"""Throwaway DMA-throughput microbench: effective HBM->VMEM bandwidth of
the tile-fetch patterns considered for the v3 LATRD kernel.

  rowchunk  - v1 style: (TR, m) full-lane slice of a 2-D (KM, m) ref
  tile3d    - current v3: [si, ds(row, T), :] of a 3-D (nt, KM, T) ref
  plane4d   - pre-tiled: [si, kr, :, :] of a 4-D (nt, Knt, T, T) ref
              (fully contiguous plane -> should coalesce into wide bursts)
  plane2d   - pre-tiled flat rows: [ds(idx*8, 8), :] of (planes*8, T*T/8)
"""

import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def _kernel(n_ref, src_ref, out_ref, *, mode, T, m, reps):
    def body(sc, sems):
        nt = m // T

        def get(slot, i):
            if mode == "rowchunk":
                # consecutive (T, m) row chunks of the (X, m) ref
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds((i % nt) * T, T), :],
                    sc.at[slot], sems.at[slot])
            if mode == "tile3d":
                si = i % nt
                ri = (i * 7 + 3) % nt
                return pltpu.make_async_copy(
                    src_ref.at[si, pl.ds(ri * T, T), :],
                    sc.at[slot], sems.at[slot])
            if mode == "plane4d":
                si = i % nt
                ri = (i * 7 + 3) % nt
                return pltpu.make_async_copy(
                    src_ref.at[si, ri], sc.at[slot], sems.at[slot])
            # plane2d
            pid = ((i * 7 + 3) % (nt * nt))
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(pid * 8, 8), :],
                sc.at[slot], sems.at[slot])

        get(0, 0).start()

        def step(i, acc):
            @pl.when(i + 1 < reps)
            def _():
                get((i + 1) % 2, i + 1).start()
            get(i % 2, i).wait()
            return acc

        jax.lax.fori_loop(0, reps, step, 0)
        out_ref[...] = sc[0].reshape(1, -1)[:, :1]

    if mode in ("rowchunk", "tile3d"):
        shape = (2, T, m) if mode == "rowchunk" else (2, T, T)
    elif mode == "plane4d":
        shape = (2, T, T)
    else:
        shape = (2, 8, T * T // 8)
    pl.run_scoped(
        body,
        sc=pltpu.VMEM(shape, jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("mode", "T", "m", "reps"))
def bench(src, *, mode, T, m, reps):
    kernel = functools.partial(_kernel, mode=mode, T=T, m=m, reps=reps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(jnp.zeros((1,), jnp.int32), src)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


m = 4608
rng = np.random.default_rng(0)
reps = 2000
for T in (384, 768):
    nt = m // T
    A = jnp.asarray(rng.standard_normal((nt * m, T)).astype(np.float32))
    for mode in ("rowchunk", "tile3d", "plane4d", "plane2d"):
        if mode == "rowchunk":
            src = A.reshape(nt * T, -1)[: 2 * m // T * T, :m]
            src = jnp.asarray(
                rng.standard_normal((m, m)).astype(np.float32))
            nbytes = T * m * 4
        elif mode == "tile3d":
            src = A.reshape(nt, m, T)
            nbytes = T * T * 4
        elif mode == "plane4d":
            src = A.reshape(nt, nt, T, T)
            nbytes = T * T * 4
        else:
            src = A.reshape(nt * nt * 8, T * T // 8)
            nbytes = T * T * 4
        f = lambda: bench(src, mode=mode, T=T, m=m, reps=reps)
        out = f(); sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); out = f(); sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        gbps = nbytes * reps / t / 1e9
        print(f"T={T} {mode:9s}: {t*1e3:8.2f} ms for {reps} x "
              f"{nbytes/1e6:5.2f} MB -> {gbps:6.1f} GB/s", flush=True)
