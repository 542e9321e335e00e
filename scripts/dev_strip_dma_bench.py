"""Throwaway bandwidth-vs-DMA-size microbench for the v4 LATRD strip idea.

Round-5 finding: WITHOUT pl.multiple_of alignment hints on the dynamic
sublane offsets these same DMAs measure ~27-108 GB/s (Mosaic takes an
unaligned path); WITH the hints see the printed numbers.

Question: v1's (128, 4608) = 2.36 MB row-chunk DMAs sustain ~500-600 GB/s
effective, but v3's (384, 384) = 0.59 MB tile DMAs measured only
~44-105 GB/s. Where is the size/shape threshold? Candidate v4 fetches
contiguous column STRIPS A2[s, ds(row0, H), :] of (H, 384) from the
col-tile-major (nt, KM, T) layout -- one DMA per (k, col-tile), height up
to the full trailing window.

Run: python scripts/dev_strip_dma_bench.py
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


def _kernel(n_ref, src_ref, out_ref, *, mode, T, H, m, reps):
    nt = m // T

    def body(sc, sems):
        nH = m // H if mode == "strip" else None

        def get(slot, i):
            if mode == "rowchunk":
                # v1 style: (H, m) slice of a (m, m) ref
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(pl.multiple_of((i % (m // H)) * H, H), H), :],
                    sc.at[slot], sems.at[slot])
            # strip: (H, T) slice of plane (i % nt) at a varying row
            si = i % nt
            ri = ((i * 7 + 3) % nH) * H
            return pltpu.make_async_copy(
                src_ref.at[si, pl.ds(pl.multiple_of(ri, H), H), :],
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

    shape = (2, H, m) if mode == "rowchunk" else (2, H, T)
    pl.run_scoped(
        body,
        sc=pltpu.VMEM(shape, jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("mode", "T", "H", "m", "reps"))
def bench(src, *, mode, T, H, m, reps):
    kernel = functools.partial(_kernel, mode=mode, T=T, H=H, m=m, reps=reps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.zeros((1,), jnp.int32), src)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


m = 4608
T = 384
nt = m // T
rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((nt, m, T)).astype(np.float32))
Asq = jnp.asarray(rng.standard_normal((m, m)).astype(np.float32))
print("backend:", jax.default_backend(), flush=True)

for mode, H_list, src in (
    ("strip", [128, 384, 768, 1536, 2304, 4608], A),
    ("rowchunk", [128, 384], Asq),
):
    for H in H_list:
        nbytes = H * (T if mode == "strip" else m) * 4
        reps = max(200, min(4000, int(3e9 / nbytes)))
        f = lambda: bench(src, mode=mode, T=T, H=H, m=m, reps=reps)
        try:
            out = f(); sync(out)
        except Exception as exc:  # noqa: BLE001
            print(f"{mode:9s} H={H:5d}: FAILED "
                  f"({str(exc).splitlines()[0][:90]})", flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); out = f(); sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        gbps = nbytes * reps / t / 1e9
        print(f"{mode:9s} H={H:5d}: {nbytes/1e6:6.2f} MB/DMA x {reps:5d} "
              f"-> {gbps:6.1f} GB/s ({t/reps*1e6:7.2f} us/DMA)", flush=True)
