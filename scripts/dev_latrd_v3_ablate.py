"""Throwaway ablation of the v3 symmetric-tile panel kernel: where do the
~9 us/tile go? Modes (timing-only; most produce WRONG math on purpose):

  full      - the real v3 pair loop
  nocontrib2- skip the transposed dot + its dynamic av RMW
  dmaonly   - wait for every tile DMA, no compute
  staticlane- full compute but all lane offsets pinned to 0 (wrong math):
              isolates the cost of DYNAMIC lane-offset loads/stores
  nodots    - dynamic RMW kept, dots replaced by the tile's first rows

Run: python scripts/dev_latrd_v3_ablate.py [n]
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

_KP = 8


def _cdiv(a, b):
    return -(-a // b)


def _kernel(off_ref, A2_ref, out_ref, *, K, m, nb, T, mode):
    KM = K * m
    dtype = out_ref.dtype
    off = off_ref[0]
    nt = m // T

    def body(av, v_sc, tile_sc, sems):
        v_sc[...] = jnp.ones((_KP, KM), dtype) * 1e-3

        def col_body(j, acc):
            c = off + j
            av[...] = jnp.zeros((_KP, KM), dtype)
            r0 = c // T
            q_t = nt - r0
            P = q_t * (q_t + 1) // 2

            def advance(r, s):
                wrap = s >= r
                return (jnp.where(wrap, r + 1, r),
                        jnp.where(wrap, r0, s + 1))

            for k in range(K):
                def get_dma(slot, ri, si, k=k):
                    return pltpu.make_async_copy(
                        A2_ref.at[si, pl.ds(k * m + ri * T, T), :],
                        tile_sc.at[slot],
                        sems.at[slot],
                    )

                @pl.when(P > 0)
                def _():
                    get_dma(0, r0, r0).start()

                def pair_body(p, carry, k=k):
                    ri, si, rn, sn = carry

                    @pl.when(p + 1 < P)
                    def _():
                        get_dma((p + 1) % 2, rn, sn).start()

                    get_dma(p % 2, ri, si).wait()
                    if mode != "dmaonly":
                        tile = tile_sc[p % 2]
                        li = 0 if mode == "staticlane" else None

                        def lidx(block):
                            if li is not None:
                                return pl.ds(0, T)
                            return pl.ds(
                                pl.multiple_of(k * m + block * T, T), T)

                        vs = v_sc[:, lidx(si)]
                        if mode == "nodots":
                            part1 = tile[:_KP, :] + vs
                        else:
                            part1 = jax.lax.dot_general(
                                vs, tile, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST,
                            ).astype(dtype)
                        idx_r = lidx(ri)
                        av[:, idx_r] = av[:, idx_r] + part1

                        if mode != "nocontrib2":
                            @pl.when((si < ri) | (mode == "staticlane"))
                            def _():
                                vr = v_sc[:, lidx(ri)]
                                if mode == "nodots":
                                    part2 = tile[:_KP, :] + vr
                                else:
                                    part2 = jax.lax.dot_general(
                                        vr, tile, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.HIGHEST,
                                    ).astype(dtype)
                                idx_s = lidx(si)
                                av[:, idx_s] = av[:, idx_s] + part2
                    rn2, sn2 = advance(rn, sn)
                    return rn, sn, rn2, sn2

                r1, s1 = advance(jnp.asarray(r0, jnp.int32),
                                 jnp.asarray(r0, jnp.int32))
                jax.lax.fori_loop(0, P, pair_body,
                                  (jnp.asarray(r0, jnp.int32),
                                   jnp.asarray(r0, jnp.int32), r1, s1))
            return acc + jnp.sum(av[...], axis=1, keepdims=True)[:1, :_KP]

        out_ref[...] = jax.lax.fori_loop(
            0, nb, col_body, jnp.zeros((1, _KP), dtype))

    pl.run_scoped(
        body,
        av=pltpu.VMEM((_KP, KM), dtype),
        v_sc=pltpu.VMEM((_KP, KM), dtype),
        tile_sc=pltpu.VMEM((2, T, T), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("K", "m", "nb", "T", "mode"))
def panel(A2, off, *, K, m, nb, T, mode):
    kernel = functools.partial(_kernel, K=K, m=m, nb=nb, T=T, mode=mode)
    scal = jnp.stack([jnp.asarray(off, jnp.int32)])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, _KP), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
    )(scal, A2)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


n = int(sys.argv[1]) if len(sys.argv) > 1 else 2304
K = 4 if n <= 2304 else 3
for T in ([384, 768] if n >= 1536 else [128]):
    m = _cdiv(n, T) * T
    nt = m // T
    nb = 64
    rng = np.random.default_rng(0)
    A2 = jnp.asarray(
        rng.standard_normal((nt, K * m, T)).astype(np.float32))
    # tiles for a zero-offset panel (worst case): sum over nb cols of P(c)
    n_tiles = sum(
        (nt - c // T) * (nt - c // T + 1) // 2 for c in range(nb)) * K
    print(f"n={n} K={K} T={T} (panel off=0, {n_tiles} tiles/panel)",
          flush=True)
    for mode in ["dmaonly", "nodots", "nocontrib2", "staticlane", "full"]:
        f = lambda: panel(A2, 0, K=K, m=m, nb=nb, T=T, mode=mode)
        try:
            out = f(); sync(out)
        except Exception as exc:  # noqa: BLE001
            print(f"  {mode:11s}: FAILED "
                  f"({str(exc).splitlines()[0][:90]})", flush=True)
            continue
        ts = []
        for _ in range(5):
            t0 = time.perf_counter(); out = f(); sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"  {mode:11s}: {t*1e3:7.2f} ms/panel "
              f"({t/n_tiles*1e6:6.2f} us/tile)", flush=True)
