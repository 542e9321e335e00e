"""Throwaway probe: what HBM->VMEM bandwidth does the PRODUCTION v1 LATRD
panel kernel actually sustain, and what part of its structure achieves it?

The standalone microbench (dev_strip_dma_bench.py) measures ~100 GB/s for
double-buffered 2.36 MB DMAs, but v1's end-to-end stage-1 time implies
~485 GB/s. One of the two is unrepresentative; this times ONE v1 panel
(off=0, the worst case) and a compute-stripped clone of its chunk loop.

Run: python scripts/dev_v1_dma_probe.py
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

from laplace_jax.ops.latrd_pallas import latrd_panel

print("backend:", jax.default_backend(), flush=True)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


K, m, nb, TR = 3, 4608, 64, 128
rng = np.random.default_rng(0)
A = rng.standard_normal((K, m, m)).astype(np.float32)
Aw = jnp.asarray((A + A.transpose(0, 2, 1)) / 2)

# NOTE: calling the production latrd_panel standalone OOMs the 16 MB
# scoped-vmem stack limit (16.73M) -- it only compiles inside the
# production tridiagonalize_pallas outer jit. Implied production numbers
# come from docs/performance.md instead: (3,4608) class 0.943 s ~ 485 GB/s.
nbytes = nb * K * (m // TR) * TR * m * 4  # no skipping at off=0

# --- compute-stripped clone of v1's chunk loop -------------------------
def _kernel(n_ref, A_ref, out_ref, *, K, m, nb, TR, mode):
    n_ch = m // TR

    def body(av, chunk_sc, sems):
        v8 = jnp.full((8, m), 1e-3, jnp.float32)

        def col_body(j, acc):
            def get_dma(slot, t):
                return pltpu.make_async_copy(
                    A_ref.at[pl.ds(pl.multiple_of(t * TR, TR), TR), :],
                    chunk_sc.at[slot],
                    sems.at[slot],
                )

            get_dma(0, 0).start()

            for k in range(K):
                def chunk_body(i, _c, k=k):
                    t = k * n_ch + i

                    @pl.when(t + 1 < K * n_ch)
                    def _():
                        get_dma((t + 1) % 2, t + 1).start()

                    get_dma(t % 2, t).wait()
                    if mode == "full":
                        part = jax.lax.dot_general(
                            v8, chunk_sc[t % 2],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        ).astype(jnp.float32)
                        av[:, pl.ds(
                            pl.multiple_of(k * m + i * TR, TR), TR
                        )] = part
                    return _c

                jax.lax.fori_loop(0, n_ch, chunk_body, 0)
            return acc + av[0, 0]

        out_ref[...] = jnp.broadcast_to(
            jax.lax.fori_loop(0, nb, col_body, jnp.float32(0.0)), (1, 1)
        )

    pl.run_scoped(
        body,
        av=pltpu.VMEM((8, K * m), jnp.float32),
        chunk_sc=pltpu.VMEM((2, TR, m), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("K", "m", "nb", "TR", "mode"))
def clone(Aflat, *, K, m, nb, TR, mode):
    kernel = functools.partial(_kernel, K=K, m=m, nb=nb, TR=TR, mode=mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.zeros((1,), jnp.int32), Aflat)


Aflat = Aw.reshape(K * m, m)
for mode in ("dmaonly", "full"):
    f = lambda: clone(Aflat, K=K, m=m, nb=nb, TR=TR, mode=mode)
    out = f(); sync(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); out = f(); sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"clone {mode:8s}: {t*1e3:8.2f} ms  "
          f"({nbytes/1e9:.2f} GB -> {nbytes/t/1e9:6.1f} GB/s)", flush=True)
