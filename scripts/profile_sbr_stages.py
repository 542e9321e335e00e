"""Per-stage SBR timing at the bench factor shapes (v5e, warm).

Measures, per (K, n) class and bandwidth b:
  - stage A: `band.band_reduce` (full -> band, XLA panel QR)
  - stage B: `chase.band_to_tridiag` (band -> tridiag, XLA wavefront chase)
  - Q2 apply: `chase.apply_chase_q` on an n x n matrix
against the current production stage 1 (`latrd_pallas` via tridiag dispatch)
to budget a VMEM-resident chase kernel. Run: python scripts/profile_sbr_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.band import band_reduce
from laplace_jax.ops.chase import apply_chase_q, band_to_tridiag


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timeit(fn, *args, reps=3):
    fn(*args)  # warm/compile
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    classes = [(4, 1152), (4, 2304), (3, 4608)]
    bs = [int(x) for x in os.environ.get("SBR_BS", "64,128").split(",")]
    rng = np.random.default_rng(0)
    for K, n in classes:
        M = rng.standard_normal((K, n, n)).astype(np.float32)
        A = jnp.asarray(M + np.swapaxes(M, 1, 2))
        for b in bs:
            tA = timeit(lambda A=A, b=b: band_reduce(A, b=b), reps=3)
            B, V, taus = band_reduce(A, b=b)
            tB = timeit(lambda B=B, b=b: band_to_tridiag(B, b=b), reps=1)
            d, e, Vlog, taulog = band_to_tridiag(B, b=b)
            S = jnp.asarray(
                rng.standard_normal((K, n, n)).astype(np.float32)
            )
            tQ = timeit(
                lambda V=Vlog, t=taulog, S=S, b=b: apply_chase_q(V, t, S, b=b),
                reps=1,
            )
            print(
                f"(K={K}, n={n}, b={b}): stageA={tA:.3f}s "
                f"chase={tB:.3f}s applyQ2={tQ:.3f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
