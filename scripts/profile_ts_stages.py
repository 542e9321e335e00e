"""Per-stage wall-clock of the two-stage eigensolver on the bench factor
classes: tridiagonalize (stage 1) vs tridiag_eigh (stage 2) vs apply_q
(back-transform) — the ground truth for the SBR (full->band->tridiagonal)
rewrite decision.
"""

import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.tridiag import apply_q, tridiagonalize
from laplace_jax.ops.tridiag_eig import tridiag_eigh

print("backend:", jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(0)


def mk(k, n):
    A = rng.standard_normal((k, n, n)).astype(np.float32)
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


classes = [(3, 4608), (4, 2304), (4, 1152)]
tot = {"s1": 0.0, "s2": 0.0, "bt": 0.0}
for k, n in classes:
    st = mk(k, n)
    # warm all three programs
    d, e, V, taus = tridiagonalize(st)
    lam, Ut = tridiag_eigh(d, e)
    Q = apply_q(V, taus, Ut)
    sync(Q)

    t0 = time.perf_counter()
    d, e, V, taus = tridiagonalize(st)
    sync(taus)
    t1 = time.perf_counter()
    lam, Ut = tridiag_eigh(d, e)
    sync(Ut)
    t2 = time.perf_counter()
    Q = apply_q(V, taus, Ut)
    sync(Q)
    t3 = time.perf_counter()
    s1, s2, bt = t1 - t0, t2 - t1, t3 - t2
    tot["s1"] += s1; tot["s2"] += s2; tot["bt"] += bt
    print(f"({k},{n}): stage1 {s1:.3f}s  stage2 {s2:.3f}s  "
          f"back-transform {bt:.3f}s", flush=True)
print(f"totals: stage1 {tot['s1']:.3f}s  stage2 {tot['s2']:.3f}s  "
      f"back-transform {tot['bt']:.3f}s", flush=True)

# unroll sweep on stage 1 (the column fori_loop's per-iteration overhead)
for unroll in (1, 2, 4):
    for k, n in classes:
        st = mk(k, n)
        d, e, V, taus = tridiagonalize(st, unroll=unroll)
        sync(taus)
        t0 = time.perf_counter()
        d, e, V, taus = tridiagonalize(st, unroll=unroll)
        sync(taus)
        print(f"stage1 unroll={unroll} ({k},{n}): "
              f"{time.perf_counter() - t0:.3f}s", flush=True)
