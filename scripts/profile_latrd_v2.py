"""Pallas LATRD stage-1 kernel v1 vs v2 on the bench factor classes.

v2 (`laplace_jax.ops.latrd_pallas_v2`) = MXU segment corrections +
deferred 8-aligned panel writes + row-block caching. Measured results and
status: see the v2 module docstring (short version: 1.09x at (4,1152),
scoped-vmem compile failure at larger classes — not production).
Correctness is checked via the tridiagonal spectrum against numpy.
"""

import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.latrd_pallas import tridiagonalize_pallas
from laplace_jax.ops.latrd_pallas_v2 import tridiagonalize_pallas_v2

print("backend:", jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(0)


def mk(k, n):
    A = rng.standard_normal((k, n, n)).astype(np.float32)
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def tri_spec_err(d, e, A):
    d, e = np.asarray(d, np.float64), np.asarray(e, np.float64)
    errs = []
    for k in range(d.shape[0]):
        T = np.diag(d[k]) + np.diag(e[k], -1) + np.diag(e[k], 1)
        ew_t = np.linalg.eigvalsh(T)
        ew_a = np.linalg.eigvalsh(np.asarray(A[k], np.float64))
        errs.append(np.abs(ew_t - ew_a).max() / max(1.0, np.abs(ew_a).max()))
    return max(errs)


def run(st, fn, reps=3):
    t0 = time.perf_counter()
    d, e, V, taus = fn(st)
    sync(taus)
    warm = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        d, e, V, taus = fn(st)
        sync(taus)
        best = min(best, time.perf_counter() - t0)
    return best, warm, (d, e)


for k, n in [(4, 1152), (4, 2304), (3, 4608)]:
    st = mk(k, n)
    t1, w1, _ = run(st, tridiagonalize_pallas)
    try:
        t2, w2, (d2, e2) = run(st, tridiagonalize_pallas_v2)
    except Exception as ex:  # scoped-vmem compile failures at big classes
        print(f"({k},{n}): v1 {t1:.3f}s  v2 FAILED: "
              f"{type(ex).__name__}", flush=True)
        continue
    err = tri_spec_err(d2, e2, st)
    print(
        f"({k},{n}): v1 {t1:.3f}s  v2 {t2:.3f}s  ({t1 / t2:.2f}x)  "
        f"[first-call v1 {w1:.1f}s v2 {w2:.1f}s]  v2 spec err {err:.2e}",
        flush=True,
    )
