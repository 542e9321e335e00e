"""Stage-1 tridiagonalization: v4 (symmetric-half STRIP streaming) vs the
production v1 Pallas kernel, median-of-5 per bench factor class, plus an
on-chip spectrum correctness check for v4.

Usage: python scripts/profile_latrd_v4.py [n] [H]
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
from laplace_jax.ops.latrd_pallas_v4 import tridiagonalize_pallas_v4

print("backend:", jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(0)


def mk(k, n):
    A = rng.standard_normal((k, n, n)).astype(np.float32)
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def med(f, st, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(st)
        sync(out[3])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


import scipy.linalg as sla

classes = [(4, 512), (4, 1152), (4, 2304), (3, 4608)]
H = None
if len(sys.argv) > 1:
    sel = sys.argv[1]  # e.g. "4608" to run one class
    classes = [(k, n) for k, n in classes if str(n) == sel]
if len(sys.argv) > 2:
    H = int(sys.argv[2])

def tri_spectrum(d, e):
    d64, e64 = np.asarray(d, np.float64), np.asarray(e, np.float64)
    return np.stack([
        sla.eigh_tridiagonal(d64[i], e64[i], eigvals_only=True)
        for i in range(d64.shape[0])
    ])


for k, n in classes:
    st = mk(k, n)
    v4 = lambda s: tridiagonalize_pallas_v4(s, H=H)
    t0 = time.perf_counter()
    out1 = tridiagonalize_pallas(st)
    sync(out1[3])
    print(f"({k},{n}) v1 first call: {time.perf_counter() - t0:.1f}s",
          flush=True)
    # oracle: v1's tridiagonal spectrum (LAPACK-verified in the test
    # suite) — the dense f64 eigvalsh is minutes of single-core CPU at
    # the 4608 class and adds nothing here
    ew_ref = tri_spectrum(out1[0], out1[1])
    t0 = time.perf_counter()
    d4, e4, V4, t4 = v4(st)
    sync(t4)
    print(f"  v4 first call (incl compile): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    scale = float(np.abs(ew_ref).max())
    err = float(np.abs(tri_spectrum(d4, e4) - ew_ref).max()) / scale
    print(f"  v4 vs v1 spectrum err {err:.2e}", flush=True)
    assert err < 3e-5
    t_1, _ = med(tridiagonalize_pallas, st)
    t_4, _ = med(v4, st)
    print(f"  V1 {t_1:.3f}s   V4 {t_4:.3f}s   ({t_1 / t_4:.2f}x)",
          flush=True)
