"""Stage-1 tridiagonalization: Pallas LATRD kernel vs the XLA formulation,
median-of-5 per bench factor class, plus a correctness check on-chip."""

import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.tridiag import tridiagonalize as _trid_xla
from laplace_jax.ops.latrd_pallas import tridiagonalize_pallas


def tridiagonalize(st):
    # production (tridiag_eig.py) always runs stage-1 under f32 matmuls
    with jax.default_matmul_precision("float32"):
        return _trid_xla(st)

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

for k, n in [(4, 1152), (4, 2304), (3, 4608)]:
    st = mk(k, n)
    # correctness first (also warms the compile). d/e are NOT compared
    # element-wise against the XLA path: rounding divergence is chaotic
    # (a near-trivial reflector flips and every later entry differs while
    # both outputs remain valid tridiagonalizations). The invariant is
    # the spectrum of T.
    ew_true = np.linalg.eigvalsh(np.asarray(st, np.float64))
    t_comp0 = time.perf_counter()
    d1, e1, V1, t1 = tridiagonalize_pallas(st)
    sync(t1)
    print(f"({k},{n}) pallas first call (incl compile): "
          f"{time.perf_counter() - t_comp0:.1f}s", flush=True)
    d64 = np.asarray(d1, np.float64)
    e64 = np.asarray(e1, np.float64)
    scale = float(np.abs(ew_true).max())
    err = max(
        np.abs(sla.eigh_tridiagonal(d64[i], e64[i], eigvals_only=True)
               - ew_true[i]).max()
        for i in range(k)
    ) / scale
    print(f"  tridiagonal spectrum err {err:.2e}", flush=True)
    assert err < 3e-5
    tridiagonalize(st)  # warm the XLA reference
    t_x, _ = med(lambda s: tridiagonalize(s), st)
    t_p, _ = med(lambda s: tridiagonalize_pallas(s), st)
    print(f"  XLA {t_x:.3f}s   PALLAS {t_p:.3f}s   ({t_x / t_p:.2f}x)",
          flush=True)
