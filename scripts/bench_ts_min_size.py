"""Measure the TS-vs-QDWH crossover size for `_TS_MIN_SIZE`.

Sweeps batched symmetric eigendecomposition over factor sizes 128..2048 at
K=4 (a typical same-shape KFAC class) and prints warm wall-clock for the
two-stage solver (`eigh_stack_ts`) vs XLA's QDWH eigh. The smallest size
where TS reliably wins sets `laplace_jax.utils.matrix._TS_MIN_SIZE`; the
table goes into docs/performance.md.
"""

import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.tridiag_eig import eigh_stack_ts

print("backend:", jax.default_backend(), jax.devices(), flush=True)

rng = np.random.default_rng(0)


def mk(k, n):
    A = rng.standard_normal((k, n, n)).astype(np.float32)
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n)


def sync(x):
    np.asarray(jax.device_get(x[..., 0, 0]))


@jax.jit
def qdwh_eigh(st):
    Q, l = jax.lax.linalg.eigh(
        st, symmetrize_input=True,
        implementation=jax.lax.linalg.EighImplementation.QDWH,
    )
    return l, Q


K = 4
sizes = [128, 192, 256, 384, 512, 768, 1024, 1536, 2048]
print(f"{'n':>5} {'ts_warm_s':>10} {'qdwh_warm_s':>12} {'ts_speedup':>10}")
for n in sizes:
    st = mk(K, n)
    # warm both
    l, Q = eigh_stack_ts(st); sync(Q)
    l, Q = qdwh_eigh(st); sync(Q)
    reps = max(1, 512 // n)
    t0 = time.perf_counter()
    for _ in range(reps):
        l, Q = eigh_stack_ts(st)
    sync(Q)
    ts_s = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        l, Q = qdwh_eigh(st)
    sync(Q)
    qd_s = (time.perf_counter() - t0) / reps
    print(f"{n:>5} {ts_s:>10.4f} {qd_s:>12.4f} {qd_s / ts_s:>10.2f}",
          flush=True)
