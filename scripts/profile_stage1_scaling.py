"""Stage-1 tridiagonalize scaling probe: separate the HBM term (~K n^3/3
reads) from per-iteration and per-window overheads by sweeping K, n, nb,
and n_classes independently.
"""

import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.tridiag import tridiagonalize

print("backend:", jax.default_backend(), jax.devices(), flush=True)
rng = np.random.default_rng(0)


def mk(k, n):
    A = rng.standard_normal((k, n, n)).astype(np.float32)
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def t1(st, **kw):
    d, e, V, taus = tridiagonalize(st, **kw)
    sync(taus)
    t0 = time.perf_counter()
    d, e, V, taus = tridiagonalize(st, **kw)
    sync(taus)
    return time.perf_counter() - t0


cases = [
    ("K scaling", [(1, 1152), (2, 1152), (4, 1152), (8, 1152)], {}),
    ("n scaling", [(4, 576), (4, 1152), (4, 2304)], {}),
    ("nb sweep n=1152", [(4, 1152)], {"nb": 32}),
    ("nb sweep n=1152", [(4, 1152)], {"nb": 128}),
    ("classes=4 n=1152", [(4, 1152)], {"n_classes": 4}),
    ("classes=16 n=1152", [(4, 1152)], {"n_classes": 16}),
    ("classes=4 n=2304", [(4, 2304)], {"n_classes": 4}),
    ("unroll=4 n=1152", [(4, 1152)], {"unroll": 4}),
    ("unroll=8 n=1152", [(4, 1152)], {"unroll": 8}),
]
for tag, shapes, kw in cases:
    for k, n in shapes:
        st = mk(k, n)
        dt = t1(st, **kw)
        print(f"{tag}: ({k},{n}) {kw}: {dt:.3f}s "
              f"({dt / n * 1e3:.3f} ms/col)", flush=True)
