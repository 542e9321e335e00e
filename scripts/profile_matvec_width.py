"""Why does stage-1's per-column folded matvec miss HBM peak?

Compares formulations of the batched symmetric matvec (K, m, m) @ (K, m)
inside a sequential fori_loop (the real usage shape) against the pure-read
HBM roofline, sweeping the folded matmul's RHS width.
"""

import sys

sys.path.insert(0, "/root/repo")
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

print("backend:", jax.default_backend(), jax.devices(), flush=True)

K, m = 3, 4608
ITERS = 200
rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((K, m, m)).astype(np.float32))
v0 = jnp.asarray(rng.standard_normal((K, m)).astype(np.float32))
bytes_per = K * m * m * 4


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def bench(name, body):
    @jax.jit
    def run(A, v):
        def it(i, v):
            out = body(A, v)
            # feed back so iterations are sequential (like the real loop)
            return out / (1.0 + jnp.max(jnp.abs(out)))

        return jax.lax.fori_loop(0, ITERS, it, v)

    out = run(A, v0)
    sync(out)
    t0 = time.perf_counter()
    out = run(A, v0)
    sync(out)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name}: {dt * 1e3:.3f} ms/iter -> {bytes_per / dt / 1e9:.0f} GB/s",
          flush=True)


# roofline: pure reduction read
def red(A, v):
    return v * 0 + jnp.sum(A, axis=(1, 2))[:, None] * 1e-9


bench("reduce-read roofline", red)


# current _bmv: folded 2-D matmul, RHS (m, K)
def bmv_fold(A, v):
    P = (A.reshape(K * m, m) @ v.T).reshape(K, m, K)
    idx = jnp.arange(K)[:, None, None]
    return jnp.take_along_axis(P, idx, axis=2)[..., 0]


bench("folded RHS=K(3)", bmv_fold)


# folded with RHS padded to width c
def mk_wide(c):
    def f(A, v):
        Vw = jnp.zeros((m, c), A.dtype).at[:, :K].set(v.T)
        P = (A.reshape(K * m, m) @ Vw).reshape(K, m, c)
        idx = jnp.arange(K)[:, None, None]
        return jnp.take_along_axis(P, idx, axis=2)[..., 0]

    return f


for c in (8, 32, 128, 256):
    bench(f"folded RHS={c}", mk_wide(c))


# batched dot_general (the documented-bad variant)
def bdot(A, v):
    return jnp.einsum("kij,kj->ki", A, v)


bench("einsum kij,kj->ki", bdot)


# batched with dummy trailing dim 8
def bdot8(A, v):
    V = jnp.broadcast_to(v[:, :, None], (K, m, 8))
    return jnp.einsum("kij,kjc->kic", A, V)[..., 0]


bench("einsum kij,kjc->kic c=8", bdot8)
