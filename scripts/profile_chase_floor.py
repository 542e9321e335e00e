"""Feasibility floor for the bulge-chasing stage-B loop: per-iteration cost
of a lax.fori_loop whose body does the chase step's work shape — a W-way
batched slab gather from a (K, 2b, Np) band store, a small batched rank-2
update, and a scatter back — at several (W, b, unroll) points.

The d=1 band->tridiagonal chase has sequential depth ~3n (sweeps offset by 3
time steps); at n=4608 that is ~14k iterations, so the per-iteration floor
decides whether the whole pass lands at ~0.1s or ~0.5s.
"""

import sys

sys.path.insert(0, "/root/repo")
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

print("backend:", jax.default_backend(), jax.devices(), flush=True)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def bench_loop(body, state, iters, tag):
    @functools.partial(jax.jit, static_argnames=("n", "unroll"))
    def run(state, n, unroll):
        return jax.lax.fori_loop(0, n, body, state, unroll=unroll)

    for unroll in (1, 2, 4, 8):
        out = run(state, iters, unroll)
        sync(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        out = run(state, iters, unroll)
        sync(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        print(
            f"{tag} unroll={unroll}: {dt:.3f}s for {iters} iters "
            f"-> {dt / iters * 1e6:.1f} us/iter",
            flush=True,
        )


# ---- trivial body: pure loop overhead ------------------------------------
def triv_body(i, x):
    return x + 1.0


bench_loop(triv_body, jnp.zeros((8, 128)), 14000, "trivial")

# ---- chase-shaped body ----------------------------------------------------
# K matrices, W concurrent tasks, bandwidth b: gather (K, W, 2b, 2b) slabs at
# W task-dependent positions, do a masked reflector build + rank-2 update on
# a local dense (K*W, 3b, 3b) block, scatter slabs back.
for K, W, b in ((11, 25, 64), (11, 25, 32), (3, 25, 64)):
    Np = 4608 + 3 * b
    D = jnp.asarray(
        np.random.default_rng(0).standard_normal((K, 2 * b, Np)).astype(
            np.float32
        )
    )

    def chase_body(tau, D, K=K, W=W, b=b, Np=Np):
        # W task positions derived from tau (wavefront schedule shape)
        w = jnp.arange(W)
        s = tau // 3 - w
        t = tau - 3 * s
        p0 = jnp.clip(s + jnp.maximum(t - 1, 0) * b, 0, Np - 2 * b)

        col_idx = p0[:, None] + jnp.arange(2 * b)[None, :]  # (W, 2b)
        slabs = D[:, :, col_idx]  # one gather: (K, 2b, W, 2b)
        # local rank-2-update-shaped math (not the real chase; same op count)
        L = slabs.transpose(2, 0, 1, 3).reshape(W * K, 2 * b, 2 * b)
        v = L[:, :, 0]
        nrm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True) + 1e-30)
        v = v / nrm
        w_ = jnp.einsum("kij,ki->kj", L, v)
        w_ = w_ - 0.5 * jnp.sum(w_ * v, axis=1, keepdims=True) * v
        L = L - v[:, :, None] * w_[:, None, :] - w_[:, :, None] * v[:, None, :]
        slabs = L.reshape(W, K, 2 * b, 2 * b).transpose(1, 2, 0, 3)
        # one scatter (slab columns are schedule-disjoint)
        return D.at[:, :, col_idx].set(slabs)

    bench_loop(
        lambda i, d: chase_body(i, d), D, 2000, f"chase K={K} W={W} b={b}"
    )
