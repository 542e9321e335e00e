"""Does lax loop `unroll` amortize the ~0.2 ms/iteration floor on this
runtime? Calibrates the floor at 1024 iterations, then sweeps unroll for
an elementwise body and for the stage-1-like matvec body."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
print("backend:", jax.default_backend(), flush=True)

K, m = 3, 4608
rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((K, m, m)).astype(np.float32))
v0 = jnp.asarray(rng.standard_normal((K, m)).astype(np.float32) * 1e-3)


def bench(label, body, carry, iters, unroll):
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, iters, body, carry, unroll=unroll)
    out = run(carry)
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry)
        np.asarray(jax.device_get(
            jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
        ts.append(time.perf_counter() - t0)
    print(f"{label} iters={iters:5d} unroll={unroll:2d}: "
          f"{min(ts)/iters*1e3:.4f} ms/iter", flush=True)


def ew(i, v):
    return v * 0.999 + 1e-6


def mv(i, v):
    w = (A.reshape(K * m, m) @ v.T).reshape(K, m, K)
    w = jnp.take_along_axis(w, jnp.arange(K)[:, None, None], axis=2)[..., 0]
    return jnp.tanh(w * 1e-4)


bench("elementwise", ew, v0, 1024, 1)
for u in (2, 4, 8, 16, 32):
    bench("elementwise", ew, v0, 1024, u)
bench("matvec     ", mv, v0, 256, 1)
for u in (2, 4, 8):
    bench("matvec     ", mv, v0, 256, u)
