"""Which batched-matvec lowering is fastest on TPU at stage-1 shapes?

The stage-1 inner loop does ~n sequential matvecs against the trailing
window. Candidates (all inside one fori_loop to amortize dispatch):
  folded : (K*m, m) @ (m, K) matmul (current _bmv)
  unroll : per-k (m,m)*(m,) multiply + lane reduce, K unrolled
  unrollT: per-k (m,) @ (m,m) vec-mat (contract over sublane axis)
"""
import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
print("backend:", jax.default_backend(), flush=True)

K, m, ITERS = 3, 4608, 32
rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((K, m, m)).astype(np.float32))
v0 = jnp.asarray(rng.standard_normal((K, m)).astype(np.float32))

def bench(label, step):
    @jax.jit
    def run(A, v):
        def body(_, v):
            w = step(A, v)
            return w / (1.0 + jnp.max(jnp.abs(w)))
        return jax.lax.fori_loop(0, ITERS, body, v)
    out = run(A, v0); np.asarray(jax.device_get(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(A, v0); np.asarray(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / ITERS * 1e3
    bw = K * m * m * 4 / (per / 1e3) / 1e9
    print(f"{label}: {per:.3f} ms/matvec  ({bw:.0f} GB/s effective)", flush=True)

def folded(A, v):
    P = (A.reshape(K * m, m) @ v.T).reshape(K, m, K)
    idx = jnp.arange(K)[:, None, None]
    return jnp.take_along_axis(P, idx, axis=2)[..., 0]

def unroll(A, v):
    return jnp.stack([jnp.sum(A[k] * v[k][None, :], axis=1) for k in range(K)])

def unrollT(A, v):
    return jnp.stack([v[k] @ A[k] for k in range(K)])

def unroll_mm(A, v):
    return jnp.stack([A[k] @ v[k][:, None] for k in range(K)])[..., 0]

bench("folded (K*m,m)@(m,K)", folded)
bench("unroll mult+reduce   ", unroll)
bench("unrollT v@A          ", unrollT)
bench("unroll A@v[:,None]   ", unroll_mm)
