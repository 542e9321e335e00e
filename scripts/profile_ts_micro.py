import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from laplace_jax.ops import tridiag_eig as te
print("backend:", jax.default_backend(), flush=True)

K = 3
rng = np.random.default_rng(0)

def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]).ravel()[:1])

def timeit(label, f, *args, reps=3, **kw):
    t0 = time.perf_counter()
    out = f(*args, **kw)
    for l in jax.tree_util.tree_leaves(out): sync(l)
    print(f"{label}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args, **kw)
        for l in jax.tree_util.tree_leaves(out): sync(l)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.1f}ms (min of {reps})", flush=True)
    return out

# jacobi base case shape for n=4608: m0=36, S0=128
m0, S0 = 36, 128
A = rng.standard_normal((K * S0, m0, m0)).astype(np.float32)
A = jnp.asarray((A + A.transpose(0, 2, 1)) / 2)
jac = jax.jit(functools.partial(te._jacobi_eigh, sweeps=12))
timeit("jacobi base (12 sweeps, B=384, m=36)", jac, A)

# merges at the top 3 level shapes, bi=40/0
n_pad = 4608
for M2 in (4608, 2304, 1152):
    S = n_pad // M2
    B = K * S
    D = jnp.asarray(np.sort(rng.standard_normal((B, M2)).astype(np.float32), axis=1))
    U = jnp.broadcast_to(jnp.eye(M2, dtype=jnp.float32), (B, M2, M2))
    rho = jnp.abs(jnp.asarray(rng.standard_normal((B,)).astype(np.float32)))
    z = jnp.asarray(rng.standard_normal((B, M2)).astype(np.float32))
    z = z / jnp.linalg.norm(z, axis=1, keepdims=True)
    for bi, ni in ((40, 3), (0, 3)):
        ml = jax.jit(functools.partial(te._merge_level, bisect_iters=bi,
                                       newton_iters=ni))
        timeit(f"merge B={B} M={M2} bi={bi} ni={ni}", ml, D, U, rho, z)
