import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from laplace_jax.ops.tridiag import tridiagonalize, apply_q
from laplace_jax.ops.tridiag_eig import tridiag_eigh
print("backend:", jax.default_backend(), flush=True)

K, n = 3, 4608
rng = np.random.default_rng(0)
# PSD without an n^3 host matmul: diag-dominant symmetric
A = rng.standard_normal((K, n, n)).astype(np.float32)
A = (A + A.transpose(0, 2, 1)) / 2
A = jnp.asarray(A)

def sync(x):
    np.asarray(jax.device_get(x[..., 0] if x.ndim == 1 else x[..., 0, 0]))

def timeit(label, f, *args, reps=3, **kw):
    out = f(*args, **kw)
    jax.tree_util.tree_map(lambda v: sync(v) if hasattr(v, 'ndim') else None, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args, **kw)
        leaves = jax.tree_util.tree_leaves(out)
        sync(leaves[0])
        for l in leaves:
            sync(l)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts):.3f}s (min of {reps})", flush=True)
    return out

d, e, V, taus = timeit("stage1 tridiagonalize", tridiagonalize, A)
lam, Ut = timeit("stage2 tridiag_eigh   ", tridiag_eigh, d, e)
vecs = timeit("stage3 apply_q        ", apply_q, V, taus, Ut)
