"""Decompose _merge_level cost at (B=3, M=4608) into fragments.

sync NOTE: slice ON DEVICE first (x[0,...,0]) — jax.device_get of a full
(B, M, M) output ships ~255MB through the axon tunnel (~35MB/s = 7s!) and
poisons the measurement."""
import sys; sys.path.insert(0, "/root/repo")
import time, functools, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
print("backend:", jax.default_backend(), flush=True)

B, M = 3, 4608
rng = np.random.default_rng(0)
ds = jnp.asarray(np.sort(rng.standard_normal((B, M)).astype(np.float32), axis=1))
U = jnp.asarray(rng.standard_normal((B, M, M)).astype(np.float32))
z = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32))
z2 = z * z
rho = jnp.abs(jnp.asarray(rng.standard_normal((B,)).astype(np.float32)))
perm = jnp.asarray(np.argsort(rng.standard_normal((B, M)), axis=1).astype(np.int32))
mu = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32) ** 2)
rl = jnp.asarray(rng.integers(0, M, (B, M)).astype(np.int32))
tiny = jnp.float32(1e-30)

def sync(x):
    idx = tuple(0 for _ in range(getattr(x, "ndim", 0)))
    np.asarray(jax.device_get(x[idx] if idx else x))

def timeit(label, f, *args, reps=3):
    out = f(*args)
    for l in jax.tree_util.tree_leaves(out): sync(l)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        for l in jax.tree_util.tree_leaves(out): sync(l)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:.1f}ms", flush=True)

@jax.jit
def frag_bisect(ds, z2, rho, mu):
    Dg = ds[:, :, None] - ds[:, None, :]
    def body(_, lohi):
        lo, hi = lohi
        m_ = 0.5 * (lo + hi)
        denom = Dg - m_[:, None, :]
        denom = jnp.where(denom == 0, tiny, denom)
        t1 = jnp.where(z2[:, :, None] > 0, rho[:, None, None] * z2[:, :, None] / denom, 0.0)
        f = 1.0 + jnp.sum(t1, axis=1)
        neg = f < 0
        return jnp.where(neg, m_, lo), jnp.where(neg, hi, m_)
    lo, hi = jax.lax.fori_loop(0, 40, body, (jnp.zeros_like(mu), mu + 1.0))
    return lo

@jax.jit
def frag_gather_ax2(U, perm):
    return jnp.take_along_axis(U, perm[:, None, :], axis=2) * 1.000001

@jax.jit
def frag_gather_ax1_full(U, rl):
    return jnp.take_along_axis(
        U, jnp.broadcast_to(rl[:, :, None], (B, M, M)), axis=1) * 1.000001

@jax.jit
def frag_einsum_f32(U, G):
    with jax.default_matmul_precision("float32"):
        return jnp.einsum("bij,bjk->bik", U, G)

@jax.jit
def frag_einsum_bf16(U, G):
    with jax.default_matmul_precision("bfloat16"):
        return jnp.einsum("bij,bjk->bik", U, G)

@jax.jit
def frag_cholqr2(V):
    with jax.default_matmul_precision("float32"):
        for _ in range(2):
            G = jnp.einsum("kji,kjl->kil", V, V)
            L = jnp.linalg.cholesky(G)
            V = jax.lax.linalg.triangular_solve(
                L, V, left_side=False, lower=True, transpose_a=True)
        return V

@jax.jit
def frag_w_cols(ds, mu, z):
    Dg = ds[:, :, None] - ds[:, None, :]
    num = mu[:, None, :] - Dg
    w = z[:, :, None] / jnp.where(num == 0, tiny, -num)
    nrm = jnp.sqrt(jnp.maximum(jnp.sum(w * w, axis=1), tiny))
    return w / nrm[:, None, :]

from laplace_jax.ops import tridiag_eig as te
ml40 = jax.jit(functools.partial(te._merge_level, bisect_iters=40, newton_iters=3))
ml8 = jax.jit(functools.partial(te._merge_level, bisect_iters=8, newton_iters=3))

timeit("bisect40 f-evals      ", frag_bisect, ds, z2, rho, mu)
timeit("gather U axis=2 (perm) ", frag_gather_ax2, U, perm)
timeit("gather U axis=1 (full) ", frag_gather_ax1_full, U, rl)
timeit("U@G einsum f32         ", frag_einsum_f32, U, U)
timeit("U@G einsum bf16        ", frag_einsum_bf16, U, U)
timeit("cholqr2                ", frag_cholqr2, U)
timeit("w columns + norm       ", frag_w_cols, ds, mu, z)
timeit("FULL merge bi=40       ", ml40, ds, U, rho, z)
timeit("FULL merge bi=8        ", ml8, ds, U, rho, z)
