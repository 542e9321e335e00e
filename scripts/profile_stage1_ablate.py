"""Ablation profile of the REAL stage-1 column loop body at class-0 shapes
(K=3, m=4608, nb=64): cumulative variants from empty loop to full body, to
localize the gap between the HBM cost model (~0.23 ms/iter) and measured
stage-1 time. One fori_loop of 512 iterations per variant (dispatch ~25 ms
amortized to <0.2%)."""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
print("backend:", jax.default_backend(), flush=True)

K, m, nb = 3, 4608, 64
ITERS = 512
dtype = jnp.float32
rng = np.random.default_rng(0)
Aw0 = jnp.asarray(rng.standard_normal((K, m, m)).astype(np.float32))
UW0 = jnp.zeros((K, m, 2 * nb), dtype)
d0 = jnp.zeros((K, m), dtype)
taus0 = jnp.zeros((K, m), dtype)
rows_w = jnp.arange(m)
eps_tiny = jnp.asarray(jnp.finfo(dtype).tiny * 1e4, dtype)


def _bmv(A, v):
    Kk, mm, nn = A.shape
    P = (A.reshape(Kk * mm, nn) @ v.T).reshape(Kk, mm, Kk)
    idx = jnp.arange(Kk)[:, None, None]
    return jnp.take_along_axis(P, idx, axis=2)[..., 0]


def _bmv_t(A, v):
    Kk, mm, nn = A.shape
    eye = jnp.eye(Kk, dtype=A.dtype)
    vb = (eye[:, :, None] * v[None, :, :]).reshape(Kk, Kk * mm)
    return vb @ A.reshape(Kk * mm, nn)


def swap(x):
    return jnp.concatenate([x[:, nb:], x[:, :nb]], axis=1)


def body_full(j, inner, stop_at=99):
    """The real col_body with a cutoff: ops after `stop_at` are skipped."""
    Aw_c, UW, d, e, taus = inner
    c = j % (m - 2 * nb)
    col = jax.lax.dynamic_slice(Aw_c, (0, c, 0), (K, 1, m))[:, 0, :]  # 1
    if stop_at >= 2:
        uw_row = jax.lax.dynamic_slice(UW, (0, c, 0), (K, 1, 2 * nb))[:, 0, :]
        col = col - _bmv(UW, swap(uw_row))  # 2: UW correction matvec
    if stop_at >= 3:
        d = jax.lax.dynamic_update_slice(
            d, jax.lax.dynamic_slice(col, (0, c), (K, 1)), (0, c))  # 3
    below = rows_w[None, :] > c
    x = jnp.where(below, col, 0.0)
    if stop_at >= 4:  # 4: householder scalars
        alpha = jax.lax.dynamic_slice(col, (0, c + 1), (K, 1))[:, 0]
        xnorm2 = jnp.maximum(jnp.sum(x * x, axis=1) - alpha * alpha, 0.0)
        anorm = jnp.sqrt(alpha * alpha + xnorm2)
        sign = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
        beta = -sign * anorm
        trivial = xnorm2 <= eps_tiny * anorm * anorm
        denom = jnp.where(trivial, 1.0, alpha - beta)
        beta_safe = jnp.where(trivial, 1.0, beta)
        tau = jnp.where(trivial, 0.0, (beta - alpha) / beta_safe)
        v = jnp.where(below, x / denom[:, None], 0.0)
        v = jnp.where(rows_w[None, :] == c + 1, 1.0, v)
        v = jnp.where(below, v, 0.0)
        taus = jax.lax.dynamic_update_slice(taus, tau[:, None], (0, c))
    else:
        v = x * 1e-4
        tau = jnp.full((K,), 1e-4, dtype)
    if stop_at >= 5:
        Av = _bmv(Aw_c, v)  # 5: the big trailing matvec
    else:
        Av = v
    if stop_at >= 6:
        UWv = _bmv_t(UW, v)
        Av = Av - _bmv(UW, swap(UWv))  # 6: UW corrections of Av
    w = tau[:, None] * Av
    if stop_at >= 7:
        w = w - (0.5 * tau * jnp.sum(w * v, axis=1))[:, None] * v
        w = jnp.where(below, w, 0.0)
    if stop_at >= 8:  # 8: UW writes
        jj = j % nb
        UW = jax.lax.dynamic_update_slice(UW, v[:, :, None], (0, 0, jj))
        UW = jax.lax.dynamic_update_slice(
            UW, w[:, :, None], (0, 0, nb + jj))
    else:
        UW = UW + 0.0 * w[:, :, None]
    return Aw_c, UW, d, d, taus


LABELS = {
    1: "1 row read only          ",
    2: "+2 UW correction matvec  ",
    3: "+3 d write               ",
    4: "+4 householder scalars   ",
    5: "+5 BIG trailing matvec   ",
    6: "+6 UW corrections of Av  ",
    7: "+7 w symmetrize          ",
    8: "+8 UW writes (full body) ",
}


def bench(stop_at):
    import functools
    body = functools.partial(body_full, stop_at=stop_at)

    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, ITERS, body, carry)

    carry = (Aw0, UW0, d0, d0, taus0)
    out = run(carry)
    np.asarray(jax.device_get(out[1][0, 0, 0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry)
        np.asarray(jax.device_get(out[1][0, 0, 0]))
        ts.append(time.perf_counter() - t0)
    print(f"{LABELS[stop_at]}: {min(ts)/ITERS*1e3:.4f} ms/iter", flush=True)


for s in range(1, 9):
    bench(s)
