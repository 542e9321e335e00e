"""Batched blocked Householder tridiagonalization (stage 1 of the two-stage
symmetric eigensolver) + WY-blocked application of the accumulated Q.

TPU-native LAPACK `sytrd`/`orgtr` replacement for the KFAC decompose epilogue
(reference math preserved: `/root/reference/laplace/utils/matrix.py:123-150`
consumes plain `eigh` results). Design notes:

- Batched over a leading K axis (same-shape KFAC factors decompose together).
- LATRD-style panels: within a panel of `nb` columns only skinny matvecs and
  rank-2 corrections run; the trailing matrix is touched once per panel by a
  rank-2nb update (matmul). The memory traffic is the classical ~n^3/3
  elements of symmetric matvec reads — the HBM-bandwidth-bound floor.
- Static shapes via WINDOW CLASSES: panels are grouped into `n_classes`
  windows of static size; each class body is one `lax.fori_loop` over its
  panels (inner `fori_loop` over columns), so the HLO holds ~n_classes
  compiled segments instead of n/nb. Out-of-window rows are masked by global
  row index.
- NO batched matvecs / batched small-free-dim contractions anywhere on the
  hot path. XLA's TPU layout assignment lowers a batch-K dot_general matvec
  (and the equivalent multiply+reduce) to a form with the K axis in the
  128-lane minor dimension, which forces a 128/K-padded relayout COPY of the
  big (K, m, m) operand — measured 42.7x HBM blow-up (10.1 GiB for a 243 MiB
  trailing block) at K=3, an instant OOM. Instead every contraction is
  folded to a single canonical 2-D matmul: big operands are reshaped
  (K, m, n) -> (K*m, n) (free reshape), small operands are embedded
  block-diagonally (`_bdiag`), and per-batch results are read off block rows
  or the block diagonal. The K-fold FLOP overhead is irrelevant because
  these ops are HBM-bound on reading the big operand.
- Everything is jit-compatible with no data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["tridiagonalize", "apply_q"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _bdiag(X: jnp.ndarray) -> jnp.ndarray:
    """Block-diagonal embedding: (K, m, w) -> (K*m, K*w) with block k on the
    diagonal. Costs K x the (small) operand's memory; buys a canonical 2-D
    matmul in place of a layout-hostile batched contraction."""
    K, m, w = X.shape
    eye = jnp.eye(K, dtype=X.dtype)
    return (eye[:, None, :, None] * X[:, :, None, :]).reshape(K * m, K * w)


def _bmv(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched matvec (K, m, n) @ (K, n) -> (K, m) via one folded 2-D matmul
    (see module docstring for why dot_general/multiply+reduce are banned)."""
    K, m, n = A.shape
    P = (A.reshape(K * m, n) @ v.T).reshape(K, m, K)
    idx = jnp.arange(K)[:, None, None]
    return jnp.take_along_axis(P, idx, axis=2)[..., 0]


def _bmv_t(A: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched transposed matvec sum_i A[k,i,j] v[k,i] -> (K, n) via one
    folded 2-D matmul: block-structured v rows against (K*m, n)."""
    K, m, n = A.shape
    eye = jnp.eye(K, dtype=A.dtype)
    vb = (eye[:, :, None] * v[None, :, :]).reshape(K, K * m)
    return vb @ A.reshape(K * m, n)


@functools.partial(jax.jit, static_argnames=("nb", "n_classes", "unroll"))
def tridiagonalize(A: jnp.ndarray, nb: int = 64, n_classes: int = 8,
                   unroll: int = 1):
    """Reduce a batch of symmetric matrices to tridiagonal form.

    Parameters
    ----------
    A : (K, n, n) symmetric (only referenced symmetrically).

    Returns
    -------
    d : (K, n) diagonal of T
    e : (K, n-1) sub-diagonal of T
    V : (K, n_pad, n) Householder vectors; column j has support on rows
        j+1..n-1 with the leading nonzero normalized to 1.
    taus : (K, n) reflector scalars (tau[j] = 0 for trivial reflectors).

    Convention: T = H_last ... H_0 A H_0 ... H_last with H_j = I - tau_j v_j
    v_j^T, so A = Q T Q^T with Q = H_0 H_1 ... H_last (see `apply_q`).
    """
    K, n, _ = A.shape
    dtype = A.dtype
    if n <= 2:
        d = jnp.diagonal(A, axis1=1, axis2=2)
        e = (
            A[:, 1:, 0].reshape(K, max(n - 1, 0))
            if n == 2
            else jnp.zeros((K, max(n - 1, 0)), dtype)
        )
        V = jnp.zeros((K, n, n), dtype)
        taus = jnp.zeros((K, n), dtype)
        return d, e, V, taus

    nb = max(8, min(nb, n))
    # class granularity: a multiple of nb, ~n/n_classes
    S = max(nb, _cdiv(_cdiv(n, n_classes), nb) * nb)
    n_pad = _cdiv(n, S) * S
    Ap = jnp.zeros((K, n_pad, n_pad), dtype).at[:, :n, :n].set(A)

    d = jnp.zeros((K, n_pad), dtype)
    e = jnp.zeros((K, n_pad), dtype)
    # column dim padded to n_pad: the per-panel bulk reflector write spans a
    # full nb-wide panel, which may run past n_cols at the tail
    V = jnp.zeros((K, n_pad, n_pad), dtype)
    taus = jnp.zeros((K, n), dtype)
    eps_tiny = jnp.asarray(
        jnp.finfo(dtype).tiny * 1e4 if dtype != jnp.float64 else 1e-290, dtype
    )

    n_cols = n - 2  # columns needing reflectors: j = 0..n-3
    row_idx_full = jnp.arange(n_pad)

    q = 0
    while q < n_cols:
        m = n_pad - q  # window size (static)
        Aw = jax.lax.dynamic_slice(Ap, (0, q, q), (K, m, m))
        rows_w = row_idx_full[:m]  # window-relative row ids
        # panels fully inside this class: starts q, q+nb, ... < min(q+S, n_cols)
        n_panels = _cdiv(min(S, n_cols - q), nb)

        def class_body(t, carry, q=q, m=m, rows_w=rows_w):
            Aw, d, e, V, taus = carry
            off = t * nb  # window-relative panel offset
            # fused panel buffer: columns [0, nb) hold the reflectors v
            # (LATRD U), columns [nb, 2nb) hold the w vectors (LATRD W).
            # One buffer means ONE folded matvec per correction instead of
            # two — the loop body is bound by per-iteration overhead
            # (~0.026 ms/iteration on v5e for any body) plus the HBM read
            # of the trailing window, so fewer, fatter ops win
            UW = jnp.zeros((K, m, 2 * nb), dtype)

            def swap(x):
                return jnp.concatenate([x[:, nb:], x[:, :nb]], axis=1)

            def col_body(j, inner):
                Aw_c, UW, d, e, taus = inner
                c = off + j  # window-relative column
                jg = q + c  # global column
                # the column loop runs a STATIC nb iterations (unrollable,
                # and one less dynamic bound for XLA); tail-panel columns
                # past n_cols are masked to exact no-ops: tau = 0 and v = 0
                # make w = 0, so UW, V, and the trailing update are
                # untouched, and the d/e/taus writes they DO perform land on
                # positions that are overwritten, trimmed, or zero-on-zero
                # afterwards
                ok = (c + q) < n_cols
                # corrected column c = A[:, c] - U W^T[., c] - W U^T[., c];
                # the window is symmetric, so read ROW c (contiguous) instead
                # of a strided column slice
                col = jax.lax.dynamic_slice(
                    Aw_c, (0, c, 0), (K, 1, m)
                )[:, 0, :]
                uw_row = jax.lax.dynamic_slice(
                    UW, (0, c, 0), (K, 1, 2 * nb)
                )[:, 0, :]
                col = col - _bmv(UW, swap(uw_row))
                valid = (rows_w[None, :] + q) < n  # real (unpadded) rows
                col = jnp.where(valid, col, 0.0)
                d = jax.lax.dynamic_update_slice(
                    d, jax.lax.dynamic_slice(col, (0, c), (K, 1)), (0, jg)
                )
                # Householder on rows > c of the corrected column
                below = rows_w[None, :] > c
                x = jnp.where(below, col, 0.0)
                alpha = jax.lax.dynamic_slice(col, (0, c + 1), (K, 1))[:, 0]
                xnorm2 = jnp.sum(x * x, axis=1) - alpha * alpha
                xnorm2 = jnp.maximum(xnorm2, 0.0)
                anorm = jnp.sqrt(alpha * alpha + xnorm2)
                sign = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
                beta = -sign * anorm
                trivial = xnorm2 <= eps_tiny * anorm * anorm
                denom = jnp.where(trivial, 1.0, alpha - beta)
                beta_safe = jnp.where(trivial, 1.0, beta)
                tau = jnp.where(trivial, 0.0, (beta - alpha) / beta_safe)
                tau = jnp.where(ok, tau, 0.0)
                v = jnp.where(below, x / denom[:, None], 0.0)
                v = jnp.where(rows_w[None, :] == c + 1, 1.0, v)
                v = jnp.where(below & ok, v, 0.0)
                e_val = jnp.where(trivial, alpha, beta)
                e = jax.lax.dynamic_update_slice(e, e_val[:, None], (0, jg))
                taus = jax.lax.dynamic_update_slice(taus, tau[:, None], (0, jg))
                # w = tau (A v - U (W^T v) - W (U^T v)); then
                # w -= 0.5 tau (w^T v) v
                Av = _bmv(Aw_c, v)
                UWv = _bmv_t(UW, v)  # [U^T v | W^T v]
                Av = Av - _bmv(UW, swap(UWv))
                w = tau[:, None] * Av
                w = w - (0.5 * tau * jnp.sum(w * v, axis=1))[:, None] * v
                w = jnp.where(below, w, 0.0)
                UW = jax.lax.dynamic_update_slice(UW, v[:, :, None], (0, 0, j))
                UW = jax.lax.dynamic_update_slice(
                    UW, w[:, :, None], (0, 0, nb + j)
                )
                return Aw_c, UW, d, e, taus

            Aw, UW, d, e, taus = jax.lax.fori_loop(
                0, nb, col_body, (Aw, UW, d, e, taus), unroll=unroll
            )
            U = UW[:, :, :nb]
            W = UW[:, :, nb:]
            # all reflectors of the panel land in V with ONE bulk write
            # (a per-column dynamic_update_slice would pay the iteration
            # latency floor n more times); V's column dim is padded so the
            # write never clamps
            V = jax.lax.dynamic_update_slice(V, U, (0, q, q + off))
            # rank-2nb trailing update A <- A - U W^T - W U^T, folded to 2-D:
            # block rows of (bdiag(U) @ stacked-W^T) are exactly U_k W_k^T
            Ub = _bdiag(U)
            Wb = _bdiag(W)
            Wt = W.transpose(0, 2, 1).reshape(K * nb, m)
            Ut = U.transpose(0, 2, 1).reshape(K * nb, m)
            Aw = (Aw.reshape(K * m, m) - Ub @ Wt - Wb @ Ut).reshape(K, m, m)
            return (Aw, d, e, V, taus)

        Aw, d, e, V, taus = jax.lax.fori_loop(
            0, n_panels, class_body, (Aw, d, e, V, taus)
        )
        Ap = jax.lax.dynamic_update_slice(Ap, Aw, (0, q, q))
        q += S

    # trailing 2x2 block: d[n-2], d[n-1], e[n-2]
    d = d.at[:, n - 2].set(Ap[:, n - 2, n - 2])
    d = d.at[:, n - 1].set(Ap[:, n - 1, n - 1])
    e = e.at[:, n - 2].set(Ap[:, n - 1, n - 2])
    return d[:, :n], e[:, : n - 1], V[:, :, :n], taus


@functools.partial(jax.jit, static_argnames=("nb",))
def apply_q(V: jnp.ndarray, taus: jnp.ndarray, S: jnp.ndarray, nb: int = 64):
    """Compute Q @ S with Q = H_0 H_1 ... H_{n-3} from `tridiagonalize`.

    Uses the compact WY form per panel (T built by the forward recurrence),
    applying panels in reverse order: Q S = P_0 (P_1 (... (P_last S))).
    `S` is (K, n, c); returns (K, n, c). The big products run as folded 2-D
    matmuls (module docstring); panels are padded with tau=0 (identity)
    reflectors to a uniform width so one `fori_loop` covers them all.
    """
    K, n_pad, n = V.shape
    dtype = V.dtype
    Sc = S.shape[-1]
    out = jnp.zeros((K, n_pad, Sc), dtype).at[:, :n, :].set(S)
    n_cols = max(n - 2, 0)
    if n_cols == 0:
        return out[:, :n, :]
    n_blocks = _cdiv(n_cols, nb)
    ncp = n_blocks * nb
    Vp_all = jnp.zeros((K, n_pad, ncp), dtype).at[:, :, :n_cols].set(
        V[:, :, :n_cols]
    )
    tp_all = jnp.zeros((K, ncp), dtype).at[:, :n_cols].set(taus[:, :n_cols])

    # ---- all panels' compact-WY T factors, built ONCE batched over panels
    # (panels are independent; only the forward recurrence over the nb
    # in-panel columns is sequential, so the build is nb steps total instead
    # of n_blocks * nb)
    def g_body(b, G_all):
        p = b * nb
        Vp = jax.lax.dynamic_slice(Vp_all, (0, 0, p), (K, n_pad, nb))
        Vb = _bdiag(Vp)
        G = (Vb.T @ Vp.reshape(K * n_pad, nb)).reshape(K, nb, nb)
        return jax.lax.dynamic_update_slice(G_all, G[None], (b, 0, 0, 0))

    G_all = jax.lax.fori_loop(
        0, n_blocks, g_body, jnp.zeros((n_blocks, K, nb, nb), dtype)
    ).reshape(n_blocks * K, nb, nb)
    tp_r = (
        tp_all.reshape(K, n_blocks, nb).transpose(1, 0, 2)
        .reshape(n_blocks * K, nb)
    )

    def t_body(j, T):
        # T[j,j] = tau_j; T[:j,j] = -tau_j T[:j,:j] (Vp^T v_j)
        gcol = jax.lax.dynamic_slice(
            G_all, (0, 0, j), (n_blocks * K, nb, 1)
        )[..., 0]
        tj = jax.lax.dynamic_slice(tp_r, (0, j), (n_blocks * K, 1))[:, 0]
        mask = jnp.arange(nb)[None, :] < j
        tcol = -tj[:, None] * jnp.einsum(
            "kij,kj->ki", T, jnp.where(mask, gcol, 0.0)
        )
        tcol = jnp.where(mask, tcol, 0.0)
        tcol = jnp.where(jnp.arange(nb)[None, :] == j, tj[:, None], tcol)
        return jax.lax.dynamic_update_slice(T, tcol[:, :, None], (0, 0, j))

    T_all = jax.lax.fori_loop(
        0, nb, t_body, jnp.zeros((n_blocks * K, nb, nb), dtype)
    ).reshape(n_blocks, K, nb, nb)

    def panel_body(i, out_flat):
        b = n_blocks - 1 - i
        p = b * nb
        Vp = jax.lax.dynamic_slice(Vp_all, (0, 0, p), (K, n_pad, nb))
        Vb = _bdiag(Vp)  # (K*n_pad, K*nb)
        T = jax.lax.dynamic_slice(T_all, (b, 0, 0, 0), (1, K, nb, nb))[0]
        # P S = S - V T (V^T S), all folded 2-D
        VtS = Vb.T @ out_flat  # (K*nb, Sc), block rows = Vp_k^T S_k
        X = _bdiag(T) @ VtS  # (K*nb, Sc)
        return out_flat - Vb @ X

    out_flat = jax.lax.fori_loop(
        0, n_blocks, panel_body, out.reshape(K * n_pad, Sc)
    )
    return out_flat.reshape(K, n_pad, Sc)[:, :n, :]
