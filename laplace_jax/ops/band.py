"""Successive band reduction, stage A: full symmetric -> banded (bandwidth b)
via blocked panel QR with compact-WY two-sided updates.

This replaces the column-at-a-time trailing matvec of
`laplace_jax.ops.tridiag.tridiagonalize` — whose ~n^3/3 sequential HBM reads
are the measured wall of the KFAC decompose epilogue — with panel-granular
trailing updates: the trailing matrix is read/written ONCE per b-wide panel
(traffic ~2n^3/(3b) elements), and all heavy contractions are canonical 2-D
matmuls on the MXU. Columns within a panel only touch the (m, b) panel
block, so the unavoidable sequential column loop is skinny.

Output convention matches `tridiag.tridiagonalize`'s reflector layout, so
`tridiag.apply_q` applies the accumulated Q unchanged: reflector for global
column c is stored in V[:, :, c] with unit leading element at row c + b and
support [c + b, n); A = Q B Q^T with Q = H_0 H_1 ... and B banded.

Reference math consumed downstream: `/root/reference/laplace/utils/
matrix.py:123-150` (plain eigh results); the banded intermediate has no
reference analogue (torch uses LAPACK syevd whole-hog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from laplace_jax.ops.tridiag import _bdiag, _bmv_t, _cdiv

__all__ = ["band_reduce"]


@functools.partial(jax.jit, static_argnames=("b", "n_classes"))
def band_reduce(A: jnp.ndarray, b: int = 64, n_classes: int = 8):
    """Reduce a batch of symmetric matrices to symmetric band form.

    Parameters
    ----------
    A : (K, n, n) symmetric (only referenced symmetrically).
    b : target bandwidth (also the panel width).

    Returns
    -------
    B : (K, n, n) the banded matrix (entries with |i-j| > b zeroed).
    V : (K, n, n) Householder vectors; column c has unit leading element at
        row c + b, support [c + b, n); columns past the last panel are zero.
    taus : (K, n) reflector scalars (0 = identity).
    """
    K, n, _ = A.shape
    dtype = A.dtype
    if n <= b + 1:
        # already banded; no reflectors
        return A, jnp.zeros((K, n, n), dtype), jnp.zeros((K, n), dtype)

    # columns needing elimination: panels cover [0, n_cols), n_cols = n-b-1
    # (column c needs zeros below row c+b; the last b+1 columns have none)
    n_cols = n - b - 1
    S = max(b, _cdiv(_cdiv(n, n_classes), b) * b)  # class granularity
    n_pad = _cdiv(n, S) * S
    Ap = jnp.zeros((K, n_pad, n_pad), dtype).at[:, :n, :n].set(A)
    V = jnp.zeros((K, n_pad, n_pad), dtype)
    taus = jnp.zeros((K, n_pad), dtype)
    eps_tiny = jnp.asarray(
        jnp.finfo(dtype).tiny * 1e4 if dtype != jnp.float64 else 1e-290, dtype
    )
    row_idx_full = jnp.arange(n_pad)

    q = 0
    while q < n_cols:
        m = n_pad - q  # static window size; window = rows/cols [q, n_pad)
        Aw = jax.lax.dynamic_slice(Ap, (0, q, q), (K, m, m))
        rows_w = row_idx_full[:m]
        n_panels = _cdiv(min(S, n_cols - q), b)

        def class_body(t, carry, q=q, m=m, rows_w=rows_w):
            Aw, V, taus = carry
            off = t * b  # window-relative panel start column

            # ---- panel QR: Householders of the block below the band ------
            # C holds the panel's column block rows [0, m) (upper rows are
            # masked out of every reflector); updates stay inside C
            C = jax.lax.dynamic_slice(Aw, (0, 0, off), (K, m, b))
            Vp = jnp.zeros((K, m, b), dtype)
            tp = jnp.zeros((K, b), dtype)

            def col_body(j, inner):
                C, Vp, tp = inner
                c = off + j  # window-relative column
                piv = c + b  # window-relative pivot row
                ok = (q + c) < n_cols
                col = jax.lax.dynamic_slice(C, (0, 0, j), (K, m, 1))[..., 0]
                below = rows_w[None, :] > piv
                valid = (rows_w[None, :] + q) < n
                x = jnp.where(below & valid, col, 0.0)
                alpha = jnp.sum(
                    jnp.where(rows_w[None, :] == piv, col, 0.0), axis=1
                )
                xnorm2 = jnp.sum(x * x, axis=1)
                anorm = jnp.sqrt(alpha * alpha + xnorm2)
                sign = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
                beta = -sign * anorm
                trivial = xnorm2 <= eps_tiny * anorm * anorm
                denom = jnp.where(trivial, 1.0, alpha - beta)
                beta_safe = jnp.where(trivial, 1.0, beta)
                tau = jnp.where(trivial, 0.0, (beta - alpha) / beta_safe)
                tau = jnp.where(ok, tau, 0.0)
                v = jnp.where(below & valid, x / denom[:, None], 0.0)
                v = jnp.where(rows_w[None, :] == piv, 1.0, v)
                v = jnp.where((rows_w[None, :] >= piv) & ok, v, 0.0)
                # apply (I - tau v v^T) to the whole panel block (columns
                # <= j change too: they hold R entries above the pivot rows
                # of LATER columns... no: v is zero on rows <= piv, and
                # columns < j have zeros below their own pivot < piv, so the
                # update leaves them untouched up to fp noise on exact
                # zeros; applying to all columns keeps ONE fat matmul)
                w = _bmv_t(C, v)  # (K, b) = v^T C
                C = C - (tau[:, None] * v)[:, :, None] * w[:, None, :]
                Vp = jax.lax.dynamic_update_slice(
                    Vp, v[:, :, None], (0, 0, j)
                )
                tp = jax.lax.dynamic_update_slice(tp, tau[:, None], (0, j))
                return C, Vp, tp

            C, Vp, tp = jax.lax.fori_loop(0, b, col_body, (C, Vp, tp))

            # ---- compact WY T: T[j,j]=tau_j, T[:j,j] = -tau_j T (V^T v_j)
            Vb = _bdiag(Vp)  # (K*m, K*b)
            G = (Vb.T @ Vp.reshape(K * m, b)).reshape(K, b, b)

            def t_body(j, T):
                gcol = jax.lax.dynamic_slice(G, (0, 0, j), (K, b, 1))[..., 0]
                tj = jax.lax.dynamic_slice(tp, (0, j), (K, 1))[:, 0]
                mask = jnp.arange(b)[None, :] < j
                tcol = -tj[:, None] * jnp.einsum(
                    "kij,kj->ki", T, jnp.where(mask, gcol, 0.0)
                )
                tcol = jnp.where(mask, tcol, 0.0)
                tcol = jnp.where(
                    jnp.arange(b)[None, :] == j, tj[:, None], tcol
                )
                return jax.lax.dynamic_update_slice(
                    T, tcol[:, :, None], (0, 0, j)
                )

            T = jax.lax.fori_loop(0, b, t_body, jnp.zeros((K, b, b), dtype))

            # ---- two-sided compact-WY update of the window ----------------
            # A <- A - W V^T - V W^T with P = A V, S = V^T P, M = T^T S T,
            # W = P T - 0.5 V M. V is zero on rows < off+b, so rows above
            # the panel's pivot block take exactly the right-application
            # A (I - V T V^T) (their V-term vanishes) and earlier banded
            # rows are untouched (their A V is zero).
            Aw_flat = Aw.reshape(K * m, m)
            P = (Aw_flat @ jnp.swapaxes(Vp, 0, 1).reshape(m, K * b)).reshape(
                K, m, K, b
            )
            P = jnp.take_along_axis(
                P, jnp.arange(K)[:, None, None, None], axis=2
            )[:, :, 0, :]  # (K, m, b) block-diagonal selection
            # Vb.T row block k pairs only with P's block k: (K*b, b) where
            # row (k, j) = Vp[k,:,j]^T P[k] — already the per-batch V^T P
            Sm = (Vb.T @ P.reshape(K * m, b)).reshape(K, b, b)
            M = jnp.einsum("kji,kjl,klo->kio", T, Sm, T)  # T^T S T
            Y = jnp.einsum("kmj,kjo->kmo", P, T)  # P T (small free dims)
            W = Y - 0.5 * jnp.einsum("kmj,kjo->kmo", Vp, M)
            Wb = _bdiag(W)
            Vt = jnp.swapaxes(Vp, 1, 2).reshape(K * b, m)
            Wt = jnp.swapaxes(W, 1, 2).reshape(K * b, m)
            Aw = (Aw_flat - Vb @ Wt - Wb @ Vt).reshape(K, m, m)

            V = jax.lax.dynamic_update_slice(V, Vp, (0, q, q + off))
            taus = jax.lax.dynamic_update_slice(taus, tp, (0, q + off))
            return Aw, V, taus

        Aw, V, taus = jax.lax.fori_loop(
            0, n_panels, class_body, (Aw, V, taus)
        )
        Ap = jax.lax.dynamic_update_slice(Ap, Aw, (0, q, q))
        q += S

    B = Ap[:, :n, :n]
    # clean the numerically-zeroed outside-band entries and resymmetrize
    i = jnp.arange(n)
    band = jnp.abs(i[:, None] - i[None, :]) <= b
    B = jnp.where(band[None], (B + jnp.swapaxes(B, 1, 2)) * 0.5, 0.0)
    return B, V[:, :n, :n], taus[:, :n]
