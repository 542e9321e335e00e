"""Successive band reduction, stage B: symmetric band -> tridiagonal via
pipelined Householder bulge chasing, plus the grouped compact-WY application
of the accumulated chase transform.

Combined with `laplace_jax.ops.band.band_reduce` (stage A: full -> band via
panel QR, trailing matrix touched once per b-wide panel) this replaces the
column-at-a-time `tridiag.tridiagonalize`, whose ~K n^3/3 sequential
trailing-matvec HBM reads are the measured wall of the KFAC decompose
epilogue (reference math consumed downstream:
`/root/reference/laplace/utils/matrix.py:123-150`).

Chase design (everything static-shaped, one `lax.fori_loop` over a global
time axis):

- The band lives in DIAGONAL storage ``D[k, p] = B[p + k, p]`` (lower
  triangle, k = 0..2b-1), so each task's working set is a contiguous
  (2b, 2b) slab of columns — one gather + one scatter per wavefront step
  for ALL concurrent tasks.
- Task (s, t): sweep s eliminates band column s; its chase task t cleans
  one column with a length-b Householder reflector supported on rows
  I_t = [s + t b + 1, s + (t+1) b] and applies it two-sided. The slab is
  mapped to a local dense (3b, 3b) block by a STATIC index map (positions
  within a slab are fixed relative offsets), updated with one rank-2
  symmetric correction, and mapped back.
- Wavefront schedule time(s, t) = 3 s + t: it respects both dependencies
  ((s, t-1) and (s-1, t+2) run strictly earlier) and makes concurrent
  slabs disjoint (consecutive active sweeps sit 3b - 1 columns apart), so
  one batched gather/scatter per step is race-free. Tasks outside their
  sweep's chain are parked on a dedicated padding slab with tau = 0; parked
  duplicates write back identical gathered values.
- A whole sweep's chain reflectors have DISJOINT supports (block t covers
  rows [s + t b + 1, s + (t+1) b]), so sweep s's chain packs into ONE
  column of the reflector log.

Q2 application (`apply_chase_q`) never materializes the (dense) chase
transform. Reflectors are grouped into compact-WY blocks G(J, t) = {g
consecutive sweeps, same chase position t}: members span b + g - 1 rows
and the group order (J ascending, t descending) is a valid linearization
of the reflector partial order (non-adjacent groups commute; proof in
comments). Groups on anti-diagonals {(J + k, t + k)} touch disjoint row
blocks and apply concurrently, so the whole transform is ~(G + T) batched
(g x b+g) matmul steps on the MXU instead of ~n^2/b rank-1 updates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["band_to_tridiag", "apply_chase_q"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _chain_cap(n: int, b: int) -> int:
    """Max chase tasks per sweep: task (s, t) exists while its first
    eliminated row s + t b + 2 is a real row (< n); worst case s = 0."""
    return max((n - 3) // b + 1, 1)


@functools.partial(jax.jit, static_argnames=("b",))
def band_to_tridiag(B: jnp.ndarray, b: int):
    """Reduce a batch of symmetric band matrices to tridiagonal form.

    Parameters
    ----------
    B : (K, n, n) symmetric with bandwidth b (entries |i-j| > b are ignored).
    b : the semi-bandwidth (as produced by `band.band_reduce`).

    Returns
    -------
    d : (K, n) diagonal of T.
    e : (K, n-1) sub-diagonal of T.
    Vlog : (K, n, n) chase reflectors; column s holds sweep s's WHOLE chain
        (chain blocks have disjoint supports), reflector of task (s, t) on
        rows [s + t b + 1, s + (t+1) b] with unit leading element.
    taulog : (K, TCAP, n) reflector scalars, taulog[:, t, s] for task (s, t).

    Convention: T = H_last ... H_0 B H_0 ... H_last (execution order), so
    B = Q T Q^T with Q = H_0 H_1 ... — `apply_chase_q` computes Q @ S.
    """
    K, n, _ = B.shape
    dtype = B.dtype
    if n <= 2 or b <= 1:
        d = jnp.diagonal(B, axis1=1, axis2=2)
        e = B[:, 1:, 0].reshape(K, 1) if n == 2 else jnp.zeros(
            (K, max(n - 1, 0)), dtype
        )
        if n > 2:
            i = jnp.arange(n - 1)
            e = B[:, i + 1, i]
        return d, e, jnp.zeros((K, n, n), dtype), jnp.zeros(
            (K, _chain_cap(n, max(b, 2)), n), dtype
        )

    TCAP = _chain_cap(n, b)
    n_sweeps = n - 2  # sweep s cleans column s; needs rows s+2..: s <= n-3,
    # but sweep n-3 is the last with work; keep the loop bound tight below
    W = TCAP // 3 + 2  # concurrent tasks (t spacing 3 across active sweeps)

    # ---- diagonal storage with front/back padding -------------------------
    P0 = b  # front pad: t=0 slabs start at column s - b + 1
    PPARK = 2 * b  # dedicated parking slab for masked-out tasks
    Np = P0 + n + 2 * b + PPARK
    p_park = P0 + n + 2 * b
    i_idx = jnp.arange(n)
    D = jnp.zeros((K, 2 * b, Np), dtype)

    def diag_k(k):
        v = B[:, k + i_idx[: n - k], i_idx[: n - k]] if k < n else jnp.zeros(
            (K, 0), dtype
        )
        return jnp.zeros((K, Np), dtype).at[:, P0 : P0 + n - k].set(v)

    D = jnp.stack([diag_k(min(k, n - 1)) for k in range(2 * b)], axis=1)
    # entries beyond the true band are noise from stage A's zeroing —
    # B is banded by contract, so rows k > b start zero
    D = D * (jnp.arange(2 * b)[None, :, None] <= b)

    Vlog = jnp.zeros((K, n, n_sweeps + 1), dtype)  # last col = parking
    taulog = jnp.zeros((K, TCAP, n_sweeps + 1), dtype)
    d_out = jnp.zeros((K, n_sweeps + 1), dtype)
    e_out = jnp.zeros((K, n_sweeps + 1), dtype)

    eps_tiny = jnp.asarray(
        jnp.finfo(dtype).tiny * 1e4 if dtype != jnp.float64 else 1e-290, dtype
    )

    # static index maps between the (2b, 2b) slab and the (3b, 3b) local
    # dense block: L[i, j] = slab[|i-j|, min(i, j)]
    ii = jnp.arange(3 * b)[:, None]
    jj = jnp.arange(3 * b)[None, :]
    kk = jnp.abs(ii - jj)
    pp = jnp.minimum(ii, jj)
    L_valid = (kk < 2 * b) & (pp < 2 * b)
    L_idx = jnp.where(L_valid, kk * 2 * b + pp, 0)  # into slab.reshape(-1)
    kk2 = jnp.arange(2 * b)[:, None]
    pp2 = jnp.arange(2 * b)[None, :]
    S_valid = (kk2 + pp2) < 3 * b  # slab entries owned by the local block
    S_idx = jnp.where(S_valid, (pp2 + kk2) * 3 * b + pp2, 0)  # into L flat
    rows3 = jnp.arange(3 * b)
    refl_rows = (rows3 >= b) & (rows3 < 2 * b)  # reflector support
    elim_rows = (rows3 >= b + 1) & (rows3 < 2 * b)  # eliminated entries

    T_steps = 3 * (n_sweeps - 1) + 1

    def step(tau_step, carry):
        D, Vlog, taulog, d_out, e_out = carry
        w = jnp.arange(W)
        s = tau_step // 3 - w
        t = tau_step - 3 * s
        valid = (s >= 0) & (s <= n - 3) & (t >= 0) & (s + t * b + 2 <= n - 1)
        w0g = s + (t - 1) * b + 1  # global slab start (t=0: s - b + 1)
        w0 = jnp.where(valid, P0 + w0g, p_park)
        c_off = jnp.where(t >= 1, 0, b - 1)  # local column being cleaned

        col_idx = w0[:, None] + jnp.arange(2 * b)[None, :]  # (W, 2b)
        slabs = D[:, :, col_idx]  # (K, 2b, W, 2b)
        slabs = slabs.transpose(0, 2, 1, 3).reshape(K * W, 2 * b * 2 * b)
        L = jnp.where(
            L_valid[None], jnp.take(slabs, L_idx.reshape(-1), axis=1)
            .reshape(K * W, 3 * b, 3 * b), 0.0
        )

        # ---- reflector from the cleaned column ---------------------------
        c_kw = jnp.tile(c_off, K)  # (K*W,) task layout: k-major, w-minor
        x = jnp.take_along_axis(L, c_kw[:, None, None], axis=2)[..., 0]
        alpha = x[:, b]
        xt = jnp.where(elim_rows[None, :], x, 0.0)
        xnorm2 = jnp.sum(xt * xt, axis=1)
        anorm = jnp.sqrt(alpha * alpha + xnorm2)
        sign = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
        beta = -sign * anorm
        trivial = xnorm2 <= eps_tiny * anorm * anorm
        denom = jnp.where(trivial, 1.0, alpha - beta)
        beta_safe = jnp.where(trivial, 1.0, beta)
        tau = jnp.where(trivial, 0.0, (beta - alpha) / beta_safe)
        ok = jnp.tile(valid, K)
        tau = jnp.where(ok, tau, 0.0)
        v = jnp.where(elim_rows[None, :], xt / denom[:, None], 0.0)
        v = jnp.where(rows3[None, :] == b, 1.0, v)
        v = jnp.where(refl_rows[None, :] & ok[:, None], v, 0.0)

        # ---- two-sided rank-2 update --------------------------------------
        Lv = jnp.einsum("kij,kj->ki", L, v)
        wv = tau[:, None] * Lv
        wv = wv - (0.5 * tau * jnp.sum(wv * v, axis=1))[:, None] * v
        L = L - v[:, :, None] * wv[:, None, :] - wv[:, :, None] * v[:, None, :]

        # ---- write back ----------------------------------------------------
        L_flat = L.reshape(K * W, 9 * b * b)
        s_new = jnp.take(L_flat, S_idx.reshape(-1), axis=1).reshape(
            K * W, 2 * b, 2 * b
        )
        s_new = jnp.where(S_valid[None], s_new, slabs.reshape(
            K * W, 2 * b, 2 * b))
        s_new = s_new.reshape(K, W, 2 * b, 2 * b).transpose(0, 2, 1, 3)
        D = D.at[:, :, col_idx].set(s_new)

        # ---- logs ----------------------------------------------------------
        s_col = jnp.where(valid, s, n_sweeps)  # parked -> dummy column
        rows_v = jnp.where(
            valid[:, None],
            jnp.clip(w0g[:, None] + b + jnp.arange(b)[None, :], 0, n - 1),
            n - 1,
        )  # (W, b)
        v_seg = v.reshape(K, W, 3 * b)[:, :, b : 2 * b]
        v_seg = jnp.where(valid[None, :, None], v_seg, 0.0)
        Vlog = Vlog.at[:, rows_v, s_col[:, None]].add(v_seg)
        t_row = jnp.clip(t, 0, TCAP - 1)
        taulog = taulog.at[:, t_row, s_col].set(tau.reshape(K, W))

        # t = 0 finalizes d[s] and e[s]
        is0 = valid & (t == 0)
        Lr = L.reshape(K, W, 3 * b, 3 * b)
        d_val = Lr[:, :, b - 1, b - 1]
        e_val = Lr[:, :, b, b - 1]
        s_d = jnp.where(is0, s, n_sweeps)
        d_out = d_out.at[:, s_d].set(
            jnp.where(is0[None, :], d_val, d_out[:, s_d])
        )
        e_out = e_out.at[:, s_d].set(
            jnp.where(is0[None, :], e_val, e_out[:, s_d])
        )
        return D, Vlog, taulog, d_out, e_out

    D, Vlog, taulog, d_out, e_out = jax.lax.fori_loop(
        0, T_steps, step, (D, Vlog, taulog, d_out, e_out)
    )

    # trailing 2x2 block straight from the band store
    d = jnp.zeros((K, n), dtype)
    d = d.at[:, : n - 2].set(d_out[:, : n - 2])
    d = d.at[:, n - 2].set(D[:, 0, P0 + n - 2])
    d = d.at[:, n - 1].set(D[:, 0, P0 + n - 1])
    e = jnp.zeros((K, n - 1), dtype)
    e = e.at[:, : n - 2].set(e_out[:, : n - 2])
    e = e.at[:, n - 2].set(D[:, 1, P0 + n - 2])
    return d, e, Vlog[:, :, :n_sweeps], taulog[:, :, :n_sweeps]


@functools.partial(jax.jit, static_argnames=("b", "g"))
def apply_chase_q(Vlog: jnp.ndarray, taulog: jnp.ndarray, S: jnp.ndarray,
                  b: int, g: int | None = None):
    """Compute Q @ S with Q = H_0 H_1 ... from `band_to_tridiag`.

    Grouped compact-WY: reflectors {(s, t) : s in [Jg, Jg+g)} form block
    G(J, t) spanning rows [Jg + t b + 1, Jg + g - 1 + (t+1) b]. Group order
    J ascending, t DESCENDING is a valid linearization (any two reflectors
    (s, t), (s', t') with |t - t'| >= 2 and |s - s'| < g <= b have disjoint
    supports, and the remaining cross-group pairs all point J-then-t-desc).
    Anti-diagonal group sets {(J + k, t + k)} touch disjoint rows (gap of
    one row) and apply as ONE batched matmul step. Q S applies groups in
    REVERSE of that order.
    """
    K, n, n_sweeps = Vlog.shape
    dtype = Vlog.dtype
    Sc = S.shape[-1]
    if n_sweeps == 0:
        return S
    if g is None:
        g = min(b, 64)
    g = min(g, b)  # commutation argument needs g <= b
    TCAP = taulog.shape[1]
    G_s = _cdiv(n_sweeps, g)
    Lg = b + g  # group row span (b + g - 1, padded by 1 for alignment)

    # ---- gather every group's V (banded columns) and build all T's --------
    # group (J, t): row start r0 = J g + t b + 1; member j (sweep J g + j)
    # occupies local rows [j, j + b).
    Jt = jnp.arange(G_s * TCAP)
    Jg_all = (Jt // TCAP) * g
    t_all = Jt % TCAP
    r0_all = Jg_all + t_all * b + 1  # (NG,)
    NG = G_s * TCAP

    rows_l = jnp.arange(Lg)
    # V gather: Vg[n_g, k, r, j] = Vlog[k, r0 + r, Jg + j] masked to the
    # member's support rows [j, j + b)
    row_ids = jnp.clip(r0_all[:, None] + rows_l[None, :], 0, n - 1)  # (NG,Lg)
    col_ids = jnp.clip(
        Jg_all[:, None] + jnp.arange(g)[None, :], 0, n_sweeps - 1
    )  # (NG, g)
    in_range = (
        (r0_all[:, None] + rows_l[None, :] < n)
        & (Jg_all[:, None] + jnp.arange(g)[None, :] < n_sweeps)[:, None, :]
        if False
        else None
    )
    Vg = Vlog[:, row_ids[:, :, None], col_ids[:, None, :]]  # (K, NG, Lg, g)
    supp = (
        (rows_l[None, :, None] >= jnp.arange(g)[None, None, :])
        & (rows_l[None, :, None] < jnp.arange(g)[None, None, :] + b)
    )  # (1, Lg, g)
    real_row = (r0_all[:, None] + rows_l[None, :]) < n  # (NG, Lg)
    real_col = (Jg_all[:, None] + jnp.arange(g)[None, :]) < n_sweeps
    Vg = Vg * supp[None] * real_row[None, :, :, None] * real_col[
        None, :, None, :
    ]
    taus_g = taulog[
        :, jnp.clip(t_all, 0, TCAP - 1)[:, None], col_ids
    ] * real_col[None]  # (K, NG, g)

    # forward compact-WY T per group: T[j, j] = tau_j,
    # T[:j, j] = -tau_j T[:j, :j] (V^T v_j)
    Vf = Vg.reshape(K * NG, Lg, g)
    tf = taus_g.reshape(K * NG, g)
    Gram = jnp.einsum("xrj,xrl->xjl", Vf, Vf)

    def t_body(j, T):
        gcol = jax.lax.dynamic_slice(
            Gram, (0, 0, j), (K * NG, g, 1))[..., 0]
        tj = jax.lax.dynamic_slice(tf, (0, j), (K * NG, 1))[:, 0]
        mask = jnp.arange(g)[None, :] < j
        tcol = -tj[:, None] * jnp.einsum(
            "xjl,xl->xj", T, jnp.where(mask, gcol, 0.0)
        )
        tcol = jnp.where(mask, tcol, 0.0)
        tcol = jnp.where(jnp.arange(g)[None, :] == j, tj[:, None], tcol)
        return jax.lax.dynamic_update_slice(T, tcol[:, :, None], (0, 0, j))

    T_all = jax.lax.fori_loop(
        0, g, t_body, jnp.zeros((K * NG, g, g), dtype)
    ).reshape(K, NG, g, g)
    Vg = Vg.reshape(K, NG, Lg, g)

    # ---- anti-diagonal application ----------------------------------------
    # valid order: omega = J - t ascending; Q @ S applies it DESCENDING.
    # groups on one anti-diagonal: (J0 + m, t0 + m), rows disjoint.
    out = jnp.zeros((K, n + Lg, Sc), dtype).at[:, :n, :].set(S)
    n_diag = G_s + TCAP - 1  # omega = J - t in [-(TCAP-1), G_s - 1]
    DW = min(G_s, TCAP)  # max groups on a diagonal

    def diag_body(i, out):
        omega = (G_s - 1) - i  # descending
        m = jnp.arange(DW)
        Jd = jnp.maximum(omega, 0) + m
        td = Jd - omega
        ok = (Jd < G_s) & (td < TCAP)
        idx = jnp.where(ok, Jd * TCAP + td, 0)
        r0 = jnp.where(ok, Jd * g + td * b + 1, n)  # parked rows -> pad zone
        rowsD = r0[:, None] + rows_l[None, :]  # (DW, Lg) disjoint blocks
        Ublk = out[:, rowsD, :]  # (K, DW, Lg, Sc)
        Vd = Vg[:, idx] * ok[None, :, None, None]  # (K, DW, Lg, g)
        Td = T_all[:, idx]
        Y = jnp.einsum("kdrj,kdrc->kdjc", Vd, Ublk)
        X = jnp.einsum("kdjl,kdlc->kdjc", Td, Y)
        Ublk = Ublk - jnp.einsum("kdrj,kdjc->kdrc", Vd, X)
        return out.at[:, rowsD, :].set(Ublk)

    out = jax.lax.fori_loop(0, n_diag, diag_body, out)
    return out[:, :n, :]
