"""Level-batched spectral divide-and-conquer eigendecomposition for factor stacks.

Why this exists: XLA's TPU eigendecomposition (QDWH spectral divide-and-conquer,
`jax/_src/tpu/linalg/eigh.py`) processes its recursion agenda strictly
sequentially — one subproblem at a time inside a `while_loop` — and a *batched*
`jnp.linalg.eigh` on TPU lowers to `lax.map`, i.e. a stack of k factors runs k
independent serial agendas back to back. For a KFAC decompose epilogue (tens of
factors, sizes 512-4608; reference math `laplace/utils/matrix.py:123-150`) this
leaves the MXU idle: measured ~10s for three 4608^2 factors on a v5e.

This module drives the same spectral D&C [1] from the host, but batches each
recursion *level* into a few vmapped device calls, pooling subproblems across
the WHOLE set of factors (all shapes). Two measured facts about this TPU
toolchain shape the design (see DESIGN.md):

- batched matmul and batched Cholesky scale near-perfectly (3x4608^3 matmul in
  14ms, 3x cholesky in 35ms), while batched QR is ~40x SLOWER than serial QR
  (2.9s vs 72ms at (3, 9216, 4608)).
- therefore every step is built from matmul + cholesky + triangular-solve
  only: the spectral projector comes from a capped dynamically-weighted
  Halley matrix-sign iteration (QDWH in its Cholesky form, never its
  QR form), and subspace extraction uses randomized shifted-CholeskyQR
  passes instead of a QR-complete factorization.

Per-subproblem eigenvector bases stay LOCAL: each level writes its (b, b)
orthogonal transforms into a block-diagonal (n, n) matrix L_level, and the
global basis is the running product V <- V @ L_level (one batched matmul per
class per level). Host<->device traffic is one small flag readback and one
rank readback per level (about log2(n/termination) levels).

[1] Nakatsukasa & Higham, "Stable and efficient spectral divide and conquer
    algorithms for the symmetric eigenvalue decomposition and the SVD",
    SIAM J. Sci. Comput. 35(3), 2013.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_DEBUG = bool(os.environ.get("EIGH_DC_DEBUG"))
# "2" additionally forces a full device sync at every level boundary to
# attribute wall time per level (the async level timestamps don't)
_DEBUG_SYNC = os.environ.get("EIGH_DC_DEBUG") == "2"

__all__ = ["eigh_stack_dc", "eigh_pooled_dc"]


def _round_up(x: int, granularity: int) -> int:
    return ((x + granularity - 1) // granularity) * granularity


def _pow2_ceil(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def _masked(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Zero out rows/cols >= b of a padded square block."""
    n = H.shape[-1]
    i = jnp.arange(n)
    m = (i[:, None] < b) & (i[None, :] < b)
    return jnp.where(m, H, 0)


def _masked_eye(B: int, b: jnp.ndarray, dtype) -> jnp.ndarray:
    i = jnp.arange(B)
    return jnp.where((i[:, None] == i[None, :]) & (i[:, None] < b), 1.0, 0.0).astype(dtype)


# ---------------------------------------------------------------------------
# matrix sign via capped dynamically-weighted Halley (QDWH, Cholesky form)
# ---------------------------------------------------------------------------

# Weight cap: the Cholesky-form update factors Z = I + c X^2, which is only
# numerically safe for moderate c (jax's own qdwh switches QR->Cholesky at
# c <= 100; we never use QR because batched QR is ~40x slower than serial on
# this toolchain — see module docstring). c(a) = a + (a-1)^2/4 - 1 <= 100
# gives a <= 1 + (sqrt(1616) - 4)/2.
_A_CAP = 1.0 + (np.sqrt(1616.0) - 4.0) / 2.0  # ~19.0997
_SIGN_MAXIT = 40


def _halley_weights(l):
    """Dynamically-weighted Halley coefficients (Nakatsukasa & Higham eq. 3.6)
    for current spectral lower bound `l`, with `a` capped for Cholesky safety.
    For small `l` the capped iteration still grows the bound ~19x per step."""
    l = jnp.clip(l, 1e-30, 1.0)
    l2 = l * l
    d = jnp.cbrt(4.0 * (1.0 - l2) / (l2 * l2))
    f = 8.0 * (2.0 - l2) / (l2 * jnp.sqrt(1.0 + d))
    a = jnp.sqrt(1.0 + d) + 0.5 * jnp.sqrt(
        jnp.maximum(8.0 - 4.0 * d + f, 0.0)
    )
    a = jnp.minimum(a, l.dtype.type(_A_CAP))
    b = (a - 1.0) ** 2 / 4.0
    c = a + b - 1.0
    return a, b, c


def _sign_halley(X, eye_b, full_eye, l0, v):
    """sign(X) for symmetric X, spectrum in [-1, 1], min |eigenvalue| ~ l0.

    QDWH-style weighted Halley driven by the l-recurrence, built from
    matmul + Cholesky + triangular-solve only (all batch perfectly on TPU):

        X <- (b/c) X + (a - b/c) * X (I + c X^2)^{-1}

    Termination measures the SPECTRAL deviation of X^2 from I with a 2-step
    power iteration on (X^2 - I) against the fixed random probe `v` (three
    matvecs; the X^2 comes free from the Z build). An entrywise residual is
    blind to delocalized stragglers: an eigendirection stuck at |x| ~ 0.95
    (e.g. when the Ritz gap fed into l0 doesn't exist in the true spectrum)
    spreads its deviation over n^2 entries and shows up as ~1e-4 while
    polluting the split subspace at 1e-1. The tolerance is ~sqrt(eps), not
    eps: the divide step only needs every eigendirection CLASSIFIED to the
    correct half-space — eigenvalues come from the congruence transform, and
    residual coupling from a deviation theta enters the children only at
    O(theta^2). An over-optimistic l0 therefore degrades to extra
    (well-conditioned, late-stage) iterations, never to a wrong result;
    `_SIGN_MAXIT` bounds the worst case. 4-9 iterations typical vs ~22 for
    a fixed polynomial schedule — the dynamic weights are why this beats
    matmul-only Newton-Schulz variants ~4x in FLOPs.
    """
    dt = X.dtype
    eps = jnp.finfo(dt).eps
    tol = 3.0 * float(np.sqrt(float(eps)))

    def cond(state):
        _, _, k, est_prev, est = state
        ramping = est > 0.1
        improving = est < 0.5 * est_prev
        return (k < _SIGN_MAXIT) & (est > tol) & (ramping | improving)

    def body(state):
        X, l, k, _, est = state
        X2 = X @ X
        # X (hence X^2) is masked to the valid b x b block and v is zero
        # outside it, so (X^2 - I) v needs no extra masking.
        w1 = X2 @ v - v
        w2 = X2 @ w1 - w1
        n1 = jnp.linalg.norm(w1)
        est_new = jnp.linalg.norm(w2) / jnp.maximum(n1, jnp.finfo(dt).tiny)
        # first application loses a sqrt(n) overlap factor; don't let that
        # report convergence while w1 itself is still large
        est_new = jnp.maximum(
            est_new, n1 / jnp.maximum(jnp.linalg.norm(v), jnp.finfo(dt).tiny)
        )
        a, b, c = _halley_weights(l)
        Z = full_eye + c * X2
        W = jnp.linalg.cholesky(Z)
        Y = jax.lax.linalg.triangular_solve(W, X, left_side=True, lower=True)
        Y = jax.lax.linalg.triangular_solve(
            W, Y, left_side=True, lower=True, transpose_a=True
        )
        Xn = (b / c) * X + (a - b / c) * Y
        ln = jnp.clip(l * (a + b * l * l) / (1.0 + c * l * l), 0.0, 1.0)
        return Xn, ln, k + 1, est, est_new

    big = jnp.asarray(jnp.finfo(dt).max, dt)
    init = (X, jnp.asarray(l0, dt), jnp.int32(0), big, big)
    X, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    # One unweighted Halley polish: the loop exits at the probe's noise
    # floor (~sqrt(eps)); cubic convergence takes a 1e-3 deviation to 1e-9
    # in one well-conditioned (c=3) step, restoring eps-level sign quality.
    X2 = X @ X
    Z = full_eye + 3.0 * X2
    W = jnp.linalg.cholesky(Z)
    Y = jax.lax.linalg.triangular_solve(W, X, left_side=True, lower=True)
    Y = jax.lax.linalg.triangular_solve(
        W, Y, left_side=True, lower=True, transpose_a=True
    )
    return (1.0 / 3.0) * X + (8.0 / 3.0) * Y


# ---------------------------------------------------------------------------
# randomized shifted-CholeskyQR subspace extraction (chol/trsm/matmul only)
# ---------------------------------------------------------------------------


def _cholqr_pass(Y: jnp.ndarray, r: jnp.ndarray, shift_rel: float,
                 fallback: bool = False) -> jnp.ndarray:
    """One (optionally shifted) CholeskyQR pass on the first `r` columns of Y;
    columns >= r are zero on input and output. The identity padding of the
    Gram keeps the Cholesky PD on the masked part.

    With `fallback=True` a second, heavily-shifted factorization is computed
    alongside and selected per lane when the primary one fails: a random
    sketch of a k-dim subspace by exactly k columns is a SQUARE Gaussian
    within it, so kappa ~ O(n) tails occasionally push the Gram's smallest
    eigenvalue to rounding level and Cholesky to NaN (observed to depend on
    XLA fusion rounding). The fallback's kappa(V) <= ~8 guarantees the next
    plain pass restores orthonormality."""
    B = Y.shape[-1]
    i = jnp.arange(B)
    valid = (i[:, None] < r) & (i[None, :] < r)
    eye_r = jnp.where(
        (i[:, None] == i[None, :]) & (i[:, None] < r), 1.0, 0.0
    ).astype(Y.dtype)
    G = Y.T @ Y
    tr = jnp.trace(G) / jnp.maximum(r, 1).astype(G.dtype)
    if shift_rel:
        G = G + (shift_rel * tr) * eye_r
    G = jnp.where(valid, G, jnp.eye(B, dtype=G.dtype))
    L = jnp.linalg.cholesky(G)
    if fallback:
        L_fb = jnp.linalg.cholesky(G + (0.02 * tr) * eye_r)
        L = jnp.where(jnp.isnan(L).any(), L_fb, L)
    V = jax.lax.linalg.triangular_solve(L, Y, left_side=False, lower=True,
                                        transpose_a=True)
    return jnp.where(i[None, :] < r, V, 0)


def _orth_cols(Y: jnp.ndarray, r: jnp.ndarray, shift_rel: float) -> jnp.ndarray:
    """Orthonormalize the first `r` columns of Y: one shifted pass bounds the
    condition number, two plain passes reach eps-orthonormality
    (shifted CholeskyQR3, Fukaya et al. 2020). The first two passes carry the
    NaN-fallback (see `_cholqr_pass`)."""
    V = _cholqr_pass(Y, r, shift_rel, fallback=True)
    V = _cholqr_pass(V, r, 0.0, fallback=True)
    return _cholqr_pass(V, r, 0.0)


# ---------------------------------------------------------------------------
# jitted level kernels
# ---------------------------------------------------------------------------


_RITZ_DIM = 128  # random-compression size for the split-point estimate


@jax.jit
def _classify(subH: jnp.ndarray, sizes: jnp.ndarray, H0norms: jnp.ndarray,
              G_ritz: jnp.ndarray, q_target: jnp.ndarray):
    """Early-exit flags and split points.

    Early exits mirror the nearly-diagonal / tiny-norm termination of XLA's
    `recursive_case` (Nakatsukasa & Higham 5.2): blocks whose off-diagonal is
    numerical noise are finalized with their diagonal as eigenvalues.

    The split point is the Ritz value of a random s-dimensional compression
    (generalized pencil (G'HG, G'G), so masking needs no
    re-orthonormalization) at an ADAPTIVE quantile `q`. Ritz quantiles of a
    random compression are biased upward on heavy-tailed spectra (Rayleigh
    quotients mix in trace-dominating eigenvalues; measured: the Ritz
    median lands at the 75th true percentile on exp-decay Gram factors),
    and no fixed algebraic correction exists (harmonic/inverse pencils of
    the same subspace carry the same information; high-degree Krylov
    compressions break down in f32). Instead the DRIVER feeds back the
    exact split fractions it already reads (rank = trace of the spectral
    projector) and retargets q multiplicatively toward true-median splits
    — self-correcting within a decompose call, bounded by clipping.
    Balanced splits minimize total recursion FLOPs (1.33x the first level
    at 50/50 vs 1.8x at 25/75); XLA's own median-of-diagonal peels only a
    few eigenvalues per level on such spectra (LINEAR depth, measured
    ~150/split). Also returns the straddling Ritz spacing (sign-iteration
    bound seed) and a Ritz-extreme spectral-radius estimate that replaces
    the up-to-sqrt(n) loose 1-norm bound in the split normalization."""

    def one(H, b, H0n, q):
        H = _masked(H, b)
        eps = jnp.finfo(H.dtype).eps
        norm = jnp.linalg.norm(H)
        d = jnp.diagonal(H)
        off = jnp.linalg.norm(H - jnp.diag(d))
        done = (off <= 5 * eps * norm) | (norm < eps * H0n)

        Gm = jnp.where(jnp.arange(H.shape[0])[:, None] < b, G_ritz, 0)
        HG = H @ Gm
        A_s = Gm.T @ HG
        B_s = Gm.T @ Gm
        s = A_s.shape[0]

        def pencil_eigs(A_p, B_p, pd_floor):
            # rank(B) = min(b, s): real lanes always have b > termination
            # > s, but PADDING lanes (b = 1) would hand Cholesky a rank-1
            # pencil; a full-strength shift keeps it PD (outputs unused)
            tr = jnp.trace(B_p) / s
            shift = jnp.where(b >= s, pd_floor * tr, tr + 1.0)
            Bs = B_p + shift * jnp.eye(s, dtype=H.dtype)
            L = jnp.linalg.cholesky(Bs)
            C = jax.lax.linalg.triangular_solve(
                L, A_p, left_side=True, lower=True
            )
            C = jax.lax.linalg.triangular_solve(
                L, C.T, left_side=True, lower=True
            )
            return jnp.linalg.eigvalsh(C)  # ascending

        ritz = pencil_eigs(A_s, B_s, 10 * eps)
        idx = jnp.clip((q * s).astype(jnp.int32), 1, s - 1)
        r_lo = jax.lax.dynamic_index_in_dim(ritz, idx - 1, keepdims=False)
        r_hi = jax.lax.dynamic_index_in_dim(ritz, idx, keepdims=False)
        sigma = 0.5 * (r_lo + r_hi)
        gap_half = 0.5 * (r_hi - r_lo)
        alpha_est = 1.25 * jnp.maximum(ritz[-1] - sigma, sigma - ritz[0])
        return done, sigma, gap_half, alpha_est

    with jax.default_matmul_precision("float32"):
        q_b = jnp.broadcast_to(jnp.asarray(q_target, subH.dtype),
                               (subH.shape[0],))
        return jax.vmap(one)(subH, sizes, H0norms, q_b)


@functools.partial(jax.jit, static_argnames=("shift_rel",))
def _split_v2(subH: jnp.ndarray, sizes: jnp.ndarray, split_points: jnp.ndarray,
              gap_halves: jnp.ndarray, alpha_ests: jnp.ndarray,
              G_seed: jnp.ndarray, shift_rel: float):
    """One vmapped divide step on a (m, B, B) stack of padded blocks.

    Matmul/cholesky-only spectral split: weighted-Halley sign of the shifted
    block -> spectral projector -> one combined randomized CholeskyQR basis
    covering both eigenspaces -> congruence transform.

    Returns children `H_minus`/`H_plus` (m, B, B), the local orthogonal
    transform `W = [V_minus | V_plus]` (m, B, B), and the minus-ranks.
    """
    B = subH.shape[-1]
    full_eye = jnp.eye(B, dtype=subH.dtype)

    def one(H, b, sigma, gap_half, alpha_est):
        H = _masked(H, b)
        eps = jnp.finfo(H.dtype).eps
        eye_b = _masked_eye(B, b, H.dtype)
        X = H - sigma.astype(H.dtype) * eye_b
        # (matmul precision forced to true f32 by the caller's context: TPU's
        # default reduced-precision matmuls would cap the sign accuracy at
        # bf16 level, exactly as jax's own eigh forces 'float32')
        # symmetric: ||X||_2 <= ||X||_1 = ||X||_inf; prefer the classifier's
        # Ritz-extreme estimate when finite — the 1-norm overestimates by up
        # to sqrt(n), which shrinks l0 and costs extra Halley ramp steps
        alpha1 = jnp.max(jnp.sum(jnp.abs(X), axis=0))
        ok = jnp.isfinite(alpha_est) & (alpha_est > 0)
        alpha = jnp.where(ok, jnp.minimum(alpha1, alpha_est), alpha1)
        X = jnp.where(alpha > 0, X / alpha, X)
        # spectral lower bound from the Ritz gap, halved for safety (true
        # eigenvalues can sit inside a Ritz gap); the sign iteration's
        # stall-based termination makes an overestimate non-fatal
        l0 = jnp.clip(
            0.5 * gap_half / jnp.maximum(alpha, jnp.finfo(H.dtype).tiny),
            16 * eps, 0.9,
        )
        i0 = jnp.arange(B)
        v_probe = jnp.where(i0 < b, G_seed[:, 0], 0)
        S = _sign_halley(X, eye_b, full_eye, l0, v_probe)
        P_minus = 0.5 * (eye_b - S)  # projector onto eigenvalues < sigma
        rank_minus = jnp.round(jnp.trace(P_minus)).astype(jnp.int32)

        # Combined-basis extraction: one square sketch Y whose first
        # `rank_minus` columns sample range(P) and the rest range(I-P),
        # orthonormalized TOGETHER by shifted CholeskyQR3. The two column
        # blocks are orthogonal subspaces in exact arithmetic, so one chain
        # of full-width passes yields the complete ordered [V_minus|V_plus]
        # transform with eps-level mutual orthogonality built in — no
        # per-block CholQR chains, no deflation corrections. This halves
        # the extraction cost relative to the two-basis scheme (measured:
        # the separate V1/V2 path spent ~1s per 4608-level vs ~0.44s here).
        i = jnp.arange(B)
        M = P_minus @ G_seed
        Y = jnp.where(i[None, :] < rank_minus, M, G_seed - M)
        Y = jnp.where((i[:, None] < b) & (i[None, :] < b), Y, 0)
        W = _orth_cols(Y, b.astype(jnp.int32), shift_rel)
        # One Newton-Schulz polar polish: exactly-r columns sketching an
        # r-dim subspace form a SQUARE Gaussian within it, whose kappa ~ O(n)
        # tail leaves the CholQR chain at ~1e-4 orthogonality in f32. The NS
        # step contracts that quadratically (e -> 1.5 e^2), and since W^T W's
        # deviation is block-local up to the sign residual, the column-space
        # split is preserved.
        eye_w = _masked_eye(B, b, H.dtype)
        W = W @ (1.5 * eye_w - 0.5 * (W.T @ W))

        # Congruence in one shot: T = W^T H W is block-diagonal up to the
        # O(theta^2) sign-residual coupling that the split drops anyway.
        T = W.T @ (H @ W)
        Hm = jnp.where(
            (i[:, None] < rank_minus) & (i[None, :] < rank_minus), T, 0
        )
        Tp = jnp.pad(T, ((0, B), (0, B)))
        r0 = rank_minus.astype(jnp.int32)
        Hp = jax.lax.dynamic_slice(Tp, (r0, r0), (B, B))
        bp = b.astype(jnp.int32) - r0
        Hp = jnp.where((i[:, None] < bp) & (i[None, :] < bp), Hp, 0)
        return Hm, Hp, W, rank_minus

    with jax.default_matmul_precision("float32"):
        return jax.vmap(one)(subH, sizes, split_points, gap_halves, alpha_ests)


@jax.jit
def _base_eigh(subH: jnp.ndarray, sizes: jnp.ndarray):
    """Batched dense eigendecomposition of terminal blocks.

    Padding trick: masked-out rows/cols are replaced by `BIG * I` with `BIG`
    above the block's spectral radius (Frobenius bound — a max-entry bound is
    NOT sufficient), so padding eigenvalues sort strictly last under the
    ascending-order contract and the valid b columns come out first."""

    def one(H, b):
        B = H.shape[0]
        H = _masked(H, b)
        big = 2.0 * jnp.linalg.norm(H) + 1.0
        i = jnp.arange(B)
        pad_eye = jnp.where((i[:, None] == i[None, :]) & (i[:, None] >= b),
                            big.astype(H.dtype), 0)
        vals, vecs = jnp.linalg.eigh(H + pad_eye, symmetrize_input=False)
        valid = i < b
        return jnp.where(valid, vals, 0), jnp.where(valid[None, :], vecs, 0)

    return jax.vmap(one)(subH, sizes)


@jax.jit
def _diag_vals(subH: jnp.ndarray, sizes: jnp.ndarray):
    """Nearly-diagonal / noise-level blocks: diagonal as eigenvalues, basis
    unchanged (XLA's `nearly_diagonal_case`)."""

    def one(H, b):
        valid = jnp.arange(H.shape[0]) < b
        return jnp.where(valid, jnp.diagonal(H), 0)

    return jax.vmap(one)(subH, sizes)


@jax.jit
def _scatter_blocks(L: jnp.ndarray, W: jnp.ndarray, mats: jnp.ndarray,
                    offs: jnp.ndarray, sizes: jnp.ndarray) -> jnp.ndarray:
    """Write (m, B, B) local blocks into the (k, n, n) block-diagonal L at
    (mat, off, off); entries outside each block's (b, b) range are dropped."""
    m, B, _ = W.shape
    n = L.shape[1]
    i = jnp.arange(B)
    row = offs[:, None, None] + i[None, :, None]
    col = offs[:, None, None] + i[None, None, :]
    valid = (i[None, :, None] < sizes[:, None, None]) & (
        i[None, None, :] < sizes[:, None, None]
    )
    row = jnp.where(valid, row, n)  # out of bounds -> dropped
    col = jnp.where(valid, col, n)
    mat_idx = jnp.broadcast_to(mats[:, None, None], W.shape)
    return L.at[mat_idx, row, col].set(W, mode="drop")


@jax.jit
def _scatter_vals(buf: jnp.ndarray, vals: jnp.ndarray, col_base: jnp.ndarray,
                  sizes: jnp.ndarray) -> jnp.ndarray:
    """Scatter (m, B) eigenvalue rows into the flat (kn+1,) buffer; padded
    entries land in the trailing scratch slot."""
    m, B = vals.shape
    kn = buf.shape[0] - 1
    j = jnp.arange(B)[None, :]
    idx = jnp.where(j < sizes[:, None], col_base[:, None] + j, kn)
    return buf.at[idx.reshape(-1)].set(vals.reshape(-1), mode="drop")


# ---------------------------------------------------------------------------
# host-side driver
# ---------------------------------------------------------------------------

_TERMINATION = 256
_BUCKET = 128  # TPU lane width; tighter padding than 256 for odd sizes
# Cold-start value for the adaptive split quantile (see _classify): the
# empirical upward bias of random-compression Ritz quantiles on decaying PSD
# Gram spectra. Per-call state only — a process-global would make results
# call-order dependent and racy.
_Q_INIT = 0.35
# condition bound for the first (shifted) CholeskyQR pass; see _orth_cols
_SHIFT_REL = {"float32": 1e-3, "float64": 1e-9}


class _Record:
    """Host-side subproblem descriptor."""

    __slots__ = ("cls", "mat", "off", "size", "src", "idx")

    def __init__(self, cls, mat, off, size, src=None, idx=None):
        self.cls = cls    # class index (shape group)
        self.mat = mat    # matrix index within the class
        self.off = off    # diagonal offset within the matrix
        self.size = size  # true block size
        self.src = src    # ("m"|"p", device array) holding the block, or None
        self.idx = idx    # row in the source stack


def _padded_take(arr, rows):
    """Gather rows with the index list padded to a power of two: keeps the
    compiled-program shape space tiny (every distinct shape is a slow remote
    compile on this toolchain). Padding rows duplicate row 0; callers mask
    them out via zero sizes."""
    mp = _pow2_ceil(max(len(rows), 1))
    idx = list(rows) + [rows[0]] * (mp - len(rows))
    return jnp.take(arr, jnp.asarray(idx, dtype=jnp.int32), axis=0)


def _padded_meta(mats, offs, sizes, col_bases):
    """Pad scatter metadata to the same power-of-two row count; padding rows
    get size 0, which routes every one of their indices out of bounds."""
    m = len(mats)
    mp = _pow2_ceil(max(m, 1))
    pad = mp - m
    z = [0] * pad
    return (
        jnp.asarray(list(mats) + z, jnp.int32),
        jnp.asarray(list(offs) + z, jnp.int32),
        jnp.asarray(list(sizes) + z, jnp.int32),
        jnp.asarray(list(col_bases) + z, jnp.int32),
    )


def _gather_blocks(records, width, stacks):
    """Stack each record's (width, width) top-left block slice; sources
    smaller than the bucket width (rounded-up level-0 matrices) are padded."""
    src = records[0].src
    if all(r.src == src for r in records):
        arr = stacks[src]
        if [r.idx for r in records] == list(range(arr.shape[0])):
            # whole-stack fast path (level 0): no gather copy
            if arr.shape[-1] == width:
                return arr
            if arr.shape[-1] < width:
                d = width - arr.shape[-1]
                return jnp.pad(arr, ((0, 0), (0, d), (0, d)))
        out = jnp.take(arr, jnp.asarray([r.idx for r in records]), axis=0)
        out = out[:, :width, :width]
        if out.shape[-1] < width:
            d = width - out.shape[-1]
            out = jnp.pad(out, ((0, 0), (0, d), (0, d)))
        return out
    out = []
    for rec in records:
        arr = stacks[rec.src][rec.idx][:width, :width]
        if arr.shape[0] < width:
            d = width - arr.shape[0]
            arr = jnp.pad(arr, ((0, d), (0, d)))
        out.append(arr)
    return jnp.stack(out)


def eigh_pooled_dc(stacks, termination_size: int = _TERMINATION,
                   q_init: float = _Q_INIT):
    """Eigendecompose a collection of symmetric-matrix stacks together.

    `stacks` is a list of (k_c, n_c, n_c) arrays (one per distinct factor
    shape). All same-level D&C subproblems across every stack are pooled into
    shared vmapped dispatches. Returns a list of `(eigenvalues, eigenvectors)`
    per input stack, ascending per matrix, matching `jnp.linalg.eigh`.
    """
    stacks = [jnp.asarray(s) for s in stacks]
    for s in stacks:
        if s.ndim != 3 or s.shape[1] != s.shape[2]:
            raise ValueError(f"expected (k, n, n) stacks, got {s.shape}")
    if not stacks:
        return []
    dtype = stacks[0].dtype
    if any(s.dtype != dtype for s in stacks):
        raise ValueError("all stacks must share one dtype; pool per dtype")
    shift_rel = _SHIFT_REL.get(jnp.dtype(dtype).name, 1e-3)

    sym = [(s + jnp.swapaxes(s, 1, 2)) / 2 for s in stacks]
    H0norms = [np.asarray(jnp.linalg.norm(s, axis=(1, 2))) for s in sym]

    # per-class output state
    vals_bufs = [jnp.zeros((s.shape[0] * s.shape[1] + 1,), dtype) for s in sym]
    V_accs: list = [None] * len(sym)

    # level-0 agenda: whole matrices; blocks live in the class stacks
    blockstore: dict = {}
    records: list[_Record] = []
    for ci, s in enumerate(sym):
        blockstore[("init", ci)] = s
        for mi in range(s.shape[0]):
            records.append(_Record(ci, mi, 0, s.shape[1], ("init", ci), mi))

    G_cache: dict = {}

    # The classify pencil compresses to _RITZ_DIM dimensions; active blocks
    # smaller than that would make it rank-deficient and its split estimates
    # garbage (degrading every such block to the serial per-block fallback),
    # so the base-case threshold can never sit below it.
    termination_size = max(int(termination_size), _RITZ_DIM)

    level = 0
    # Adaptive Ritz split quantile (see _classify), retargeted from the
    # exact split fractions read back each level; `q_init` seeds level 1
    # (callers that decompose same-family spectra repeatedly may thread the
    # learned value through explicitly).
    q_run = float(q_init)
    while records:
        level += 1
        # ---- group by (terminal?, bucket width) -------------------------
        # routing is by SIZE: a small block must go to the dense base case
        # even when its bucket rounds above the termination size.
        groups: dict = {}
        for rec in records:
            is_base = rec.size <= termination_size
            groups.setdefault(
                (is_base, _round_up(rec.size, _BUCKET)), []
            ).append(rec)
        if _DEBUG:
            import sys as _sys
            import time as _time

            print(
                f"[eigh_dc] level {level}: {len(records)} subproblems, "
                f"groups {sorted(((B, len(rs)) for B, rs in groups.items()), reverse=True)} "
                f"t={_time.strftime('%H:%M:%S')}",
                file=_sys.stderr,
                flush=True,
            )

        next_records: list[_Record] = []
        new_blockstore: dict = {}
        # per-class pending writes for this level
        level_L: dict = {}

        def _get_L(ci):
            if ci not in level_L:
                k_c, n_c, _ = sym[ci].shape
                level_L[ci] = jnp.broadcast_to(
                    jnp.eye(n_c, dtype=dtype)[None], (k_c, n_c, n_c)
                )
            return level_L[ci]

        # ---- phase A: gather + dispatch base-eigh and classify per group ---
        # All device work is queued asynchronously; the flag readbacks in
        # phase B then overlap compute ACROSS groups instead of stalling on
        # each group in turn (the axon tunnel charges ~30ms per host sync).
        pend = []
        for (is_base, Bk), recs in sorted(
            groups.items(), key=lambda kv: (-kv[0][1], kv[0][0])
        ):
            m = len(recs)
            m_pad = _pow2_ceil(m)
            subH = _gather_blocks(recs, Bk, blockstore)
            if m_pad > m:
                subH = jnp.pad(subH, ((0, m_pad - m), (0, 0), (0, 0)))
            sizes_h = np.array([r.size for r in recs], np.int64)
            sizes = jnp.asarray(
                np.concatenate([sizes_h, np.ones(m_pad - m)]), jnp.int32
            )

            if is_base:
                # terminal: one batched dense eigh for the whole group
                bvals, bvecs = _base_eigh(subH, sizes)
                for ci in {r.cls for r in recs}:
                    sel = [i for i, r in enumerate(recs) if r.cls == ci]
                    n_c = sym[ci].shape[1]
                    mats, offs, szs, cbs = _padded_meta(
                        [recs[i].mat for i in sel],
                        [recs[i].off for i in sel],
                        [recs[i].size for i in sel],
                        [recs[i].mat * n_c + recs[i].off for i in sel],
                    )
                    level_L[ci] = _scatter_blocks(
                        _get_L(ci), _padded_take(bvecs, sel), mats, offs, szs
                    )
                    vals_bufs[ci] = _scatter_vals(
                        vals_bufs[ci], _padded_take(bvals, sel), cbs, szs
                    )
                continue

            H0n = jnp.asarray(
                np.concatenate(
                    [np.array([H0norms[r.cls][r.mat] for r in recs]),
                     np.ones(m_pad - m)]
                ),
                dtype,
            )
            if ("ritz", Bk) not in G_cache:
                G_cache[("ritz", Bk)] = jax.random.normal(
                    jax.random.key(7), (Bk, _RITZ_DIM), dtype
                )
            done_d, sigmas, gap_halves, alpha_ests = _classify(
                subH, sizes, H0n, G_cache[("ritz", Bk)],
                jnp.asarray(q_run, dtype),
            )
            pend.append(
                (Bk, recs, m, subH, sizes_h, sizes, done_d, sigmas,
                 gap_halves, alpha_ests)
            )

        # ---- phase B: read flags; queue done-value scatters and splits ------
        splits = []
        for (Bk, recs, m, subH, sizes_h, sizes, done_d, sigmas,
             gap_halves, alpha_ests) in pend:
            done = np.asarray(done_d)[:m]  # sync 1 (pipelined across groups)

            idx_done = np.flatnonzero(done)
            idx_act = np.flatnonzero(~done)

            if idx_done.size:
                rows_all = list(idx_done)
                dvals = _diag_vals(
                    _padded_take(subH, rows_all),
                    _padded_take(sizes, rows_all)
                    * jnp.asarray(
                        [1] * len(rows_all)
                        + [0] * (_pow2_ceil(len(rows_all)) - len(rows_all)),
                        jnp.int32,
                    ),
                )
                # eigvecs: identity block (L untouched); only values written
                for ci in {recs[i].cls for i in idx_done}:
                    _get_L(ci)  # materialize so V_acc update happens uniformly
                    n_c = sym[ci].shape[1]
                    rows = [j for j, i in enumerate(idx_done)
                            if recs[i].cls == ci]
                    _, _, szs, cbs = _padded_meta(
                        [0] * len(rows), [0] * len(rows),
                        [recs[idx_done[j]].size for j in rows],
                        [recs[idx_done[j]].mat * n_c + recs[idx_done[j]].off
                         for j in rows],
                    )
                    vals_bufs[ci] = _scatter_vals(
                        vals_bufs[ci], _padded_take(dvals, rows), cbs, szs
                    )

            if not idx_act.size:
                continue

            ma = idx_act.size
            ma_pad = _pow2_ceil(ma)
            rows_act = list(idx_act)
            subH_a = _padded_take(subH, rows_act)
            sig_a = _padded_take(sigmas, rows_act)
            gap_a = _padded_take(gap_halves, rows_act)
            alp_a = _padded_take(alpha_ests, rows_act)
            sizes_a = jnp.asarray(
                np.concatenate([sizes_h[idx_act], np.ones(ma_pad - ma)]),
                jnp.int32,
            )
            if Bk not in G_cache:
                G_cache[Bk] = jax.random.normal(
                    jax.random.key(20260816), (Bk, Bk), dtype
                )
            Hm, Hp, W, ranks = _split_v2(
                subH_a, sizes_a, sig_a, gap_a, alp_a, G_cache[Bk],
                shift_rel=shift_rel,
            )
            splits.append((Bk, recs, idx_act, subH_a, Hm, Hp, W, ranks))

        # ---- phase C: read ranks; scatter transforms; emit children ---------
        frac_num = frac_den = 0
        for Bk, recs, idx_act, subH_a, Hm, Hp, W, ranks_d in splits:
            ranks = np.asarray(ranks_d)[: idx_act.size].astype(np.int64)
            # ^ sync 2 (pipelined across groups)
            for j, gi in enumerate(idx_act):
                if 0 < ranks[j] < recs[gi].size:
                    frac_num += int(ranks[j])
                    frac_den += int(recs[gi].size)

            new_blockstore[("m", Bk)] = Hm
            new_blockstore[("p", Bk)] = Hp

            # local transforms into this level's block-diagonal L
            ok_rows = [j for j, gi in enumerate(idx_act)
                       if 0 < ranks[j] < recs[gi].size]
            for ci in {recs[gi].cls for gi in idx_act}:
                rows = [j for j in ok_rows if recs[idx_act[j]].cls == ci]
                if not rows:
                    _get_L(ci)
                    continue
                mats, offs, szs, _ = _padded_meta(
                    [recs[idx_act[j]].mat for j in rows],
                    [recs[idx_act[j]].off for j in rows],
                    [recs[idx_act[j]].size for j in rows],
                    [0] * len(rows),
                )
                level_L[ci] = _scatter_blocks(
                    _get_L(ci), _padded_take(W, rows), mats, offs, szs
                )

            for j, gi in enumerate(idx_act):
                rec = recs[gi]
                b, r = rec.size, int(ranks[j])
                if r <= 0 or r >= b:
                    # degenerate split (projector rank 0 or full): solve the
                    # block directly with XLA's serial eigh — guaranteed
                    # progress, rare.
                    Hi = _masked(subH_a[j], jnp.int32(b))[:b, :b]
                    fvals, fvecs = jnp.linalg.eigh(Hi)
                    Bp = _round_up(b, 128)
                    fvecs = jnp.pad(fvecs, ((0, Bp - b), (0, Bp - b)))[None]
                    fvals = jnp.pad(fvals, (0, Bp - b))[None]
                    level_L[rec.cls] = _scatter_blocks(
                        _get_L(rec.cls), fvecs,
                        jnp.asarray([rec.mat], jnp.int32),
                        jnp.asarray([rec.off], jnp.int32),
                        jnp.asarray([b], jnp.int32),
                    )
                    n_c = sym[rec.cls].shape[1]
                    vals_bufs[rec.cls] = _scatter_vals(
                        vals_bufs[rec.cls], fvals,
                        jnp.asarray([rec.mat * n_c + rec.off], jnp.int32),
                        jnp.asarray([b], jnp.int32),
                    )
                    continue
                next_records.append(
                    _Record(rec.cls, rec.mat, rec.off, r, ("m", Bk), j)
                )
                next_records.append(
                    _Record(rec.cls, rec.mat, rec.off + r, b - r, ("p", Bk), j)
                )

        # ---- adapt the split quantile from this level's exact fractions ----
        if frac_den:
            a = frac_num / frac_den
            q_run = float(np.clip(q_run * 0.5 / max(a, 0.05), 0.08, 0.92))
            if _DEBUG:
                import sys as _sys

                print(
                    f"[eigh_dc]   split fraction {a:.2f} -> q={q_run:.2f}",
                    file=_sys.stderr, flush=True,
                )

        # ---- compose this level's transforms into the running bases -----
        with jax.default_matmul_precision("float32"):
            for ci, L in level_L.items():
                V_accs[ci] = L if V_accs[ci] is None else V_accs[ci] @ L

        if _DEBUG_SYNC:
            import sys as _sys
            import time as _time

            for ci in range(len(sym)):
                if V_accs[ci] is not None:
                    np.asarray(V_accs[ci][0, 0, 0])
                np.asarray(vals_bufs[ci][0])
            print(
                f"[eigh_dc]   level {level} fully synced "
                f"t={_time.strftime('%H:%M:%S')}+{_time.time() % 1:.2f}",
                file=_sys.stderr, flush=True,
            )

        records = next_records
        blockstore = new_blockstore

    # ---- final ordering per matrix ---------------------------------------
    out = []
    for ci, s in enumerate(sym):
        k_c, n_c, _ = s.shape
        vals = vals_bufs[ci][:-1].reshape(k_c, n_c)
        vecs = V_accs[ci]
        if vecs is None:  # degenerate: everything solved via fallbacks only
            vecs = jnp.broadcast_to(jnp.eye(n_c, dtype=dtype)[None],
                                    (k_c, n_c, n_c))
        order = jnp.argsort(vals, axis=1)
        vals = jnp.take_along_axis(vals, order, axis=1)
        vecs = jnp.take_along_axis(vecs, order[:, None, :], axis=2)
        out.append((vals, vecs))
    return out


def eigh_stack_dc(stack, termination_size: int = _TERMINATION):
    """Eigendecompose a (k, n, n) stack of symmetric matrices.

    Drop-in for `jnp.linalg.eigh` on a stack (ascending eigenvalues), but all
    same-level D&C subproblems run in shared vmapped dispatches instead of
    XLA's serial agenda. Intended for TPU; on CPU it is correct but LAPACK's
    direct solver is faster. Returns `(eigenvalues (k, n), eigenvectors
    (k, n, n))`.
    """
    stack = jnp.asarray(stack)
    if stack.ndim != 3 or stack.shape[1] != stack.shape[2]:
        raise ValueError(f"expected (k, n, n) stack, got {stack.shape}")
    if stack.shape[1] <= termination_size:
        return jnp.linalg.eigh((stack + jnp.swapaxes(stack, 1, 2)) / 2)
    [(vals, vecs)] = eigh_pooled_dc([stack], termination_size=termination_size)
    return vals, vecs
