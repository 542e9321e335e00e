"""Pallas TPU LATRD kernel, v4: symmetric-half STRIP streaming.

v3 (`ops/latrd_pallas_v3.py`) cut the trailing-matvec HBM traffic ~3x by
streaming only the lower trailing triangle as (T, T) tiles, each serving
both y[R] += A[R,S] @ v[S] and y[S] += A[R,S]^T @ v[R]. Measured on v5e
it beat the production v1 by only 1.06x at the (3, 4608) bench class:
per-tile DMA issue overhead (~0.97 us against a 0.74 us transfer) eats
~half the traffic win (`scripts/dev_v1_dma_probe.py` — after removing
the ~25 ms fixed per-invocation tunnel-sync cost that polluted earlier
microbenches, chunk DMAs stream at ~760 GB/s, HBM peak).

v4 keeps v3's coverage but fetches each column-strip of the lower
triangle as tall contiguous (H, T) chunks (H = 4T by default, 2.36 MB —
the same size the v1 kernel streams at peak):

- For column c, col-tile s in [c//T, nt): strip rows [sT, m) of plane s
  in the col-tile-major copy A2 are CONTIGUOUS; chunk j covers rows
  [sT + jH, sT + (j+1)H). The chunk serves
      y[rows] += chunk @ v[s-tile]          (direct, incl. diag tile)
      y[s-tile] += chunk^T @ v[rows]        (transposed, rows strictly
                                             below the diagonal tile)
  with VPU masks for rows past the window end (a chunk may overrun into
  the next k's rows — reads are kept in bounds by H padding rows per
  plane) and for the diagonal tile in the transposed product.
- The flat pair loop over (s, j) uses a state-machine advance with
  double-buffered DMA, exactly like v3's triangular pair loop.
- The U/W panel row writes use 8-row aligned read-modify-write slices
  instead of v1/v3's full (2nb, KM) masked select: Mosaic materializes
  full-buffer where() temporaries on the kernel stack, which is what
  blew the 16 MB scoped-vmem limit in v2/v3 experiments.

Everything else — row fetch, U/W corrections, Householder rules, output
conventions — matches v1/v3, so `tridiag.apply_q` and the D&C stage 2
consume the outputs unchanged. Reference math consumed downstream:
`/root/reference/laplace/utils/matrix.py:123-150`.

Measured on v5e vs the production v1 (`scripts/profile_latrd_v4.py`,
median-of-5, warm): 1.01x at (4,512), 0.99x at (4,1152), **1.17x at
(4,2304), 1.10x at (3,4608)** — the auto dispatcher picks v4 from
n >= 2304 (`tridiag_eig._stage1_impl`). Tuning sweeps that did NOT pay
(`scripts/dev_v4_param_sweep.py`, `dev_v4_vmem_probe.py`):

- Bigger strip chunks: H=3T fits scoped vmem only at (4,2304) and is
  SLOWER there (0.259s vs 0.240s); at (3,4608) it needs nb=32 and loses
  (0.925s vs 0.857s). Per-chunk cost scales with bytes, not count.
- `chunk_precision="default"` (1-pass bf16 strip products instead of the
  6-pass f32 HIGHEST): only 0.857 -> 0.740s at (3,4608) — so the MXU
  pass count is a minor term; the floor is per-chunk fixed cost (DMA
  issue + dynamic-lane RMW of the av accumulator) — and the tridiagonal
  spectrum drifts 2.3e-4 relative (vs HIGHEST's 1.4e-7 against v1),
  far outside the 3e-5 oracle tolerance. Rejected for production; the
  knob stays for measurement.

This file is separate from v1/v3 on purpose: Mosaic kernel payloads
embed source locations, so sharing a file would invalidate every cached
executable on any line shift (docs/performance.md, round-4 lesson).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["latrd_panel_v4", "tridiagonalize_pallas_v4"]

_KP = 8  # per-k scalar blocks are padded to 8 sublanes/lanes


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _panel_kernel(off_ref, A_ref, A2_ref, uwt_ref, out_ref,
                  *, K: int, m: int, nb: int, T: int, H: int,
                  chunk_prec: jax.lax.Precision):
    KM = K * m
    dtype = uwt_ref.dtype
    off = off_ref[0]  # panel's first window-relative column
    q_base = off_ref[1]  # window start (global)
    n_real = off_ref[2]  # true (unpadded) n
    nt = m // T  # col-tiles per k
    h = H // T  # tile-rows per chunk

    uw = uwt_ref  # U/W panel works in the output ref (VMEM footprint)

    # av / v_sc carry H padding lanes: the last chunk of a strip starts
    # at window row m - T, so its H-wide dynamic slice reaches KM - T + H
    KMp = KM + H

    def body(av, v_sc, row_sc, strip_sc, sems, row_sem):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, KM), 1)
        local = lanes % m  # lane -> window-relative row
        kid8 = jax.lax.broadcasted_iota(jnp.int32, (_KP, KM), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (_KP, KM), 1)
        sel = (lane8 // m == kid8).astype(dtype)  # (8, KM) k-segment select
        eps_tiny = jnp.asarray(jnp.finfo(dtype).tiny * 1e4, dtype)

        uw[...] = jnp.zeros((2 * nb, KM), dtype)
        v_sc[...] = jnp.zeros((_KP, KMp), dtype)  # padding lanes stay 0
        sub_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, 3 * _KP), 0)
        sub8k = jax.lax.broadcasted_iota(jnp.int32, (8, KM), 0)
        lH = jax.lax.broadcasted_iota(jnp.int32, (_KP, H), 1)

        def seg_bcast(s8):
            """(X, 8) per-k values -> (X, KM) per-segment broadcast."""
            return jax.lax.dot_general(
                s8, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)

        def seg_reduce(x):
            """(X, KM) -> (X, 8) per-k lane-segment sums."""
            return jax.lax.dot_general(
                x, sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)

        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, m), 0)

        def col_body(j, det_acc):
            c = off + j

            # ---- fetch row c of each k (symmetric window: row == column).
            c8 = pl.multiple_of((c // 8) * 8, 8)
            parts = []
            for k in range(K):
                cp = pltpu.make_async_copy(
                    A_ref.at[pl.ds(k * m + c8, 8), :],
                    row_sc,
                    row_sem,
                )
                cp.start()
                cp.wait()
                parts.append(jnp.sum(
                    jnp.where(sub8 == c % 8, row_sc[...], 0.0),
                    axis=0, keepdims=True,
                ))
            row = jnp.concatenate(parts, axis=1)  # (1, KM)

            # ---- corrected column: col = row - U W^T[., c] - W U^T[., c]
            oneh = (lane8 == kid8 * m + c).astype(dtype)  # (8, KM)
            uw_row = jax.lax.dot_general(
                uw[...], oneh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)  # (2nb, 8): [q, k] = UW[q, k*m+c]
            sw = jnp.concatenate([uw_row[nb:], uw_row[:nb]], axis=0)
            # NOTE: a sublane-contracting dot_general(sw, uw) avoids the
            # (2nb, KM) broadcast product here but forces Mosaic to
            # relayout the whole panel operand (measured: scoped vmem
            # JUMPS 17.5M -> 25.9M at the (4, 2304) class), so the
            # v1-style elementwise form stays
            corr = jnp.sum(uw[...] * seg_bcast(sw), axis=0, keepdims=True)
            col = row - corr
            col = jnp.where(local < n_real - q_base, col, 0.0)

            # ---- Householder (tridiag.py conventions) --------------------
            below = local > c
            x = jnp.where(below, col, 0.0)
            d_val = seg_reduce(jnp.where(local == c, col, 0.0))  # (1, 8)
            alpha = seg_reduce(jnp.where(local == c + 1, col, 0.0))
            xnorm2 = jnp.maximum(seg_reduce(x * x) - alpha * alpha, 0.0)
            anorm = jnp.sqrt(alpha * alpha + xnorm2)
            sign = jnp.where(alpha >= 0, 1.0, -1.0).astype(dtype)
            beta = -sign * anorm
            trivial = xnorm2 <= eps_tiny * anorm * anorm
            denom = jnp.where(trivial, 1.0, alpha - beta)
            beta_safe = jnp.where(trivial, 1.0, beta)
            tau = jnp.where(trivial, 0.0, (beta - alpha) / beta_safe)
            ok = (c + q_base) < (n_real - 2)
            tau = jnp.where(ok, tau, 0.0)
            e_val = jnp.where(trivial, alpha, beta)

            v = jnp.where(below, x * seg_bcast(1.0 / denom), 0.0)
            v = jnp.where((local == c + 1) & ok, 1.0,
                          jnp.where(below & ok, v, 0.0))

            # ---- Av: symmetric-half strip streaming -----------------------
            v_sc[:, :KM] = jnp.broadcast_to(v, (_KP, KM))
            av[...] = jnp.zeros((_KP, KMp), dtype)

            r0 = c // T  # first col-tile intersecting the trailing block
            q_t = nt - r0  # strips (and tiles per side)
            # chunks per strip s: ceil((nt - s) / h); total:
            g = q_t // h
            r_rem = q_t - g * h
            P = h * g * (g + 1) // 2 + r_rem * (g + 1)

            def advance(s, jj):
                """next (strip, chunk) pair after (s, jj)."""
                u = nt - s
                wrap = (jj + 1) * h >= u  # jj + 1 >= ceil(u / h)
                return (jnp.where(wrap, s + 1, s),
                        jnp.where(wrap, 0, jj + 1))

            for k in range(K):

                def get_dma(slot, si, ji, k=k):
                    base = k * m + si * T + ji * H
                    return pltpu.make_async_copy(
                        A2_ref.at[si, pl.ds(pl.multiple_of(base, T), H), :],
                        strip_sc.at[slot],
                        sems.at[slot],
                    )

                @pl.when(P > 0)
                def _():
                    get_dma(0, r0, 0).start()

                def pair_body(p, carry, k=k):
                    # carry: current pair and the (already started) next one
                    si, ji, sn, jn = carry

                    @pl.when(p + 1 < P)
                    def _():
                        get_dma((p + 1) % 2, sn, jn).start()

                    get_dma(p % 2, si, ji).wait()
                    chunk = strip_sc[p % 2]  # (H, T): rows, cols s-tile
                    base_l = si * T + ji * H  # first row (window-relative)

                    # direct product: y[rows] += chunk @ v[s-tile]
                    vs = v_sc[:, pl.ds(
                        pl.multiple_of(k * m + si * T, T), T)]
                    part1 = jax.lax.dot_general(
                        vs, chunk, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=chunk_prec,
                    ).astype(dtype)  # (8, H)
                    part1 = jnp.where(lH < m - base_l, part1, 0.0)
                    idx_r = pl.ds(pl.multiple_of(k * m + base_l, T), H)
                    av[:, idx_r] = av[:, idx_r] + part1

                    # transposed product: y[s-tile] += chunk^T @ v[rows],
                    # rows strictly below the diagonal tile and in-window
                    vr = v_sc[:, idx_r]  # (8, H)
                    vr = jnp.where(
                        (lH + base_l >= (si + 1) * T)
                        & (lH < m - base_l), vr, 0.0)
                    part2 = jax.lax.dot_general(
                        vr, chunk, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=chunk_prec,
                    ).astype(dtype)  # (8, T)
                    idx_s = pl.ds(pl.multiple_of(k * m + si * T, T), T)
                    av[:, idx_s] = av[:, idx_s] + part2

                    sn2, jn2 = advance(sn, jn)
                    return sn, jn, sn2, jn2

                s1, j1 = advance(r0, jnp.asarray(0, jnp.int32))
                jax.lax.fori_loop(
                    0, P, pair_body,
                    (jnp.asarray(r0, jnp.int32), jnp.asarray(0, jnp.int32),
                     s1, j1),
                )

            Av = jnp.mean(av[...], axis=0, keepdims=True)[:, :KM]
            Av = jnp.where(below, Av, 0.0)  # rows <= c carry unwanted terms

            # ---- w = tau (Av - U (W^T v) - W (U^T v)), halved self-term --
            v8 = jnp.broadcast_to(v, (_KP, KM))
            uwv = jax.lax.dot_general(
                uw[...], v8 * sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)  # (2nb, 8)
            sw2 = jnp.concatenate([uwv[nb:], uwv[:nb]], axis=0)
            Av = Av - jnp.sum(uw[...] * seg_bcast(sw2), axis=0,
                              keepdims=True)
            tau_b = seg_bcast(tau)
            w = tau_b * Av
            wv = seg_reduce(w * v)
            w = w - 0.5 * seg_bcast(tau * wv) * v
            w = jnp.where(below, w, 0.0)

            # ---- write rows j (v) and nb + j (w) of the U/W panel as
            # 8-row aligned read-modify-write slices: the v1/v3-style full
            # (2nb, KM) masked select materializes full-buffer temporaries
            # on the Mosaic stack (the v2/v3 scoped-vmem OOM cause)
            j8 = pl.multiple_of((j // 8) * 8, 8)
            is_row = sub8k == j % 8
            blk = uw[pl.ds(j8, 8), :]
            uw[pl.ds(j8, 8), :] = jnp.where(
                is_row, jnp.broadcast_to(v, (8, KM)), blk)
            blkw = uw[pl.ds(nb + j8, 8), :]  # nb is a multiple of 8
            uw[pl.ds(nb + j8, 8), :] = jnp.where(
                is_row, jnp.broadcast_to(w, (8, KM)), blkw)

            det_row = jnp.concatenate([d_val, e_val, tau], axis=1)
            return jnp.where(sub_nb == j, det_row, det_acc)

        det = jax.lax.fori_loop(
            0, nb, col_body, jnp.zeros((nb, 3 * _KP), dtype)
        )
        out_ref[...] = det

    pl.run_scoped(
        body,
        av=pltpu.VMEM((_KP, KMp), dtype),
        v_sc=pltpu.VMEM((_KP, KMp), dtype),
        row_sc=pltpu.VMEM((8, m), dtype),
        strip_sc=pltpu.VMEM((2, H, T), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
        row_sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("K", "m", "nb", "T", "H", "chunk_precision",
                              "interpret")
)
def latrd_panel_v4(Aw, A2p, off, q_base, n_real, *, K, m, nb, T, H,
                   chunk_precision="highest", interpret=False):
    """One LATRD panel on the (K, m, m) trailing window, columns
    [off, off + nb) (window-relative, traced). `A2p` is the col-tile-major
    transpose of the window padded with H zero rows per plane, shape
    (m//T, K*m + H, T). Returns (UWT (2nb, K*m), det (nb, 24)) with det
    columns [d(8) | e(8) | tau(8)] carrying per-k values in the first K
    slots."""
    dtype = Aw.dtype
    kernel = functools.partial(
        _panel_kernel, K=K, m=m, nb=nb, T=T, H=H,
        chunk_prec={"highest": jax.lax.Precision.HIGHEST,
                    "high": jax.lax.Precision.HIGH,
                    "default": jax.lax.Precision.DEFAULT}[chunk_precision],
    )
    scal = jnp.stack([
        jnp.asarray(off, jnp.int32), jnp.asarray(q_base, jnp.int32),
        jnp.asarray(n_real, jnp.int32),
    ])
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2 * nb, K * m), dtype),
            jax.ShapeDtypeStruct((nb, 3 * _KP), dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scal, Aw.reshape(K * m, m), A2p)


@functools.partial(
    jax.jit, static_argnames=("nb", "n_classes", "T", "H", "chunk_precision",
                              "interpret")
)
def tridiagonalize_pallas_v4(A: jnp.ndarray, nb: int = 64,
                             n_classes: int = 4, T: int | None = None,
                             H: int | None = None,
                             chunk_precision: str = "highest",
                             interpret: bool = False):
    """Drop-in for `tridiag.tridiagonalize` with the symmetric-half strip
    streaming panel kernel. Same outputs/convention as v1/v3; `apply_q`
    and stage 2 consume V/taus unchanged.

    `T` is the col-tile width (class granularity rounds to it); `H` the
    strip chunk height, a multiple of T (default min(2T, window): 1.18 MB
    chunks at T=384 — the largest that fits the 16 MB scoped-vmem stack
    limit at the bench classes; ~85% of peak DMA efficiency).
    """
    from laplace_jax.ops.tridiag import _bdiag

    K, n, _ = A.shape
    if n <= 2:
        from laplace_jax.ops.tridiag import tridiagonalize

        return tridiagonalize(A, nb=nb)
    if T is None:
        T = 384 if n >= 1536 else 128
    with jax.default_matmul_precision("float32"):
        return _tridiagonalize_v4_body(
            A, _bdiag, nb=nb, n_classes=n_classes, T=T, H=H,
            chunk_precision=chunk_precision, interpret=interpret,
        )


def _tridiagonalize_v4_body(A, _bdiag, *, nb, n_classes, T, H,
                            chunk_precision, interpret):
    K, n, _ = A.shape
    dtype = A.dtype

    # the kernel's U/W panel writes are 8-row aligned RMW slices, so the
    # panel width must be a multiple of 8 (round down: more panels, same math)
    nb = max(8, min(nb, n))
    nb -= nb % 8
    # class granularity is a multiple of T so every window size m (and so
    # every k*m lane offset and chunk boundary) is T-aligned; the nb term
    # must round up to T too or a user nb > the class term breaks alignment
    S = max(_cdiv(nb, T) * T, T, _cdiv(_cdiv(n, n_classes), T) * T)
    # panels must tile a class exactly (off = t*nb stays inside S, and d/e/V
    # writes never spill into the next class): shrink nb to a divisor of S.
    # 8 always divides S (S is a multiple of T, itself a multiple of 128).
    while S % nb:
        nb -= 8
    n_pad = _cdiv(n, S) * S
    Ap = jnp.zeros((K, n_pad, n_pad), dtype).at[:, :n, :n].set(A)
    d = jnp.zeros((K, n_pad), dtype)
    e = jnp.zeros((K, n_pad), dtype)
    V = jnp.zeros((K, n_pad, n_pad), dtype)
    taus = jnp.zeros((K, n_pad), dtype)
    n_cols = n - 2
    H_arg = H

    q = 0
    while q < n_cols:
        m = n_pad - q
        nt = m // T
        # H = 2T (1.18 MB chunks at T=384) is the largest chunk that
        # keeps the kernel under the 16 MB scoped-vmem stack limit at the
        # (4, 2304) and (3, 4608) bench classes (H=4T compiles to 17.5M /
        # 19.5M scoped; scripts/dev_v4_vmem_probe.py)
        # a user H is rounded up to a multiple of T (the strip-chunk DMA
        # bases carry a pl.multiple_of(., T) alignment promise, and
        # h = H // T must be >= 1); m is a multiple of T so min() preserves it
        H = min(2 * T, m) if H_arg is None else min(_cdiv(H_arg, T) * T, m)
        n_panels = _cdiv(min(S, n_cols - q), nb)
        Aw = jax.lax.dynamic_slice(Ap, (0, q, q), (K, m, m))

        def class_body(t, carry, q=q, m=m, nt=nt, H=H):
            Aw, d, e, V, taus = carry
            off = t * nb
            # col-tile-major copy for the kernel's strip DMAs, padded by
            # H zero rows per plane so the last chunk of the last k's
            # strip stays in bounds: (nt, K*m + H, T)
            A2 = jnp.transpose(Aw.reshape(K * m, nt, T), (1, 0, 2))
            A2p = jnp.concatenate(
                [A2, jnp.zeros((nt, H, T), dtype)], axis=1)
            UWT, det = latrd_panel_v4(
                Aw, A2p, off, q, n, K=K, m=m, nb=nb, T=T, H=H,
                chunk_precision=chunk_precision, interpret=interpret,
            )
            U = jnp.transpose(UWT[:nb].reshape(nb, K, m), (1, 2, 0))
            W = jnp.transpose(UWT[nb:].reshape(nb, K, m), (1, 2, 0))
            dcol = jnp.transpose(det[:, :K], (1, 0))  # (K, nb)
            ecol = jnp.transpose(det[:, _KP : _KP + K], (1, 0))
            tcol = jnp.transpose(det[:, 2 * _KP : 2 * _KP + K], (1, 0))
            d = jax.lax.dynamic_update_slice(d, dcol, (0, q + off))
            e = jax.lax.dynamic_update_slice(e, ecol, (0, q + off))
            taus = jax.lax.dynamic_update_slice(taus, tcol, (0, q + off))
            V = jax.lax.dynamic_update_slice(V, U, (0, q, q + off))
            Ub = _bdiag(U)
            Wb = _bdiag(W)
            Wt = W.transpose(0, 2, 1).reshape(K * nb, m)
            Ut = U.transpose(0, 2, 1).reshape(K * nb, m)
            Aw = (Aw.reshape(K * m, m) - Ub @ Wt - Wb @ Ut).reshape(K, m, m)
            return Aw, d, e, V, taus

        Aw, d, e, V, taus = jax.lax.fori_loop(
            0, n_panels, class_body, (Aw, d, e, V, taus)
        )
        Ap = jax.lax.dynamic_update_slice(Ap, Aw, (0, q, q))
        q += S

    d = d.at[:, n - 2].set(Ap[:, n - 2, n - 2])
    d = d.at[:, n - 1].set(Ap[:, n - 1, n - 1])
    e = e.at[:, n - 2].set(Ap[:, n - 1, n - 2])
    return d[:, :n], e[:, : n - 1], V[:, :, :n], taus[:, :n]
