"""Pallas TPU LATRD kernel, v3: symmetric-half tile streaming.

The production v1 kernel (`ops/latrd_pallas.py`) streams the trailing
matvec A @ v as full-width (TR, m) row chunks, skipping chunks entirely
above the current column: per column it reads rows (c.., m) x ALL m
columns, ~n^3/2 elements in total — the columns <= c multiply v's zeros.
Since the window is SYMMETRIC, the matvec only needs the lower triangle
of the trailing (m-c)^2 block: an off-diagonal tile A[R, S] (S <= R)
serves both

    y[R] += A[R, S] @ v[S]      and      y[S] += A[R, S]^T @ v[R],

so streaming square (T, T) tiles of the lower trailing triangle cuts the
HBM traffic to ~n^3/6 + O(n^2 T) — a ~3x reduction of exactly what the
kernel is bound by (v1 measures ~60% of ITS OWN n^3/2 streaming roofline;
see docs/performance.md).

Implementation notes:

- Tiles are fetched from a pre-transposed copy A2 of the window with
  layout (nt, K*m, T) (col-tile-major), so every DMA slice uses leading
  (sublane-like) dynamic offsets only — no dynamic lane-offset DMAs.
  The (KM, m) row-major window is still passed for the per-column row
  fetch. A2 is rebuilt by XLA after each panel's rank-2nb update (one
  transpose copy per panel, ~0.6 ms at the 4608 class — noise).
- Per column, the tile loop is ONE fori over the flattened lower-triangle
  pair index p in [0, P) with P = q(q+1)/2, q = nt - c//T: the triangular
  decode p -> (r, s) uses an f32 sqrt with integer fixup (exact for the
  tiny P involved). Tiles are double-buffered: wait p, prefetch p+1.
- v is staged in a VMEM scratch so the per-tile v[S]/v[R] slices are
  dynamic lane-offset LOADS of a ref (the same mechanism v1 uses for its
  dynamic av stores), aligned to T (a multiple of 128).
- Everything else — row fetch, U/W panel corrections, Householder rules,
  output conventions — matches v1 exactly, so `tridiag.apply_q` and the
  D&C stage 2 consume the outputs unchanged. Reference math consumed
  downstream: `/root/reference/laplace/utils/matrix.py:123-150`.

This file is separate from v1 on purpose: Mosaic kernel payloads embed
source locations, so sharing a file would invalidate every cached v1
executable on any line shift (docs/performance.md, round-4 lesson).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["latrd_panel_v3", "tridiagonalize_pallas_v3"]

_KP = 8  # per-k scalar blocks are padded to 8 sublanes/lanes


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _panel_kernel(off_ref, A_ref, A2_ref, uwt_ref, out_ref,
                  *, K: int, m: int, nb: int, T: int):
    KM = K * m
    dtype = uwt_ref.dtype
    off = off_ref[0]  # panel's first window-relative column
    q_base = off_ref[1]  # window start (global)
    n_real = off_ref[2]  # true (unpadded) n
    nt = m // T  # col-tiles per k

    uw = uwt_ref  # U/W panel works in the output ref (VMEM footprint)

    def body(av, v_sc, row_sc, tile_sc, sems, row_sem):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, KM), 1)
        local = lanes % m  # lane -> window-relative row
        kid8 = jax.lax.broadcasted_iota(jnp.int32, (_KP, KM), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (_KP, KM), 1)
        sel = (lane8 // m == kid8).astype(dtype)  # (8, KM) k-segment select
        eps_tiny = jnp.asarray(jnp.finfo(dtype).tiny * 1e4, dtype)

        uw[...] = jnp.zeros((2 * nb, KM), dtype)
        sub_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, 3 * _KP), 0)
        sub_uw = jax.lax.broadcasted_iota(jnp.int32, (2 * nb, KM), 0)

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

            # ---- Av: symmetric-half tile streaming ------------------------
            # stage v for dynamic lane-offset slicing; zero the accumulator
            v_sc[...] = jnp.broadcast_to(v, (_KP, KM))
            av[...] = jnp.zeros((_KP, KM), dtype)

            r0 = c // T  # first tile index intersecting the trailing block
            q_t = nt - r0  # tiles per side in the trailing block
            P = q_t * (q_t + 1) // 2  # lower-triangle pairs

            def advance(r, s):
                """next lower-triangle pair after (r, s), row-major."""
                wrap = s >= r
                return (jnp.where(wrap, r + 1, r),
                        jnp.where(wrap, r0, s + 1))

            # k is a static python loop (static v/av segment bases); the
            # double buffer hands off across k via the running pair parity
            for k in range(K):

                def get_dma(slot, ri, si, k=k):
                    # pl.multiple_of is LOAD-BEARING: without the
                    # alignment hint Mosaic issues the DMA on an
                    # unaligned path that sustains only ~44-105 GB/s
                    # (vs ~350+ GB/s aligned; dev_strip_dma_bench.py)
                    return pltpu.make_async_copy(
                        A2_ref.at[
                            si, pl.ds(pl.multiple_of(k * m + ri * T, T), T), :
                        ],
                        tile_sc.at[slot],
                        sems.at[slot],
                    )

                @pl.when(P > 0)
                def _():
                    get_dma(0, r0, r0).start()

                def pair_body(p, carry, k=k):
                    # carry: current pair and the (already started) next one
                    ri, si, rn, sn = carry

                    @pl.when(p + 1 < P)
                    def _():
                        get_dma((p + 1) % 2, rn, sn).start()

                    get_dma(p % 2, ri, si).wait()
                    tile = tile_sc[p % 2]  # (T, T): rows ri-block, cols si
                    vs = v_sc[:, pl.ds(
                        pl.multiple_of(k * m + si * T, T), T)]
                    part1 = jax.lax.dot_general(
                        vs, tile, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    ).astype(dtype)  # (8, T) += rows ri-block
                    idx_r = pl.ds(pl.multiple_of(k * m + ri * T, T), T)
                    av[:, idx_r] = av[:, idx_r] + part1

                    @pl.when(si < ri)
                    def _():
                        vr = v_sc[:, pl.ds(
                            pl.multiple_of(k * m + ri * T, T), T)]
                        part2 = jax.lax.dot_general(
                            vr, tile, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        ).astype(dtype)  # (8, T) += rows si-block
                        idx_s = pl.ds(
                            pl.multiple_of(k * m + si * T, T), T)
                        av[:, idx_s] = av[:, idx_s] + part2
                    rn2, sn2 = advance(rn, sn)
                    return rn, sn, rn2, sn2

                r1, s1 = advance(jnp.asarray(r0, jnp.int32),
                                 jnp.asarray(r0, jnp.int32))
                jax.lax.fori_loop(
                    0, P, pair_body,
                    (jnp.asarray(r0, jnp.int32), jnp.asarray(r0, jnp.int32),
                     r1, s1),
                )

            Av = jnp.mean(av[...], axis=0, keepdims=True)
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

            uw[...] = jnp.where(
                sub_uw == j, jnp.broadcast_to(v, (2 * nb, KM)),
                jnp.where(
                    sub_uw == nb + j, jnp.broadcast_to(w, (2 * nb, KM)),
                    uw[...],
                ),
            )

            det_row = jnp.concatenate([d_val, e_val, tau], axis=1)
            return jnp.where(sub_nb == j, det_row, det_acc)

        det = jax.lax.fori_loop(
            0, nb, col_body, jnp.zeros((nb, 3 * _KP), dtype)
        )
        out_ref[...] = det

    pl.run_scoped(
        body,
        av=pltpu.VMEM((_KP, KM), dtype),
        v_sc=pltpu.VMEM((_KP, KM), dtype),
        row_sc=pltpu.VMEM((8, m), dtype),
        tile_sc=pltpu.VMEM((2, T, T), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
        row_sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("K", "m", "nb", "T", "interpret")
)
def latrd_panel_v3(Aw, A2, off, q_base, n_real, *, K, m, nb, T=384,
                   interpret=False):
    """One LATRD panel on the (K, m, m) trailing window, columns
    [off, off + nb) (window-relative, traced). `A2` is the col-tile-major
    transpose of the window, shape (m//T, K*m, T). Returns
    (UWT (2nb, K*m), det (nb, 24)) with det columns [d(8) | e(8) | tau(8)]
    carrying per-k values in the first K slots."""
    dtype = Aw.dtype
    kernel = functools.partial(_panel_kernel, K=K, m=m, nb=nb, T=T)
    scal = jnp.stack([
        jnp.asarray(off, jnp.int32), jnp.asarray(q_base, jnp.int32),
        jnp.asarray(n_real, jnp.int32),
    ])
    kwargs = {}
    if not interpret:
        # the default 16 MB scoped-vmem flag is below v5e's physical VMEM;
        # the T=768 double buffer + U/W panel + full-buffer temporaries
        # need ~22 MB at the (3, 4608) bench class
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024,
        )
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
        **kwargs,
    )(scal, Aw.reshape(K * m, m), A2)


@functools.partial(
    jax.jit, static_argnames=("nb", "n_classes", "T", "interpret")
)
def tridiagonalize_pallas_v3(A: jnp.ndarray, nb: int = 64,
                             n_classes: int = 4, T: int | None = None,
                             interpret: bool = False):
    """Drop-in for `tridiag.tridiagonalize` with the symmetric-half tile
    streaming panel kernel. Same outputs/convention as v1; `apply_q` and
    stage 2 consume V/taus unchanged.

    `T` is the square streaming tile size; it must divide every window
    class, so class granularity is rounded to T. Default: 384 for
    n >= 1536, 128 below (test sizes). T=768 was measured slightly
    better per tile (the kernel is DMA-overhead-bound: T=384 ablates at
    ~5.6-6.0 us/tile vs the ~0.74 us transfer time) but its (2, 768,
    768) double buffer plus the (2nb, KM) panel temporaries exceed the
    16 MB scoped-vmem stack limit at the (4, 2304)+ bench classes — the
    `vmem_limit_bytes` compiler param does not raise the XLA-side stack
    limit on the remote AOT toolchain.

    Measured end-to-end vs the production v1 (v5e, warm, median-of-5):
    (4,512) 0.94x, (4,1152) 0.69x, (4,2304) 1.26x, (3,4608) 1.06x —
    the ~3x HBM-traffic reduction does not materialize because small
    (0.59 MB) tile DMAs sustain only ~44-105 GB/s vs ~600 GB/s for v1's
    2.36 MB row chunks. Kept as the correctness base for the strip-DMA
    v4 (`ops/latrd_pallas_v4.py`), which fetches the same lower-triangle
    coverage as contiguous multi-MB column strips.
    """
    from laplace_jax.ops.tridiag import _bdiag

    K, n, _ = A.shape
    if n <= 2:
        from laplace_jax.ops.tridiag import tridiagonalize

        return tridiagonalize(A, nb=nb)
    if T is None:
        T = 384 if n >= 1536 else 128
    with jax.default_matmul_precision("float32"):
        return _tridiagonalize_v3_body(
            A, _bdiag, nb=nb, n_classes=n_classes, T=T, interpret=interpret
        )


def _tridiagonalize_v3_body(A, _bdiag, *, nb, n_classes, T, interpret):
    K, n, _ = A.shape
    dtype = A.dtype

    nb = max(8, min(nb, n))
    nb -= nb % 8  # 8-row sublane alignment, as in v4
    # class granularity is a multiple of T so every window size m (and so
    # every k*m lane offset and tile boundary) is T-aligned; the nb term
    # must round up to T too or a user nb > the class term breaks alignment
    S = max(_cdiv(nb, T) * T, T, _cdiv(_cdiv(n, n_classes), T) * T)
    # panels must tile a class exactly (off = t*nb stays inside S): shrink
    # nb to a divisor of S; 8 always divides S (a multiple of T >= 128)
    while S % nb:
        nb -= 8
    n_pad = _cdiv(n, S) * S
    Ap = jnp.zeros((K, n_pad, n_pad), dtype).at[:, :n, :n].set(A)
    d = jnp.zeros((K, n_pad), dtype)
    e = jnp.zeros((K, n_pad), dtype)
    V = jnp.zeros((K, n_pad, n_pad), dtype)
    taus = jnp.zeros((K, n_pad), dtype)
    n_cols = n - 2

    q = 0
    while q < n_cols:
        m = n_pad - q
        nt = m // T
        n_panels = _cdiv(min(S, n_cols - q), nb)
        Aw = jax.lax.dynamic_slice(Ap, (0, q, q), (K, m, m))

        def class_body(t, carry, q=q, m=m, nt=nt):
            Aw, d, e, V, taus = carry
            off = t * nb
            # col-tile-major copy for the kernel's tile DMAs: (nt, K*m, T)
            A2 = jnp.transpose(
                Aw.reshape(K * m, nt, T), (1, 0, 2)
            )
            UWT, det = latrd_panel_v3(
                Aw, A2, off, q, n, K=K, m=m, nb=nb, T=T,
                interpret=interpret,
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
