"""Experimental v2 of the Pallas LATRD panel kernel — kept OUT of
`latrd_pallas.py` on purpose: Mosaic kernel payloads embed source
locations, so any line shift in that file invalidates every cached
two-stage-eigensolver executable (minutes of recompile on remote-compile
toolchains). Experiments live here where they cannot move v1's lines.

v2 status (v5e, 2026-08-19, `scripts/profile_latrd_v2.py`):

- (4, 1152): 0.059 s vs v1 0.062 s — only 1.09x. The per-column VMEM
  traffic this variant removes is not the big class's critical path.
- (4, 2304) and up: fails to compile — "scoped allocation 29.33M exceeds
  16.00M". The MXU correction dots take the whole (2nb, KM) U/W panel as
  a matmul operand, which Mosaic materializes on the kernel stack (v1's
  elementwise multiply+reduce streams it instead); several overlapping
  materializations blow the scoped-vmem limit at KM >= 10240.

Not production. v1 (`latrd_pallas.tridiagonalize_pallas`) remains the
TPU default. Correctness is oracle-tested in interpret mode
(`tests/test_latrd_pallas.py::test_pallas_v2_*`).

Changes vs v1, for the record:

1. Segment corrections on the MXU: the two UW^T[:, c]-style correction
   sites become (8, 2nb) x (2nb, KM) dots + an 8-sublane masked sum,
   instead of materializing a (2nb, KM) `seg_bcast` product and reducing
   2nb sublanes on the VPU.
2. Deferred panel writes: the current 8 columns' v/w live in a small
   (16, KM) scratch (`vw8`) that flushes into the big U/W panel with one
   selector-matmul add every 8 columns, replacing the per-column
   full-buffer (2nb, KM) masked select.
3. Row-block caching: the 8-row aligned diagonal block serving columns
   [c8, c8+8) is fetched once per 8 columns into a (8, KM) buffer
   instead of K blocking DMA round-trips every column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from laplace_jax.ops.latrd_pallas import _KP, _cdiv

__all__ = ["tridiagonalize_pallas_v2"]


def _panel_kernel_v2(off_ref, A_ref, uwt_ref, out_ref,
                     *, K: int, m: int, nb: int, TR: int):
    KM = K * m
    dtype = uwt_ref.dtype
    off = off_ref[0]
    q_base = off_ref[1]
    n_real = off_ref[2]
    n_ch = m // TR
    uw = uwt_ref  # see _panel_kernel: VMEM budget forbids a separate panel

    def body(av, rowb, vw8, chunk_sc, sems, row_sem):
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, KM), 1)
        local = lanes % m
        kid8 = jax.lax.broadcasted_iota(jnp.int32, (_KP, KM), 0)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (_KP, KM), 1)
        sel = (lane8 // m == kid8).astype(dtype)
        eps_tiny = jnp.asarray(jnp.finfo(dtype).tiny * 1e4, dtype)

        uw[...] = jnp.zeros((2 * nb, KM), dtype)
        vw8[...] = jnp.zeros((2 * _KP, KM), dtype)
        sub_nb = jax.lax.broadcasted_iota(jnp.int32, (nb, 3 * _KP), 0)
        sub16 = jax.lax.broadcasted_iota(jnp.int32, (2 * _KP, KM), 0)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, KM), 0)

        def hdot(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)

        def seg_bcast(s8):
            return hdot(s8, sel)

        def seg_reduce(x):
            return jax.lax.dot_general(
                x, sel, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)

        def lane_pick(x, oneh):
            """(X, KM) x (8, KM) one-hot -> (X, 8) lane extraction."""
            return jax.lax.dot_general(
                x, oneh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)

        def corr_of(s_uw, s_vw):
            """sum_q uw[q,l] s_uw[q,k(l)] + vw8 analog -> (1, KM), on MXU."""
            P = hdot(s_uw.T, uw[...]) + hdot(s_vw.T, vw8[...])
            return jnp.sum(P * sel, axis=0, keepdims=True)

        def col_body(j, det_acc):
            c = off + j
            jrec = j % 8

            # ---- row block cache: fetch rows [c8, c8+8) of each k once per
            # 8 columns (off is 8-aligned: nb % 8 == 0)
            c8 = pl.multiple_of((c // 8) * 8, 8)

            @pl.when(c % 8 == 0)
            def _():
                for k in range(K):
                    cp = pltpu.make_async_copy(
                        A_ref.at[pl.ds(k * m + c8, 8), :],
                        rowb.at[:, k * m : (k + 1) * m],
                        row_sem,
                    )
                    cp.start()
                    cp.wait()

            row = jnp.sum(
                jnp.where(sub8 == c % 8, rowb[...], 0.0),
                axis=0, keepdims=True,
            )

            # ---- corrected column: col = row - U W^T[., c] - W U^T[., c]
            oneh = (lane8 == kid8 * m + c).astype(dtype)
            uw_row = lane_pick(uw[...], oneh)  # (2nb, 8)
            vw_row = lane_pick(vw8[...], oneh)  # (16, 8)
            sw = jnp.concatenate([uw_row[nb:], uw_row[:nb]], axis=0)
            svw = jnp.concatenate([vw_row[_KP:], vw_row[:_KP]], axis=0)
            col = row - corr_of(sw, svw)
            col = jnp.where(local < n_real - q_base, col, 0.0)

            # ---- Householder (identical to _panel_kernel) -----------------
            below = local > c
            x = jnp.where(below, col, 0.0)
            d_val = seg_reduce(jnp.where(local == c, col, 0.0))
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

            # ---- Av: stream A row chunks (same pipeline as _panel_kernel)
            v8 = jnp.broadcast_to(v, (_KP, KM))

            def get_dma(slot, t):
                return pltpu.make_async_copy(
                    A_ref.at[pl.ds(pl.multiple_of(t * TR, TR), TR), :],
                    chunk_sc.at[slot],
                    sems.at[slot],
                )

            def need(t):
                return (t * TR + TR - 1) % m > c

            @pl.when(need(0))
            def _():
                get_dma(0, 0).start()

            for k in range(K):
                vk = v8[:, k * m : (k + 1) * m]

                def chunk_body(i, _c, k=k, vk=vk):
                    t = k * n_ch + i

                    @pl.when((t + 1 < K * n_ch) & need(t + 1))
                    def _():
                        get_dma((t + 1) % 2, t + 1).start()

                    @pl.when(need(t))
                    def _():
                        get_dma(t % 2, t).wait()
                        part = jax.lax.dot_general(
                            vk, chunk_sc[t % 2],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        ).astype(dtype)
                        av[:, pl.ds(
                            pl.multiple_of(k * m + i * TR, TR), TR
                        )] = part
                    return _c

                jax.lax.fori_loop(0, n_ch, chunk_body, 0)
            Av = jnp.mean(av[...], axis=0, keepdims=True)
            Av = jnp.where(below, Av, 0.0)

            # ---- w = tau (Av - U (W^T v) - W (U^T v)), halved self-term --
            uwv = lane_pick(uw[...], v8 * sel)  # (2nb, 8)
            vwv = lane_pick(vw8[...], v8 * sel)  # (16, 8)
            sw2 = jnp.concatenate([uwv[nb:], uwv[:nb]], axis=0)
            svw2 = jnp.concatenate([vwv[_KP:], vwv[:_KP]], axis=0)
            Av = Av - corr_of(sw2, svw2)
            tau_b = seg_bcast(tau)
            w = tau_b * Av
            wv = seg_reduce(w * v)
            w = w - 0.5 * seg_bcast(tau * wv) * v
            w = jnp.where(below, w, 0.0)

            # ---- recent-column buffer write + amortized flush -------------
            vw8[...] = jnp.where(
                sub16 == jrec, jnp.broadcast_to(v, (2 * _KP, KM)),
                jnp.where(
                    sub16 == _KP + jrec, jnp.broadcast_to(w, (2 * _KP, KM)),
                    vw8[...],
                ),
            )

            @pl.when(jrec == 7)
            def _():
                # selector-matmul flush, amortized over 8 columns (a
                # dynamic-start sublane store lowers to stack copies):
                # M[q, r] scatters vw8 row r to uw row j8+r / nb+j8+(r-8);
                # the target rows are still zero, so an add suffices.
                j8 = j - 7
                q_i = jax.lax.broadcasted_iota(jnp.int32, (2 * nb, 2 * _KP), 0)
                r_i = jax.lax.broadcasted_iota(jnp.int32, (2 * nb, 2 * _KP), 1)
                M = (
                    ((r_i < _KP) & (q_i == j8 + r_i))
                    | ((r_i >= _KP) & (q_i == nb + j8 + r_i - _KP))
                ).astype(dtype)
                uw[...] = uw[...] + hdot(M, vw8[...])
                vw8[...] = jnp.zeros((2 * _KP, KM), dtype)

            det_row = jnp.concatenate([d_val, e_val, tau], axis=1)
            return jnp.where(sub_nb == j, det_row, det_acc)

        det = jax.lax.fori_loop(
            0, nb, col_body, jnp.zeros((nb, 3 * _KP), dtype)
        )
        out_ref[...] = det

    pl.run_scoped(
        body,
        av=pltpu.VMEM((_KP, KM), dtype),
        rowb=pltpu.VMEM((8, KM), dtype),
        vw8=pltpu.VMEM((2 * _KP, KM), dtype),
        chunk_sc=pltpu.VMEM((2, TR, m), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
        row_sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("K", "m", "nb", "TR", "interpret")
)
def _latrd_panel_v2(Aw, off, q_base, n_real, *, K, m, nb, TR=128,
                    interpret=False):
    dtype = Aw.dtype
    kernel = functools.partial(_panel_kernel_v2, K=K, m=m, nb=nb, TR=TR)
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
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scal, Aw.reshape(K * m, m))


@functools.partial(
    jax.jit, static_argnames=("nb", "n_classes", "interpret")
)
def tridiagonalize_pallas_v2(A: jnp.ndarray, nb: int = 64,
                             n_classes: int = 4, interpret: bool = False):
    """v2-kernel variant of `latrd_pallas.tridiagonalize_pallas` (same
    outputs/convention). Requires nb % 8 == 0 (the amortized panel flush);
    other configurations delegate to v1. See module docstring for status."""
    from laplace_jax.ops.latrd_pallas import tridiagonalize_pallas
    from laplace_jax.ops.tridiag import _bdiag

    K, n, _ = A.shape
    if n <= 2 or max(8, min(nb, n)) % 8 != 0:
        return tridiagonalize_pallas(A, nb=nb, n_classes=n_classes,
                                     interpret=interpret)
    with jax.default_matmul_precision("float32"):
        return _body_v2(A, _bdiag, nb=nb, n_classes=n_classes,
                        interpret=interpret)


def _body_v2(A, _bdiag, *, nb, n_classes, interpret):
    K, n, _ = A.shape
    dtype = A.dtype

    nb = max(8, min(nb, n))
    S = max(nb, 128, _cdiv(_cdiv(n, n_classes), 128) * 128)
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
        TR = 128
        n_panels = _cdiv(min(S, n_cols - q), nb)
        Aw = jax.lax.dynamic_slice(Ap, (0, q, q), (K, m, m))

        def class_body(t, carry, q=q, m=m, TR=TR):
            Aw, d, e, V, taus = carry
            off = t * nb
            UWT, det = _latrd_panel_v2(
                Aw, off, q, n, K=K, m=m, nb=nb, TR=TR,
                interpret=interpret,
            )
            U = jnp.transpose(UWT[:nb].reshape(nb, K, m), (1, 2, 0))
            W = jnp.transpose(UWT[nb:].reshape(nb, K, m), (1, 2, 0))
            dcol = jnp.transpose(det[:, :K], (1, 0))
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
