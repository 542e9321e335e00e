"""Pallas TPU kernel for the LATRD panel factorization — the sequential
per-column inner loop of blocked Householder tridiagonalization.

Why: the XLA formulation (`laplace_jax.ops.tridiag.tridiagonalize`) pays
~45 HLO ops per column at ~2.4 us/op of per-op dispatch overhead (measured
on v5e, `scripts/profile_matvec_width.py`: the folded trailing matvec
already runs at ~97% of HBM peak, so the gap between the measured 1.58 s
stage-1 and its ~0.7 s HBM roofline on the ResNet-18 KFAC factor set is
almost entirely op-issue overhead). Inside one Pallas kernel the per-column
work is VLIW code with the LATRD U/W panel resident in VMEM, so a panel
costs its HBM streaming plus a few microseconds per column.

Kernel design (see `/opt/skills/guides/pallas_guide.md`):

- The trailing window stays in HBM (`pl.ANY`); the per-column matvec A @ v
  streams it in (TR, m) row chunks with double-buffered async DMA. Chunks
  whose rows are entirely above the current column are SKIPPED (`pl.when`),
  which recovers most of the staircase waste of coarse window classes.
- The U/W panel is ONE (2 nb, K*m) VMEM scratch (`uw`), rows = reflector /
  w index, lanes = flattened (k, row). Per-column row writes are contiguous.
- All per-k broadcasts and segment reductions go through a static selector
  matrix `sel[k, l] = (l // m == k)` on the MXU — no lane<->sublane
  relayouts anywhere: the chunk product is computed directly in lane layout
  as dot_general(v_bcast (8, m), chunk (TR, m)) -> (8, TR).
- Row/column validity comes from a static `local = lane % m` iota compared
  against the dynamic column index.

Output convention matches `tridiag.tridiagonalize` exactly (Householder
sign and trivial-reflector rules), so `apply_q` and the D&C stage 2
(`tridiag_eig`) consume it unchanged. Reference math consumed downstream:
`/root/reference/laplace/utils/matrix.py:123-150`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["latrd_panel", "tridiagonalize_pallas"]

_KP = 8  # per-k scalar blocks are padded to 8 sublanes/lanes


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _panel_kernel(off_ref, A_ref, uwt_ref, out_ref,
                  *, K: int, m: int, nb: int, TR: int):
    KM = K * m
    dtype = uwt_ref.dtype
    off = off_ref[0]  # panel's first window-relative column
    q_base = off_ref[1]  # window start (global)
    n_real = off_ref[2]  # true (unpadded) n
    n_ch = m // TR

    # the U/W panel works directly in the output ref (uwt_ref): a separate
    # VMEM scratch would double the panel's footprint and blows the 16 MB
    # scoped-vmem limit at the (3, 4608) bench class (KM=13824: 7.08 MB each)
    uw = uwt_ref

    def body(av, row_sc, chunk_sc, sems, row_sem):
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
            # DMA slices must be 8-sublane aligned, so fetch the aligned
            # 8-row block around c and mask-select the wanted row.
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

            # ---- Av: stream A row chunks (double-buffered, skip rows <= c)
            v8 = jnp.broadcast_to(v, (_KP, KM))

            def get_dma(slot, t):
                return pltpu.make_async_copy(
                    A_ref.at[pl.ds(pl.multiple_of(t * TR, TR), TR), :],
                    chunk_sc.at[slot],
                    sems.at[slot],
                )

            # chunk t covers flat rows [t TR, (t+1) TR); TR | m, so a chunk
            # never crosses a k boundary. Skip chunks with no row > c.
            def need(t):
                return (t * TR + TR - 1) % m > c

            @pl.when(need(0))
            def _():
                get_dma(0, 0).start()

            # static python loop over k keeps the v lane-slice static; the
            # double-buffer pipeline hands off across k via the global t.
            for k in range(K):
                vk = v8[:, k * m : (k + 1) * m]  # static (8, m)

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
                        ).astype(dtype)  # (8, TR)
                        av[:, pl.ds(
                            pl.multiple_of(k * m + i * TR, TR), TR
                        )] = part
                    return _c

                jax.lax.fori_loop(0, n_ch, chunk_body, 0)
            # all 8 av sublanes are identical (v8 rows are); a mean avoids a
            # size-1 sublane slice, which Mosaic rejects
            Av = jnp.mean(av[...], axis=0, keepdims=True)
            Av = jnp.where(below, Av, 0.0)  # skipped chunks hold stale data

            # ---- w = tau (Av - U (W^T v) - W (U^T v)), halved self-term --
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

            # single-row vector stores are not tileable on TPU (sublane
            # slices must be multiples of 8); write rows j and nb+j with one
            # full-buffer masked select (a pure-VMEM VPU pass, ~2 us)
            uw[...] = jnp.where(
                sub_uw == j, jnp.broadcast_to(v, (2 * nb, KM)),
                jnp.where(
                    sub_uw == nb + j, jnp.broadcast_to(w, (2 * nb, KM)),
                    uw[...],
                ),
            )

            # d/e/tau row j of the (nb, 24) accumulator (carried value)
            det_row = jnp.concatenate([d_val, e_val, tau], axis=1)
            return jnp.where(sub_nb == j, det_row, det_acc)

        det = jax.lax.fori_loop(
            0, nb, col_body, jnp.zeros((nb, 3 * _KP), dtype)
        )
        out_ref[...] = det

    pl.run_scoped(
        body,
        av=pltpu.VMEM((_KP, KM), dtype),
        row_sc=pltpu.VMEM((8, m), dtype),
        chunk_sc=pltpu.VMEM((2, TR, m), dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
        row_sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit, static_argnames=("K", "m", "nb", "TR", "interpret")
)
def latrd_panel(Aw, off, q_base, n_real, *, K, m, nb, TR=128,
                interpret=False):
    """One LATRD panel on the (K, m, m) trailing window `Aw`, columns
    [off, off + nb) (window-relative, traced). Returns
    (UWT (2nb, K*m), det (nb, 24)) with det columns [d(8) | e(8) | tau(8)]
    carrying per-k values in the first K slots."""
    dtype = Aw.dtype
    kernel = functools.partial(_panel_kernel, K=K, m=m, nb=nb, TR=TR)
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
def tridiagonalize_pallas(A: jnp.ndarray, nb: int = 64, n_classes: int = 4,
                          interpret: bool = False):
    """Drop-in for `tridiag.tridiagonalize` with the panel inner loop as a
    Pallas kernel. Same outputs/convention; `apply_q` consumes V/taus
    unchanged.

    The trailing rank-2nb update between panels stays in XLA (it is a
    clean MXU matmul). Window classes shrink the streamed window in
    `n_classes` static steps; the kernel's chunk skipping recovers the
    within-class staircase, so fewer classes (default 4) trade compile
    count for negligible extra traffic.

    The trailing updates MUST run at f32 matmul precision: at TPU
    default (bf16 passes) the ~1e-3 window error is amplified by the
    next panel's Householder normalizations into O(1) divergence —
    single panels are clean, multi-panel runs are not. The kernel's own
    dots are already pinned HIGHEST.
    """
    from laplace_jax.ops.tridiag import _bdiag

    K, n, _ = A.shape
    dtype = A.dtype
    if n <= 2:
        from laplace_jax.ops.tridiag import tridiagonalize

        return tridiagonalize(A, nb=nb)
    with jax.default_matmul_precision("float32"):
        return _tridiagonalize_pallas_body(
            A, _bdiag, nb=nb, n_classes=n_classes, interpret=interpret
        )


def _tridiagonalize_pallas_body(A, _bdiag, *, nb, n_classes, interpret):
    K, n, _ = A.shape
    dtype = A.dtype

    nb = max(8, min(nb, n))
    # S (and so n_pad, every window size m, and every k*m lane offset) is a
    # multiple of 128 so all kernel slices sit on TPU tile boundaries
    S = max(nb, 128, _cdiv(_cdiv(n, n_classes), 128) * 128)
    n_pad = _cdiv(n, S) * S
    Ap = jnp.zeros((K, n_pad, n_pad), dtype).at[:, :n, :n].set(A)
    d = jnp.zeros((K, n_pad), dtype)
    e = jnp.zeros((K, n_pad), dtype)
    V = jnp.zeros((K, n_pad, n_pad), dtype)
    # padded like d/e: panel writes are nb wide, and a tail panel's
    # dynamic_update_slice start would otherwise CLAMP and spray the write
    # over earlier columns
    taus = jnp.zeros((K, n_pad), dtype)
    n_cols = n - 2

    q = 0
    while q < n_cols:
        m = n_pad - q
        TR = 128  # m is a multiple of 128 by construction
        n_panels = _cdiv(min(S, n_cols - q), nb)
        Aw = jax.lax.dynamic_slice(Ap, (0, q, q), (K, m, m))

        def class_body(t, carry, q=q, m=m, TR=TR):
            Aw, d, e, V, taus = carry
            off = t * nb
            UWT, det = latrd_panel(
                Aw, off, q, n, K=K, m=m, nb=nb, TR=TR,
                interpret=interpret,
            )
            # unpack: U rows [0, nb), W rows [nb, 2nb) -> (K, m, nb)
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
