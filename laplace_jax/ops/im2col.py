"""Slice-based im2col: convolution patches without any conv primitive.

Why this exists: every curvature computation differentiates through the model,
and conv backward ops (kernel-grad / transposed convs) are the slowest-compiling
primitives on the TPU toolchain by a wide margin. Expressing a conv as
``patches(x) @ W_flat`` turns its entire autodiff into matmul transposes plus
slice/pad transposes — MXU-friendly and fast to compile. KFAC additionally needs
the patches anyway for its activation factor (`curvature/kfac.py`), so the
rewrite shares them.

The patch feature axis is ordered (kh, kw, C_in) row-major, matching the flax
kernel flatten (kh, kw, C_in, C_out) -> (K, C_out).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["im2col", "conv_output_shape", "resolve_padding"]


def resolve_padding(padding, in_shape: Sequence[int], ksize: Sequence[int],
                    strides: Sequence[int], dilation: Sequence[int]) -> list:
    """Per-spatial-dim (lo, hi) padding from 'SAME'/'VALID'/explicit pairs,
    matching `lax.conv_general_dilated` semantics."""
    n = len(ksize)
    eff_k = [d * (k - 1) + 1 for k, d in zip(ksize, dilation)]
    if isinstance(padding, str):
        p = padding.upper()
        if p == "VALID":
            return [(0, 0)] * n
        if p == "SAME":
            pads = []
            for i in range(n):
                out = -(-in_shape[i] // strides[i])  # ceil
                total = max((out - 1) * strides[i] + eff_k[i] - in_shape[i], 0)
                pads.append((total // 2, total - total // 2))
            return pads
        raise ValueError(f"Unsupported padding {padding} for im2col rewrite.")
    # explicit: int or sequence of (lo, hi)
    if isinstance(padding, int):
        return [(padding, padding)] * n
    pads = []
    for p in padding:
        if isinstance(p, int):
            pads.append((p, p))
        else:
            pads.append((int(p[0]), int(p[1])))
    return pads


def conv_output_shape(in_shape, ksize, strides, pads, dilation):
    eff_k = [d * (k - 1) + 1 for k, d in zip(ksize, dilation)]
    return [
        (in_shape[i] + pads[i][0] + pads[i][1] - eff_k[i]) // strides[i] + 1
        for i in range(len(ksize))
    ]


def im2col(x: jnp.ndarray, ksize, strides, padding, dilation=None,
           input_dilation=None) -> jnp.ndarray:
    """Extract conv patches via pad + strided slices (no conv primitive).

    x: (B, *spatial, C). Returns (B, *out_spatial, prod(ksize)*C) with the
    feature axis ordered (k_0, ..., k_{n-1}, C) row-major.

    `input_dilation` (lhs dilation, the transposed-conv upsampling) inserts
    zeros between input elements before patch extraction, matching
    `lax.conv_general_dilated` lhs_dilation semantics.
    """
    nspatial = x.ndim - 2
    ksize = tuple(ksize)
    strides = tuple(strides)
    dilation = tuple(dilation) if dilation else (1,) * nspatial
    if input_dilation:
        if isinstance(input_dilation, int):
            input_dilation = (input_dilation,) * nspatial
        if any(d != 1 for d in input_dilation):
            cfg = [(0, 0, 0)]
            for d in input_dilation:
                cfg.append((0, 0, int(d) - 1))
            cfg.append((0, 0, 0))
            x = jax.lax.pad(x, jnp.zeros((), x.dtype), cfg)
    in_shape = x.shape[1:-1]
    pad_mode = "constant"
    if isinstance(padding, str) and padding.upper() == "CIRCULAR":
        # flax CIRCULAR semantics: wrap-pad by the dilated kernel extent,
        # then VALID (flax `linear.py` Conv handles CIRCULAR the same way)
        eff_k = [d * (k - 1) + 1 for k, d in zip(ksize, dilation)]
        pads = [((e - 1) // 2, e // 2) for e in eff_k]
        pad_mode = "wrap"
    else:
        pads = resolve_padding(padding, in_shape, ksize, strides, dilation)
    out_shape = conv_output_shape(in_shape, ksize, strides, pads, dilation)

    pad_widths = [(0, 0)] + list(pads) + [(0, 0)]
    xp = jnp.pad(x, pad_widths, mode=pad_mode)
    B, C = x.shape[0], x.shape[-1]

    # iterate over kernel offsets row-major; each offset is one strided slice
    import itertools

    cols = []
    for offs in itertools.product(*[range(k) for k in ksize]):
        start = [0] + [offs[i] * dilation[i] for i in range(nspatial)] + [0]
        limit = [B] + [
            offs[i] * dilation[i] + (out_shape[i] - 1) * strides[i] + 1
            for i in range(nspatial)
        ] + [C]
        step = [1] + list(strides) + [1]
        cols.append(jax.lax.slice(xp, start, limit, step))
    return jnp.concatenate(cols, axis=-1)
