"""Exact diagonal curvature via layer taps — no full-Jacobian materialization.

The Jacobian-based `diag` path materializes J of shape (B, C, P), which is
infeasible for large P (a ResNet-18 batch-64 Jacobian is ~28 GB). The torch
reference sidesteps this with per-module extensions in BackPACK/ASDL
(`curvature/backpack.py:178-196`, `asdl.py:166-212`); this module is the
functional TPU equivalent: from the same tap/offset vjp machinery as KFAC, the
exact per-layer diagonal is

- Dense (2-D input, no weight sharing):
  ``diag_W[i,o] = Σ_{n,c} a_n[i]² g_{nc}[o]²`` (one einsum),
  ``diag_b[o] = Σ_{n,c} g_{nc}[o]²``;
- Conv / shared Dense (weight sharing over T positions):
  ``diag_W[k,o] = Σ_{n,c} (Σ_t patch_{nt}[k] g_{ntc}[o])²`` — computed with a
  `lax.map` over the batch so peak memory is per-layer C·K·O, never B·C·P.

Exactness matches the GGN/EF diagonal definitions used elsewhere
(`curvature/curvature.py:413-433`, `:495-505`); equality with the J-based path
is enforced by the test suite.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from laplace_jax.curvature.kfac import (
    _norm_xhat,
    _sqrt_hessian_cotangents,
    _under,
    conv_patches,
)
from laplace_jax.enums import Likelihood

__all__ = ["diag_curvature_taps", "TapUnsupported"]


class TapUnsupported(ValueError):
    """The model has trainable leaves outside intercepted layers — the exact
    tap diagonal is unavailable; callers fall back to the Jacobian path."""


def diag_curvature_taps(
    model,
    x,
    y,
    likelihood,
    lossfunc,
    curv_type: str = "ggn",  # 'ggn' (exact) | 'ef'
    last_layer_path: Optional[tuple] = None,
):
    """Exact diagonal GGN or empirical Fisher in canonical flat-vector order.

    Returns (loss, diag) with diag shaped (n_params,). The factor convention
    matches the J-based paths: GGN regression diag = Σ (J)² (Λ=I); EF uses the
    gradients of the *sum* loss (the reference's 2× regression convention).
    """
    train_params = model.train_params
    _, tap_shapes = jax.eval_shape(
        lambda tp, xx: model.apply_with_taps(tp, xx), train_params, x
    )
    if last_layer_path is not None:
        tap_shapes = [t for t in tap_shapes if t.path == last_layer_path]
    if not any(
        t.kind in ("dense", "conv", "dense_general", "embed", "unfactored")
        for t in tap_shapes
    ):
        raise TapUnsupported(
            "No Dense/Conv layers intercepted for diagonal curvature."
        )
    xleaf = jax.tree_util.tree_leaves(x)[0]
    varying_zero = (xleaf.ravel()[0] * 0).astype(jnp.float32)
    offsets = {
        t.path: jnp.zeros(t.outputs.shape, t.outputs.dtype)
        + varying_zero.astype(t.outputs.dtype)
        for t in tap_shapes
        if t.kind != "unfactored"  # exact per-leaf path needs no output tap
    }

    keep_paths = {t.path for t in tap_shapes}

    def f_of_offsets(offs):
        f2, taps2 = model.apply_with_taps(train_params, x, offs)
        taps2 = [t for t in taps2 if t.path in keep_paths]
        return f2, taps2

    f, vjp_fn, taps = jax.vjp(f_of_offsets, offsets, has_aux=True)
    dtype = f.dtype

    if curv_type == "ggn":
        if likelihood == Likelihood.REGRESSION:
            # Λ = I convention of the J-based GGN paths (no sum-MSE factor 2)
            C = f.shape[-1]
            eye = jnp.eye(C, dtype=dtype)
            cotangents = jnp.broadcast_to(
                eye[:, None, :], (C, f.shape[0], C)
            ).astype(dtype)
        else:
            cotangents = _sqrt_hessian_cotangents(f, likelihood, dtype)  # (C, B, C)
        g_stack = jax.vmap(lambda ct: vjp_fn(ct)[0])(cotangents)
        ct_sweeps = [(1.0, cotangents)]
    elif curv_type == "ef":
        if likelihood == Likelihood.REGRESSION:
            ct = 2.0 * (f - y)
        else:
            p = jax.nn.softmax(f, axis=-1)
            ct = p - jax.nn.one_hot(y, f.shape[-1], dtype=dtype)
        g_stack = {k: v[None] for k, v in vjp_fn(ct)[0].items()}  # (1, B, ..., O)
        ct_sweeps = [(1.0, ct[None])]
    else:
        raise ValueError(f"Unsupported curv_type {curv_type} for diag taps.")

    # per-layer diagonals
    kernel_diag, bias_diag = {}, {}
    norm_scale_diag, norm_bias_diag = {}, {}
    for t in taps:
        if t.kind == "unfactored":
            continue  # exact per-leaf path below; no output tap collected
        g = g_stack[t.path]  # (C', B, *lead, O) with C'=C (ggn) or 1 (ef)
        if t.kind == "norm":
            # exact per-sample norm-param grads from the output cotangents:
            # g_bias = Σ_pos g, g_scale = Σ_pos g ∘ x̂; diag = Σ_{c,b} g²
            xhat = _norm_xhat(t)
            red = tuple(range(2, g.ndim - 1))
            if t.bias is not None:
                norm_bias_diag[t.path] = (g.sum(red) ** 2).sum((0, 1))
            if t.scale is not None:
                norm_scale_diag[t.path] = ((g * xhat[None]).sum(red) ** 2).sum(
                    (0, 1)
                )
            continue
        if t.kind == "dense" and t.inputs.ndim == 2:
            a = t.inputs  # (B, I)
            kernel_diag[t.path] = jnp.einsum("bi,cbo->io", a**2, g**2)
            bias_diag[t.path] = jnp.einsum("cbo->o", g**2)
        elif t.kind == "embed":
            # per-sample embedding grad: rows of ids scatter-add their output
            # cotangents; diag = Σ_{c,b} (scattered)²
            ids = t.inputs  # (B, *pos)
            V = t.conv_spec["num_embeddings"]
            B = ids.shape[0]
            ids2 = ids.reshape(B, -1)  # (B, T)
            Cp = g.shape[0]
            g2 = g.reshape(Cp, B, ids2.shape[1], g.shape[-1])  # (C', B, T, D)

            def per_sample_embed(args):
                ids_b, g_b = args  # (T,), (C', T, D)
                G = jax.vmap(
                    lambda gc: jax.ops.segment_sum(gc, ids_b, num_segments=V)
                )(g_b)  # (C', V, D)
                return (G**2).sum(0)

            dE = jax.lax.map(
                per_sample_embed, (ids2, jnp.swapaxes(g2, 0, 1)), batch_size=8
            )
            kernel_diag[t.path] = dE.sum(0)
        elif t.kind == "dense_general":
            # DenseGeneral / Einsum: activation rows pre-normalized to
            # (B, T, K) in kernel order; cotangents flattened per the tap's
            # permutation metadata. Bias diag uses the (possibly different)
            # bias flatten order.
            from laplace_jax.curvature.kfac import _dg_grad_rows

            a2 = t.patches  # (B, T, K)
            spec = t.conv_spec
            Cp, B = g.shape[0], a2.shape[0]
            g_k = _dg_grad_rows(g, spec).reshape(Cp, B, a2.shape[1], -1)
            g_b = _dg_grad_rows(g, spec, for_bias=True).reshape(
                Cp, B, a2.shape[1], -1
            )

            def per_sample_dg(args):
                a_b, gk_b, gb_b = args  # (T, K), (C', T, O), (C', T, O)
                M = jnp.einsum("tk,cto->cko", a_b, gk_b)
                return (M**2).sum(0), (gb_b.sum(1) ** 2).sum(0)

            dK, dB = jax.lax.map(
                per_sample_dg,
                (a2, jnp.swapaxes(g_k, 0, 1), jnp.swapaxes(g_b, 0, 1)),
                batch_size=8,
            )
            dK = dK.sum(0)  # (K, O)
            if spec.get("kernel_layout") == "ok":
                # feature-major kernel flatten: entries run O-major
                dK = dK.T
            kernel_diag[t.path] = dK
            bias_diag[t.path] = dB.sum(0)
        else:
            groups = 1
            if t.kind == "dense":  # weight sharing over leading dims
                a2 = t.inputs.reshape(t.inputs.shape[0], -1, t.inputs.shape[-1])
            else:
                if t.patches is not None:
                    a2 = t.patches.reshape(
                        t.patches.shape[0], -1, t.patches.shape[-1]
                    )
                else:
                    a2 = conv_patches(t.inputs, t.conv_spec)
                groups = int(t.conv_spec.get("feature_group_count") or 1)
            Cp = g.shape[0]
            B = a2.shape[0]
            g2 = g.reshape(Cp, B, -1, g.shape[-1])  # (C', B, T, O)

            if groups == 1:

                def per_sample(args):
                    a_b, g_b = args  # (T, K), (C', T, O)
                    M = jnp.einsum("tk,cto->cko", a_b, g_b)
                    return (M**2).sum(0), (g_b.sum(1) ** 2).sum(0)

            else:
                # grouped conv: out channel o (group-major blocks) pairs
                # only with its group's patches; the per-sample kernel grad
                # is exact per (group, k, o-within-group)
                from laplace_jax.curvature.kfac import group_patches

                ksize = t.conv_spec["kernel_size"]
                opg = g.shape[-1] // groups
                a2 = group_patches(a2, ksize, groups)  # (B, T, G, Kg)

                def per_sample(args):
                    a_b, g_b = args  # (T, G, Kg), (C', T, O)
                    g_g = g_b.reshape(g_b.shape[0], g_b.shape[1], groups, opg)
                    M = jnp.einsum("tgk,ctgo->cgko", a_b, g_g)
                    dK = (M**2).sum(0)  # (G, Kg, opg)
                    dK = jnp.moveaxis(dK, 0, 1).reshape(
                        dK.shape[1], groups * opg
                    )
                    return dK, (g_b.sum(1) ** 2).sum(0)

            dK, dB = jax.lax.map(
                per_sample, (a2, jnp.swapaxes(g2, 0, 1)), batch_size=8
            )
            dK = dK.sum(0)
            if t.kind == "conv" and t.mask is not None:
                # masked conv: ∂f/∂W = mask ∘ (patch·grad), so the exact
                # per-entry diagonal carries mask² (0/1 masks zero the
                # frozen entries). kernel flatten (kh, kw, cpg, cout)
                # matches dK's (K, O) layout in both the grouped and
                # ungrouped branches.
                m = t.mask.reshape(-1, dK.shape[-1])
                dK = dK * (m * m)
            kernel_diag[t.path] = dK
            bias_diag[t.path] = dB.sum(0)

    # exact per-leaf diagonals for non-factorizable ("unfactored") layers:
    # DenseGeneral batch_dims, interleaved einsum labels, kernel batch axes.
    # Differentiates the model w.r.t. the leaves themselves per sample — the
    # same exact definition as the tap formulas, without layer structure.
    from laplace_jax.curvature.kfac import _exact_leaf_diags

    unf_specs = []
    for spec in model.leaf_specs:
        if last_layer_path is not None and not _under(
            spec.path, last_layer_path
        ):
            continue
        if any(
            t.kind == "unfactored" and _under(spec.path, t.path) for t in taps
        ):
            unf_specs.append(spec)
    unf_diag = (
        _exact_leaf_diags(model, train_params, x, ct_sweeps, unf_specs, dtype)
        if unf_specs
        else {}
    )

    # assemble in canonical leaf order
    parts = []
    for spec in model.leaf_specs:
        path, role = spec.path, spec.path[-1]
        if last_layer_path is not None and not _under(path, last_layer_path):
            continue
        matched = None
        for t in taps:
            if _under(path, t.path):
                matched = t
                break
        if matched is None:
            raise TapUnsupported(
                f"Trainable parameter {path} does not belong to an intercepted "
                "Dense/Conv/norm layer; use the Jacobian-based diag path."
            )
        if matched.kind == "unfactored":
            parts.append(unf_diag[path])
        elif matched.kind == "norm":
            if role == "scale" and matched.path in norm_scale_diag:
                parts.append(norm_scale_diag[matched.path].ravel())
            elif role == "bias" and matched.path in norm_bias_diag:
                parts.append(norm_bias_diag[matched.path].ravel())
            else:
                raise ValueError(
                    f"Unsupported norm parameter role {role} for diag taps."
                )
        elif role in ("kernel", "embedding"):
            parts.append(kernel_diag[matched.path].ravel())
        elif role == "bias":
            parts.append(bias_diag[matched.path].ravel())
        else:
            raise ValueError(f"Unsupported parameter role {role}.")

    loss = lossfunc(f, y)
    return loss, jnp.concatenate(parts)
