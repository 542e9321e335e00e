"""KFAC factor computation via functional layer taps.

The reference obtains KFAC factors from backward hooks planted by curvlinops/ASDL
(`laplace/curvature/curvlinops.py:55-108`, `asdl.py:214-251`). The TPU-native
equivalent is hook-free: the flax interceptor adds a zero "offset" to every
Dense/Conv output (see `NNModel.apply_with_taps`), and one `jax.vjp` w.r.t. those
offsets yields the per-layer output gradients. Factor accumulation is then a
couple of batched matmuls per layer — exactly the MXU-friendly shape.

Normalization contract (pinned by the reference's KFAC tests — single-point
exactness, batch additivity, N-proportionality; see
`tests/test_curv_backends_asdl.py:296-360`):

- activation factor  ``A = (1/(N·T)) Σ_{n,t} a a^T``  (T = weight-sharing /
  spatial positions; T=1 for Dense on 2-D inputs — "expand" KFAC)
- gradient factor    ``B = Σ_{s} Σ_{n,t} g g^T`` (averaged over MC samples s)
- bias group uses ``[B]`` alone; Dense kernel group is ``(A, B)`` with the
  input-major A ⊗ B dense-block convention of `laplace_jax.utils.matrix.Kron`.

Fisher types mirror the reference backends: ``exact`` (square-root loss Hessian
backprop, curvlinops FisherType.TYPE2), ``mc`` (sampled labels,
FisherType.MC), ``empirical`` (actual-label loss gradients, FisherType.EMPIRICAL).

Masked convs (flax ``nn.Conv(mask=...)``): KFAC uses the standard (A, B)
factors of the unmasked layer — a Kronecker product cannot represent the
zeroed rows/cols of mask-frozen entries, so frozen entries receive the
approximate (spurious, nonzero) A ⊗ B curvature of the dense product rather
than prior-only precision, which slightly perturbs the KFAC log-det/marglik
relative to an exactly-masked curvature. Functionally this is harmless:
posterior samples drawn for frozen entries are inert because the mask
multiplies them out in the forward pass. The *exact* paths (tap diagonal in
`diag_taps.py`, all J-based GGN/EF/Hessian paths) carry the mask exactly.
The torch reference has no masked-conv concept.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from laplace_jax.enums import Likelihood
from laplace_jax.utils.matrix import Kron

__all__ = ["kfac_factors", "conv_patches", "group_patches"]


def group_patches(patches: jnp.ndarray, ksize, groups: int) -> jnp.ndarray:
    """Regroup a (..., kh*kw*cin) patch feature axis (layout (kh, kw, cin)
    row-major, cin in consecutive groups — XLA conv group semantics) into
    (..., groups, kh*kw*cin_per_group), each group matching the grouped-conv
    kernel flatten (kh, kw, cin/groups)."""
    kprod = 1
    for k in ksize:
        kprod *= int(k)
    cin = patches.shape[-1] // kprod
    cpg = cin // groups
    lead = patches.shape[:-1]
    p = patches.reshape(*lead, kprod, groups, cpg)
    p = jnp.moveaxis(p, -2, len(lead))
    return p.reshape(*lead, groups, kprod * cpg)


def conv_patches(inputs: jnp.ndarray, spec: dict) -> jnp.ndarray:
    """Extract convolution patches ordered to match the flax kernel flatten.

    flax Conv kernels are (kh, kw, in, out); the canonical row-major flatten of
    the leading dims is (kh, kw, in). `conv_general_dilated_patches` returns the
    feature axis in (in, kh, kw) order, so we permute.

    Returns patches of shape (batch, T, kh*kw*in) with T = #spatial positions.
    """
    ksize = tuple(spec["kernel_size"])
    nspatial = len(ksize)
    c_in = inputs.shape[-1]
    pad = spec["padding"]
    if isinstance(pad, str) and pad.upper() == "CIRCULAR":
        # lax's patch extractor has no circular mode; the slice-based im2col
        # does, and already emits the (kh, kw, cin) feature order
        from laplace_jax.ops.im2col import im2col

        in_dil = spec.get("input_dilation")
        dilated = in_dil not in (None, 1) and (
            isinstance(in_dil, int) or any(int(d) != 1 for d in in_dil)
        )
        if dilated:
            # flax rejects string padding + lhs dilation at forward time, so
            # no valid model reaches here; raise rather than silently
            # computing patches of the undilated input
            raise ValueError(
                "CIRCULAR padding with input_dilation has no defined conv "
                "semantics (flax rejects it); cannot extract patches."
            )
        kdil = spec.get("kernel_dilation")
        if kdil is None or isinstance(kdil, int):
            kdil = (kdil or 1,) * nspatial
        p = im2col(inputs, ksize, tuple(spec["strides"]), pad, tuple(kdil))
        return p.reshape(p.shape[0], -1, p.shape[-1])
    lhs_spec = "N" + "HWD"[:nspatial] + "C"
    rhs_spec = "HWD"[:nspatial] + "IO"
    def _norm_dilation(d):
        if d is None:
            return None
        if isinstance(d, int):
            return None if d == 1 else (d,) * nspatial
        return tuple(d)

    patches = jax.lax.conv_general_dilated_patches(
        lhs=inputs,
        filter_shape=ksize,
        window_strides=tuple(spec["strides"]),
        padding=spec["padding"],
        lhs_dilation=_norm_dilation(spec.get("input_dilation")),
        rhs_dilation=_norm_dilation(spec.get("kernel_dilation")),
        dimension_numbers=(lhs_spec, rhs_spec, lhs_spec),
    )
    B = patches.shape[0]
    spatial_out = patches.shape[1:-1]
    T = 1
    for s in spatial_out:
        T *= s
    # feature axis ordered (c_in, kh, kw) -> reorder to (kh, kw, c_in)
    patches = patches.reshape(B, T, c_in, *ksize)
    perm = (0, 1) + tuple(range(3, 3 + nspatial)) + (2,)
    patches = jnp.transpose(patches, perm).reshape(B, T, -1)
    return patches


def _sqrt_hessian_cotangents(f: jnp.ndarray, likelihood, dtype) -> jnp.ndarray:
    """Columns of S with S S^T = ∂²(sum-loss)/∂f² per sample, shaped (C, B, C).

    classification: Λ = diag(p) - p pᵀ = Σ_c p_c (e_c - p)(e_c - p)ᵀ, so
    S[:, c] = √p_c (e_c - p). regression: sum-MSE Hessian is 2I, S = √2·I.
    """
    C = f.shape[-1]
    eye = jnp.eye(C, dtype=dtype)
    if likelihood == Likelihood.REGRESSION:
        return jnp.broadcast_to(
            (jnp.sqrt(2.0) * eye)[:, None, :], (C, f.shape[0], C)
        ).astype(dtype)
    p = jax.nn.softmax(f, axis=-1)
    # S_cot[c, b, :] = sqrt(p[b, c]) * (e_c - p[b])
    return jnp.sqrt(p.T)[:, :, None] * (eye[:, None, :] - p[None, :, :])


def kfac_factors(
    model,
    x,
    y,
    N: int,
    likelihood,
    lossfunc,
    fisher_type: str = "exact",
    num_samples: int = 1,
    key: Optional[jax.Array] = None,
    last_layer_path: Optional[tuple] = None,
    unsupported: str = "skip",
    block_max_params: int = 8192,
):
    """Compute per-batch KFAC `Kron` factors and the (unscaled) batch loss.

    `unsupported` controls parameters outside Dense/Conv layers (norm scales
    and biases, or anything else):

    - ``"skip"`` (default): zero curvature block with a warning — the posterior
      for those weights falls back to the prior, matching the reference's
      skip-with-warning behavior (`laplace/curvature/asdl.py:137-138`).
    - ``"block"``: exact dense 1-factor Fisher blocks for unsupported leaves
      (no torch backend has this). Norm-layer scale/bias blocks come from the
      same single vjp sweep; any OTHER unsupported leaf (e.g. an `nn.Einsum`
      kernel whose equation has no 2-factor-group flatten) with at most
      `block_max_params` parameters gets an exact block via per-sample vjps
      w.r.t. the leaf itself — one whole-model backward per (sample,
      cotangent), so reserve it for small exotic leaves. Larger leaves fall
      back to zero blocks + warning.
    - ``"raise"``: hard error (the strict pre-round-2 behavior).
    """
    train_params = model.train_params
    # shape-only probe (no compute) to size the offsets
    _, tap_shapes = jax.eval_shape(
        lambda tp, xx: model.apply_with_taps(tp, xx), train_params, x
    )
    if last_layer_path is not None:
        tap_shapes = [t for t in tap_shapes if t.path == last_layer_path]
    want_norm_taps = unsupported == "block"
    tap_shapes = [
        t for t in tap_shapes if t.kind != "norm" or want_norm_taps
    ]
    if not any(
        t.kind in ("dense", "conv", "dense_general", "embed", "unfactored")
        for t in tap_shapes
    ):
        raise ValueError("No Dense/Conv layers intercepted for KFAC.")
    # tie the zero offsets to x's device-varying-ness: under shard_map's
    # varying-manual-axes semantics, differentiating w.r.t. an UNVARYING value
    # auto-inserts a psum on its cotangent, which would double-reduce the
    # per-shard output gradients. `0 * x[...]` is folded away by XLA outside
    # shard contexts.
    xleaf = jax.tree_util.tree_leaves(x)[0]
    varying_zero = (xleaf.ravel()[0] * 0).astype(jnp.float32)
    offsets = {
        t.path: jnp.zeros(t.outputs.shape, t.outputs.dtype)
        + varying_zero.astype(t.outputs.dtype)
        for t in tap_shapes
        if t.kind != "unfactored"  # exact-block leaves need no cotangent tap
    }

    # ONE forward pass: primal outputs + taps (activations/patches) as vjp aux
    keep_paths = {t.path for t in tap_shapes}

    def f_of_offsets(offs):
        f2, taps2 = model.apply_with_taps(train_params, x, offs)
        taps2 = [t for t in taps2 if t.path in keep_paths]
        return f2, taps2

    f, vjp_fn, taps = jax.vjp(f_of_offsets, offsets, has_aux=True)
    dtype = f.dtype

    # ---- output-gradient cotangent sweeps -----------------------------------
    # unified across fisher types: list of (weight, g_dict) where g_dict maps
    # path -> cotangent-grads with a leading sweep axis
    # ct_sweeps mirrors g_sweeps with the raw output cotangents (K, B, C);
    # only consumed by the generic exact-block path (unsupported="block"),
    # so default runs trace no extra ops
    if fisher_type == "exact":
        cotangents = _sqrt_hessian_cotangents(f, likelihood, dtype)  # (C, B, C)
        g_sweeps = [(1.0, jax.vmap(lambda ct: vjp_fn(ct)[0])(cotangents))]
        ct_sweeps = [(1.0, cotangents)]
    elif fisher_type == "mc":
        key = jax.random.key(0) if key is None else key
        g_sweeps = []
        ct_sweeps = []
        for s in range(num_samples):
            k = jax.random.fold_in(key, s)
            if likelihood == Likelihood.REGRESSION:
                ct = jnp.sqrt(2.0) * jax.random.normal(k, f.shape, dtype=dtype)
            else:
                p = jax.nn.softmax(f, axis=-1)
                cls = jax.random.categorical(k, f, axis=-1)
                ct = p - jax.nn.one_hot(cls, f.shape[-1], dtype=dtype)
            g = vjp_fn(ct)[0]
            g_sweeps.append(
                (1.0 / num_samples, {p_: gl[None] for p_, gl in g.items()})
            )
            ct_sweeps.append((1.0 / num_samples, ct[None]))
    elif fisher_type == "empirical":
        if likelihood == Likelihood.REGRESSION:
            ct = 2.0 * (f - y)
        else:
            p = jax.nn.softmax(f, axis=-1)
            ct = p - jax.nn.one_hot(y, f.shape[-1], dtype=dtype)
        g = vjp_fn(ct)[0]
        g_sweeps = [(1.0, {p_: gl[None] for p_, gl in g.items()})]
        ct_sweeps = [(1.0, ct[None])]
    else:
        raise ValueError(f"Unknown fisher_type {fisher_type}.")

    norm_paths = {t.path for t in taps if t.kind == "norm"}
    dg_specs = {t.path: t.conv_spec for t in taps if t.kind == "dense_general"}

    # ---- B factors (Dense/Conv output-gradient covariances) -----------------
    # dense_general (DenseGeneral / Einsum) cotangents may carry several
    # feature axes in non-kernel order: flatten them via the tap's metadata.
    # When kernel and bias flatten orders differ (exotic einsum outputs), a
    # separately-ordered bias factor is kept in B_facs_bias.
    B_facs: dict = {}
    B_facs_bias: dict = {}
    for w, gd in g_sweeps:
        for p_, gl in gd.items():
            if p_ in norm_paths:
                continue
            if p_ in dg_specs:
                spec = dg_specs[p_]
                contrib = w * _grad_cov(_dg_grad_rows(gl, spec))
                B_facs[p_] = contrib if p_ not in B_facs else B_facs[p_] + contrib
                if spec["g_perm"] != spec["g_perm_bias"]:
                    cb = w * _grad_cov(_dg_grad_rows(gl, spec, for_bias=True))
                    B_facs_bias[p_] = (
                        cb if p_ not in B_facs_bias else B_facs_bias[p_] + cb
                    )
                continue
            contrib = w * _grad_cov(gl)
            B_facs[p_] = contrib if p_ not in B_facs else B_facs[p_] + contrib

    # ---- exact dense blocks for norm-layer scale/bias -----------------------
    # per-sample grads: g_bias = Σ_pos g_out, g_scale = Σ_pos g_out ∘ x̂ — the
    # block Σ_{sweep,b} g gᵀ is the exact diagonal Fisher block for that leaf
    norm_blocks: dict = {}
    for t in taps:
        if t.kind != "norm":
            continue
        xhat = _norm_xhat(t)
        Hb = Hs = None
        for w, gd in g_sweeps:
            gl = gd[t.path]  # (K, B, pos..., Cf)
            red = tuple(range(2, gl.ndim - 1))
            gb = gl.sum(red)
            gs = (gl * xhat[None]).sum(red)
            cb = w * jnp.einsum("kbc,kbd->cd", gb, gb)
            cs = w * jnp.einsum("kbc,kbd->cd", gs, gs)
            Hb = cb if Hb is None else Hb + cb
            Hs = cs if Hs is None else Hs + cs
        if t.bias is not None:
            norm_blocks[(t.path, "bias")] = Hb
        if t.scale is not None:
            norm_blocks[(t.path, "scale")] = Hs

    # ---- activation factors A per layer ------------------------------------
    A_facs = {}
    for t in taps:
        if t.kind in ("norm", "unfactored"):
            continue  # norm: exact blocks above; unfactored: blocks below
        if t.kind == "dense_general":
            # activation rows already normalized to (B, T, K) in kernel order
            p = t.patches
            A_facs[t.path] = jnp.einsum("btk,btl->kl", p, p) / (N * p.shape[1])
            continue
        if t.kind == "embed":
            # one-hot activations: the Gram is diagonal with token counts
            ids = t.inputs
            V = t.conv_spec["num_embeddings"]
            T = max(int(ids.size) // int(ids.shape[0]), 1)
            counts = (
                jnp.zeros((V,), dtype=dtype).at[ids.ravel()].add(1.0)
            )
            A_facs[t.path] = jnp.diag(counts) / (N * T)
            continue
        if t.kind == "dense":
            a = t.inputs
            if a.ndim == 2:
                A = jnp.einsum("bi,bj->ij", a, a) / N
            else:  # weight sharing over leading dims: expand-KFAC
                a2 = a.reshape(-1, a.shape[-1])
                T = a2.shape[0] // a.shape[0]
                A = jnp.einsum("bi,bj->ij", a2, a2) / (N * T)
        else:  # conv: reuse the im2col patches from the matmul rewrite if present
            if t.patches is not None:
                patches = t.patches.reshape(t.patches.shape[0], -1,
                                            t.patches.shape[-1])
            else:
                patches = conv_patches(t.inputs, t.conv_spec)
            T = patches.shape[1]
            groups = int(t.conv_spec.get("feature_group_count") or 1)
            if groups == 1:
                A = jnp.einsum("btk,btl->kl", patches, patches) / (N * T)
            else:
                # grouped conv: each output channel sees only its group's
                # patches; the shared-A Kronecker approximation averages the
                # per-group patch Grams, i.e. (t, group) is the
                # weight-sharing axis (T_eff = T*groups). Reduces to the
                # ungrouped formula at groups=1.
                pg = group_patches(patches, t.conv_spec["kernel_size"], groups)
                A = jnp.einsum("btgk,btgl->kl", pg, pg) / (N * T * groups)
        A_facs[t.path] = A

    # ---- assemble Kron groups in canonical leaf order -----------------------
    kfacs = []
    skipped = []
    block_wanted = []  # (index into kfacs, spec) for generic exact blocks
    for spec in model.leaf_specs:
        path, role = spec.path, spec.path[-1]
        if last_layer_path is not None and not _under(path, last_layer_path):
            continue
        matched = None
        for t in taps:
            if _under(path, t.path):
                matched = t
                break
        group = None
        if matched is not None:
            if matched.kind in ("dense", "conv", "dense_general"):
                if role == "kernel":
                    A_f, B_f = A_facs[matched.path], B_facs[matched.path]
                    # feature-major kernels (einsum "ok" layout) flatten as
                    # B ⊗ A, so the group factors swap; the Kron container is
                    # agnostic to which factor is which
                    if (
                        matched.kind == "dense_general"
                        and matched.conv_spec.get("kernel_layout") == "ok"
                    ):
                        group = (B_f, A_f)
                    else:
                        group = (A_f, B_f)
                elif role == "bias":
                    group = (
                        B_facs_bias.get(matched.path, B_facs[matched.path]),
                    )
            elif matched.kind == "embed":
                if role == "embedding":
                    group = (A_facs[matched.path], B_facs[matched.path])
            elif matched.kind == "norm":
                blk = norm_blocks.get((matched.path, role))
                if blk is not None:
                    group = (blk,)
        if group is None:
            # non-factorizable DenseGeneral/Einsum leaves ("unfactored" taps)
            # take the exact dense-block path even under the default "skip"
            # mode — the reference captures their torch equivalents because
            # any torch module decomposes into hooked nn.Linear layers
            # (`curvlinops.py:55-75`); zero-curvature + warning would be a
            # coverage regression against it. Under "raise" they are likewise
            # fine (intercepted and exactly handled), so only genuinely
            # uncoverable leaves raise.
            auto_block = matched is not None and matched.kind == "unfactored"
            if (
                (unsupported == "block" or auto_block)
                and spec.size <= block_max_params
            ):
                block_wanted.append((len(kfacs), spec))
            elif unsupported == "raise":
                raise ValueError(
                    f"Trainable parameter {path} does not belong to an "
                    "intercepted Dense/Conv layer; KFAC is undefined for it. "
                    "Freeze it via the trainable mask or use a diag/full "
                    "Hessian structure."
                )
            else:
                skipped.append("/".join(path))
            group = _zero_group(spec, dtype)
        kfacs.append(group)

    if block_wanted:
        blocks = _exact_leaf_blocks(
            model, train_params, x, ct_sweeps,
            [s for _, s in block_wanted], dtype,
        )
        for i, spec in block_wanted:
            kfacs[i] = (blocks[spec.path],)

    if skipped:
        warnings.warn(
            f"Parameters not supported by KFAC get zero curvature (posterior "
            f"falls back to the prior): {skipped}. Pass "
            "kron_unsupported='block' for exact dense blocks (raise "
            "block_max_params if these leaves exceed it), or freeze them via "
            "the trainable mask."
        )

    loss = lossfunc(f, y)
    return loss, Kron(kfacs)


def _exact_leaf_accumulate(model, train_params, x, ct_sweeps, specs, init, accum):
    """Per-sample exact leaf-gradient engine for arbitrary (untapped) leaves.

    Differentiates the model w.r.t. the leaves THEMSELVES via per-sample
    vjps — no tap or module structure needed, so this covers anything the
    structured KFAC/tap paths cannot (e.g. `nn.Einsum` kernels whose
    equation has no 2-factor-group flatten, DenseGeneral batch_dims).
    For each cotangent sweep `(w, ct)` with ct shaped (K, B, C), computes
    per-sample flat grads G of shape (B, K, P_leaf) per leaf and folds
    `w * accum(spec, G)` into the per-leaf accumulator.

    Cost: one whole-model backward per (sample, cotangent) for the selected
    leaves jointly — reserved for exotic leaves outside the structured paths.
    """
    flat, treedef = jax.tree_util.tree_flatten(train_params)
    index_of = {s.path: i for i, s in enumerate(model.leaf_specs)}
    sel = [index_of[s.path] for s in specs]
    leaves0 = [flat[j] for j in sel]

    def f_single(leaves, xi):
        flat2 = list(flat)
        for j, lv in zip(sel, leaves):
            flat2[j] = lv
        tp2 = jax.tree_util.tree_unflatten(treedef, flat2)
        xb = jax.tree_util.tree_map(lambda a: a[None], xi)
        return model.apply(tp2, xb)[0]

    def g_single(xi, ct_i):
        """ct_i (K, C) -> list over leaves of (K, P_leaf) per-sample grads."""
        _, vjp1 = jax.vjp(lambda lv: f_single(lv, xi), leaves0)

        def one(c):
            return [g.reshape(-1) for g in vjp1(c)[0]]

        return jax.vmap(one)(ct_i)

    out = {s.path: init(s) for s in specs}
    for w, ct in ct_sweeps:  # ct (K, B, C)
        Gs = jax.vmap(g_single)(x, jnp.moveaxis(ct, 0, 1))
        for s, G in zip(specs, Gs):  # G (B, K, P)
            out[s.path] = out[s.path] + w * accum(s, G)
    return out


def _exact_leaf_blocks(model, train_params, x, ct_sweeps, specs, dtype):
    """Exact dense Fisher blocks per leaf: Σ_sweeps w · Σ_{sample,cot} g gᵀ
    — the exact per-batch Fisher block (matches the norm-layer block
    scaling). Gated by ``block_max_params`` at the call sites."""
    return _exact_leaf_accumulate(
        model, train_params, x, ct_sweeps, specs,
        init=lambda s: jnp.zeros((s.size, s.size), dtype),
        accum=lambda s, G: jnp.einsum(
            "bkp,bkq->pq", G.astype(dtype), G.astype(dtype)
        ),
    )


def _exact_leaf_diags(model, train_params, x, ct_sweeps, specs, dtype):
    """Exact curvature diagonals per leaf: Σ_sweeps w · Σ_{sample,cot} g²
    — the diagonal of `_exact_leaf_blocks` without the P² memory."""
    return _exact_leaf_accumulate(
        model, train_params, x, ct_sweeps, specs,
        init=lambda s: jnp.zeros((s.size,), dtype),
        accum=lambda s, G: (G.astype(dtype) ** 2).sum((0, 1)),
    )


def _norm_xhat(tap) -> jnp.ndarray:
    """Reconstruct the normalized pre-affine activation x̂ from a norm tap:
    out = scale ∘ x̂ + bias ⇒ x̂ = (out − bias)/scale (zero scales guarded)."""
    out = tap.outputs
    if tap.bias is not None:
        out = out - tap.bias
    if tap.scale is not None:
        out = out / jnp.where(tap.scale == 0, 1.0, tap.scale)
    return out


def _zero_group(spec, dtype):
    """Zero Kron group matching `Kron.init_from_params` structure for a leaf."""
    shape = spec.shape
    if len(shape) <= 1:
        P = max(int(spec.size), 1)
        return (jnp.zeros((P, P), dtype=dtype),)
    p_in = int(spec.size) // int(shape[-1])
    p_out = int(shape[-1])
    return (
        jnp.zeros((p_in, p_in), dtype=dtype),
        jnp.zeros((p_out, p_out), dtype=dtype),
    )


def _dg_grad_rows(gl: jnp.ndarray, spec: dict, for_bias: bool = False):
    """Flatten dense_general cotangents (S, B, *out) to (rows, O) with the
    feature axes last in kernel (default) or bias flatten order."""
    perm = spec["g_perm_bias"] if for_bias else spec["g_perm"]
    if perm is not None:
        gl = jnp.transpose(gl, (0,) + tuple(1 + p for p in perm))
    O = 1
    for d in gl.shape[gl.ndim - spec["n_feat"]:]:
        O *= d
    return gl.reshape(-1, O)


def _grad_cov(g: jnp.ndarray) -> jnp.ndarray:
    """Σ g gᵀ over all leading axes; g has trailing `out` axis."""
    g2 = g.reshape(-1, g.shape[-1])
    return jnp.einsum("bo,bp->op", g2, g2)


def _under(leaf_path, module_path) -> bool:
    """Exact module ownership (see `nnmodel._path_contains`)."""
    from laplace_jax.nnmodel import _leaf_module_path

    return _leaf_module_path(leaf_path) == tuple(module_path)
