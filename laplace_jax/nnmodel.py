"""Model adapter: functional replacement for the reference's module/hook machinery.

The reference manipulates stateful `nn.Module`s: `FeatureExtractor` forward hooks
capture last-layer inputs (`laplace/utils/feature_extractor.py:149-216`) and the
curvature backends read per-module statistics planted by backward hooks
(`laplace/curvature/curvlinops.py:55-75`). In JAX everything is a pure function of
the parameters, so this module provides the equivalents functionally:

- `NNModel` wraps `(apply_fn, params)` with an optional trainable mask (the
  reference's `requires_grad` subset scan, `laplace/baselaplace.py:115-122`).
- For flax modules, `flax.linen.intercept_methods` gives *taps*: per-layer
  (input activation, pre-offset output) pairs plus additive zero "offsets" whose
  cotangents are exactly the output gradients KFAC needs — no hooks, no mutation,
  fully traceable under `jit`/`grad`/`vmap`.
- Last-layer discovery = "last executed Dense module" recorded during one traced
  forward (reference auto-discovery: `feature_extractor.py:159-216`).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

from laplace_jax.enums import FeatureReduction
from laplace_jax.utils.flatten import (
    leaf_specs,
    make_unflatten,
    merge,
    num_params,
    partition,
    tree_to_vector,
)

try:
    import flax.linen as nn

    _HAS_FLAX = True
    _NORM_MODULES = tuple(
        m
        for m in (
            getattr(nn, "BatchNorm", None),
            getattr(nn, "LayerNorm", None),
            getattr(nn, "GroupNorm", None),
            getattr(nn, "RMSNorm", None),
            getattr(nn, "InstanceNorm", None),
        )
        if m is not None
    )
except Exception:  # pragma: no cover
    _HAS_FLAX = False
    _NORM_MODULES = ()


@jax.tree_util.register_pytree_node_class
class LayerTap:
    """Record of one intercepted linear layer execution.

    Registered as a pytree (arrays as children, identity as static aux) so a
    taps list can cross jit/vjp/eval_shape boundaries — KFAC exploits this to
    get activations and output-offsets from a single forward pass via
    `jax.vjp(..., has_aux=True)`."""

    def __init__(self, path, inputs, outputs, kind, conv_spec=None, patches=None,
                 scale=None, bias=None, mask=None):
        self.path = path  # tuple[str, ...] module path
        self.inputs = inputs  # layer input activations
        self.outputs = outputs  # layer output (post-offset)
        self.kind = kind  # "dense" | "conv" | "norm"
        self.conv_spec = conv_spec  # dict for conv patch extraction
        self.patches = patches  # im2col patches when the matmul rewrite ran
        self.scale = scale  # norm layers: scale parameter (None if use_scale=False)
        self.bias = bias  # norm layers: bias parameter (None if use_bias=False)
        self.mask = mask  # masked convs: kernel mask (array — pytree child)

    def tree_flatten(self):
        children = (self.inputs, self.outputs, self.patches, self.scale,
                    self.bias, self.mask)
        spec = self.conv_spec
        if isinstance(spec, dict):
            spec = tuple(sorted((k, _freeze(v)) for k, v in spec.items()))
        aux = (self.path, self.kind, spec)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        path, kind, spec = aux
        if isinstance(spec, tuple):
            spec = {k: v for k, v in spec}
        inputs, outputs, patches, scale, bias, mask = children
        return cls(path, inputs, outputs, kind, spec, patches, scale, bias,
                   mask)


def _freeze(v):
    if isinstance(v, list):
        return tuple(v)
    return v


class NNModel:
    """A neural network as `(apply_fn, params)` plus introspection hooks.

    Parameters
    ----------
    apply_fn : callable `(params, x) -> f` where `f` is `(batch, ..., outputs)`
    params : parameter pytree
    trainable_mask : pytree of per-leaf bools or None (all trainable). Frozen
        leaves are held constant and excluded from the posterior, mirroring the
        reference's `requires_grad` filter.
    module : optional flax `nn.Module` enabling taps / last-layer discovery.
    """

    def __init__(
        self,
        apply_fn: Callable,
        params: Any,
        trainable_mask: Any = None,
        module: Any = None,
    ):
        self.apply_fn = apply_fn
        self.params = params
        self.module = module
        if trainable_mask is None:
            trainable_mask = jax.tree_util.tree_map(lambda _: True, params)
        self.trainable_mask = trainable_mask
        self.train_params, self.frozen_params = partition(params, trainable_mask)
        self.is_subset = any(
            not m for m in jax.tree_util.tree_leaves(trainable_mask)
        )
        self._unflatten = make_unflatten(self.train_params)
        self.n_params = num_params(self.train_params)
        self.leaf_specs = leaf_specs(self.train_params)
        self.n_layers = len(self.leaf_specs)

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_flax(cls, module, params, trainable_mask=None) -> "NNModel":
        def apply_fn(p, x):
            return module.apply(p, x)

        # Non-'params' collections (batch_stats, ...) are state, not weights:
        # freeze them so they stay out of the posterior — the analogue of the
        # reference's requires_grad filter excluding buffers.
        if (
            trainable_mask is None
            and isinstance(params, Mapping)
            and "params" in params
            and len(params) > 1
        ):
            trainable_mask = _collection_mask(params)

        return cls(apply_fn, params, trainable_mask, module=module)

    @classmethod
    def wrap(cls, model, params=None) -> "NNModel":
        """Coerce supported inputs into an NNModel: NNModel passthrough,
        (flax module, params) pair, or (apply_fn, params) pair."""
        if isinstance(model, NNModel):
            return model
        if params is None and isinstance(model, (tuple, list)) and len(model) == 2:
            model, params = model
        if _HAS_FLAX and isinstance(model, nn.Module):
            return cls.from_flax(model, params)
        if callable(model):
            return cls(model, params)
        raise ValueError(
            "model must be an NNModel, a flax Module (with params), or a callable "
            "apply_fn (with params)."
        )

    # -- basic application -----------------------------------------------------
    def full_params(self, train_params) -> Any:
        return merge(train_params, self.frozen_params)

    def apply(self, train_params, x) -> jnp.ndarray:
        return self.apply_fn(self.full_params(train_params), x)

    def apply_vec(self, theta: jnp.ndarray, x) -> jnp.ndarray:
        """Apply from the canonical flat parameter vector."""
        return self.apply(self._unflatten(theta), x)

    @property
    def mean_vector(self) -> jnp.ndarray:
        return tree_to_vector(self.train_params)

    def unflatten(self, theta: jnp.ndarray) -> Any:
        return self._unflatten(theta)

    def set_params(self, train_params) -> None:
        """Refresh the MAP point (used after training / loading)."""
        self.params = merge(train_params, self.frozen_params)
        self.train_params = train_params

    # -- flax interception ----------------------------------------------------
    def _require_flax(self):
        if self.module is None:
            raise ValueError(
                "This operation requires a flax module (taps / last-layer "
                "introspection). Construct the NNModel via NNModel.from_flax or "
                "pass the flax module."
            )

    def apply_with_taps(self, train_params, x, offsets: Optional[Mapping] = None):
        """Forward pass recording per-linear-layer taps.

        Returns `(f, taps)` where taps is a list of `LayerTap` in execution
        order. If `offsets` (dict path -> array broadcastable to the layer
        output) is given, each tapped output gets `+ offsets[path]`; the vjp
        w.r.t. these offsets yields the per-layer output gradients that torch
        backends obtain with backward hooks (`curvlinops.py:61-62`).
        """
        self._require_flax()
        taps: list[LayerTap] = []

        def interceptor(next_fun, args, kwargs, context):
            module = context.module
            if context.method_name != "__call__" or not isinstance(
                module,
                (nn.Dense, nn.Conv, nn.DenseGeneral, nn.Einsum, nn.Embed)
                + _NORM_MODULES,
            ):
                return next_fun(*args, **kwargs)
            path = tuple(module.path)
            if isinstance(module, nn.Embed):
                # Embedding lookup = one-hot(ids) @ embedding — a Dense layer
                # with one-hot activations. The tap records the ids; curvature
                # code builds the (sparse) activation statistics from them.
                out = next_fun(*args, **kwargs)
                if offsets is not None and path in offsets:
                    out = out + offsets[path]
                spec = {"num_embeddings": int(module.num_embeddings)}
                taps.append(LayerTap(path, args[0], out, "embed", spec))
                return out
            if isinstance(module, (nn.DenseGeneral, nn.Einsum)):
                # Generalized linear layers (flax attention is built on
                # DenseGeneral): normalize to the common "dense_general" tap —
                # activation rows (B, T, K) flattened in the KERNEL's
                # contracted-axis order, plus metadata to permute/flatten the
                # output cotangent into kernel feature order. The torch
                # reference captures these because torch attention decomposes
                # into nn.Linear hooks (`curvature/curvlinops.py:55-75`).
                out = next_fun(*args, **kwargs)
                if offsets is not None and path in offsets:
                    out = out + offsets[path]
                tap = _general_linear_tap(module, args[0], out, path)
                if tap is not None:
                    taps.append(tap)
                return out
            if isinstance(module, _NORM_MODULES):
                # Norm layers: out = scale ∘ x̂ + bias. Tap the output (plus the
                # additive offset, whose cotangent is the per-position output
                # gradient) and the scale/bias values so curvature code can
                # reconstruct x̂ = (out − bias)/scale for per-sample
                # scale-gradients — the hook-free analogue of what the torch
                # backends can't do at all (they skip norm layers).
                out = next_fun(*args, **kwargs)
                if offsets is not None and path in offsets:
                    out = out + offsets[path]
                scale = (
                    module.get_variable("params", "scale")
                    if module.has_variable("params", "scale")
                    else None
                )
                bias = (
                    module.get_variable("params", "bias")
                    if module.has_variable("params", "bias")
                    else None
                )
                taps.append(
                    LayerTap(path, args[0], out, "norm", scale=scale, bias=bias)
                )
                return out
            if isinstance(module, nn.Dense):
                out = next_fun(*args, **kwargs)
                if offsets is not None and path in offsets:
                    out = out + offsets[path]
                taps.append(LayerTap(path, args[0], out, "dense"))
                return out

            # Conv: prefer the im2col-matmul rewrite — identical math, but its
            # autodiff is pure matmul/slice transposes (conv backward ops are
            # by far the slowest-compiling TPU primitives), and KFAC reuses
            # the patches for its activation factor.
            a = args[0]
            ksize = module.kernel_size
            if isinstance(ksize, int):
                ksize = (ksize,) * (a.ndim - 2)
            ksize = tuple(ksize)
            strides = module.strides
            if strides is None:
                strides = (1,) * len(ksize)
            elif isinstance(strides, int):
                strides = (strides,) * len(ksize)
            strides = tuple(strides)
            spec = dict(
                kernel_size=ksize,
                strides=strides,
                padding=module.padding,
                input_dilation=module.input_dilation,
                kernel_dilation=module.kernel_dilation,
                feature_group_count=module.feature_group_count,
            )
            kmask = getattr(module, "mask", None)
            pad_str = (
                module.padding.upper()
                if isinstance(module.padding, str)
                else None
            )
            has_input_dilation = module.input_dilation not in (None, 1)
            rewritable = (
                (pad_str is None or pad_str in ("SAME", "VALID", "CIRCULAR"))
                # flax/lax REJECT string padding combined with lhs dilation
                # ("String padding is not implemented for transposed
                # convolution"); falling back keeps the rewrite's semantics
                # exactly equal to the native module — including its errors
                and not (has_input_dilation and pad_str is not None)
            )
            if rewritable:
                from laplace_jax.ops.im2col import im2col

                kdil = module.kernel_dilation
                if kdil is None or isinstance(kdil, int):
                    kdil = (kdil or 1,) * len(ksize)
                patches = im2col(a, ksize, strides, module.padding, tuple(kdil),
                                 input_dilation=module.input_dilation)
                kernel = module.get_variable("params", "kernel")
                if kmask is not None:
                    # flax masked conv (e.g. autoregressive PixelCNN kernels):
                    # conv(x, kernel * mask). Folding the mask here keeps the
                    # whole curvature path on matmul autodiff — the Jacobian
                    # w.r.t. the kernel picks up the mask automatically.
                    kernel = kernel * kmask
                groups = int(module.feature_group_count or 1)
                if groups == 1:
                    out = patches @ kernel.reshape(-1, kernel.shape[-1])
                else:
                    # grouped conv as blocked matmul: patches laid out
                    # (..., kh, kw, cin) regroup to (..., g, kh*kw*cpg)
                    # matching the kernel flatten (kh, kw, cpg); XLA conv
                    # output channels are group-major, so the reshape back
                    # restores the native ordering.
                    from laplace_jax.curvature.kfac import group_patches

                    pg = group_patches(patches, ksize, groups)
                    cout = kernel.shape[-1]
                    k_r = kernel.reshape(-1, groups, cout // groups)
                    out = jnp.einsum("...gk,kgo->...go", pg, k_r)
                    out = out.reshape(*out.shape[:-2], cout)
                if module.has_variable("params", "bias"):
                    out = out + module.get_variable("params", "bias")
                if module.dtype is not None:
                    out = out.astype(module.dtype)
            else:
                patches = None
                out = next_fun(*args, **kwargs)
            if offsets is not None and path in offsets:
                out = out + offsets[path]
            taps.append(
                LayerTap(path, a, out, "conv", spec, patches, mask=kmask)
            )
            return out

        params = self.full_params(train_params)
        with nn.intercept_methods(interceptor):
            f = self.module.apply(params, x)
        return f, taps

    def apply_curv(self, train_params, x):
        """Curvature-path forward: conv layers run as im2col matmuls so all
        autodiff through the model avoids conv-backward primitives. Falls back
        to the plain apply for non-flax models."""
        if self.module is None:
            return self.apply(train_params, x)
        f, _ = self.apply_with_taps(train_params, x)
        return f

    def apply_vec_curv(self, theta: jnp.ndarray, x) -> jnp.ndarray:
        return self.apply_curv(self._unflatten(theta), x)

    def linear_layer_paths(self, x) -> list[LayerTap]:
        """Run one probing forward (like the reference's `model(X[:1])` probe,
        `baselaplace.py:947-951`) to list intercepted linear layers."""
        xs = _probe_slice(x)
        _, taps = self.apply_with_taps(self.train_params, xs)
        return taps

    # -- last layer ------------------------------------------------------------
    def find_last_layer(self, x) -> tuple:
        """Path of the model's head layer for last-layer Laplace.

        Prefers the last executed Dense (the φ⊗I closed-form fast path; the
        reference *requires* a linear head, `feature_extractor.py:144-145`).
        With no Dense present, falls back to the last executed parameterized
        tapped layer of any kind (Conv / DenseGeneral / Einsum / norm) — the
        generic-Jacobian last-layer path, beyond reference generality."""
        taps = self.linear_layer_paths(x)
        dense = [t for t in taps if t.kind == "dense"]
        if dense:
            return dense[-1].path
        for t in reversed(taps):
            try:
                self.last_layer_param_paths(t.path)
                return t.path
            except ValueError:
                continue
        raise ValueError(
            "No Dense layer found for last-layer Laplace, and no other "
            "parameterized tapped layer (Conv/DenseGeneral/Einsum/norm) to "
            "fall back to."
        )

    def tap_kind(self, path: tuple, x) -> Optional[str]:
        """Kind of the tapped layer at `path` ('dense' | 'conv' |
        'dense_general' | 'norm'), or None if the path is not tapped."""
        for t in self.linear_layer_paths(x):
            if t.path == path:
                return t.kind
        return None

    def last_layer_param_paths(self, last_layer_path: tuple) -> list[tuple]:
        """Parameter-leaf paths (as string tuples) under the last layer."""
        specs = leaf_specs(self.params)
        sel = [s.path for s in specs if _path_contains(s.path, last_layer_path)]
        if not sel:
            raise ValueError(f"No parameters found under module path {last_layer_path}.")
        return sel

    def split_last_layer(self, last_layer_path: tuple):
        """Partition `params` into (last-layer subtree mask, rest)."""

        def mask_from_path(tree):
            flat = jax.tree_util.tree_leaves_with_path(tree)
            masks = []
            for path, _ in flat:
                pstr = tuple(_key_to_str(k) for k in path)
                masks.append(_path_contains(pstr, last_layer_path))
            treedef = jax.tree_util.tree_structure(tree)
            return jax.tree_util.tree_unflatten(treedef, masks)

        return mask_from_path(self.params)

    def apply_with_features(
        self,
        train_params,
        x,
        last_layer_path: tuple,
        feature_reduction: FeatureReduction | str | None = None,
    ):
        """Forward returning `(f, features)` where features is the last layer's
        input, reduced to (batch, dim) if requested
        (`feature_extractor.py:100-127`)."""
        f, taps = self.apply_with_taps(train_params, x)
        feats = None
        for t in taps:
            if t.path == last_layer_path:
                feats = t.inputs
        if feats is None:
            raise ValueError(f"Last layer {last_layer_path} not executed in forward.")
        if feats.ndim > 2 and feature_reduction is not None:
            if feature_reduction == FeatureReduction.PICK_FIRST:
                idx = (slice(None),) + (0,) * (feats.ndim - 2) + (slice(None),)
                feats = feats[idx]
            elif feature_reduction == FeatureReduction.PICK_LAST:
                idx = (slice(None),) + (-1,) * (feats.ndim - 2) + (slice(None),)
                feats = feats[idx]
            elif feature_reduction == FeatureReduction.AVERAGE:
                feats = feats.mean(axis=tuple(range(1, feats.ndim - 1)))
            else:
                raise ValueError(f"Invalid feature_reduction {feature_reduction}.")
        return f, feats


def _general_linear_tap(module, a, out, path):
    """Normalize a DenseGeneral / Einsum execution into a "dense_general" tap.

    The tap stores activation rows as `patches` of shape (B, T, K) — K the
    flattened contracted dims in KERNEL order, T the weight-sharing positions
    per sample — plus cotangent metadata in `conv_spec`:

    - ``n_feat``: number of trailing feature axes of the output cotangent
      after permutation,
    - ``g_perm`` / ``g_perm_bias``: permutation of the OUTPUT axes bringing
      the feature axes last in kernel / bias flatten order (None = identity).

    Configurations without a clean (K, O) Kronecker factorization (exotic
    einsum label layouts) get an "unfactored" tap when the layer is
    batch-separable — curvature code then computes EXACT per-leaf blocks /
    diagonals via per-sample vjps w.r.t. the kernel itself. Returns None
    only for layers outside per-sample semantics entirely (DenseGeneral
    batch_dims, kernel axes tied to the batch, batch-contracting
    equations, call-time einsum_str): those fall to the unsupported/skip
    path.
    """
    if isinstance(module, nn.DenseGeneral):
        if tuple(module.batch_dims or ()):
            return None  # kernel carries batch axes: no A ⊗ B structure
        features = module.features
        features = (
            tuple(features)
            if isinstance(features, (tuple, list))
            else (features,)
        )
        axis = module.axis
        axis = tuple(axis) if isinstance(axis, (tuple, list)) else (axis,)
        ndim = a.ndim
        axis = tuple(ax % ndim for ax in axis)
        if 0 in axis or len(set(axis)) != len(axis):
            return None  # contracting the batch axis: not batch-additive
        non_axis = tuple(i for i in range(ndim) if i not in axis)
        K = 1
        for ax in axis:
            K *= a.shape[ax]
        a_mat = jnp.transpose(a, non_axis + axis).reshape(a.shape[0], -1, K)
        spec = {
            "n_feat": len(features),
            "g_perm": None,
            "g_perm_bias": None,
            "kernel_layout": "ko",  # flax kernels are (contracted..., feat...)
        }
        return LayerTap(path, a, out, "dense_general", spec, a_mat)

    # nn.Einsum: einsum_str from the constructor or the call site
    es = module.einsum_str
    if es is None:
        return None  # call-time einsum_str is not visible to the interceptor
    es = es.replace(" ", "")
    if "->" not in es or es.count(",") != 1:
        return None
    lhs_out, out_s = es.split("->")
    lhs_s, rhs_s = lhs_out.split(",")
    if "." in rhs_s:
        return None  # kernel rank must be static; flax rejects this anyway
    if "..." in lhs_s:
        # expand the ellipsis to explicit batch labels from a's rank, so the
        # common "...d,dh->...h"-style equations take the structured path
        n_batch = a.ndim - len(lhs_s.replace("...", ""))
        if n_batch < 0 or "..." not in out_s:
            return None
        import string as _string

        pool = [
            c for c in _string.ascii_letters
            if c not in lhs_s + rhs_s + out_s
        ]
        if len(pool) < n_batch:
            return None
        batch = "".join(pool[:n_batch])
        lhs_s = lhs_s.replace("...", batch)
        out_s = out_s.replace("...", batch)
    if "." in lhs_s + out_s:
        return None
    lhs_l, rhs_l, out_l = list(lhs_s), list(rhs_s), list(out_s)

    def _unfactored():
        """Equations with no clean 2-factor Kronecker structure still get
        EXACT curvature (dense Fisher blocks in KFAC, exact diagonals in the
        tap-diag path) via per-sample vjps w.r.t. the kernel itself — but
        only when the layer is batch-separable: the batch label must stay
        out of the kernel (a kernel axis tied to the batch size makes
        per-sample application ill-defined) and reach the output (a
        batch-contracting einsum is not batch-additive). Non-separable
        layers stay unsupported (skip-with-warning)."""
        if lhs_l and lhs_l[0] not in rhs_l and lhs_l[0] in out_l:
            return LayerTap(path, a, out, "unfactored")
        return None

    if (
        len(set(lhs_l)) != len(lhs_l)
        or len(set(rhs_l)) != len(rhs_l)
        or len(set(out_l)) != len(out_l)
    ):
        return _unfactored()  # repeated (diagonal) labels
    contracted = [c for c in rhs_l if c in lhs_l and c not in out_l]
    feat = [c for c in rhs_l if c not in lhs_l]
    if not contracted or not feat:
        return _unfactored()
    # the row-major kernel flatten must factor into the contracted block and
    # the feature block: contracted-major kernels ("ko") yield an (A, B)
    # group, feature-major kernels ("ok", e.g. attention out-projections
    # "BTNH,DNH->BTD") yield the reversed (B, A) group — either way the
    # group's Kronecker product equals the dense block under the leaf's
    # canonical flatten. Interleaved label layouts have no 2-factor
    # structure and fall to the unsupported/skip path.
    if rhs_l == contracted + feat:
        layout = "ko"
    elif rhs_l == feat + contracted:
        layout = "ok"
    else:
        return _unfactored()  # interleaved labels / kernel batch axes
    if any(c not in out_l for c in feat):
        return _unfactored()  # summed-out kernel feature axis
    lhs_keep = [c for c in lhs_l if c not in contracted]
    out_nonfeat = [c for c in out_l if c not in feat]
    # activation and gradient rows must describe the same (sample, position)
    # pairs: every kept lhs label appears in the output (and vice versa);
    # the gradient permutation below restores lhs_keep order, so the output
    # may order them freely
    if set(out_nonfeat) != set(lhs_keep) or not lhs_keep:
        return _unfactored()
    if lhs_l[0] != lhs_keep[0]:
        return _unfactored()  # batch contracted: _unfactored() rejects too
    lhs_dims = {c: a.shape[i] for i, c in enumerate(lhs_l)}
    K = 1
    for c in contracted:
        K *= lhs_dims[c]
    perm_a = tuple(lhs_l.index(c) for c in lhs_keep + contracted)
    a_mat = jnp.transpose(a, perm_a).reshape(a.shape[0], -1, K)
    feat_out = [c for c in out_l if c in feat]  # bias flatten order
    g_perm = tuple(out_l.index(c) for c in lhs_keep + feat)
    g_perm_bias = tuple(out_l.index(c) for c in lhs_keep + feat_out)
    identity = tuple(range(len(out_l)))
    spec = {
        "n_feat": len(feat),
        "g_perm": None if g_perm == identity else g_perm,
        "g_perm_bias": None if g_perm_bias == identity else g_perm_bias,
        "kernel_layout": layout,
    }
    return LayerTap(path, a, out, "dense_general", spec, a_mat)


def _collection_mask(variables):
    """Trainable mask marking only leaves under the 'params' collection."""
    flat = jax.tree_util.tree_leaves_with_path(variables)
    masks = [
        _key_to_str(path[0]) == "params" if path else False for path, _ in flat
    ]
    treedef = jax.tree_util.tree_structure(variables)
    return jax.tree_util.tree_unflatten(treedef, masks)


def _probe_slice(x):
    """First element of a batch (tensor or dict-of-tensors)."""
    if isinstance(x, Mapping):
        return {k: v[:1] for k, v in x.items()}
    return x[:1]


def _key_to_str(k) -> str:
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    return str(k)


def _leaf_module_path(leaf_path: Sequence[str]) -> tuple:
    """Module path of a parameter leaf: strip the collection prefix ('params')
    and the parameter name. flax leaf paths look like
    ('params', 'ResidualBlock_0', 'Conv_0', 'kernel')."""
    lp = list(leaf_path)
    if lp and lp[0] == "params":
        lp = lp[1:]
    return tuple(lp[:-1])


def _path_contains(leaf_path: Sequence[str], module_path: Sequence[str]) -> bool:
    """True iff the leaf belongs EXACTLY to the module at `module_path` (full
    path from the root module). Subsequence matching is wrong: a root-level
    'Conv_0' must not claim 'ResidualBlock_3/Conv_0' leaves."""
    return _leaf_module_path(leaf_path) == tuple(module_path)
