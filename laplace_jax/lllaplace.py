"""Last-layer Laplace approximations.

TPU-native counterpart of `laplace/lllaplace.py`: instead of deep-copying the
model and hooking its last module (`lllaplace.py:136-141`), the last layer is a
*parameter partition* — a trainable mask selecting the last Dense layer's leaves —
plus a feature-capturing functional forward (`NNModel.apply_with_features`).
Auto-discovery (last executed Dense) is deferred to the first `fit` batch exactly
like the reference (`lllaplace.py:142-160`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from laplace_jax.baselaplace import (
    DiagLaplace,
    FullLaplace,
    KronLaplace,
    ParametricLaplace,
    _as_device,
    _probe,
)
from laplace_jax.enums import FeatureReduction
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.matrix import Kron

__all__ = ["LLLaplace", "FullLLLaplace", "KronLLLaplace", "DiagLLLaplace"]


class LLLaplace(ParametricLaplace):
    """Baseclass for last-layer Laplace (reference `lllaplace.py:34`).

    `last_layer_name` is a flax module path ("Dense_1" or "sub/Dense_0"); if
    None it is determined automatically on the first fit batch.
    """

    def __init__(self, model, likelihood, sigma_noise=1.0, prior_precision=1.0,
                 prior_mean=0.0, temperature=1.0, enable_backprop=False,
                 feature_reduction: FeatureReduction | str | None = None,
                 dict_key_x="input_ids", dict_key_y="labels", backend=None,
                 last_layer_name: Optional[str] = None, backend_kwargs=None,
                 params=None):
        if feature_reduction is not None and feature_reduction not in [
            fr.value for fr in FeatureReduction
        ]:
            raise ValueError(
                "`feature_reduction` must take value in the `FeatureReduction "
                "enum` or one of `{'pick_first', 'pick_last', 'average'}`!"
            )
        self.H = None
        full_model = NNModel.wrap(model, params)
        super().__init__(full_model, likelihood, sigma_noise=sigma_noise,
                         prior_precision=1.0, prior_mean=0.0,
                         temperature=temperature, enable_backprop=enable_backprop,
                         dict_key_x=dict_key_x, dict_key_y=dict_key_y,
                         backend=backend, backend_kwargs=backend_kwargs)
        self._full_model = full_model
        self.feature_reduction = feature_reduction
        self._last_layer_name = last_layer_name

        if last_layer_name is not None:
            self._set_last_layer(tuple(last_layer_name.split("/")))
            self.prior_precision = prior_precision
            self.prior_mean = prior_mean
            self.mean = self.prior_mean
            self._init_H()
        else:
            self.mean = None
            self.n_params = None
            self.n_layers = None
            self.last_layer_path = None
            # defer setter validation until the last layer is known
            self._deferred_prior_precision = prior_precision
            self._deferred_prior_mean = prior_mean

    # ------------------------------------------------------------- last layer
    def _set_last_layer(self, path: tuple) -> None:
        """Restrict the model to the last layer's parameters and rebuild the
        backend: Dense heads get the φ⊗I fast path, any other head (conv /
        DenseGeneral / Einsum / norm — beyond the reference, which requires a
        linear head, `feature_extractor.py:144-145`) gets generic Jacobians
        w.r.t. the head's restricted parameter vector."""
        self.last_layer_path = path
        # validates the path: raises "No parameters found under module path"
        # for a wrong last_layer_name (reference errors similarly on a missing
        # module attribute, `utils/feature_extractor.py:83-98`)
        self._full_model.last_layer_param_paths(path)
        mask = self._full_model.split_last_layer(path)
        self.model = NNModel(
            self._full_model.apply_fn,
            self._full_model.params,
            trainable_mask=mask,
            module=self._full_model.module,
        )
        self.n_params = self.model.n_params
        self.n_layers = self.model.n_layers
        # head kind needs a probe batch; assume the common Dense head until
        # one is available (fit re-resolves before any curvature runs)
        self._head_kind = "dense"
        if getattr(self, "data", None) is not None:
            kind = self._full_model.tap_kind(path, self.data)
            if kind is not None:
                self._head_kind = kind
        self._backend = None
        self._curv_closure_fn = None
        self._scan_fit_fn = None
        self._backend_kwargs.update(
            last_layer=True,
            last_layer_path=path,
            last_layer_dense=self._head_kind == "dense",
            feature_reduction=self.feature_reduction,
        )

    def fit(self, train_loader, override: bool = True, progress_bar: bool = False,
            key=None) -> None:
        """Discover the last layer on the first batch if needed, then fit
        (reference `lllaplace.py:162-210`)."""
        if not override:
            raise ValueError(
                "Last-layer Laplace approximations do not support `override=False`."
            )
        if self.last_layer_path is None:
            data = next(iter(train_loader))
            X, _ = self._unpack_batch(data)
            self.data = _probe(X)
            path = self._full_model.find_last_layer(self.data)
            self._set_last_layer(path)
            self.prior_precision = self._deferred_prior_precision
            self.prior_mean = self._deferred_prior_mean
            self._init_H()
        elif getattr(self, "data", None) is None:
            # explicit last_layer_name: resolve the head kind from a probe
            # before any curvature runs (φ⊗I is only valid for Dense heads)
            data = next(iter(train_loader))
            X, _ = self._unpack_batch(data)
            self.data = _probe(X)
            kind = self._full_model.tap_kind(self.last_layer_path, self.data)
            if kind is not None and kind != self._head_kind:
                pp, pm, H = self.prior_precision, self.prior_mean, self.H
                self._set_last_layer(self.last_layer_path)
                self.prior_precision, self.prior_mean, self.H = pp, pm, H
        super().fit(train_loader, override=override, progress_bar=progress_bar,
                    key=key)
        self.mean = self.model.mean_vector
        if not self.enable_backprop:
            self.mean = jax.lax.stop_gradient(self.mean)

    # -------------------------------------------------------------- predictive
    def _glm_predictive_distribution(self, x, joint=False, diagonal_output=False):
        """Last-layer GLM predictive with optional `functional_variance_fast`
        diagonal shortcut (reference `lllaplace.py:212-237`)."""
        if joint:
            Js, f_mu = self.backend._jacobians_dispatch(_as_device(x))
            f_mu = f_mu.ravel()
            f_var = self.functional_covariance(Js)
        elif diagonal_output:
            try:
                f_mu, f_var = self.functional_variance_fast(_as_device(x))
            except NotImplementedError:
                Js, f_mu = self.backend._jacobians_dispatch(_as_device(x))
                f_var = jnp.diagonal(self.functional_variance(Js), axis1=-2, axis2=-1)
        else:
            Js, f_mu = self.backend._jacobians_dispatch(_as_device(x))
            f_var = self.functional_variance(Js)
        if not self.enable_backprop:
            f_mu, f_var = jax.lax.stop_gradient((f_mu, f_var))
        return f_mu, f_var

    def functional_variance_fast(self, x):
        """Diagonal-output variance shortcut; overridden where a trick exists
        (reference `lllaplace.py:239-256`)."""
        Js, f_mu = self.backend._jacobians_dispatch(_as_device(x))
        f_var = jnp.diagonal(self.functional_variance(Js), axis1=-2, axis2=-1)
        return f_mu, f_var

    def _nn_functional_samples(self, x, n_samples=100, key=None):
        """Sampled last-layer forward passes with cached features: φ is computed
        once, each posterior sample reruns only the Dense head
        (reference `lllaplace.py:257-315`). Non-Dense heads fall back to the
        generic sampled forward (swap sampled head params into the model)."""
        if getattr(self, "_head_kind", "dense") != "dense":
            return ParametricLaplace._nn_functional_samples(
                self, x, n_samples, key
            )
        key = self._next_key() if key is None else key
        _, phi = self.model.apply_with_features(
            self.model.train_params, _as_device(x), self.last_layer_path,
            self.feature_reduction,
        )
        samples = self.sample(n_samples, key)  # (S, P_ll)

        def head(theta_ll):
            leaf = self.model.unflatten(theta_ll)
            leaves = jax.tree_util.tree_leaves(leaf)
            if len(leaves) == 2:  # (bias, kernel) in flax flatten order
                b, W = leaves
                return phi @ W + b
            (W,) = leaves
            return phi @ W

        fs = jax.vmap(head)(samples)
        if not self.enable_backprop:
            fs = jax.lax.stop_gradient(fs)
        return fs

    @property
    def prior_precision_diag(self) -> jnp.ndarray:
        """Scalar or diagonal prior only (reference `lllaplace.py:317-333`)."""
        pp = self.prior_precision
        if pp.shape[0] == 1:
            return jnp.broadcast_to(pp, (self.n_params,))
        if pp.shape[0] == self.n_params:
            return pp
        if pp.shape[0] == self.n_layers:
            sizes = [s.size for s in self.model.leaf_specs]
            return jnp.repeat(pp, jnp.asarray(sizes), total_repeat_length=self.n_params)
        raise ValueError("Mismatch of prior and model. Diagonal or scalar prior.")

    def state_dict(self) -> dict:
        state_dict = super().state_dict()
        state_dict["data"] = getattr(self, "data", None)
        state_dict["_last_layer_name"] = self._last_layer_name
        return state_dict

    def load_state_dict(self, state_dict: dict) -> None:
        if "_last_layer_name" not in state_dict:
            # a non-last-layer state dict (reference raises the same way via
            # its cls-name check, `baselaplace.py:1526-1532`)
            raise ValueError(
                "Loading a wrong Laplace type. Make sure `subset_of_weights` "
                "and `hessian_structure` are correct!"
            )
        if self._last_layer_name != state_dict["_last_layer_name"]:
            raise ValueError("Different `last_layer_name` detected!")
        data = state_dict["data"]
        if data is not None and self.last_layer_path is None:
            self.data = data
            path = self._full_model.find_last_layer(data)
            self._set_last_layer(path)
        super().load_state_dict(state_dict)
        self.n_params = self.model.n_params
        self.n_layers = self.model.n_layers


class FullLLLaplace(LLLaplace, FullLaplace):
    """Dense last-layer posterior (reference `lllaplace.py:371-380`)."""

    _key = ("last_layer", "full")


class KronLLLaplace(LLLaplace, KronLaplace):
    """KFAC last-layer posterior (reference `lllaplace.py:383-476`)."""

    _key = ("last_layer", "kron")

    def __init__(self, model, likelihood, sigma_noise=1.0, prior_precision=1.0,
                 prior_mean=0.0, temperature=1.0, enable_backprop=False,
                 feature_reduction=None, dict_key_x="input_ids",
                 dict_key_y="labels", backend=None, last_layer_name=None,
                 damping: bool = False, backend_kwargs=None, params=None):
        self.damping = damping
        self.H_facs = None
        super().__init__(model, likelihood, sigma_noise, prior_precision,
                         prior_mean, temperature, enable_backprop,
                         feature_reduction, dict_key_x, dict_key_y, backend,
                         last_layer_name, backend_kwargs, params)
        # KronLaplace.__init__ sits in the cooperative chain and would reset
        # damping to its default; restore the user's choice
        self.damping = damping

    def _init_H(self):
        self.H = Kron.init_from_params(self.model.train_params, dtype=self._dtype)

    def fit(self, train_loader, override: bool = True, progress_bar: bool = False,
            key=None) -> None:
        # LL never supports online accumulation: always reset factors; the MRO
        # routes LLLaplace.fit -> KronLaplace.fit which runs the decompose
        # epilogue after accumulation
        self.H_facs = None
        super().fit(train_loader, override=override, progress_bar=progress_bar,
                    key=key)

    def functional_variance_fast(self, x):
        """O(b·(d+k)·(d·k)) diagonal output variance in the Kron eigenbasis —
        implemented here although the reference deliberately stubs it
        (`lllaplace.py:438-441`).

        The last-layer Kron posterior is block-diagonal over the (bias,
        kernel) groups, so with kernel covariance `(A⊗B + δI)^{-1}` in its
        eigenbasis `(QA⊗QB) D^{-1} (QA⊗QB)ᵀ`:

        ``var[b,c] = Σ_ij (QAᵀφ_b)_i² (QB[c,:])_j² / D_ij + var_bias[c]``
        """
        if getattr(self, "_head_kind", "dense") != "dense":
            return LLLaplace.functional_variance_fast(self, x)
        f_mu, phi = self.model.apply_with_features(
            self.model.train_params, _as_device(x), self.last_layer_path,
            self.feature_reduction,
        )
        pp = self.posterior_precision  # KronDecomposed incl. deltas
        k = f_mu.shape[-1]
        has_bias = any(s.path[-1] == "bias" for s in self.model.leaf_specs)
        # flatten order: bias group (if any) first, then the kernel group
        kernel_gi = 1 if has_bias else 0
        QA, QB = pp.eigenvectors[kernel_gi]
        lA, lB = pp.eigenvalues[kernel_gi]
        delta = pp.deltas[kernel_gi]
        Dinv = 1.0 / pp._group_eig((lA, lB), delta, 1.0)  # (d, k) eigen grid
        u2 = (phi @ QA) ** 2  # (b, d)
        QB2 = QB**2  # (k_out rows, k eigencols) with k_out == k
        f_var = jnp.einsum("bi,cj,ij->bc", u2, QB2, Dinv)
        if has_bias:
            Qb = pp.eigenvectors[0][0]
            lb = pp.eigenvalues[0][0]
            var_bias = jnp.einsum(
                "cj,j->c", Qb**2, 1.0 / (lb + pp.deltas[0])
            )
            f_var = f_var + var_bias[None, :]
        return f_mu, f_var


class DiagLLLaplace(LLLaplace, DiagLaplace):
    """Diagonal last-layer posterior (reference `lllaplace.py:479-506`)."""

    _key = ("last_layer", "diag")

    def functional_variance_fast(self, x):
        """O(b·k·d) diagonal output variance: φ²·σ²_W + σ²_b
        (reference `lllaplace.py:489-506`). Leaf order is (bias, kernel) with
        input-major kernel (d, k)."""
        if getattr(self, "_head_kind", "dense") != "dense":
            return LLLaplace.functional_variance_fast(self, x)
        f_mu, phi = self.model.apply_with_features(
            self.model.train_params, _as_device(x), self.last_layer_path,
            self.feature_reduction,
        )
        k = f_mu.shape[-1]
        b, d = phi.shape
        var = self.posterior_variance
        has_bias = any(s.path[-1] == "bias" for s in self.model.leaf_specs)
        offset = k if has_bias else 0  # bias leaf comes first in flatten order
        w_var = var[offset : offset + d * k].reshape(d, k)
        f_var = jnp.einsum("bd,dk,bd->bk", phi, w_var, phi)
        if has_bias:
            f_var = f_var + var[:k][None, :]
        return f_mu, f_var
