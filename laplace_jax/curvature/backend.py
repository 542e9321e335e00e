"""Native JAX curvature backend.

One engine replaces the reference's four third-party backends (curvlinops / ASDL /
BackPACK / asdfghjkl behind `CurvatureInterface`, `laplace/curvature/curvature.py:12`):
per-sample Jacobians via `jacrev` on the flat parameter vector, per-sample gradients
via `vmap(grad)`, GGN / empirical-Fisher / MC-Fisher / exact-Hessian contractions as
single einsums on the MXU, and KFAC factor accumulation via functional layer taps
(see `laplace_jax.curvature.kfac`). Everything here is pure and jit-compatible; the
Laplace classes jit the per-batch closures once and reuse them across the fit loop.

Loss/factor conventions match the reference exactly
(`curvature/curvature.py:63-72`): regression uses sum-of-squares with factor 1/2
(Gaussian log-lik up to constants), classification uses sum cross-entropy with
factor 1.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from laplace_jax.curvature.kfac import kfac_factors
from laplace_jax.enums import Likelihood
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.matrix import Kron


def _trace_errors() -> tuple:
    """Exception classes a singleton-batch trace raises when model parameters
    are shape-coupled to the batch: shape errors from jnp/lax (TypeError /
    ValueError) and flax's scope shape checks (FlaxError). Anything else —
    e.g. a NameError in user code — propagates instead of silently taking
    the quadratic-memory whole-batch path."""
    from flax.errors import FlaxError

    return (TypeError, ValueError, FlaxError)


def _warn_batch_fallback(exc: Exception) -> None:
    import warnings

    warnings.warn(
        "Per-sample vmapped Jacobians failed to trace (model parameters "
        "appear shape-coupled to the batch); falling back to the whole-batch "
        f"jacrev, whose memory is QUADRATIC in batch size. Cause: {exc}",
        RuntimeWarning,
        stacklevel=3,
    )


def mse_sum(f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((f - y) ** 2)


def cross_entropy_sum(f: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(f, axis=-1)
    return -jnp.sum(jnp.take_along_axis(logp, y[..., None].astype(int), axis=-1))


class CurvatureBackend:
    """Curvature engine for one `NNModel` and likelihood.

    Parameters
    ----------
    model : NNModel
    likelihood : 'classification' | 'regression'
    curv_type : 'ggn' | 'ef' | 'hessian'
    stochastic : bool — MC-Fisher instead of exact GGN contraction
    num_samples : int — MC samples when `stochastic`
    last_layer : bool — use the φ⊗I closed-form Jacobian
        (`curvature/curvature.py:131-167`) and restrict curvature to the last
        layer's parameters (the NNModel must then have only those trainable).
    subnetwork_indices : optional int array into the canonical flat vector.
    ef_chunk_size : samples per empirical-Fisher accumulation chunk (peak
        extra memory chunk·P); None = memory-aware default (~64 MiB of
        per-sample gradients, clamped to [4, 128]).
    """

    def __init__(
        self,
        model: NNModel,
        likelihood: Likelihood | str,
        curv_type: str = "ggn",
        stochastic: bool = False,
        num_samples: int = 1,
        last_layer: bool = False,
        last_layer_path: Optional[tuple] = None,
        last_layer_dense: bool = True,
        feature_reduction=None,
        subnetwork_indices: Optional[jnp.ndarray] = None,
        kron_unsupported: str = "skip",
        kron_block_max_params: int = 8192,
        ef_chunk_size: Optional[int] = None,
    ):
        if likelihood not in (Likelihood.REGRESSION, Likelihood.CLASSIFICATION):
            raise ValueError("Backend likelihood must be regression or classification.")
        if curv_type not in ("ggn", "ef", "hessian"):
            raise ValueError(f"Unknown curv_type {curv_type}.")
        self.model = model
        self.likelihood = likelihood
        self.curv_type = curv_type
        self.stochastic = stochastic
        self.num_samples = num_samples
        self.last_layer = last_layer
        self.last_layer_path = last_layer_path
        self.last_layer_dense = last_layer_dense
        self.feature_reduction = feature_reduction
        self.subnetwork_indices = subnetwork_indices
        if kron_unsupported not in ("skip", "block", "raise"):
            raise ValueError(
                f"kron_unsupported must be 'skip', 'block', or 'raise', got "
                f"{kron_unsupported!r}."
            )
        self.kron_unsupported = kron_unsupported
        if kron_block_max_params < 1:
            raise ValueError(
                f"kron_block_max_params must be >= 1, got "
                f"{kron_block_max_params}."
            )
        self.kron_block_max_params = kron_block_max_params
        if ef_chunk_size is not None and ef_chunk_size < 1:
            raise ValueError(f"ef_chunk_size must be >= 1, got {ef_chunk_size}.")
        self.ef_chunk_size = ef_chunk_size

        if likelihood == Likelihood.REGRESSION:
            self.lossfunc = mse_sum
            self.factor = 0.5
        else:
            self.lossfunc = cross_entropy_sum
            self.factor = 1.0
        self._jit_dispatch = None  # jitted jacobian fn for the predictive path

    # ------------------------------------------------------------------ jacs
    def jacobians(self, x, theta: Optional[jnp.ndarray] = None):
        """Full per-sample Jacobians J (batch, outputs, n_params) and f (batch,
        outputs) (reference `curvature/curvature.py:88-129`). Differentiable in
        `x` (for `enable_backprop` use cases) because it is a pure function.

        With `subnetwork_indices`, differentiation runs w.r.t. the subvector
        directly so only a (B, C, P_subnet) array is ever materialized (the
        reference slices the full Jacobian, `curvature.py:126-127`)."""
        theta = self.model.mean_vector if theta is None else theta

        # per-sample jacrev under vmap, NOT jacrev of the whole-batch
        # closure: batch-level jacrev pulls every one of the B*C output
        # cotangents back through the WHOLE batch graph, materializing
        # (B*C, B, activations) cross-sample intermediates that are zero
        # off the sample diagonal — quadratic in B, and TPU tile padding
        # inflates them further (measured 25.9 GiB for LeNet at batch 32,
        # 8.7% utilization: an instant OOM on a 16 GiB chip). Per-sample
        # jacobians are independent, so vmap keeps intermediates linear
        # in B. Per-sample forward semantics match the per-sample gradient
        # path below (reference jacobians are per-sample too,
        # `curvature/curvature.py:88-129`). Models whose parameters are
        # shape-coupled to the batch (e.g. `DenseGeneral(batch_dims=...)`)
        # cannot run with a singleton batch — tracing raises, and we fall
        # back to the whole-batch closure for them.
        if self.subnetwork_indices is not None:
            idx = self.subnetwork_indices

            def jac_sub(xi):
                def f_sub(t_sub):
                    return self.model.apply_vec_curv(
                        theta.at[idx].set(t_sub), _expand(xi)
                    )[0]

                return jax.jacrev(f_sub)(theta[idx])  # (C, P_sub)

            try:
                Js = jax.vmap(jac_sub)(x)
            except _trace_errors() as exc:
                # batch-coupled params (singleton-batch trace fails): fall
                # back to the whole-batch closure — the quadratic-memory
                # path (B*C cotangents through the full batch graph). A
                # genuine shape bug raises again from the fallback trace,
                # so only truly batch-coupled models pay (and hear about)
                # the memory cost.
                _warn_batch_fallback(exc)

                def f_sub_batch(t_sub):
                    return self.model.apply_vec_curv(theta.at[idx].set(t_sub), x)

                Js = jax.jacrev(f_sub_batch)(theta[idx])  # (B, C, P_sub)
            f = self.model.apply_vec_curv(theta, x)
            return Js, f

        def jac_single(xi):
            def f_one(t):
                return self.model.apply_vec_curv(t, _expand(xi))[0]

            return jax.jacrev(f_one)(theta)  # (C, P)

        try:
            Js = jax.vmap(jac_single)(x)
        except _trace_errors() as exc:
            # see above: warn, then let a real shape bug raise from the
            # whole-batch trace instead of masking it
            _warn_batch_fallback(exc)

            def f_batch(t):
                return self.model.apply_vec_curv(t, x)

            Js = jax.jacrev(f_batch)(theta)  # (B, C, P)
        f = self.model.apply_vec_curv(theta, x)
        return Js, f

    def last_layer_jacobians(self, x, train_params=None):
        """Closed-form last-layer Jacobians via features φ.

        flax flatten order within a Dense layer is (bias, kernel); the kernel is
        input-major (in, out) so `J_kernel[:, c, i*out+o] = φ_i δ_{co}` and
        `J_bias = I`. Reference equivalent: `curvature/curvature.py:131-167`.
        """
        if self.last_layer_path is None:
            raise ValueError("last_layer_path not set on backend.")
        train_params = (
            self.model.train_params if train_params is None else train_params
        )
        f, phi = self.model.apply_with_features(
            train_params, x, self.last_layer_path, self.feature_reduction
        )
        B = phi.shape[0]
        C = f.shape[-1]
        eye = jnp.eye(C, dtype=f.dtype)
        identity = jnp.broadcast_to(eye, (B, C, C))
        J_kernel = jnp.einsum("bi,co->bcio", phi, eye).reshape(B, C, -1)
        # leaf order: bias before kernel (alphabetical flax dict order)
        has_bias = any(
            s.path[-1] == "bias" for s in self.model.leaf_specs
            if _under(s.path, self.last_layer_path)
        )
        if has_bias:
            Js = jnp.concatenate([identity, J_kernel], axis=2)
        else:
            Js = J_kernel
        return Js, f

    def _jacobians_dispatch(self, x):
        """Jitted Jacobian path for predictives; the current parameters are a
        traced argument so later `set_params` calls stay correct. Last-layer
        models with a Dense head use the closed-form φ⊗I Jacobian; non-Dense
        heads (conv / DenseGeneral / norm — the reference supports none of
        these, `feature_extractor.py:144-145`) differentiate w.r.t. the head's
        restricted flat parameter vector directly."""
        use_phi = self.last_layer and self.last_layer_dense
        if self._jit_dispatch is None:
            if use_phi:
                self._jit_dispatch = jax.jit(
                    lambda tp, xx: self.last_layer_jacobians(xx, train_params=tp)
                )
            else:
                self._jit_dispatch = jax.jit(
                    lambda th, xx: self.jacobians(xx, theta=th)
                )
        arg = self.model.train_params if use_phi else self.model.mean_vector
        return self._jit_dispatch(arg, x)

    # -------------------------------------------------------------- gradients
    def _per_sample_grad_fn(self):
        """Per-sample loss gradient closure and its primal point. With
        `subnetwork_indices`, differentiation runs w.r.t. the subvector
        directly so nothing (B, P)-sized is ever built for subnet curvature
        (the reference slices full gradients, `curvature.py:204-207`)."""
        theta = self.model.mean_vector
        idx = self.subnetwork_indices
        if idx is not None:

            def loss_single(t_sub, xi, yi):
                f = self.model.apply_vec_curv(
                    theta.at[idx].set(t_sub), _expand(xi)
                )
                return self.lossfunc(f, _expand(yi))

            return loss_single, theta[idx]

        def loss_single(t, xi, yi):
            f = self.model.apply_vec_curv(t, _expand(xi))
            return self.lossfunc(f, _expand(yi))

        return loss_single, theta

    def gradients(self, x, y):
        """Per-sample loss gradients Gs (batch, n_params[_subnet]) and total
        loss (reference `curvature/curvature.py:169-210`)."""
        loss_single, t0 = self._per_sample_grad_fn()
        Gs = jax.vmap(jax.grad(loss_single), in_axes=(None, 0, 0))(t0, x, y)
        theta = self.model.mean_vector
        loss = self.lossfunc(self.model.apply_vec_curv(theta, x), y)
        return Gs, loss

    def _ef_accumulate(self, x, y, mode: str):
        """Empirical-Fisher contraction streamed over sample chunks: a
        `lax.scan` accumulates `Σ_chunk GᵀG` (full) or `Σ G²` (diag) so peak
        memory is chunk·P (+ the P×P output for full) instead of B·P — the
        BackPACK-class capability the reference lacks for full EF."""
        loss_single, t0 = self._per_sample_grad_fn()
        grad_fn = jax.grad(loss_single)
        P = t0.shape[0]
        B = _leading_dim(y)
        chunk = self.ef_chunk_size
        if chunk is None:
            chunk = _default_ef_chunk(P, jnp.dtype(t0.dtype).itemsize)
        chunk = min(B, chunk)
        main = (B // chunk) * chunk
        dtype = t0.dtype
        init = (
            jnp.zeros((P, P), dtype=dtype)
            if mode == "full"
            else jnp.zeros((P,), dtype=dtype)
        )

        def contract(acc, Gc):
            if mode == "full":
                return acc + Gc.T @ Gc
            return acc + jnp.einsum("bp,bp->p", Gc, Gc)

        def body(acc, inp):
            xc, yc = inp
            Gc = jax.vmap(grad_fn, in_axes=(None, 0, 0))(t0, xc, yc)
            return contract(acc, Gc), None

        H = init
        if main > 0:
            xm = _reshape_chunks(_take_slice(x, 0, main), main // chunk, chunk)
            ym = _reshape_chunks(y[:main], main // chunk, chunk)
            H, _ = jax.lax.scan(body, init, (xm, ym))
        if main < B:
            Gr = jax.vmap(grad_fn, in_axes=(None, 0, 0))(
                t0, _take_slice(x, main, B), y[main:]
            )
            H = contract(H, Gr)
        theta = self.model.mean_vector
        loss = self.lossfunc(self.model.apply_vec_curv(theta, x), y)
        return H, loss

    # ------------------------------------------------------- likelihood middles
    def _functional_hessian(self, f: jnp.ndarray):
        """Λ = ∂²(-log lik)/∂f²: None (≡ I) for regression, diag(p)-ppᵀ for
        classification (reference `curvature/curvature.py:366-373`)."""
        if self.likelihood == Likelihood.REGRESSION:
            return None
        p = jax.nn.softmax(f, axis=-1)
        return jnp.einsum("bc,ck->bck", p, jnp.eye(f.shape[-1], dtype=f.dtype)) - \
            jnp.einsum("bc,bk->bck", p, p)

    def _mc_functional_fisher(self, f: jnp.ndarray, key: jax.Array):
        """MC estimate of E[∇f ∇fᵀ] with sampled labels
        (reference `curvature/curvature.py:341-364`)."""
        F = jnp.zeros((f.shape[0], f.shape[-1], f.shape[-1]), dtype=f.dtype)
        for i in range(self.num_samples):
            k = jax.random.fold_in(key, i)
            if self.likelihood == Likelihood.REGRESSION:
                y_sample = f + jax.random.normal(k, f.shape, dtype=f.dtype)
                grad_sample = f - y_sample
            else:
                p = jax.nn.softmax(f, axis=-1)
                cls = jax.random.categorical(k, f, axis=-1)
                y_sample = jax.nn.one_hot(cls, f.shape[-1], dtype=f.dtype)
                grad_sample = p - y_sample
            F = F + jnp.einsum("bc,bk->bck", grad_sample, grad_sample) / self.num_samples
        return F

    # ------------------------------------------------------------------ full
    def full(self, x, y, N: int = 1, key: Optional[jax.Array] = None):
        """Dense P×P curvature (reference `curvature.py:375-411`, `:467-493`)."""
        if self.curv_type == "ef":
            H, loss = self._ef_accumulate(x, y, mode="full")
            return self.factor * loss, self.factor * H
        if self.curv_type == "hessian":
            theta = self.model.mean_vector

            def total_loss(t):
                return self.lossfunc(self.model.apply_vec_curv(t, x), y)

            H = jax.hessian(total_loss)(theta)
            if self.subnetwork_indices is not None:
                H = H[self.subnetwork_indices][:, self.subnetwork_indices]
            loss = total_loss(theta)
            return self.factor * loss, self.factor * H
        # ggn
        Js, f = self._jacobians_dispatch(x)
        if self.stochastic:
            key = jax.random.key(0) if key is None else key
            lam = self._mc_functional_fisher(f, key)
            H = jnp.einsum("bcp,bck,bkq->pq", Js, lam, Js)
        else:
            # symmetric rank-k form H = MᵀM with M the Λ^{1/2}-weighted
            # Jacobian rows — halves the MXU work via the Pallas SYRK kernel
            # on aligned TPU shapes (falls back to a plain einsum otherwise)
            from laplace_jax.curvature.kfac import _sqrt_hessian_cotangents
            from laplace_jax.ops.syrk import syrk

            B, C, P = Js.shape
            if self.likelihood == Likelihood.REGRESSION:
                M = Js.reshape(B * C, P)
            else:
                S = _sqrt_hessian_cotangents(f, self.likelihood, f.dtype)
                M = jnp.einsum("cbk,bkp->bcp", S, Js).reshape(B * C, P)
            H = syrk(M)
        loss = self.factor * self.lossfunc(f, y)
        return loss, H

    def _can_use_taps(self) -> bool:
        """Layer-tap fast paths need a flax module, whole-model scope, and all
        trainable leaves living under intercepted Dense/Conv/DenseGeneral/
        Einsum/Embed/norm layers."""
        if self.model.module is None or self.subnetwork_indices is not None:
            return False
        return all(
            s.path[-1] in ("kernel", "bias", "scale", "embedding")
            for s in self.model.leaf_specs
        )

    # ------------------------------------------------------------------ diag
    def diag(self, x, y, N: int = 1, key: Optional[jax.Array] = None):
        """Diagonal curvature (reference `curvature.py:413-433`, `:495-505`).

        For flax models the exact diagonal is computed per layer from taps
        (`diag_taps.py`) without materializing the (B, C, P) Jacobian — the
        capability the reference gets from BackPACK/ASDL module extensions."""
        if (
            not self.stochastic
            and self.curv_type in ("ggn", "ef")
            and not self.last_layer
            and self._can_use_taps()
        ):
            from laplace_jax.curvature.diag_taps import (
                TapUnsupported,
                diag_curvature_taps,
            )

            try:
                loss, d = diag_curvature_taps(
                    self.model, x, y, self.likelihood, self.lossfunc,
                    curv_type=self.curv_type,
                )
            except TapUnsupported:
                pass  # e.g. DenseGeneral batch_dims / exotic einsum: J-path
            else:
                if self.curv_type == "ef":  # EF scales H; GGN does not
                    d = self.factor * d
                return self.factor * loss, d
        if self.curv_type == "ef":
            d, loss = self._ef_accumulate(x, y, mode="diag")
            return self.factor * loss, self.factor * d
        if self.curv_type == "hessian":
            loss, H = self.full(x, y, N)
            return loss, jnp.diagonal(H)
        Js, f = self._jacobians_dispatch(x)
        if self.stochastic:
            key = jax.random.key(0) if key is None else key
            lam = self._mc_functional_fisher(f, key)
            H = jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)
        else:
            lam = self._functional_hessian(f)
            if lam is None:
                H = jnp.einsum("bcp,bcp->p", Js, Js)
            else:
                H = jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)
        loss = self.factor * self.lossfunc(f, y)
        return loss, H

    # ------------------------------------------------------------------ kron
    def kron(self, x, y, N: int, key: Optional[jax.Array] = None) -> tuple:
        """KFAC factors as a `Kron` (reference `curvature/curvlinops.py:77-108`).

        Normalization contract (pinned by the reference's tests, see
        `tests/test_curv_backends_asdl.py:296-360`): per batch of size M out of N
        total points, the activation factor carries 1/N so factor groups add
        across batches; a single data point through a Dense layer is exact.
        """
        if self.curv_type == "hessian":
            raise ValueError(
                "KFAC with the exact Hessian is undefined; use a GGN/EF/MC "
                "backend (the reference's Hessian backend has no kron either, "
                "`curvature/curvlinops.py:183-188`)."
            )
        if self.curv_type == "ef":
            fisher_type = "empirical"
        elif self.stochastic:
            fisher_type = "mc"
        else:
            fisher_type = "exact"
        loss, kron = kfac_factors(
            self.model,
            x,
            y,
            N=N,
            likelihood=self.likelihood,
            lossfunc=self.lossfunc,
            fisher_type=fisher_type,
            num_samples=self.num_samples,
            key=key,
            last_layer_path=self.last_layer_path if self.last_layer else None,
            unsupported=self.kron_unsupported,
            block_max_params=self.kron_block_max_params,
        )
        kron = kron * self.factor
        return self.factor * loss, kron

    # ----------------------------------------------------------------- lowrank
    def eig_lowrank(self, loader, low_rank: int = 10, parallel=None):
        """Truncated eigendecomposition of the curvature via matrix-free Lanczos
        (replaces asdfghjkl's `eig_lowrank`, `curvature/asdfghjkl.py:212-236`)."""
        from laplace_jax.curvature.lanczos import lanczos_eig_curvature

        return lanczos_eig_curvature(self, loader, low_rank, parallel=parallel)


def _default_ef_chunk(P: int, itemsize: int = 4) -> int:
    """Memory-aware EF chunk: target ~64 MiB of per-sample gradient buffer
    (chunk · P · itemsize), clamped to [4, 128]. Small models get big chunks
    (throughput); huge models stay within a bounded activation+grad budget.
    Override per backend via the `ef_chunk_size` kwarg."""
    target_bytes = 64 << 20
    return max(4, min(128, target_bytes // max(P * itemsize, 1)))


def _expand(v):
    """Add back the batch dim removed by vmap (tensor or dict batch)."""
    if isinstance(v, dict):
        return {k: a[None] for k, a in v.items()}
    return v[None]


def _leading_dim(v) -> int:
    if isinstance(v, dict):
        v = next(iter(v.values()))
    return v.shape[0]


def _take_slice(v, start: int, stop: int):
    if isinstance(v, dict):
        return {k: a[start:stop] for k, a in v.items()}
    return v[start:stop]


def _reshape_chunks(v, nchunks: int, chunk: int):
    if isinstance(v, dict):
        return {
            k: a.reshape(nchunks, chunk, *a.shape[1:]) for k, a in v.items()
        }
    return v.reshape(nchunks, chunk, *v.shape[1:])


def _under(leaf_path, module_path) -> bool:
    """Exact module ownership (see `nnmodel._path_contains`)."""
    from laplace_jax.nnmodel import _leaf_module_path

    return _leaf_module_path(leaf_path) == tuple(module_path)


# -- reference-style named backends (API familiarity) ---------------------------


def GGNBackend(model, likelihood, stochastic: bool = False, num_samples: int = 1,
               **kw) -> CurvatureBackend:
    return CurvatureBackend(model, likelihood, "ggn", stochastic=stochastic,
                            num_samples=num_samples, **kw)


def EFBackend(model, likelihood, **kw) -> CurvatureBackend:
    return CurvatureBackend(model, likelihood, "ef", **kw)


def HessianBackend(model, likelihood, **kw) -> CurvatureBackend:
    return CurvatureBackend(model, likelihood, "hessian", **kw)
