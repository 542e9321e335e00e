"""FunctionalLaplace: GP inference via the GLM ↔ GP duality.

TPU-native counterpart of the reference's `FunctionalLaplace`
(`laplace/baselaplace.py:2138-3312`) and `FunctionalLLLaplace`
(`laplace/lllaplace.py:509-641`): the GGN-linearized model is a GP with NTK
kernel `K = J Jᵀ` evaluated on a subset-of-data (SoD) of size M; the predictive
is `k** − K*M (K_MM + Λ⁻¹)⁻¹ K_M*` and the marginal likelihood follows
R&W (2006) eq. 3.44 with a diagonal approximation of the likelihood Hessian.

TPU-first difference from the reference: the reference recomputes Jacobians for
every batch pair in a double loop during fit *and* for every train batch on
every predictive call (`baselaplace.py:2524-2529`, `:2747-2753`). Here SoD
Jacobians are by default computed once per batch with a jitted function and
cached as a single `(M, C, P)` array, so K_MM assembly and every predictive
reduce to one MXU einsum. Above a memory threshold (or with `streaming=True`)
the fit falls back to the reference's batch-pair double loop with transient
per-batch Jacobians, so all-weights GP on large-P nets runs in bounded memory.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from laplace_jax.baselaplace import BaseLaplace, _as_device, _probe
from laplace_jax.enums import (
    FeatureReduction,
    Likelihood,
    LinkApprox,
    PredType,
    PriorStructure,
    TuningMethod,
)
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader, dataset_size
from laplace_jax.utils.sod import sod_indices

__all__ = ["FunctionalLaplace", "FunctionalLLLaplace"]

# auto-streaming kicks in when the (M, C, P) SoD Jacobian cache would exceed
# this many bytes (1 GiB — an 11M-param net at M=256, C=10 would need ~45 GiB)
_STREAMING_THRESHOLD_BYTES = 1 << 30


class FunctionalLaplace(BaseLaplace):
    """GP-equivalent of a GGN Laplace approximation (reference
    `baselaplace.py:2138`).

    Parameters beyond `BaseLaplace`: `n_subset` (SoD size M),
    `independent_outputs` (store C separate M×M kernels instead of MC×MC),
    `seed` (SoD sampler seed).
    """

    _key = ("all", "gp")

    def __init__(self, model, likelihood, n_subset: int, sigma_noise=1.0,
                 prior_precision=1.0, prior_mean=0.0, temperature=1.0,
                 enable_backprop: bool = False, dict_key_x="input_ids",
                 dict_key_y="labels", backend="ggn", backend_kwargs=None,
                 independent_outputs: bool = False, seed: int = 0, params=None,
                 parallel=None, streaming: Optional[bool] = None):
        self._check_prior_precision(prior_precision)
        super().__init__(model, likelihood, sigma_noise, prior_precision,
                         prior_mean, temperature, enable_backprop, dict_key_x,
                         dict_key_y, backend, backend_kwargs, params, parallel)
        self.n_subset = n_subset
        self.independent_outputs = independent_outputs
        self.seed = seed
        # None = auto: stream when the (M, C, P) SoD Jacobian cache would
        # exceed _STREAMING_THRESHOLD_BYTES (large-P nets); the streaming fit
        # assembles K_MM batch-pair-wise with transient per-batch Jacobians,
        # matching the reference's always-streaming behavior
        # (`baselaplace.py:2420-2534`)
        self.streaming = streaming

        self.K_MM = None
        self.Sigma_chol = None  # cholesky of K_MM + Λ^{-1}
        self.L = None  # diagonal likelihood Hessian at the SoD points
        self.mu = None  # mean term of the marglik scatter
        self.Js_M = None  # cached SoD Jacobians (M, C, P)
        self._sod_x = None  # SoD inputs for recomputing Js after load
        self._prior_factor_sod = None
        self.mean = self.model.mean_vector
        self._fitted = False
        self._recompute_Sigma = True

    @staticmethod
    def _check_prior_precision(prior_precision):
        """Only isotropic priors fit the GP view (reference `:2263-2274`)."""
        pp = np.atleast_1d(np.asarray(prior_precision))
        if pp.ndim > 1 or pp.shape[0] != 1:
            raise ValueError("Only isotropic priors supported in FunctionalLaplace")

    # ---------------------------------------------------------------- fitting
    def _jacobians(self, x):
        """Jacobian hook (jitted); overridden by the last-layer variant
        (reference `baselaplace.py:3124-3131`)."""
        xd = _as_device(x)
        if self.parallel is not None:
            xd = self.parallel.shard_batch(xd)
        return self.backend._jacobians_dispatch(xd)

    def fit(self, train_loader, progress_bar: bool = False) -> None:
        """Build K_MM, Λ, and the Cholesky of (K_MM + Λ⁻¹) on an SoD subset
        (reference `baselaplace.py:2420-2534`)."""
        self._check_loader(train_loader)
        data = next(iter(train_loader))
        X_probe, _ = self._unpack_batch(data)
        out = jax.eval_shape(
            self.model.apply, self.model.train_params, _probe(X_probe)
        )
        self.n_outputs = out.shape[-1]

        if (
            self.likelihood == Likelihood.REGRESSION
            and self.n_outputs > 1
            and self.independent_outputs
        ):
            warnings.warn(
                "Using FunctionalLaplace with the diagonal approximation of a GP "
                "kernel is not recommended in the case of multivariate regression."
            )

        # the cached compiled prior-tuning loop bakes fitted state in as
        # trace constants; a new fit invalidates it
        self._prior_tune_cache = None
        N = dataset_size(train_loader)
        self.n_data = N
        if self.n_subset > N:
            raise AssertionError(
                "`n_subset` must be less than or equal to the original number of "
                "data points."
            )
        idx = sod_indices(N, self.n_subset, seed=self.seed)
        sod_loader = self._subset_loader(train_loader, idx)
        self._prior_factor_sod = self.n_subset / self.n_data

        self.loss = 0.0
        Js_list, f_list, lambdas, mus, xs = [], [], [], [], []
        theta = self.model.mean_vector

        use_streaming = self.streaming
        if use_streaming is None:
            itemsize = jnp.dtype(self._dtype).itemsize
            use_streaming = (
                self.n_subset * self.n_outputs * self.n_params * itemsize
                > _STREAMING_THRESHOLD_BYTES
            )

        if progress_bar:  # reference `baselaplace.py:2466-2470`
            from tqdm.auto import tqdm

            sod_loader = tqdm(sod_loader, desc="[GP fit]")
        for data in sod_loader:
            X, y = self._unpack_batch(data)
            Xd, yd = _as_device(X), jnp.asarray(y)
            if self.likelihood == Likelihood.REGRESSION and jnp.ndim(yd) != out.ndim:
                raise ValueError(
                    f"The model's output has {out.ndim} dims but the target has "
                    f"{jnp.ndim(yd)} dims."
                )
            if use_streaming:
                # no Jacobian here: f from one forward, μ's shift via one jvp
                f_b = jax.lax.stop_gradient(
                    self.model.apply(self.model.train_params, Xd)
                )
                mus.append(self._mean_scatter_term_batch_streaming(Xd, f_b, yd))
            else:
                Js_b, f_b = self._jacobians(Xd)
                Js_b = jax.lax.stop_gradient(Js_b)
                f_b = jax.lax.stop_gradient(f_b)
                Js_list.append(Js_b)
                mus.append(self._mean_scatter_term_batch(Js_b, f_b, yd))
            loss_b = self.backend.factor * self.backend.lossfunc(f_b, yd)
            self.loss = self.loss + loss_b

            if self.likelihood == Likelihood.REGRESSION:
                C = f_b.shape[-1]
                lam = jnp.broadcast_to(
                    jnp.eye(C, dtype=f_b.dtype), (f_b.shape[0], C, C)
                )
            else:
                p = jax.nn.softmax(f_b, axis=-1)
                lam = jax.vmap(jnp.diag)(p) - jnp.einsum("mk,mc->mck", p, p)
            lambdas.append(lam)
            f_list.append(f_b)
            xs.append(Xd)

        self._sod_x = xs
        self.mu = jnp.concatenate(mus, axis=0)
        lam_all = jnp.concatenate(lambdas, axis=0)  # (M, C, C)
        L_diag = jnp.diagonal(lam_all, axis1=-2, axis2=-1)  # (M, C)
        self.L = L_diag  # stored as (M, C); flattened/per-class views derived

        if use_streaming:
            # K_MM assembled batch-pair-wise: only two (m_b, C, P) Jacobians
            # live at a time (reference `baselaplace.py:2420-2534`)
            self.Js_M = None
            self.K_MM = self._kernel_streaming(xs)
        else:
            self.Js_M = jnp.concatenate(Js_list, axis=0)  # (M, C, P)
            # K_MM via one MXU contraction on the cached Jacobians
            M, C, P = self.Js_M.shape
            if self.independent_outputs:
                # (C, M, M)
                self.K_MM = jnp.einsum("mcp,ncp->cmn", self.Js_M, self.Js_M)
            else:
                Jflat = self.Js_M.reshape(M * C, P)
                self.K_MM = Jflat @ Jflat.T

        self._build_Sigma_inv()
        self._fitted = True
        self._recompute_Sigma = False

    def _mean_scatter_term_batch_streaming(self, Xd, f, y):
        """`_mean_scatter_term_batch` without a Jacobian: the shift
        `J (μ₀ − θ)` is one jvp."""
        theta = self.model.mean_vector
        v = jnp.broadcast_to(self.prior_mean, theta.shape) - theta
        _, shift = jax.jvp(
            lambda t: self.model.apply_vec_curv(t, Xd), (theta,), (v,)
        )
        shift = jax.lax.stop_gradient(shift)
        if self.likelihood == Likelihood.REGRESSION:
            return y - (f + shift)
        return -shift

    def _kernel_streaming(self, batches) -> jnp.ndarray:
        """K_MM from a double loop over SoD batch pairs (j ≥ i) with transient
        per-batch Jacobians (reference `baselaplace.py:2420-2534`)."""
        C = self.n_outputs
        sizes = []
        row_blocks = []
        for i, X_i in enumerate(batches):
            Js_i, _ = self._jacobians(X_i)
            Js_i = jax.lax.stop_gradient(Js_i)
            sizes.append(Js_i.shape[0])
            blocks = []
            for j, X_j in enumerate(batches):
                if j < i:
                    blocks.append(None)  # filled by symmetry below
                    continue
                if j == i:
                    Js_j = Js_i
                else:
                    Js_j, _ = self._jacobians(X_j)
                    Js_j = jax.lax.stop_gradient(Js_j)
                if self.independent_outputs:
                    blocks.append(jnp.einsum("mcp,ncp->cmn", Js_i, Js_j))
                else:
                    blocks.append(
                        jnp.einsum("mcp,nep->mcne", Js_i, Js_j).reshape(
                            Js_i.shape[0] * C, Js_j.shape[0] * C
                        )
                    )
            row_blocks.append(blocks)
        # mirror the strictly-lower blocks from the computed upper triangle
        nb = len(batches)
        for i in range(nb):
            for j in range(i):
                if self.independent_outputs:
                    row_blocks[i][j] = jnp.swapaxes(row_blocks[j][i], -1, -2)
                else:
                    row_blocks[i][j] = row_blocks[j][i].T
        # both layouts concatenate rows over the second-to-last axis: blocks
        # are (C, m_i, m_j) when independent, (m_i·C, m_j·C) otherwise
        return jnp.concatenate(
            [jnp.concatenate(row, axis=-1) for row in row_blocks], axis=-2
        )

    def _subset_loader(self, train_loader, idx):
        if hasattr(train_loader, "subset"):
            return train_loader.subset(idx)
        # generic loader: materialize then subset
        xs, ys = [], []
        for data in train_loader:
            X, y = self._unpack_batch(data)
            xs.append(np.asarray(X))
            ys.append(np.asarray(y))
        X = np.concatenate(xs)
        y = np.concatenate(ys)
        bs = getattr(train_loader, "batch_size", len(idx))
        return ArrayLoader(X[idx], y[idx], batch_size=bs)

    def _mean_scatter_term_batch(self, Js, f, y):
        """Scatter-term mean per batch (reference `baselaplace.py:3133-3165`)."""
        shift = jnp.einsum("bcp,p->bc", Js, self.prior_mean - self.mean)
        if self.likelihood == Likelihood.REGRESSION:
            return y - (f + shift)
        return -shift

    # ----------------------------------------------------------- Σ assembly
    @property
    def gp_kernel_prior_variance(self):
        """(M/N) / prior_precision (reference `baselaplace.py:2731-2733`)."""
        return self._gp_kernel_prior_variance(self.prior_precision)

    def _gp_kernel_prior_variance(self, prior_precision):
        pp = jnp.atleast_1d(prior_precision)[0]
        return self._prior_factor_sod / pp

    def _build_Sigma_inv(self) -> None:
        """Cholesky of `gp_var·K_MM + Λ⁻¹` (reference `baselaplace.py:2376-2407`)."""
        gp_var = self.gp_kernel_prior_variance
        h = self._H_factor
        if self.independent_outputs:
            chols = []
            for c in range(self.n_outputs):
                lam_c = self.L[:, c]
                diag = jnp.nan_to_num(1.0 / (h * lam_c), posinf=10.0)
                chols.append(
                    jnp.linalg.cholesky(gp_var * self.K_MM[c] + jnp.diag(diag))
                )
            self.Sigma_chol = jnp.stack(chols)
        else:
            lam = self.L.ravel()
            diag = jnp.nan_to_num(1.0 / (h * lam), posinf=10.0)
            self.Sigma_chol = jnp.linalg.cholesky(gp_var * self.K_MM + jnp.diag(diag))
        self._recompute_Sigma = False

    # ------------------------------------------------------------- predictive
    def __call__(self, x, pred_type: PredType | str = PredType.GP,
                 joint: bool = False, link_approx=LinkApprox.PROBIT,
                 n_samples: int = 100, diagonal_output: bool = False,
                 key: Optional[jax.Array] = None, fitting: bool = False):
        """GP posterior predictive (reference `baselaplace.py:2552-2646`)."""
        if not self._fitted:
            raise RuntimeError(
                "Functional Laplace has not been fitted to any training dataset. "
                "Please call .fit method."
            )
        if self._recompute_Sigma:
            warnings.warn(
                "The prior precision has been changed since fit. "
                "Re-computing its value..."
            )
            self._build_Sigma_inv()
        if pred_type != PredType.GP:
            raise ValueError("Only gp supported as prediction types.")
        if link_approx not in [la for la in LinkApprox]:
            raise ValueError(f"Unsupported link approximation {link_approx}.")

        likelihood = self.likelihood
        if likelihood == Likelihood.REWARD_MODELING:
            likelihood = Likelihood.CLASSIFICATION if fitting else Likelihood.REGRESSION

        return self._glm_forward_call(
            x, likelihood, joint, link_approx, n_samples, diagonal_output, key
        )

    def _glm_predictive_distribution(self, x, joint: bool = False):
        Js, f_mu = self._jacobians(x)
        if joint:
            f_mu = f_mu.ravel()
            f_var = self.functional_covariance(Js)
        else:
            f_var = self.functional_variance(Js)
        if not self.enable_backprop:
            f_mu, f_var = jax.lax.stop_gradient((f_mu, f_var))
        return f_mu, f_var

    def functional_samples(self, x, pred_type=PredType.GP, n_samples: int = 100,
                           diagonal_output: bool = False, key=None):
        f_mu, f_var = self._glm_predictive_distribution(x)
        return self._glm_functional_samples(
            f_mu, f_var, n_samples, diagonal_output, key
        )

    def predictive_samples(self, x, pred_type=PredType.GP, n_samples: int = 100,
                           diagonal_output: bool = False, key=None):
        f_mu, f_var = self._glm_predictive_distribution(x)
        return self._glm_predictive_samples(
            f_mu, f_var, n_samples, diagonal_output, key
        )

    def _K_M_star(self, Js_star) -> jnp.ndarray:
        """Cross-kernel J* J_Mᵀ: one einsum on the cached SoD Jacobians, or a
        streamed loop with transient per-batch Jacobians when `Js_M` is not
        cached (reference recomputes per train batch, `baselaplace.py:2747-2753`).
        Layout: (b, M, C) for independent outputs, else (b, M·C, C)."""
        b = Js_star.shape[0]
        C = self.n_outputs
        if self.Js_M is not None:
            if self.independent_outputs:
                return jnp.einsum("bcp,mcp->bmc", Js_star, self.Js_M)
            M = self.Js_M.shape[0]
            return jnp.einsum("mcp,bep->bmce", self.Js_M, Js_star).reshape(
                b, M * C, C
            )
        if self._sod_x is None:
            raise RuntimeError(
                "Streaming FunctionalLaplace predictive needs the SoD inputs; "
                "refit or load a state that includes them."
            )
        parts = []
        for X_b in self._sod_x:
            J_b, _ = self._jacobians(X_b)
            J_b = jax.lax.stop_gradient(J_b)
            if self.independent_outputs:
                parts.append(jnp.einsum("bcp,mcp->bmc", Js_star, J_b))
            else:
                parts.append(jnp.einsum("mcp,bep->bmce", J_b, Js_star))
        K = jnp.concatenate(parts, axis=1)
        if self.independent_outputs:
            return K
        return K.reshape(b, K.shape[1] * C, C)

    def functional_variance(self, Js_star) -> jnp.ndarray:
        """`k** − K*M Σ⁻¹ K M*` (reference `baselaplace.py:2735-2772`)."""
        gp_var = self.gp_kernel_prior_variance
        if self.independent_outputs:
            K_star = gp_var * jnp.einsum("bcp,bcp->bc", Js_star, Js_star)
            K_M_star = gp_var * self._K_M_star(Js_star)
            prods = []
            for c in range(self.n_outputs):
                v = jax.scipy.linalg.solve_triangular(
                    self.Sigma_chol[c], K_M_star[:, :, c].T, lower=True
                ).T  # (b, M)
                prods.append(jnp.einsum("bm,bm->b", v, v))
            f_var = K_star - jnp.stack(prods, axis=-1)
            return jax.vmap(jnp.diag)(f_var)
        K_star = gp_var * jnp.einsum("bcp,bep->bce", Js_star, Js_star)
        # (b, MC, C)
        K_M_star = gp_var * self._K_M_star(Js_star)
        v = jax.vmap(
            lambda k: jax.scipy.linalg.solve_triangular(self.Sigma_chol, k, lower=True)
        )(K_M_star)  # (b, MC, C)
        return K_star - jnp.einsum("bkm,bkn->bmn", v, v)

    def functional_covariance(self, Js_star) -> jnp.ndarray:
        """Joint covariance over the test batch (reference `baselaplace.py:2774-2814`)."""
        gp_var = self.gp_kernel_prior_variance
        b, C, P = Js_star.shape
        if self.independent_outputs:
            K_star = gp_var * jnp.einsum("acp,bcp->abc", Js_star, Js_star)
            K_M_star = gp_var * self._K_M_star(Js_star)
            prods = []
            for c in range(self.n_outputs):
                v = jax.scipy.linalg.solve_triangular(
                    self.Sigma_chol[c], K_M_star[:, :, c].T, lower=True
                ).T
                prods.append(jnp.einsum("bm,am->ba", v, v))
            f_var = K_star - jnp.stack(prods, axis=-1)  # (b, b, C)
            f_var = jax.vmap(jax.vmap(jnp.diag))(f_var)  # (b, b, C, C)
        else:
            K_star = gp_var * jnp.einsum("acp,bep->abce", Js_star, Js_star)
            K_M_star = gp_var * self._K_M_star(Js_star)
            v = jax.vmap(
                lambda k: jax.scipy.linalg.solve_triangular(
                    self.Sigma_chol, k, lower=True
                )
            )(K_M_star)
            f_var = K_star - jnp.einsum("akm,bkn->abmn", v, v)
        # (b, b, C, C) -> (bC, bC)
        return jnp.transpose(f_var, (0, 2, 1, 3)).reshape(b * C, b * C)

    # ---------------------------------------------------------------- marglik
    @property
    def log_det_ratio(self) -> jnp.ndarray:
        return self._log_det_ratio(self.prior_precision, self.sigma_noise)

    def _log_det_ratio(self, prior_precision, sigma_noise) -> jnp.ndarray:
        """GP marglik log-det term (reference `baselaplace.py:2865-2927`):
        regression `log|K + σ²I|`, classification `log|I + D^{1/2} K D^{1/2}|`."""
        gp_var = self._gp_kernel_prior_variance(prior_precision)
        if self.likelihood == Likelihood.REGRESSION:
            sn2 = sigma_noise**2
            if self.independent_outputs:
                ld = 0.0
                for c in range(self.n_outputs):
                    m = self.K_MM.shape[1]
                    ld = ld + jnp.linalg.slogdet(
                        gp_var * self.K_MM[c] + sn2 * jnp.eye(m, dtype=self._dtype)
                    )[1]
                return ld
            m = self.K_MM.shape[0]
            return jnp.linalg.slogdet(
                gp_var * self.K_MM + sn2 * jnp.eye(m, dtype=self._dtype)
            )[1]
        else:
            h = 1.0 / (sigma_noise**2) / self.temperature
            if self.independent_outputs:
                ld = 0.0
                for c in range(self.n_outputs):
                    W = jnp.sqrt(h * self.L[:, c])
                    m = self.K_MM.shape[1]
                    ld = ld + jnp.linalg.slogdet(
                        W[:, None] * gp_var * self.K_MM[c] * W[None, :]
                        + jnp.eye(m, dtype=self._dtype)
                    )[1]
                return ld
            W = jnp.sqrt(h * self.L.ravel())
            m = self.K_MM.shape[0]
            return jnp.linalg.slogdet(
                W[:, None] * gp_var * self.K_MM * W[None, :]
                + jnp.eye(m, dtype=self._dtype)
            )[1]

    @property
    def scatter(self) -> jnp.ndarray:
        return self._scatter(self.prior_precision, self.sigma_noise)

    def _scatter(self, prior_precision, sigma_noise, eps: float = 1e-5):
        """GP marglik scatter `μᵀ (K + noise I)⁻¹ μ`
        (reference `baselaplace.py:2929-2978`)."""
        gp_var = self._gp_kernel_prior_variance(prior_precision)
        noise = (
            sigma_noise**2 if self.likelihood == Likelihood.REGRESSION else eps
        )
        if self.independent_outputs:
            scatter = 0.0
            for c in range(self.n_outputs):
                m = self.K_MM.shape[1]
                chol = jnp.linalg.cholesky(
                    gp_var * self.K_MM[c] + noise * jnp.eye(m, dtype=self._dtype)
                )
                mu_term = jax.scipy.linalg.solve_triangular(
                    chol, self.mu[:, c], lower=True
                )
                scatter = scatter + jnp.dot(mu_term, mu_term)
            return scatter
        m = self.K_MM.shape[0]
        chol = jnp.linalg.cholesky(
            gp_var * self.K_MM + noise * jnp.eye(m, dtype=self._dtype)
        )
        mu_term = jax.scipy.linalg.solve_triangular(chol, self.mu.ravel(), lower=True)
        return jnp.dot(mu_term, mu_term)

    def log_marginal_likelihood(self, prior_precision=None, sigma_noise=None):
        """GP log marginal likelihood (reference `baselaplace.py:3167-3207`)."""
        if prior_precision is not None and not isinstance(
            prior_precision, jax.core.Tracer
        ):
            self.prior_precision = prior_precision
        if sigma_noise is not None:
            if self.likelihood != Likelihood.REGRESSION:
                raise ValueError("Can only change sigma_noise for regression.")
            if not isinstance(sigma_noise, jax.core.Tracer):
                self.sigma_noise = sigma_noise
        pp = self.prior_precision if prior_precision is None else jnp.atleast_1d(prior_precision)
        sn = self.sigma_noise if sigma_noise is None else jnp.asarray(sigma_noise).reshape(())
        return self._log_likelihood(sn) - 0.5 * (
            self._log_det_ratio(pp, sn) + self._scatter(pp, sn)
        )

    @BaseLaplace.prior_precision.setter
    def prior_precision(self, prior_precision):
        """Changing the prior invalidates the cached Cholesky
        (reference `baselaplace.py:3209-3230`)."""
        BaseLaplace.prior_precision.fset(self, prior_precision)
        self._recompute_Sigma = True

    def optimize_prior_precision(self, pred_type=PredType.GP,
                                 method=TuningMethod.MARGLIK, n_steps: int = 100,
                                 lr: float = 1e-1, init_prior_prec=1.0,
                                 prior_structure=PriorStructure.SCALAR,
                                 val_loader=None, loss=None,
                                 log_prior_prec_min: float = -4,
                                 log_prior_prec_max: float = 4,
                                 grid_size: int = 100,
                                 link_approx=LinkApprox.PROBIT,
                                 n_samples: int = 100, verbose: bool = False,
                                 progress_bar: bool = False) -> None:
        """GP-specific wrapper (reference `baselaplace.py:2980-3024`)."""
        if pred_type != PredType.GP:
            raise AssertionError("Only gp supported as prediction type.")
        if prior_structure != PriorStructure.SCALAR:
            raise AssertionError("Only isotropic gaussian prior supported.")
        if method == TuningMethod.MARGLIK:
            warnings.warn(
                "Use of method='marglik' in case of FunctionalLaplace is "
                "discouraged, rather use method='gridsearch'."
            )
        super().optimize_prior_precision(
            pred_type, method, n_steps, lr, init_prior_prec, prior_structure,
            val_loader, loss, log_prior_prec_min, log_prior_prec_max, grid_size,
            link_approx, n_samples, verbose, progress_bar,
        )
        self._build_Sigma_inv()

    def _log_marglik(self, prior_precision, sigma_noise):
        return self._log_likelihood(sigma_noise) - 0.5 * (
            self._log_det_ratio(prior_precision, sigma_noise)
            + self._scatter(prior_precision, sigma_noise)
        )

    # ----------------------------------------------------------- serialization
    def state_dict(self) -> dict:
        """No pickled loaders, unlike the reference (`baselaplace.py:3232-3257`
        pickles the train_loader — a quirk SURVEY.md flags); SoD inputs are
        stored as arrays instead."""
        return {
            "mean": self.mean,
            "num_data": self.n_subset,
            "diagonal_kernel": self.independent_outputs,
            "seed": self.seed,
            "K_MM": self.K_MM,
            "Sigma_chol": self.Sigma_chol,
            "Js_M": self.Js_M,
            # streaming fits need the SoD inputs for predictive cross-kernels
            "_sod_x": (
                self._sod_x
                if self._sod_x is not None
                and all(isinstance(x, jnp.ndarray) for x in self._sod_x)
                else None
            ),
            "_prior_factor_sod": self._prior_factor_sod,
            "_fitted": self._fitted,
            "_recompute_Sigma": self._recompute_Sigma,
            "mu": self.mu,
            "L": self.L,
            "loss": self.loss,
            "prior_mean": self.prior_mean,
            "prior_precision": self.prior_precision,
            "sigma_noise": self.sigma_noise,
            "n_data": self.n_data,
            "n_outputs": self.n_outputs,
            "likelihood": str(self.likelihood),
            "temperature": self.temperature,
            "enable_backprop": self.enable_backprop,
            "cls_name": self.__class__.__name__,
        }

    def load_state_dict(self, state_dict: dict) -> None:
        if self.__class__.__name__ != state_dict["cls_name"]:
            raise ValueError(
                "Loading a wrong Laplace type. Make sure `subset_of_weights` and"
                " `hessian_structure` are correct!"
            )
        if self.likelihood != state_dict["likelihood"]:
            raise ValueError("Different likelihoods detected!")
        self._prior_tune_cache = None  # compiled tuning loop baked old state
        self.mean = state_dict["mean"]
        self.n_subset = state_dict["num_data"]
        self.independent_outputs = state_dict["diagonal_kernel"]
        self.seed = state_dict["seed"]
        self.K_MM = state_dict["K_MM"]
        self.Sigma_chol = state_dict["Sigma_chol"]
        self.Js_M = state_dict["Js_M"]
        self._sod_x = state_dict.get("_sod_x", None)
        self._prior_factor_sod = state_dict["_prior_factor_sod"]
        self._fitted = state_dict["_fitted"]
        self.mu = state_dict["mu"]
        self.L = state_dict["L"]
        self.loss = state_dict["loss"]
        self.prior_mean = state_dict["prior_mean"]
        self.prior_precision = state_dict["prior_precision"]
        # Must come after the prior_precision line: that setter flips
        # _recompute_Sigma to True, which would discard the saved Cholesky.
        self._recompute_Sigma = state_dict["_recompute_Sigma"]
        self.sigma_noise = state_dict["sigma_noise"]
        self.n_data = state_dict["n_data"]
        self.n_outputs = state_dict["n_outputs"]
        self.likelihood = state_dict["likelihood"]
        self.temperature = state_dict["temperature"]
        self.enable_backprop = state_dict["enable_backprop"]


class FunctionalLLLaplace(FunctionalLaplace):
    """GP inference with last-layer Jacobians — features as GP inputs
    (reference `lllaplace.py:509-641`)."""

    _key = ("last_layer", "gp")

    def __init__(self, model, likelihood, n_subset: int, sigma_noise=1.0,
                 prior_precision=1.0, prior_mean=0.0, temperature=1.0,
                 enable_backprop: bool = False,
                 feature_reduction: FeatureReduction | str | None = None,
                 dict_key_x="input_ids", dict_key_y="labels",
                 last_layer_name: Optional[str] = None, backend="ggn",
                 backend_kwargs=None, independent_outputs: bool = False,
                 seed: int = 0, params=None):
        full_model = NNModel.wrap(model, params)
        super().__init__(full_model, likelihood, n_subset, sigma_noise,
                         prior_precision, prior_mean, temperature,
                         enable_backprop, dict_key_x, dict_key_y, backend,
                         backend_kwargs, independent_outputs, seed)
        self._full_model = full_model
        self.feature_reduction = feature_reduction
        self._last_layer_name = last_layer_name
        self.last_layer_path = None
        if last_layer_name is not None:
            self._set_last_layer(tuple(last_layer_name.split("/")))

    def _set_last_layer(self, path: tuple) -> None:
        self.last_layer_path = path
        self._full_model.last_layer_param_paths(path)  # validates the path
        mask = self._full_model.split_last_layer(path)
        self.model = NNModel(
            self._full_model.apply_fn, self._full_model.params,
            trainable_mask=mask, module=self._full_model.module,
        )
        self.n_params = self.model.n_params
        self.n_layers = self.model.n_layers
        self.mean = self.model.mean_vector
        self._backend = None
        self._backend_kwargs.update(
            last_layer=True, last_layer_path=path,
            feature_reduction=self.feature_reduction,
        )

    def fit(self, train_loader, progress_bar: bool = False) -> None:
        if self.last_layer_path is None:
            data = next(iter(train_loader))
            X, _ = self._unpack_batch(data)
            self.data = _probe(X)
            path = self._full_model.find_last_layer(self.data)
            self._set_last_layer(path)
        super().fit(train_loader, progress_bar=progress_bar)

    def _jacobians(self, x):
        return self.backend._jacobians_dispatch(_as_device(x))

    def state_dict(self) -> dict:
        sd = super().state_dict()
        sd["data"] = getattr(self, "data", None)
        sd["_last_layer_name"] = self._last_layer_name
        return sd

    def load_state_dict(self, state_dict: dict) -> None:
        if self._last_layer_name != state_dict["_last_layer_name"]:
            raise ValueError("Different `last_layer_name` detected!")
        data = state_dict["data"]
        if data is not None and self.last_layer_path is None:
            self.data = data
            self._set_last_layer(self._full_model.find_last_layer(data))
        super().load_state_dict(state_dict)
