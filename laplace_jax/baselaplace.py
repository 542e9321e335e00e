"""Laplace flavor classes: BaseLaplace, ParametricLaplace, Full/Kron/Diag/LowRank.

TPU-native re-design of the reference's `laplace/baselaplace.py`. The public API
(`fit`, `__call__`, `optimize_prior_precision`, `log_marginal_likelihood`,
`sample`, `state_dict`) matches the reference; internally everything decomposes
into pure jitted functions:

- the per-batch curvature closure is one jitted function reused across the fit
  loop (the reference's hot loop, `baselaplace.py:969-985`),
- the log marginal likelihood is a pure function of `(prior_precision,
  sigma_noise)` given the cached curvature, so `optimize_prior_precision` is a
  jitted optax-Adam loop instead of torch Adam-on-leaf-tensors
  (`baselaplace.py:466-485`),
- sampling and predictives thread explicit PRNG keys instead of torch Generators.
"""

from __future__ import annotations

import functools
import math
import warnings
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.enums import (
    Likelihood,
    LinkApprox,
    PredType,
    PriorStructure,
    TuningMethod,
)
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import dataset_size
from laplace_jax.utils.linalg import invsqrt_precision, normal_samples
from laplace_jax.utils.matrix import Kron, KronDecomposed
from laplace_jax.utils.prior import fix_prior_prec_structure
from laplace_jax.utils.tracecount import TRACE_COUNTS

__all__ = [
    "BaseLaplace",
    "ParametricLaplace",
    "FullLaplace",
    "KronLaplace",
    "DiagLaplace",
    "LowRankLaplace",
]


def _is_traced(x) -> bool:
    return isinstance(x, jax.core.Tracer)


import contextlib


@contextlib.contextmanager
def _swap_params(model, train_params):
    """Temporarily install `train_params` (possibly tracers) as the model's
    trainable parameters. Used to functionalize the curvature closures: the
    backend reads `model.train_params` / `mean_vector` internally, so swapping
    in a traced argument during tracing makes the compiled closure a pure
    function of the parameters — refits after `set_params` (e.g. every
    `marglik_training` tuning round) then reuse the compiled program instead
    of baking stale parameter constants."""
    old = model.train_params
    model.train_params = train_params
    try:
        yield
    finally:
        model.train_params = old


class BaseLaplace:
    """Baseclass for all Laplace approximations (reference `baselaplace.py:51`).

    Parameters mirror the reference: `model` (NNModel / flax module+params /
    apply_fn+params), `likelihood`, `sigma_noise`, `prior_precision`,
    `prior_mean`, `temperature`, `enable_backprop`, `dict_key_x/y`, `backend`
    ('ggn' | 'ef' | 'hessian' | a CurvatureBackend factory), `backend_kwargs`.
    """

    def __init__(
        self,
        model,
        likelihood: Likelihood | str,
        sigma_noise: float = 1.0,
        prior_precision=1.0,
        prior_mean=0.0,
        temperature: float = 1.0,
        enable_backprop: bool = False,
        dict_key_x: str = "input_ids",
        dict_key_y: str = "labels",
        backend=None,
        backend_kwargs: Optional[dict] = None,
        params=None,
        parallel=None,
    ):
        if likelihood not in [lik.value for lik in Likelihood]:
            raise ValueError(f"Invalid likelihood type {likelihood}")
        # optional laplace_jax.parallel.DataParallel: shards per-batch curvature
        # over a device mesh (SURVEY.md §2.6 — capability the reference lacks)
        self.parallel = parallel
        self.model: NNModel = NNModel.wrap(model, params)
        self.likelihood = likelihood

        self.n_params = self.model.n_params
        self.n_layers = self.model.n_layers
        self.is_subset_params = self.model.is_subset

        self._posterior_scale = None
        self.prior_precision = prior_precision
        self.prior_mean = prior_mean
        if sigma_noise != 1 and likelihood != Likelihood.REGRESSION:
            raise ValueError("Sigma noise != 1 only available for regression.")
        self.sigma_noise = sigma_noise
        self.temperature = temperature
        self.enable_backprop = enable_backprop
        self.dict_key_x = dict_key_x
        self.dict_key_y = dict_key_y

        self._backend: Optional[CurvatureBackend] = None
        self._backend_arg = backend
        self._backend_kwargs = dict(backend_kwargs or {})

        self.loss = 0.0
        self.n_outputs = 0
        self.n_data = 0
        # fused end-to-end GLM predictive programs, keyed by
        # (entry, likelihood, joint, link, n_samples, diagonal, backprop);
        # posterior state flows in as a pytree ARGUMENT so refits and prior
        # updates never retrace (see _fused_entry)
        self._pred_programs: dict = {}
        # internal PRNG state for MC predictives/sampling when the caller
        # passes no key: advances per use so repeated calls are NOT
        # bit-identical — matching the reference, whose torch generator
        # advances state across calls (`baselaplace.py:697-714`). Explicit
        # keys remain fully reproducible.
        self._rng = None

    def _next_key(self) -> jax.Array:
        """Split-and-advance the internal PRNG key (deterministic from seed 0
        at construction; one stream per instance)."""
        if self._rng is None:
            self._rng = jax.random.key(0)
        self._rng, k = jax.random.split(self._rng)
        return k

    # ------------------------------------------------------------- dtype
    @property
    def _dtype(self):
        return jax.tree_util.tree_leaves(self.model.train_params)[0].dtype

    # ------------------------------------------------------------- backend
    @property
    def backend(self) -> CurvatureBackend:
        """Lazily built backend (reference `baselaplace.py:180-194`)."""
        if self._backend is None:
            likelihood = (
                Likelihood.CLASSIFICATION
                if self.likelihood == Likelihood.REWARD_MODELING
                else self.likelihood
            )
            arg = self._backend_arg
            if arg is None:
                arg = "ggn"
            if isinstance(arg, str):
                ct, stoch = {
                    "ggn": ("ggn", False),
                    "mc": ("ggn", True),
                    "ef": ("ef", False),
                    "hessian": ("hessian", False),
                }[arg]
                kw = dict(self._backend_kwargs)
                stoch = kw.pop("stochastic", stoch)
                self._backend = CurvatureBackend(
                    self.model, likelihood, curv_type=ct, stochastic=stoch, **kw
                )
            elif callable(arg):
                self._backend = arg(self.model, likelihood, **self._backend_kwargs)
            else:
                raise ValueError(f"Invalid backend {arg}.")
        return self._backend

    # --------------------------------------------------------------- priors
    @property
    def prior_precision(self):
        return self._prior_precision

    @prior_precision.setter
    def prior_precision(self, prior_precision):
        """Scalar / per-layer / diagonal validation (reference
        `baselaplace.py:324-361`)."""
        self._posterior_scale = None
        pp = jnp.atleast_1d(jnp.asarray(prior_precision, dtype=self._dtype))
        if pp.ndim > 1:
            raise ValueError("Prior precision needs to be at most one-dimensional.")
        if pp.shape[0] not in (1, self.n_layers, self.n_params):
            raise ValueError("Length of prior precision does not align with architecture.")
        self._prior_precision = pp

    @property
    def prior_mean(self):
        return self._prior_mean

    @prior_mean.setter
    def prior_mean(self, prior_mean):
        pm = jnp.atleast_1d(jnp.asarray(prior_mean, dtype=self._dtype))
        if pm.ndim > 1:
            raise ValueError("Prior mean has too many dimensions!")
        if pm.shape[0] not in (1, self.n_params):
            raise ValueError("Invalid length of prior mean.")
        self._prior_mean = pm

    @property
    def sigma_noise(self):
        return self._sigma_noise

    @sigma_noise.setter
    def sigma_noise(self, sigma_noise):
        self._posterior_scale = None
        # the cached compiled prior-tuning loop bakes sigma in as a trace
        # constant (see optimize_prior_precision)
        self._prior_tune_cache = None
        sn = jnp.asarray(sigma_noise, dtype=self._dtype)
        if sn.ndim == 1:
            if sn.shape[0] > 1:
                raise ValueError("Only homoscedastic output noise supported.")
            sn = sn[0]
        elif sn.ndim > 1:
            raise ValueError("Sigma noise needs to be scalar or 1-dimensional.")
        self._sigma_noise = sn

    @property
    def _H_factor(self):
        """1 / (σ² · temperature) (reference `baselaplace.py:592-596`)."""
        return 1.0 / (self.sigma_noise**2) / self.temperature

    @property
    def prior_precision_diag(self) -> jnp.ndarray:
        """Diagonal prior precision from scalar/layerwise/diag structure
        (reference `baselaplace.py:273-303`)."""
        return self._prior_precision_diag(self.prior_precision)

    def _prior_precision_diag(self, prior_precision) -> jnp.ndarray:
        pp = jnp.atleast_1d(prior_precision)
        if pp.shape[0] == 1:
            return jnp.broadcast_to(pp, (self.n_params,))
        if pp.shape[0] == self.n_params:
            return pp
        if pp.shape[0] == self.n_layers:
            sizes = [s.size for s in self.model.leaf_specs]
            return jnp.repeat(pp, jnp.asarray(sizes), total_repeat_length=self.n_params)
        raise ValueError("Mismatch of prior and model. Diagonal, scalar, or per-layer prior.")

    # ------------------------------------------------------------ likelihood
    @property
    def log_likelihood(self) -> jnp.ndarray:
        """Differentiable training log-lik from cached loss
        (reference `baselaplace.py:213-241`)."""
        return self._log_likelihood(self.sigma_noise)

    def _log_likelihood(self, sigma_noise) -> jnp.ndarray:
        factor = -1.0 / (sigma_noise**2) / self.temperature
        if self.likelihood == Likelihood.REGRESSION:
            c = (
                self.n_data
                * self.n_outputs
                * jnp.log(sigma_noise * jnp.sqrt(2 * jnp.pi))
            )
            return factor * self.loss - c
        return factor * self.loss

    # ------------------------------------------------------------ prediction
    def _glm_forward_call(
        self,
        x,
        likelihood,
        joint: bool = False,
        link_approx=LinkApprox.PROBIT,
        n_samples: int = 100,
        diagonal_output: bool = False,
        key: Optional[jax.Array] = None,
    ):
        """GLM predictive with probit / bridge / MC links
        (reference `baselaplace.py:598-695`)."""
        fused = self._fused_entry(
            "call", likelihood, joint, link_approx, n_samples, diagonal_output
        )
        if fused is not None:
            xd = _as_device(x)
            if likelihood != Likelihood.REGRESSION and link_approx == LinkApprox.MC:
                key = self._next_key() if key is None else key
                return fused(self._jac_arg(), self._pred_state(), xd, key)
            return fused(self._jac_arg(), self._pred_state(), xd)
        f_mu, f_var = self._glm_predictive_distribution(
            x, joint=joint and likelihood == Likelihood.REGRESSION
        )
        return self._glm_link_output(
            f_mu, f_var, likelihood, joint, link_approx, n_samples,
            diagonal_output, key,
        )

    def _glm_link_output(
        self, f_mu, f_var, likelihood, joint, link_approx, n_samples,
        diagonal_output, key,
    ):
        """Pure link math applied on top of the GLM predictive distribution —
        shared by the eager path and the fused jitted programs (key must be
        concrete inside a trace; the eager MC branch resolves None keys via
        `_glm_predictive_samples`)."""
        if likelihood == Likelihood.REGRESSION:
            if diagonal_output and not joint and f_var.ndim == 3:
                f_var = jnp.diagonal(f_var, axis1=-2, axis2=-1)
            return f_mu, f_var

        if link_approx == LinkApprox.MC:
            key = self._next_key() if key is None else key
            return self._glm_predictive_samples(
                f_mu, f_var, n_samples=n_samples,
                diagonal_output=diagonal_output, key=key,
            ).mean(axis=0)
        elif link_approx == LinkApprox.PROBIT:
            kappa = 1.0 / jnp.sqrt(
                1.0 + jnp.pi / 8 * jnp.diagonal(f_var, axis1=1, axis2=2)
            )
            return jax.nn.softmax(kappa * f_mu, axis=-1)
        elif "bridge" in link_approx:
            # zero-mean correction + Laplace bridge (reference `:665-691`)
            f_mu = f_mu - (
                f_var.sum(-1) * f_mu.sum(-1)[:, None] / f_var.sum(axis=(1, 2))[:, None]
            )
            f_var = f_var - (
                jnp.einsum("bi,bj->bij", f_var.sum(-1), f_var.sum(-2))
                / f_var.sum(axis=(1, 2))[:, None, None]
            )
            K = f_mu.shape[-1]
            f_var_diag = jnp.diagonal(f_var, axis1=1, axis2=2)
            if link_approx == LinkApprox.BRIDGE_NORM:
                f_var_diag_mean = f_var_diag.mean(axis=1) / jnp.sqrt(K / 2.0)
                f_mu = f_mu / jnp.sqrt(f_var_diag_mean)[:, None]
                f_var_diag = f_var_diag / f_var_diag_mean[:, None]
            sum_exp = jnp.exp(-f_mu).sum(axis=1)[:, None]
            alpha = (1.0 - 2.0 / K + jnp.exp(f_mu) / K**2 * sum_exp) / f_var_diag
            return jnp.nan_to_num(alpha / alpha.sum(axis=1)[:, None], nan=1.0)
        else:
            raise ValueError(
                "Prediction path invalid. Check the likelihood, pred_type, "
                "link_approx combination!"
            )

    def _glm_functional_samples(
        self, f_mu, f_var, n_samples, diagonal_output=False, key=None
    ):
        """Gaussian functional samples from the GLM predictive
        (reference `baselaplace.py:752-790`)."""
        key = self._next_key() if key is None else key
        if f_var.ndim == 3 and diagonal_output:
            f_var = jnp.diagonal(f_var, axis1=1, axis2=2)
        return normal_samples(f_mu, f_var, n_samples, key)

    def _glm_predictive_samples(
        self, f_mu, f_var, n_samples, diagonal_output=False, key=None
    ):
        """Inverse-link applied on top of functional samples
        (reference `baselaplace.py:792-834`)."""
        fs = self._glm_functional_samples(f_mu, f_var, n_samples, diagonal_output, key)
        if self.likelihood == Likelihood.REGRESSION:
            return fs
        return jax.nn.softmax(fs, axis=-1)

    # ------------------------------------------------ fused GLM predictive
    # The eager GLM predictive issues one compiled Jacobian program plus a
    # long tail of per-op dispatches (posterior solve per Kron group, link
    # math, sampling) — on the remote-TPU toolchain that dispatch tail
    # dominates wall time (docs/performance.md, methodology notes). Classes
    # whose posterior state is expressible as a pytree opt in with
    # `_fusable_predictive = True` + `_pred_state` / `_fvar_pure`, and the
    # WHOLE predictive (Jacobians -> posterior solve -> link/sampling) runs
    # as ONE jitted device program per (entry, link, shapes). State is a jit
    # ARGUMENT, so refits / `optimize_prior_precision` never retrace.
    # Reference semantics: `baselaplace.py:1111-1342`.
    _fusable_predictive = False

    def _pred_state(self):
        """Dynamic posterior state consumed by `_fvar_pure` (a jit arg)."""
        raise NotImplementedError

    def _fvar_pure(self, state, Js, mode: str):
        """Functional variance ('var': (B,C,C)) or joint covariance ('cov':
        (B·C, B·C)) from the posterior state — pure in (state, Js)."""
        raise NotImplementedError

    def _jac_arg(self):
        b = self.backend
        use_phi = b.last_layer and b.last_layer_dense
        return self.model.train_params if use_phi else self.model.mean_vector

    def _jac_pure(self, jac_arg, x):
        b = self.backend
        if b.last_layer and b.last_layer_dense:
            return b.last_layer_jacobians(x, train_params=jac_arg)
        return b.jacobians(x, theta=jac_arg)

    def _glm_dist_pure(self, jac_arg, state, x, joint):
        Js, f_mu = self._jac_pure(jac_arg, x)
        if joint:
            f_mu = f_mu.ravel()
            f_var = self._fvar_pure(state, Js, "cov")
        else:
            f_var = self._fvar_pure(state, Js, "var")
        if not self.enable_backprop:
            f_mu, f_var = jax.lax.stop_gradient((f_mu, f_var))
        return f_mu, f_var

    def _fused_entry(
        self, entry, likelihood, joint, link_approx, n_samples, diagonal_output
    ):
        """Build (or fetch) the single-program GLM predictive for this config;
        None routes the caller to the eager path (unfusable class, data
        parallelism — batches are sharded eagerly — or kill switch)."""
        import os as _os

        if (
            not self._fusable_predictive
            or self.parallel is not None
            or _os.environ.get("LAPLACE_FUSED_PREDICTIVE", "1") == "0"
        ):
            return None
        try:
            self._pred_state()
        except Exception:
            return None  # not fitted / state not expressible: eager path
        cache_key = (
            entry, str(likelihood), bool(joint), str(link_approx),
            int(n_samples), bool(diagonal_output), self.enable_backprop,
            # temperature is a trace-time constant inside `_H_factor`-style
            # closures (unlike prior_precision/sigma_noise, which are jit
            # arguments via the state pytree), so it must key the program.
            float(self.temperature),
        )
        prog = self._pred_programs.get(cache_key)
        if prog is not None:
            return prog

        joint_dist = bool(joint) and likelihood == Likelihood.REGRESSION
        needs_key = (
            likelihood != Likelihood.REGRESSION and link_approx == LinkApprox.MC
            if entry == "call"
            else True
        )

        def body(jac_arg, state, x, key):
            f_mu, f_var = self._glm_dist_pure(jac_arg, state, x, joint_dist)
            if entry == "call":
                return self._glm_link_output(
                    f_mu, f_var, likelihood, joint, link_approx, n_samples,
                    diagonal_output, key,
                )
            if entry == "functional_samples":
                return self._glm_functional_samples(
                    f_mu, f_var, n_samples, diagonal_output, key
                )
            return self._glm_predictive_samples(
                f_mu, f_var, n_samples, diagonal_output, key
            )

        if needs_key:
            prog = jax.jit(body)
        else:
            prog = jax.jit(lambda jac_arg, state, x: body(jac_arg, state, x, None))
        self._pred_programs[cache_key] = prog
        return prog

    # ----------------------------------------------------- hyperparameter opt
    def optimize_prior_precision(
        self,
        pred_type: PredType | str = PredType.GLM,
        method: TuningMethod | str = TuningMethod.MARGLIK,
        n_steps: int = 100,
        lr: float = 1e-1,
        init_prior_prec=1.0,
        prior_structure: PriorStructure | str = PriorStructure.SCALAR,
        val_loader=None,
        loss=None,
        log_prior_prec_min: float = -4,
        log_prior_prec_max: float = 4,
        grid_size: int = 100,
        link_approx: LinkApprox | str = LinkApprox.PROBIT,
        n_samples: int = 100,
        verbose: bool = False,
        progress_bar: bool = False,
    ) -> None:
        """Post-hoc prior-precision tuning via marglik gradient steps or
        gridsearch on validation loss (reference `baselaplace.py:363-514`)."""
        import optax

        likelihood = (
            Likelihood.CLASSIFICATION
            if self.likelihood == Likelihood.REWARD_MODELING
            else self.likelihood
        )

        if method == TuningMethod.MARGLIK:
            self.prior_precision = init_prior_prec
            pp = self.prior_precision
            if pp.shape[0] == 1 and prior_structure != PriorStructure.SCALAR:
                self.prior_precision = fix_prior_prec_structure(
                    float(pp[0]), prior_structure, self.n_layers, self.n_params,
                    dtype=self._dtype,
                )
            log_pp = jnp.log(self.prior_precision)
            optimizer = optax.adam(lr)
            opt_state = optimizer.init(log_pp)

            def neg_marglik(lp):
                return -self._log_marglik(jnp.exp(lp), self.sigma_noise)

            @jax.jit
            def step(lp, state):
                g = jax.grad(neg_marglik)(lp)
                updates, state = optimizer.update(g, state)
                return optax.apply_updates(lp, updates), state

            if progress_bar:  # reference `baselaplace.py:470-474`
                from tqdm.auto import tqdm

                for _ in tqdm(range(n_steps), desc="[marglik prior tuning]"):
                    log_pp, opt_state = step(log_pp, opt_state)
            else:
                # The whole Adam loop as ONE device program: each step is
                # microseconds of compute, so a python loop of jitted steps
                # is pure dispatch latency (far worse over a remote device
                # link). The compiled loop is cached on the instance — a
                # fresh `jax.jit` wrapper per call would recompile every
                # time. `step`/`neg_marglik` bake the fitted state (H, loss,
                # mean) in as trace constants, so the cache is dropped
                # whenever those change (fit, sigma_noise).
                key = (float(lr), int(n_steps), log_pp.shape,
                       str(log_pp.dtype))
                cached = getattr(self, "_prior_tune_cache", None)
                if cached is None or cached[0] != key:

                    @functools.partial(jax.jit, static_argnames=("n",))
                    def run(lp, state, n):
                        def body(carry, _):
                            lp, state = carry
                            return step(lp, state), None

                        (lp, state), _ = jax.lax.scan(
                            body, (lp, state), None, length=n
                        )
                        return lp, state

                    self._prior_tune_cache = (key, run)
                run = self._prior_tune_cache[1]
                log_pp, opt_state = run(log_pp, opt_state, n_steps)
            self.prior_precision = jnp.exp(log_pp)
        elif method == TuningMethod.GRIDSEARCH:
            if val_loader is None:
                raise ValueError("gridsearch requires a validation set loader")
            from laplace_jax.utils.metrics import RunningMSEMetric, RunningNLLMetric

            interval = jnp.logspace(log_prior_prec_min, log_prior_prec_max, grid_size)
            if loss is None:
                loss = (
                    RunningMSEMetric()
                    if likelihood == Likelihood.REGRESSION
                    else RunningNLLMetric()
                )
            self.prior_precision = self._gridsearch(
                loss, interval, val_loader, pred_type=pred_type,
                link_approx=link_approx, n_samples=n_samples,
                progress_bar=progress_bar,
            )
        else:
            raise ValueError("For now only marglik and gridsearch is implemented.")

        if verbose:
            print(f"Optimized prior precision is {self.prior_precision}.")

    def _gridsearch(
        self, loss, interval, val_loader, pred_type, link_approx=LinkApprox.PROBIT,
        n_samples: int = 100, progress_bar: bool = False,
    ):
        """Grid search over prior precision against validation loss
        (reference `baselaplace.py:516-561`); non-PD/NaN results score inf."""
        from laplace_jax.utils.validate import validate

        if progress_bar:
            from tqdm.auto import tqdm

            interval = tqdm(interval, desc="[gridsearch]")
        results, prior_precs = [], []
        for prior_prec in interval:
            self.prior_precision = prior_prec
            try:
                result = validate(
                    self, val_loader, loss, pred_type=pred_type,
                    link_approx=link_approx, n_samples=n_samples,
                    dict_key_y=self.dict_key_y,
                )
                if not np.isfinite(result):
                    result = np.inf
            except FloatingPointError:
                result = np.inf
            results.append(result)
            prior_precs.append(prior_prec)
        return prior_precs[int(np.argmin(results))]

    # --------------------------------------------------------------- abstract
    def _log_marglik(self, prior_precision, sigma_noise):
        raise NotImplementedError

    def fit(self, train_loader):
        raise NotImplementedError

    def predictive(self, x, pred_type, link_approx, n_samples):
        return self(x, pred_type=pred_type, link_approx=link_approx,
                    n_samples=n_samples)

    def _unpack_batch(self, data):
        """(X, y) from tensor tuples or HF-style dict batches
        (reference `baselaplace.py:969-974`)."""
        if isinstance(data, Mapping):
            return data, data[self.dict_key_y]
        X, y = data
        return X, y

    @staticmethod
    def _check_loader(train_loader) -> None:
        """Reject one-shot iterators up front: the fit loops probe one batch
        and may iterate the loader more than once, so a generator would be
        silently part-consumed and yield an empty (zero-curvature) fit."""
        try:
            is_one_shot = iter(train_loader) is train_loader
        except TypeError:
            raise ValueError("train_loader must be an iterable of batches.")
        if is_one_shot:
            raise ValueError(
                "train_loader is a one-shot iterator (e.g. a generator); the "
                "fit loop iterates it more than once, which would silently "
                "yield an empty second pass. Pass a re-iterable loader such "
                "as laplace_jax.utils.data.ArrayLoader or a list of batches."
            )

    # ----------------------------------------------------------- persistence
    def save(self, path: str) -> None:
        """Persist the fitted state to a pickle-free `.npz` archive — the
        counterpart of `torch.save(la.state_dict(), ...)` in the reference's
        docs (`docs/index.md:306-330`)."""
        from laplace_jax.utils.serialization import save_state_dict

        save_state_dict(self.state_dict(), path)

    def load(self, path: str) -> "BaseLaplace":
        """Load state saved by `save` into this (compatible) instance."""
        from laplace_jax.utils.serialization import load_state_dict

        self.load_state_dict(load_state_dict(path))
        return self


class ParametricLaplace(BaseLaplace):
    """Weight-space posterior skeleton (reference `baselaplace.py:837`)."""

    def __init__(self, model, likelihood, sigma_noise=1.0, prior_precision=1.0,
                 prior_mean=0.0, temperature=1.0, enable_backprop=False,
                 dict_key_x="input_ids", dict_key_y="labels", backend=None,
                 backend_kwargs=None, params=None, parallel=None):
        super().__init__(model, likelihood, sigma_noise, prior_precision,
                         prior_mean, temperature, enable_backprop, dict_key_x,
                         dict_key_y, backend, backend_kwargs, params, parallel)
        # subclasses with deferred init (unknown last layer) pre-set self.H=None
        if not hasattr(self, "H"):
            self._init_H()
            self.mean = self.prior_mean
        self._curv_closure_fn = None
        self._scan_fit_fn = None

    def _init_H(self):
        raise NotImplementedError

    def _check_H_init(self):
        if getattr(self, "H", None) is None:
            raise AttributeError("Laplace not fitted. Run fit() first.")

    def _curv_closure(self, x, y, N, key):
        raise NotImplementedError

    def _make_curv_closure(self):
        """One jitted per-batch curvature closure reused across the fit loop.
        With `self.parallel` set, the batch is sharded over the mesh's data
        axis and the curvature reduction rides the ICI collectives."""
        if self._curv_closure_fn is None:
            def closure(params, x, y, N, key):
                with _swap_params(self.model, params):
                    return self._curv_closure(x, y, N, key)

            if self.parallel is not None:
                self._curv_closure_fn = self.parallel.wrap(closure, model=self.model)
            else:
                self._curv_closure_fn = jax.jit(closure)
        return self._curv_closure_fn

    def fit(self, train_loader, override: bool = True, progress_bar: bool = False,
            key: Optional[jax.Array] = None) -> None:
        """Accumulate batch curvature over the loader
        (reference `baselaplace.py:904-987`).

        When the loader's batches are uniform in-memory arrays, the whole
        accumulation runs as ONE jitted `lax.scan` over device-resident data —
        a single device dispatch for the entire fit, eliminating the per-batch
        host round trip that dominates small-loader fits on remote TPUs. The
        per-batch python loop remains for generic loaders, `progress_bar=True`,
        and sharded (`parallel`) fits.
        """
        self._check_loader(train_loader)
        if override:
            # H's zero factors are NOT materialized here: the scan path
            # overwrites H wholesale, and each zero-buffer creation is a
            # device dispatch (43 of them for a ResNet-18 Kron). The loop
            # path calls _init_H lazily below.
            self.loss = 0.0
            self.n_data = 0
            self._H_zero = True

        # the cached compiled prior-tuning loop bakes the fitted state (H,
        # loss, mean) in as trace constants; a new fit invalidates it
        self._prior_tune_cache = None

        self.mean = self.model.mean_vector
        if not self.enable_backprop:
            self.mean = jax.lax.stop_gradient(self.mean)

        # probe one batch for the output dimension — eval_shape only, no compute
        data = next(iter(train_loader))
        X_probe, y_probe = self._unpack_batch(data)
        out = jax.eval_shape(
            self.model.apply, self.model.train_params, _probe(X_probe)
        )
        self.n_outputs = out.shape[-1]
        if self.likelihood == Likelihood.REGRESSION and jnp.ndim(y_probe) != out.ndim:
            raise ValueError(
                f"The model's output has {out.ndim} dims but the target has "
                f"{jnp.ndim(y_probe)} dims."
            )

        N = dataset_size(train_loader)
        closure = self._make_curv_closure()
        key = jax.random.key(0) if key is None else key

        params = self.model.train_params
        stacked = None
        if not progress_bar and self.parallel is None:
            stacked = _stack_batches(train_loader, self._unpack_batch)

        if stacked is not None:
            xs, ys, rem = stacked
            loss, H = self._scan_accumulate(params, xs, ys, N, key)
            if rem is not None:
                x_r, y_r = rem
                loss_r, H_r = closure(
                    params, _as_device(x_r), jnp.asarray(y_r), N,
                    jax.random.fold_in(key, ys.shape[0]),
                )
                loss = loss + loss_r
                H = jax.tree_util.tree_map(jnp.add, H, H_r)
            self.loss = self.loss + loss
            # fresh zero H: assign instead of dispatching one add per factor
            # (each dispatch pays the remote-TPU round trip)
            if getattr(self, "_H_zero", False):
                self.H = H
            else:
                self.H = self.H + H
            self._H_zero = False
        else:
            iterator = train_loader
            if progress_bar:
                from tqdm.auto import tqdm

                iterator = tqdm(train_loader, desc="[fit]")
            # H stays lazy: the first batch's curvature is assigned wholesale
            # (zero factors are never materialized — their structure can
            # depend on layer metadata only the tap path knows, e.g.
            # DenseGeneral factor splits, and each zero buffer is a device
            # dispatch)
            n_batches = 0
            for i, data in enumerate(iterator):
                X, y = self._unpack_batch(data)
                loss_b, H_b = closure(
                    params, _as_device(X), jnp.asarray(y), N,
                    jax.random.fold_in(key, i),
                )
                self.loss = self.loss + loss_b
                if getattr(self, "_H_zero", False) and n_batches == 0:
                    self.H = H_b
                else:
                    self.H = self.H + H_b
                n_batches += 1
            if n_batches == 0:
                raise RuntimeError(
                    "train_loader yielded no batches — it is empty or a "
                    "one-shot iterator that was already consumed (pass a "
                    "re-iterable loader such as ArrayLoader)."
                )
            self._H_zero = False

        self.n_data += N

    def _scan_accumulate(self, params, xs, ys, N, key):
        """Whole-loader curvature accumulation as one jitted lax.scan. The
        parameters are a traced argument so refits after `set_params` reuse
        the compiled program."""
        if getattr(self, "_scan_fit_fn", None) is None:

            def scan_fit(params, xs, ys, N, key):
                TRACE_COUNTS["scan_fit"] += 1  # trace-time only
                with _swap_params(self.model, params):
                    x0 = jax.tree_util.tree_map(lambda v: v[0], xs)
                    shapes = jax.eval_shape(
                        self._curv_closure, x0, ys[0], N, key
                    )
                    init = jax.tree_util.tree_map(
                        lambda s: jnp.zeros(s.shape, s.dtype), shapes
                    )
                    nb = ys.shape[0]

                    def body(carry, inp):
                        x, y, i = inp
                        res = self._curv_closure(
                            x, y, N, jax.random.fold_in(key, i)
                        )
                        return jax.tree_util.tree_map(jnp.add, carry, res), None

                    acc, _ = jax.lax.scan(body, init, (xs, ys, jnp.arange(nb)))
                    return acc

            self._scan_fit_fn = jax.jit(scan_fit)
        return self._scan_fit_fn(params, xs, ys, jnp.asarray(N), key)

    # ------------------------------------------------------------ marglik bits
    @property
    def scatter(self) -> jnp.ndarray:
        """(θ_MAP − μ₀)ᵀ P₀ (θ_MAP − μ₀) (reference `baselaplace.py:989-1000`)."""
        return self._scatter(self.prior_precision)

    def _scatter(self, prior_precision) -> jnp.ndarray:
        delta = self.mean - self.prior_mean
        return jnp.dot(delta * self._prior_precision_diag(prior_precision), delta)

    @property
    def log_det_prior_precision(self) -> jnp.ndarray:
        return jnp.sum(jnp.log(self.prior_precision_diag))

    @property
    def log_det_posterior_precision(self) -> jnp.ndarray:
        return self._log_det_posterior_precision(
            self.prior_precision, self.sigma_noise
        )

    def _log_det_posterior_precision(self, prior_precision, sigma_noise):
        raise NotImplementedError

    @property
    def log_det_ratio(self) -> jnp.ndarray:
        """log det P − log det P₀ (reference `baselaplace.py:1026-1040`)."""
        return self._log_det_ratio(self.prior_precision, self.sigma_noise)

    def _log_det_ratio(self, prior_precision, sigma_noise):
        return self._log_det_posterior_precision(
            prior_precision, sigma_noise
        ) - jnp.sum(jnp.log(self._prior_precision_diag(prior_precision)))

    def square_norm(self, value) -> jnp.ndarray:
        raise NotImplementedError

    def log_prob(self, value, normalized: bool = True) -> jnp.ndarray:
        """Gaussian log density under the posterior
        (reference `baselaplace.py:1052-1072`)."""
        if not normalized:
            return -self.square_norm(value) / 2
        log_prob = (
            -self.n_params / 2 * math.log(2 * math.pi)
            + self.log_det_posterior_precision / 2
        )
        return log_prob - self.square_norm(value) / 2

    def log_marginal_likelihood(self, prior_precision=None, sigma_noise=None):
        """Laplace approx to the log marginal likelihood, differentiable in its
        arguments (reference `baselaplace.py:1074-1109`)."""
        if prior_precision is not None and not _is_traced(prior_precision):
            self.prior_precision = prior_precision
        if sigma_noise is not None:
            if self.likelihood != Likelihood.REGRESSION:
                raise ValueError("Can only change sigma_noise for regression.")
            if not _is_traced(sigma_noise):
                self.sigma_noise = sigma_noise
        pp = self.prior_precision if prior_precision is None else jnp.atleast_1d(prior_precision)
        sn = self.sigma_noise if sigma_noise is None else jnp.asarray(sigma_noise).reshape(())
        return self._log_marglik(pp, sn)

    def _log_marglik(self, prior_precision, sigma_noise):
        return self._log_likelihood(sigma_noise) - 0.5 * (
            self._log_det_ratio(prior_precision, sigma_noise)
            + self._scatter(prior_precision)
        )

    # ------------------------------------------------------------- predictive
    def __call__(
        self,
        x,
        pred_type: PredType | str = PredType.GLM,
        joint: bool = False,
        link_approx: LinkApprox | str = LinkApprox.PROBIT,
        n_samples: int = 100,
        diagonal_output: bool = False,
        key: Optional[jax.Array] = None,
        fitting: bool = False,
    ):
        """Posterior predictive (reference `baselaplace.py:1111-1208`)."""
        if pred_type not in [p for p in PredType]:
            raise ValueError("Only glm and nn supported as prediction types.")
        if link_approx not in [la for la in LinkApprox]:
            raise ValueError(f"Unsupported link approximation {link_approx}.")
        if pred_type == PredType.NN and link_approx != LinkApprox.MC:
            raise ValueError(
                "Only mc link approximation is supported for nn prediction type."
            )

        likelihood = self.likelihood
        if likelihood == Likelihood.REWARD_MODELING:
            likelihood = Likelihood.CLASSIFICATION if fitting else Likelihood.REGRESSION

        if pred_type == PredType.GLM:
            return self._glm_forward_call(
                x, likelihood, joint, link_approx, n_samples, diagonal_output, key
            )
        else:
            key = self._next_key() if key is None else key
            if likelihood == Likelihood.REGRESSION:
                samples = self._nn_predictive_samples(x, n_samples, key)
                return samples.mean(axis=0), samples.var(axis=0)
            return self._nn_predictive_samples(x, n_samples, key).mean(axis=0)

    def functional_samples(self, x, pred_type=PredType.GLM, n_samples: int = 100,
                           diagonal_output: bool = False, key=None):
        """Function-space posterior samples (reference `baselaplace.py:1213-1253`)."""
        if pred_type not in [p for p in PredType]:
            raise ValueError("Only glm and nn supported as prediction types.")
        key = self._next_key() if key is None else key
        if pred_type == PredType.GLM:
            fused = self._fused_entry(
                "functional_samples", self.likelihood, False,
                LinkApprox.MC, n_samples, diagonal_output,
            )
            if fused is not None:
                return fused(self._jac_arg(), self._pred_state(),
                             _as_device(x), key)
            f_mu, f_var = self._glm_predictive_distribution(x)
            return self._glm_functional_samples(
                f_mu, f_var, n_samples, diagonal_output, key
            )
        return self._nn_functional_samples(x, n_samples, key)

    def predictive_samples(self, x, pred_type=PredType.GLM, n_samples: int = 100,
                           diagonal_output: bool = False, key=None):
        """Samples through the inverse link (reference `baselaplace.py:1260-1304`)."""
        if pred_type not in [p for p in PredType]:
            raise ValueError("Only glm and nn supported as prediction types.")
        key = self._next_key() if key is None else key
        if pred_type == PredType.GLM:
            fused = self._fused_entry(
                "predictive_samples", self.likelihood, False,
                LinkApprox.MC, n_samples, diagonal_output,
            )
            if fused is not None:
                return fused(self._jac_arg(), self._pred_state(),
                             _as_device(x), key)
            f_mu, f_var = self._glm_predictive_distribution(x)
            return self._glm_predictive_samples(
                f_mu, f_var, n_samples, diagonal_output, key
            )
        return self._nn_predictive_samples(x, n_samples, key)

    def _glm_predictive_distribution(self, x, joint=False, diagonal_output=False):
        """Jacobian-based GLM predictive (reference `baselaplace.py:1306-1342`)."""
        xd = _as_device(x)
        if self.parallel is not None:
            xd = self.parallel.shard_batch(xd)
        Js, f_mu = self.backend._jacobians_dispatch(xd)
        if joint:
            f_mu = f_mu.ravel()
            f_var = self.functional_covariance(Js)
        else:
            f_var = self.functional_variance(Js)
            if diagonal_output:
                f_var = jnp.diagonal(f_var, axis1=-2, axis2=-1)
        if not self.enable_backprop:
            f_mu, f_var = jax.lax.stop_gradient((f_mu, f_var))
        return f_mu, f_var

    def _nn_functional_samples(self, x, n_samples=100, key=None):
        """MC functional samples by swapping sampled weights into the model
        (reference `baselaplace.py:1344-1362`); vectorized with vmap instead of
        a python loop over `vector_to_parameters`."""
        key = self._next_key() if key is None else key
        samples = self.sample(n_samples, key)  # (S, P)
        xd = _as_device(x)

        def forward_one(theta):
            return self.model.apply_vec(theta, xd)

        fs = jax.lax.map(forward_one, samples, batch_size=_map_batch(n_samples))
        if not self.enable_backprop:
            fs = jax.lax.stop_gradient(fs)
        return fs

    def _nn_predictive_samples(self, x, n_samples=100, key=None):
        fs = self._nn_functional_samples(x, n_samples, key)
        if self.likelihood == Likelihood.CLASSIFICATION:
            fs = jax.nn.softmax(fs, axis=-1)
        return fs

    # ------------------------------------------------------------- posterior
    def functional_variance(self, Js) -> jnp.ndarray:
        raise NotImplementedError

    def functional_covariance(self, Js) -> jnp.ndarray:
        raise NotImplementedError

    def sample(self, n_samples: int = 100, key: Optional[jax.Array] = None):
        raise NotImplementedError

    @property
    def posterior_precision(self):
        raise NotImplementedError

    # ----------------------------------------------------------- serialization
    def state_dict(self) -> dict:
        self._check_H_init()
        return {
            "mean": self.mean,
            "H": self.H,
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
        if self.n_params is not None and len(state_dict["mean"]) != self.n_params:
            raise ValueError(
                "Attempting to load Laplace with different number of parameters "
                "than the model."
            )
        if self.likelihood != state_dict["likelihood"]:
            raise ValueError("Different likelihoods detected!")
        if self.temperature != state_dict["temperature"]:
            warnings.warn("Different `temperature` parameters detected.")
        if self.enable_backprop != state_dict["enable_backprop"]:
            warnings.warn("Different `enable_backprop` values.")
        self._prior_tune_cache = None  # compiled tuning loop baked old state
        self.mean = state_dict["mean"]
        self.H = state_dict["H"]
        self.loss = state_dict["loss"]
        self.prior_mean = state_dict["prior_mean"]
        self.prior_precision = state_dict["prior_precision"]
        self.sigma_noise = state_dict["sigma_noise"]
        self.n_data = state_dict["n_data"]
        self.n_outputs = state_dict["n_outputs"]
        self.likelihood = state_dict["likelihood"]
        self.temperature = state_dict["temperature"]
        self.enable_backprop = state_dict["enable_backprop"]


class FullLaplace(ParametricLaplace):
    """Dense P×P posterior precision (reference `baselaplace.py:1572-1703`)."""

    _key = ("all", "full")

    def _init_H(self):
        self.H = jnp.zeros((self.n_params, self.n_params), dtype=self._dtype)
        self._posterior_scale = None

    def _curv_closure(self, x, y, N, key):
        return self.backend.full(x, y, N=N, key=key)

    def fit(self, train_loader, override=True, progress_bar=False, key=None):
        self._posterior_scale = None
        super().fit(train_loader, override=override, progress_bar=progress_bar,
                    key=key)

    @property
    def posterior_scale(self):
        """P^{-1/2} via Cholesky (reference `baselaplace.py:1636-1650`)."""
        if self._posterior_scale is None:
            self._posterior_scale = invsqrt_precision(self.posterior_precision)
        return self._posterior_scale

    @property
    def posterior_covariance(self):
        scale = self.posterior_scale
        return scale @ scale.T

    @property
    def posterior_precision(self):
        self._check_H_init()
        return self._posterior_precision(self.prior_precision, self.sigma_noise)

    def _posterior_precision(self, prior_precision, sigma_noise):
        h_factor = 1.0 / (sigma_noise**2) / self.temperature
        return h_factor * self.H + jnp.diag(self._prior_precision_diag(prior_precision))

    def _log_det_posterior_precision(self, prior_precision, sigma_noise):
        return jnp.linalg.slogdet(
            self._posterior_precision(prior_precision, sigma_noise)
        )[1]

    def square_norm(self, value):
        delta = value - self.mean
        return delta @ self.posterior_precision @ delta

    def functional_variance(self, Js):
        return self._fvar_pure(self.posterior_covariance, Js, "var")

    def functional_covariance(self, Js):
        return self._fvar_pure(self.posterior_covariance, Js, "cov")

    # fused predictive state: the cached posterior covariance (one eager
    # Cholesky after each fit / prior update, then a pure jit argument)
    _fusable_predictive = True

    def _pred_state(self):
        self._check_H_init()
        return self.posterior_covariance

    def _fvar_pure(self, cov, Js, mode):
        if mode == "cov":
            n_batch, n_outs, n_params = Js.shape
            Jf = Js.reshape(n_batch * n_outs, n_params)
            return jnp.einsum("np,pq,mq->nm", Jf, cov, Jf)
        return jnp.einsum("ncp,pq,nkq->nck", Js, cov, Js)

    def sample(self, n_samples: int = 100, key: Optional[jax.Array] = None):
        key = self._next_key() if key is None else key
        eps = jax.random.normal(key, (n_samples, self.n_params), dtype=self._dtype)
        return self.mean[None, :] + eps @ self.posterior_scale.T

    def shard_posterior(self, mesh=None, axis_name: str = "model") -> "FullLaplace":
        """Lay the dense curvature H out over a mesh `model` axis so posterior
        logdet / inverse / predictive einsums run distributed — for P beyond a
        single chip's HBM. XLA propagates the row sharding through the jitted
        consumers and inserts the collectives; results equal the replicated
        path (tested on a virtual mesh). No reference equivalent (the
        reference is single-device, SURVEY.md §2.6)."""
        from jax.sharding import NamedSharding, PartitionSpec

        self._check_H_init()
        P = self.H.shape[0]
        if mesh is None:
            from laplace_jax.parallel import data_mesh

            # XLA shardings must divide the dimension: use the largest device
            # count that divides P
            devs = jax.devices()
            k = max(d for d in range(1, len(devs) + 1) if P % d == 0)
            if k < len(devs):
                warnings.warn(
                    f"n_params={P} not divisible by {len(devs)} devices; "
                    f"sharding the posterior over {k} device(s)."
                )
            mesh = data_mesh(devices=devs[:k], axis_name=axis_name)
        elif P % mesh.shape[axis_name] != 0:
            raise ValueError(
                f"n_params={P} must be divisible by the mesh '{axis_name}' "
                f"axis size {mesh.shape[axis_name]}."
            )
        self.H = jax.device_put(
            self.H, NamedSharding(mesh, PartitionSpec(axis_name, None))
        )
        self._posterior_scale = None
        return self


class KronLaplace(ParametricLaplace):
    """KFAC posterior precision (reference `baselaplace.py:1706-1879`).

    `H_facs` keeps undecomposed factors for online/continual updates with
    N-proportional rescaling; `H` holds the eigendecomposed `KronDecomposed`
    after fit. Prior precision restricted to scalar or per-layer.
    """

    _key = ("all", "kron")

    def __init__(self, model, likelihood, sigma_noise=1.0, prior_precision=1.0,
                 prior_mean=0.0, temperature=1.0, enable_backprop=False,
                 dict_key_x="input_ids", dict_key_y="labels", backend=None,
                 damping: bool = False, backend_kwargs=None, params=None,
                 parallel=None):
        self.damping = damping
        self.H_facs: Optional[Kron] = None
        super().__init__(model, likelihood, sigma_noise, prior_precision,
                         prior_mean, temperature, enable_backprop, dict_key_x,
                         dict_key_y, backend, backend_kwargs, params, parallel)

    def _init_H(self):
        self.H = Kron.init_from_params(self.model.train_params, dtype=self._dtype)

    def _check_H_init(self):
        if getattr(self, "H_facs", None) is None:
            raise AttributeError("Laplace not fitted. Run fit() first.")

    def _curv_closure(self, x, y, N, key):
        return self.backend.kron(x, y, N=N, key=key)

    @staticmethod
    def _rescale_factors(kron: Kron, factor) -> Kron:
        """Rescale the 1/N-carrying activation factor (our A = F[0]; the
        reference's layout has it at F[1], `baselaplace.py:1771-1777`)."""
        kfacs = []
        for F in kron.kfacs:
            if len(F) == 2:
                kfacs.append((F[0] * factor, F[1]))
            else:
                kfacs.append(F)
        return Kron(kfacs)

    def fit(self, train_loader, override=True, progress_bar=False, key=None):
        if override:
            self.H_facs = None

        if self.H_facs is not None:
            n_data_old = self.n_data
            n_data_new = dataset_size(train_loader)
            self._init_H()  # re-init H non-decomposed
            self._H_zero = True
            self.H_facs = self._rescale_factors(
                self.H_facs, n_data_old / (n_data_old + n_data_new)
            )

        super().fit(train_loader, override=override, progress_bar=progress_bar,
                    key=key)

        if self.H_facs is None:
            self.H_facs = self.H
        else:
            self.H = self._rescale_factors(
                self.H, n_data_new / (n_data_new + n_data_old)
            )
            self.H_facs = self.H_facs + self.H

        # decompose for inference; keep H_facs for further online updates.
        # Under a DataParallel mesh the independent per-factor eigh problems
        # spread across its devices (the epilogue dominates single-chip fit
        # wall time — see Kron.decompose).
        devices = None if self.parallel is None else self.parallel.mesh
        self.H = self.H_facs.decompose(damping=self.damping, devices=devices)
        if not self.damping:
            # populate the flat-eigenvalue cache eagerly (concrete here);
            # marglik steps then read it as a baked constant
            self.H._flat_eigs

    @property
    def posterior_precision(self) -> KronDecomposed:
        self._check_H_init()
        return self._posterior_precision(self.prior_precision, self.sigma_noise)

    def _posterior_precision(self, prior_precision, sigma_noise):
        h_factor = 1.0 / (sigma_noise**2) / self.temperature
        return self.H * h_factor + prior_precision

    def _log_det_posterior_precision(self, prior_precision, sigma_noise):
        if isinstance(self.H, Kron):  # not fitted: fall back to prior
            return jnp.sum(jnp.log(self._prior_precision_diag(prior_precision)))
        if not self.damping:
            # logdet(f H + delta) = sum log(f lam + delta) over the CACHED
            # flat Kronecker eigenvalues of H — H is a constant of the traced
            # marglik step, so inside `optimize_prior_precision`'s scanned
            # Adam loop this leaves ~3 fused elementwise ops per iteration
            # instead of rebuilding per-group eigenvalue outer products (and
            # their gradients) every step
            lam = self.H._flat_eigs
            h_factor = 1.0 / (sigma_noise**2) / self.temperature
            deltas = self.H._check_deltas(jnp.asarray(prior_precision))
            sizes = self.H.group_sizes
            dflat = jnp.concatenate(
                [
                    jnp.broadcast_to(deltas[gi], (sizes[gi],))
                    for gi in range(len(sizes))
                ]
            )
            return jnp.sum(jnp.log(h_factor * lam + dflat))
        return self._posterior_precision(prior_precision, sigma_noise).logdet()

    def square_norm(self, value):
        delta = value - self.mean
        if isinstance(self.H, Kron):
            return jnp.dot(delta * self.prior_precision_diag, delta)
        return delta @ self.posterior_precision.bmm(delta, exponent=1)

    def functional_variance(self, Js):
        return self.posterior_precision.inv_square_form(Js)

    def functional_covariance(self, Js):
        n_batch, n_outs, n_params = Js.shape
        Js = Js.reshape(1, n_batch * n_outs, n_params)
        cov = self.posterior_precision.inv_square_form(Js)[0]
        return cov

    # fused predictive state: the decomposed factors plus (prior, noise) as
    # pytree args; the damped posterior is assembled inside the trace so the
    # per-group eigenbasis solves fuse into the one predictive program
    _fusable_predictive = True

    def _pred_state(self):
        self._check_H_init()
        if not isinstance(self.H, KronDecomposed):
            raise NotImplementedError  # undecomposed factors: eager path
        return (self.H, self.prior_precision, jnp.asarray(self.sigma_noise))

    def _fvar_pure(self, state, Js, mode):
        H, prior_precision, sigma_noise = state
        h_factor = 1.0 / (sigma_noise**2) / self.temperature
        post = H * h_factor + prior_precision  # mirrors _posterior_precision
        if mode == "cov":
            n_batch, n_outs, n_params = Js.shape
            return post.inv_square_form(
                Js.reshape(1, n_batch * n_outs, n_params)
            )[0]
        return post.inv_square_form(Js)

    def sample(self, n_samples: int = 100, key: Optional[jax.Array] = None):
        key = self._next_key() if key is None else key
        eps = jax.random.normal(key, (n_samples, self.n_params), dtype=self._dtype)
        samples = self.posterior_precision.bmm(eps, exponent=-0.5)
        return self.mean[None, :] + samples.reshape(n_samples, self.n_params)

    @ParametricLaplace.prior_precision.setter
    def prior_precision(self, prior_precision):
        ParametricLaplace.prior_precision.fset(self, prior_precision)
        if self._prior_precision.shape[0] not in (1, self.n_layers):
            raise ValueError("Prior precision for Kron either scalar or per-layer.")

    def state_dict(self) -> dict:
        state_dict = super().state_dict()
        state_dict["H"] = self.H_facs
        return state_dict

    def load_state_dict(self, state_dict: dict) -> None:
        super().load_state_dict(state_dict)
        self.H_facs = self.H
        self.H = self.H_facs.decompose(damping=self.damping)


class DiagLaplace(ParametricLaplace):
    """Diagonal posterior precision (reference `baselaplace.py:2048-2135`)."""

    _key = ("all", "diag")

    def _init_H(self):
        self.H = jnp.zeros(self.n_params, dtype=self._dtype)

    def _curv_closure(self, x, y, N, key):
        return self.backend.diag(x, y, N=N, key=key)

    @property
    def posterior_precision(self):
        self._check_H_init()
        return self._posterior_precision(self.prior_precision, self.sigma_noise)

    def _posterior_precision(self, prior_precision, sigma_noise):
        h_factor = 1.0 / (sigma_noise**2) / self.temperature
        return h_factor * self.H + self._prior_precision_diag(prior_precision)

    @property
    def posterior_scale(self):
        return 1.0 / jnp.sqrt(self.posterior_precision)

    @property
    def posterior_variance(self):
        return 1.0 / self.posterior_precision

    def _log_det_posterior_precision(self, prior_precision, sigma_noise):
        return jnp.sum(jnp.log(self._posterior_precision(prior_precision, sigma_noise)))

    def square_norm(self, value):
        delta = value - self.mean
        return delta @ (delta * self.posterior_precision)

    def functional_variance(self, Js):
        return jnp.einsum("ncp,p,nkp->nck", Js, self.posterior_variance, Js)

    def functional_covariance(self, Js):
        n_batch, n_outs, n_params = Js.shape
        Js = Js.reshape(n_batch * n_outs, n_params)
        return jnp.einsum("np,p,mp->nm", Js, self.posterior_variance, Js)

    # fused predictive state: raw diagonal curvature + (prior, noise); the
    # posterior variance is two elementwise ops assembled inside the trace
    _fusable_predictive = True

    def _pred_state(self):
        self._check_H_init()
        return (self.H, self.prior_precision, jnp.asarray(self.sigma_noise))

    def _fvar_pure(self, state, Js, mode):
        H, prior_precision, sigma_noise = state
        h_factor = 1.0 / (sigma_noise**2) / self.temperature
        var = 1.0 / (h_factor * H + self._prior_precision_diag(prior_precision))
        if mode == "cov":
            n_batch, n_outs, n_params = Js.shape
            Jf = Js.reshape(n_batch * n_outs, n_params)
            return jnp.einsum("np,p,mp->nm", Jf, var, Jf)
        return jnp.einsum("ncp,p,nkp->nck", Js, var, Js)

    def sample(self, n_samples: int = 100, key: Optional[jax.Array] = None):
        key = self._next_key() if key is None else key
        eps = jax.random.normal(key, (n_samples, self.n_params), dtype=self._dtype)
        return self.mean[None, :] + eps * self.posterior_scale[None, :]


class LowRankLaplace(ParametricLaplace):
    """Low-rank posterior precision `P = V diag(λ) Vᵀ + P₀` from truncated
    Lanczos of the dataset curvature (reference `baselaplace.py:1882-2045`),
    with Woodbury-style inference at K×K cost."""

    _key = ("all", "lowrank")

    def __init__(self, model, likelihood, backend="hessian", sigma_noise=1.0,
                 prior_precision=1.0, prior_mean=0.0, temperature=1.0,
                 enable_backprop=False, dict_key_x="input_ids",
                 dict_key_y="labels", backend_kwargs=None, params=None,
                 low_rank: int = 10, parallel=None):
        self.low_rank = low_rank
        super().__init__(model, likelihood, sigma_noise, prior_precision,
                         prior_mean, temperature, enable_backprop, dict_key_x,
                         dict_key_y, backend, backend_kwargs, params, parallel)

    def _init_H(self):
        self.H = None

    @property
    def V(self):
        (U, eigvals), prior_prec_diag = self.posterior_precision
        return U / prior_prec_diag[:, None]

    @property
    def Kinv(self):
        (U, eigvals), _ = self.posterior_precision
        return jnp.linalg.inv(jnp.diag(1.0 / eigvals) + U.T @ self.V)

    def fit(self, train_loader, override: bool = True, progress_bar: bool = False,
            key=None):
        """Whole-loader eigendecomposition; not batch-additive
        (reference `baselaplace.py:1950-1987`)."""
        if not override:
            raise ValueError("LowRank LA does not support updating.")
        self._check_loader(train_loader)

        self._prior_tune_cache = None
        self.mean = self.model.mean_vector
        if not self.enable_backprop:
            self.mean = jax.lax.stop_gradient(self.mean)

        data = next(iter(train_loader))
        X, y = self._unpack_batch(data)
        out = jax.eval_shape(self.model.apply, self.model.train_params, _probe(X))
        if self.likelihood == Likelihood.REGRESSION and jnp.ndim(y) != out.ndim:
            raise ValueError(
                f"The model's output has {out.ndim} dims but the target has "
                f"{jnp.ndim(y)} dims."
            )
        self.n_outputs = out.shape[-1]

        eigenvectors, eigenvalues, loss = self.backend.eig_lowrank(
            train_loader, low_rank=self.low_rank, parallel=self.parallel
        )
        self.H = (eigenvectors, eigenvalues)
        self.loss = loss
        self.n_data = dataset_size(train_loader)

    @property
    def posterior_precision(self):
        self._check_H_init()
        return (self.H[0], self._H_factor * self.H[1]), self.prior_precision_diag

    def functional_variance(self, Js):
        prior_var = jnp.einsum("ncp,nkp->nck", Js / self.prior_precision_diag, Js)
        Js_V = jnp.einsum("ncp,pl->ncl", Js, self.V)
        info_gain = jnp.einsum("ncl,nkl->nck", Js_V @ self.Kinv, Js_V)
        return prior_var - info_gain

    def functional_covariance(self, Js):
        n_batch, n_outs, n_params = Js.shape
        Js = Js.reshape(n_batch * n_outs, n_params)
        prior_cov = jnp.einsum("np,mp->nm", Js / self.prior_precision_diag, Js)
        Js_V = jnp.einsum("np,pl->nl", Js, self.V)
        info_gain = jnp.einsum("nl,ml->nm", Js_V @ self.Kinv, Js_V)
        return prior_cov - info_gain

    def sample(self, n_samples: int = 100, key: Optional[jax.Array] = None):
        """Low-rank + diag Gaussian sampling via the double-Cholesky trick
        (reference `baselaplace.py:2022-2038`)."""
        key = self._next_key() if key is None else key
        eps = jax.random.normal(key, (self.n_params, n_samples), dtype=self._dtype)
        d = self.prior_precision_diag
        Vs = self.V * jnp.sqrt(d)[:, None]
        VtV = Vs.T @ Vs
        Ik = jnp.eye(VtV.shape[0], dtype=self._dtype)
        A = jnp.linalg.cholesky(VtV)
        B = jnp.linalg.cholesky(VtV + Ik)
        A_inv = jnp.linalg.inv(A)
        C = jnp.linalg.inv(A_inv.T @ (B - Ik) @ A_inv)
        Kern_inv = jnp.linalg.inv(jnp.linalg.inv(C) + Vs.T @ Vs)
        dinv_sqrt = jnp.sqrt(d)[:, None]
        prior_sample = eps / dinv_sqrt
        gain_sample = (Vs / dinv_sqrt) @ Kern_inv @ (Vs.T @ eps)
        return self.mean + (prior_sample - gain_sample).T

    def _log_det_posterior_precision(self, prior_precision, sigma_noise):
        (U, eigvals) = self.H
        h_factor = 1.0 / (sigma_noise**2) / self.temperature
        lam = h_factor * eigvals
        d = self._prior_precision_diag(prior_precision)
        V = U / d[:, None]
        Kinv = jnp.linalg.inv(jnp.diag(1.0 / lam) + U.T @ V)
        return (
            jnp.sum(jnp.log(lam))
            + jnp.sum(jnp.log(d))
            - jnp.linalg.slogdet(Kinv)[1]
        )


def _stack_batches(loader, unpack, max_bytes: int = 1 << 30):
    """Stack a loader's batches into (nb, B, ...) arrays for the scan fit.

    Returns `(xs, ys, remainder)` — remainder is a final smaller batch or
    None — or None when the loader isn't stackable (non-uniform batches,
    non-array data, or total size above `max_bytes` — checked while
    iterating, so an out-of-core loader is never fully materialized)."""
    batches = []
    total = 0
    try:
        for data in loader:
            X, y = unpack(data)
            total += sum(
                np.asarray(leaf).nbytes
                for leaf in jax.tree_util.tree_leaves(X)
            ) + np.asarray(y).nbytes
            if total > max_bytes:
                return None
            batches.append((X, y))
    except Exception:
        return None
    if not batches:
        return None

    def lead(x):
        if isinstance(x, Mapping):
            x = next(iter(x.values()))
        return int(np.shape(x)[0])

    try:
        b0 = lead(batches[0][0])
        rem = None
        if len(batches) > 1 and lead(batches[-1][0]) != b0:
            rem = batches.pop()
        if any(lead(X) != b0 for X, _ in batches):
            return None
        if isinstance(batches[0][0], Mapping):
            keys = list(batches[0][0].keys())
            xs = {
                k: np.stack([np.asarray(X[k]) for X, _ in batches]) for k in keys
            }
        else:
            xs = np.stack([np.asarray(X) for X, _ in batches])
        ys = np.stack([np.asarray(y) for _, y in batches])
    except Exception:
        return None
    return xs, ys, rem


def _as_device(x):
    if isinstance(x, Mapping):
        return {k: jnp.asarray(v) for k, v in x.items()}
    return jnp.asarray(x)


def _probe(x):
    if isinstance(x, Mapping):
        return {k: jnp.asarray(v[:1]) for k, v in x.items()}
    return jnp.asarray(x[:1])


def _map_batch(n: int) -> int:
    """Chunk size for lax.map over posterior samples — bounds activation memory."""
    return max(1, min(n, 16))
