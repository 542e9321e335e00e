"""Subnetwork Laplace: posterior over an arbitrary index set of the flat params.

Parity: `laplace/subnetlaplace.py` — index validation, GGN/EF-only backends,
subnet prior, and `assemble_full_samples` scattering subnet samples back into the
MAP vector. Indices address the canonical flat vector (`utils/flatten.py`), the
JAX counterpart of `parameters_to_vector` ordering.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from laplace_jax.baselaplace import DiagLaplace, FullLaplace, ParametricLaplace

__all__ = ["SubnetLaplace", "FullSubnetLaplace", "DiagSubnetLaplace"]


class SubnetLaplace(ParametricLaplace):
    """Laplace over a subnetwork (reference `subnetlaplace.py:15`).

    Parameters: `subnetwork_indices` — unique in-range int vector indexing the
    canonical flat parameter vector.
    """

    def __init__(self, model, likelihood, subnetwork_indices, sigma_noise=1.0,
                 prior_precision=1.0, prior_mean=0.0, temperature=1.0,
                 backend=None, backend_kwargs=None, params=None,
                 dict_key_x="input_ids", dict_key_y="labels", parallel=None):
        self.H = None
        super().__init__(model, likelihood, sigma_noise=sigma_noise,
                         prior_precision=prior_precision, prior_mean=prior_mean,
                         temperature=temperature, backend=backend,
                         backend_kwargs=backend_kwargs, params=params,
                         dict_key_x=dict_key_x, dict_key_y=dict_key_y,
                         parallel=parallel)
        if isinstance(self._backend_arg, str) and self._backend_arg == "hessian":
            raise ValueError("SubnetLaplace can only be used with GGN and EF.")
        self._check_subnetwork_indices(subnetwork_indices)
        self.subnetwork_indices = jnp.asarray(subnetwork_indices)
        self._backend_kwargs["subnetwork_indices"] = self.subnetwork_indices
        self.n_params_subnet = int(self.subnetwork_indices.shape[0])
        self.prior_precision = self._prior_precision  # re-validate vs subnet size
        self._init_H()

    def _check_subnetwork_indices(self, idx) -> None:
        """Index validation (reference `subnetlaplace.py:113-137`)."""
        if idx is None:
            raise ValueError("Subnetwork indices cannot be None.")
        idx = np.asarray(idx)
        if idx.size == 0 or idx.ndim != 1 or not np.issubdtype(idx.dtype, np.integer):
            raise ValueError(
                "Subnetwork indices must be non-empty 1-dimensional integer array."
            )
        if (idx < 0).any() or (idx >= self.n_params).any():
            raise ValueError(
                f"Subnetwork indices must lie between 0 and n_params={self.n_params}."
            )
        if len(np.unique(idx)) != len(idx):
            raise ValueError("Subnetwork indices must not contain duplicate entries.")

    @property
    def prior_precision_diag(self) -> jnp.ndarray:
        """Scalar or subnet-diagonal prior (reference `subnetlaplace.py:139-157`)."""
        pp = self.prior_precision
        if pp.shape[0] == 1:
            return jnp.broadcast_to(pp, (self.n_params_subnet,))
        if pp.shape[0] == self.n_params_subnet:
            return pp
        raise ValueError("Mismatch of prior and model. Diagonal or scalar prior.")

    def _prior_precision_diag(self, prior_precision) -> jnp.ndarray:
        pp = jnp.atleast_1d(prior_precision)
        if pp.shape[0] == 1:
            return jnp.broadcast_to(pp, (self.n_params_subnet,))
        if pp.shape[0] == self.n_params_subnet:
            return pp
        raise ValueError("Mismatch of prior and model. Diagonal or scalar prior.")

    @ParametricLaplace.prior_precision.setter
    def prior_precision(self, prior_precision):
        self._posterior_scale = None
        pp = jnp.atleast_1d(jnp.asarray(prior_precision, dtype=self._dtype))
        if pp.ndim > 1:
            raise ValueError("Prior precision needs to be at most one-dimensional.")
        n_sub = getattr(self, "n_params_subnet", None)
        if n_sub is not None and pp.shape[0] not in (1, n_sub):
            raise ValueError("Length of prior precision does not align with subnetwork.")
        self._prior_precision = pp

    @property
    def mean_subnet(self) -> jnp.ndarray:
        return self.mean[self.subnetwork_indices]

    @property
    def scatter(self) -> jnp.ndarray:
        return self._scatter(self.prior_precision)

    def _scatter(self, prior_precision) -> jnp.ndarray:
        delta = self.mean_subnet - self.prior_mean
        return jnp.dot(delta * self._prior_precision_diag(prior_precision), delta)

    def square_norm(self, value) -> jnp.ndarray:
        """Δᵀ P Δ over the subnetwork; accepts a full or subnet-sized vector."""
        if value.shape[-1] == self.n_params:
            value = value[..., self.subnetwork_indices]
        delta = value - self.mean_subnet
        if hasattr(self, "posterior_precision") and self.H is not None:
            P = self.posterior_precision
            if P.ndim == 1:
                return delta @ (delta * P)
            return delta @ P @ delta
        raise AttributeError("Laplace not fitted. Run fit() first.")

    def assemble_full_samples(self, subnet_samples) -> jnp.ndarray:
        """Scatter subnet samples into copies of the full MAP vector
        (reference `subnetlaplace.py:168-171`)."""
        full = jnp.broadcast_to(
            self.mean[None, :], (subnet_samples.shape[0], self.n_params)
        )
        return full.at[:, self.subnetwork_indices].set(subnet_samples)

    def state_dict(self) -> dict:
        sd = super().state_dict()
        sd["subnetwork_indices"] = self.subnetwork_indices
        return sd

    def load_state_dict(self, state_dict: dict) -> None:
        idx = state_dict.get("subnetwork_indices")
        if idx is None:
            raise ValueError(
                "Loading a wrong Laplace type. Make sure `subset_of_weights` "
                "and `hessian_structure` are correct!"
            )
        idx = np.asarray(idx)
        mine = np.asarray(self.subnetwork_indices)
        if idx.shape != mine.shape or not np.array_equal(idx, mine):
            raise ValueError(
                "Different `subnetwork_indices` detected! The posterior is "
                "only valid for the index set it was fitted with."
            )
        state_dict = {
            k: v for k, v in state_dict.items() if k != "subnetwork_indices"
        }
        super().load_state_dict(state_dict)


class FullSubnetLaplace(SubnetLaplace, FullLaplace):
    """Dense subnet posterior (reference `subnetlaplace.py:174-204`)."""

    _key = ("subnetwork", "full")

    def _init_H(self):
        if getattr(self, "n_params_subnet", None) is None:
            self.H = None
            return
        self.H = jnp.zeros(
            (self.n_params_subnet, self.n_params_subnet), dtype=self._dtype
        )
        self._posterior_scale = None

    def sample(self, n_samples: int = 100, key: Optional[jax.Array] = None):
        key = self._next_key() if key is None else key
        eps = jax.random.normal(
            key, (n_samples, self.n_params_subnet), dtype=self._dtype
        )
        subnet_samples = self.mean_subnet[None, :] + eps @ self.posterior_scale.T
        return self.assemble_full_samples(subnet_samples)


class DiagSubnetLaplace(SubnetLaplace, DiagLaplace):
    """Diagonal subnet posterior (reference `subnetlaplace.py:207-241`)."""

    _key = ("subnetwork", "diag")

    def _init_H(self):
        if getattr(self, "n_params_subnet", None) is None:
            self.H = None
            return
        self.H = jnp.zeros(self.n_params_subnet, dtype=self._dtype)

    def sample(self, n_samples: int = 100, key: Optional[jax.Array] = None):
        key = self._next_key() if key is None else key
        eps = jax.random.normal(
            key, (n_samples, self.n_params_subnet), dtype=self._dtype
        )
        subnet_samples = self.mean_subnet[None, :] + eps * self.posterior_scale[None, :]
        return self.assemble_full_samples(subnet_samples)
