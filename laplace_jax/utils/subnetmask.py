"""Subnetwork selection strategies.

Parity: `laplace/utils/subnetmask.py` — each mask produces an index vector into
the canonical flat parameter vector. Score-based masks rank parameters and take
the top-k; name-based masks select whole leaves/modules; `LastLayerSubnetMask`
reuses the last-layer auto-discovery.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from laplace_jax.enums import Likelihood
from laplace_jax.nnmodel import NNModel, _path_contains
from laplace_jax.utils.flatten import tree_to_vector

__all__ = [
    "SubnetMask",
    "RandomSubnetMask",
    "LargestMagnitudeSubnetMask",
    "LargestVarianceDiagLaplaceSubnetMask",
    "LargestVarianceSWAGSubnetMask",
    "ParamNameSubnetMask",
    "ModuleNameSubnetMask",
    "LastLayerSubnetMask",
]


class SubnetMask:
    """Baseclass (reference `subnetmask.py:28-155`)."""

    def __init__(self, model):
        self.model: NNModel = NNModel.wrap(model)
        self.parameter_vector = tree_to_vector(self.model.train_params)
        self._n_params = int(self.parameter_vector.shape[0])
        self._indices: Optional[np.ndarray] = None
        self._n_params_subnet: Optional[int] = None

    def _check_select(self):
        if self._indices is None:
            raise AttributeError("Subnetwork mask not selected. Run select() first.")

    @property
    def indices(self) -> np.ndarray:
        self._check_select()
        return self._indices

    @property
    def n_params_subnet(self) -> int:
        if self._n_params_subnet is None:
            self._check_select()
            self._n_params_subnet = len(self._indices)
        return self._n_params_subnet

    def convert_subnet_mask_to_indices(self, subnet_mask) -> np.ndarray:
        """Binary (n_params,) mask → sorted index vector
        (reference `subnetmask.py:64-112`)."""
        mask = np.asarray(subnet_mask)
        if mask.dtype not in (np.bool_,) and not np.issubdtype(mask.dtype, np.integer):
            raise ValueError(
                "Subnetwork mask needs to be 1-dimensional integral or boolean!"
            )
        if mask.ndim != 1 or len(mask) != self._n_params:
            raise ValueError("Subnetwork mask needs to be a binary (n_params,) vector!")
        if not np.isin(mask.astype(np.int64), [0, 1]).all():
            raise ValueError("Subnetwork mask must be binary!")
        return np.nonzero(mask)[0]

    def select(self, train_loader=None) -> np.ndarray:
        if self._indices is not None:
            raise ValueError("Subnetwork mask already selected.")
        subnet_mask = self.get_subnet_mask(train_loader)
        self._indices = self.convert_subnet_mask_to_indices(subnet_mask)
        return self._indices

    def get_subnet_mask(self, train_loader):
        raise NotImplementedError


class ScoreBasedSubnetMask(SubnetMask):
    """Top-k by score (reference `subnetmask.py:158-205`)."""

    def __init__(self, model, n_params_subnet: int):
        super().__init__(model)
        if n_params_subnet is None:
            raise ValueError(
                "Need to pass number of subnetwork parameters when using "
                "subnetwork Laplace."
            )
        if n_params_subnet > self._n_params:
            raise ValueError(
                f"Subnetwork ({n_params_subnet}) cannot be larger than model "
                f"({self._n_params})."
            )
        self._n_params_subnet = n_params_subnet
        self._param_scores = None

    def compute_param_scores(self, train_loader):
        raise NotImplementedError

    def _check_param_scores(self):
        if np.asarray(self._param_scores).shape != self.parameter_vector.shape:
            raise ValueError(
                "Parameter scores need to be of same shape as parameter vector."
            )

    def get_subnet_mask(self, train_loader):
        if self._param_scores is None:
            self._param_scores = self.compute_param_scores(train_loader)
        self._check_param_scores()
        idx = np.argsort(np.asarray(self._param_scores))[::-1][: self._n_params_subnet]
        idx = np.sort(idx)
        mask = np.zeros(self._n_params, dtype=bool)
        mask[idx] = True
        return mask


class RandomSubnetMask(ScoreBasedSubnetMask):
    """Uniformly random subnetwork (reference `subnetmask.py:208-212`)."""

    def __init__(self, model, n_params_subnet, seed: int = 0):
        super().__init__(model, n_params_subnet)
        self.seed = seed

    def compute_param_scores(self, train_loader):
        rng = np.random.default_rng(self.seed)
        return rng.uniform(size=self._n_params)


class LargestMagnitudeSubnetMask(ScoreBasedSubnetMask):
    """Largest |θ| (reference `subnetmask.py:215-219`)."""

    def compute_param_scores(self, train_loader):
        return np.abs(np.asarray(self.parameter_vector))


class LargestVarianceDiagLaplaceSubnetMask(ScoreBasedSubnetMask):
    """Largest marginal variance under a diagonal Laplace
    (reference `subnetmask.py:222-249`)."""

    def __init__(self, model, n_params_subnet, diag_laplace_model):
        super().__init__(model, n_params_subnet)
        self.diag_laplace_model = diag_laplace_model

    def compute_param_scores(self, train_loader):
        if train_loader is None:
            raise ValueError("Need to pass train loader for subnet selection.")
        self.diag_laplace_model.fit(train_loader)
        return np.asarray(self.diag_laplace_model.posterior_variance)


class LargestVarianceSWAGSubnetMask(ScoreBasedSubnetMask):
    """Largest marginal variance under diagonal SWAG
    (reference `subnetmask.py:252-307`)."""

    def __init__(self, model, n_params_subnet,
                 likelihood: Likelihood | str = Likelihood.CLASSIFICATION,
                 swag_n_snapshots: int = 40, swag_snapshot_freq: int = 1,
                 swag_lr: float = 0.01):
        if likelihood not in (Likelihood.CLASSIFICATION, Likelihood.REGRESSION):
            raise ValueError("Only available for classification and regression!")
        super().__init__(model, n_params_subnet)
        self.likelihood = likelihood
        self.swag_n_snapshots = swag_n_snapshots
        self.swag_snapshot_freq = swag_snapshot_freq
        self.swag_lr = swag_lr

    def compute_param_scores(self, train_loader):
        if train_loader is None:
            raise ValueError("Need to pass train loader for subnet selection.")
        from laplace_jax.utils.swag import fit_diagonal_swag_var

        return np.asarray(
            fit_diagonal_swag_var(
                self.model, train_loader, self.likelihood,
                n_snapshots_total=self.swag_n_snapshots,
                snapshot_freq=self.swag_snapshot_freq, lr=self.swag_lr,
            )
        )


class ParamNameSubnetMask(SubnetMask):
    """Select parameter leaves by path name, e.g. 'params/Dense_0/kernel'
    (reference `subnetmask.py:310-350`)."""

    def __init__(self, model, parameter_names: list[str]):
        super().__init__(model)
        self._parameter_names = parameter_names

    def _check_param_names(self):
        names = set(self._parameter_names)
        if not names:
            raise ValueError("Parameter name list cannot be empty.")
        existing = {"/".join(s.path) for s in self.model.leaf_specs}
        missing = names - existing
        if missing:
            raise ValueError(f"Parameters {sorted(missing)} do not exist in model.")

    def get_subnet_mask(self, train_loader):
        self._check_param_names()
        mask = np.zeros(self._n_params, dtype=bool)
        for s in self.model.leaf_specs:
            if "/".join(s.path) in self._parameter_names:
                mask[s.offset : s.offset + s.size] = True
        return mask


class ModuleNameSubnetMask(SubnetMask):
    """Select whole modules by flax path name, e.g. 'Dense_0'
    (reference `subnetmask.py:353-404`)."""

    def __init__(self, model, module_names: list[str]):
        super().__init__(model)
        self._module_names = module_names

    def _check_module_names(self):
        names = list(self._module_names)
        if not names:
            raise ValueError("Module name list cannot be empty.")
        for name in names:
            mpath = tuple(name.split("/"))
            if not any(
                _path_contains(s.path, mpath) for s in self.model.leaf_specs
            ):
                raise ValueError(f"Modules ['{name}'] do not exist in model.")

    def get_subnet_mask(self, train_loader):
        self._check_module_names()
        mask = np.zeros(self._n_params, dtype=bool)
        for name in self._module_names:
            mpath = tuple(name.split("/"))
            for s in self.model.leaf_specs:
                if _path_contains(s.path, mpath):
                    mask[s.offset : s.offset + s.size] = True
        return mask


class LastLayerSubnetMask(ModuleNameSubnetMask):
    """The last layer as a subnetwork (reference `subnetmask.py:407-436`)."""

    def __init__(self, model, last_layer_name: Optional[str] = None):
        super().__init__(model, [])
        self._last_layer_name = last_layer_name

    def get_subnet_mask(self, train_loader):
        if train_loader is None:
            raise ValueError("Need to pass train loader for subnet selection.")
        if self._last_layer_name is None:
            data = next(iter(train_loader))
            X = data[0] if isinstance(data, (tuple, list)) else data
            path = self.model.find_last_layer(X[:1])
            self._module_names = ["/".join(path)]
        else:
            self._module_names = [self._last_layer_name]
        return super().get_subnet_mask(train_loader)
