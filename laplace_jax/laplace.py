"""`Laplace()` factory: string-keyed dispatch to the concrete flavor class.

Parity: `laplace/laplace.py:13-53` — resolves `(subset_of_weights,
hessian_structure)` against each class's `_key` via a recursive subclass walk.
"""

from __future__ import annotations

from laplace_jax.baselaplace import BaseLaplace
from laplace_jax.enums import HessianStructure, Likelihood, SubsetOfWeights


def Laplace(
    model,
    likelihood: Likelihood | str,
    subset_of_weights: SubsetOfWeights | str = SubsetOfWeights.LAST_LAYER,
    hessian_structure: HessianStructure | str = HessianStructure.KRON,
    *args,
    **kwargs,
) -> BaseLaplace:
    """Simplified Laplace access using strings instead of different classes.

    Parameters
    ----------
    model : NNModel | (flax module, params) | (apply_fn, params)
    likelihood : 'classification' | 'regression' | 'reward_modeling'
    subset_of_weights : 'all' | 'last_layer' | 'subnetwork'
    hessian_structure : 'full' | 'kron' | 'diag' | 'lowrank' | 'gp'
    """
    # import flavor modules so every _key registers via __subclasses__
    import laplace_jax.functional_laplace  # noqa: F401
    import laplace_jax.lllaplace  # noqa: F401
    import laplace_jax.subnetlaplace  # noqa: F401

    if subset_of_weights == "subnetwork" and hessian_structure not in ["full", "diag"]:
        raise ValueError(
            "Subnetwork Laplace requires a full or diagonal Hessian approximation!"
        )
    laplace_map = {
        subclass._key: subclass
        for subclass in _all_subclasses(BaseLaplace)
        if hasattr(subclass, "_key")
    }
    laplace_class = laplace_map[(subset_of_weights, hessian_structure)]
    return laplace_class(model, likelihood, *args, **kwargs)


def _all_subclasses(cls) -> set:
    return set(cls.__subclasses__()).union(
        [s for c in cls.__subclasses__() for s in _all_subclasses(c)]
    )
