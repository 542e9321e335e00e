"""Prior-precision structure helpers.

Parity: `expand_prior_precision` (`laplace/utils/utils.py:264-293`) and
`fix_prior_prec_structure` (`:296-334`) — shape a scalar / per-layer / diagonal
prior precision into the canonical flat-vector layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from laplace_jax.enums import PriorStructure


def expand_prior_precision(prior_prec: jnp.ndarray, params) -> jnp.ndarray:
    """Expand a scalar / per-leaf / diagonal prior precision to a full diagonal
    vector in canonical flatten order over `params` leaves."""
    leaves = jax.tree_util.tree_leaves(params)
    P = sum(int(p.size) for p in leaves)
    prior_prec = jnp.atleast_1d(prior_prec)
    if prior_prec.ndim != 1:
        raise ValueError("Prior precision must be at most 1-dimensional.")
    if prior_prec.shape[0] == 1:
        return jnp.broadcast_to(prior_prec, (P,)).astype(leaves[0].dtype)
    if prior_prec.shape[0] == P:
        return prior_prec
    if prior_prec.shape[0] == len(leaves):
        return jnp.concatenate(
            [jnp.full((int(p.size),), d, dtype=leaves[0].dtype)
             for d, p in zip(prior_prec, leaves)]
        )
    raise ValueError("Mismatch of prior and model. Diagonal, scalar, or per-layer prior.")


def expand_prior_precision_sizes(
    prior_prec: jnp.ndarray, leaf_sizes: list[int]
) -> jnp.ndarray:
    """Same as `expand_prior_precision` but from explicit leaf sizes.

    Jit-friendly (shapes are static); differentiable in `prior_prec`, which the
    marglik prior-precision optimization relies on
    (reference `laplace/baselaplace.py:466-485`).
    """
    P = sum(leaf_sizes)
    prior_prec = jnp.atleast_1d(prior_prec)
    if prior_prec.shape[0] == 1:
        return jnp.broadcast_to(prior_prec, (P,))
    if prior_prec.shape[0] == P:
        return prior_prec
    if prior_prec.shape[0] == len(leaf_sizes):
        return jnp.repeat(prior_prec, jnp.asarray(leaf_sizes), total_repeat_length=P)
    raise ValueError("Mismatch of prior and model. Diagonal, scalar, or per-layer prior.")


def fix_prior_prec_structure(
    prior_prec_init: float,
    prior_structure: PriorStructure | str,
    n_layers: int,
    n_params: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Create an initial prior-precision vector with the requested structure
    (reference `laplace/utils/utils.py:296-334`)."""
    if prior_structure == PriorStructure.SCALAR:
        return jnp.full((1,), prior_prec_init, dtype=dtype)
    if prior_structure == PriorStructure.LAYERWISE:
        return jnp.full((n_layers,), prior_prec_init, dtype=dtype)
    if prior_structure == PriorStructure.DIAG:
        return jnp.full((n_params,), prior_prec_init, dtype=dtype)
    raise ValueError(f"Invalid prior structure {prior_structure}.")
