"""Pytree <-> flat-vector plumbing.

The whole library works on one canonical flattening of the (trainable) parameter
pytree: `jax.flatten_util.ravel_pytree` order (tree-flatten order, i.e. sorted dict
keys for flax params). Every vectorized quantity — posterior mean, diagonal precision,
Jacobian parameter axis, Kron group slices, subnetwork indices — uses this order.

This replaces torch's `parameters_to_vector` convention in the reference
(`laplace/baselaplace.py:931-935`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

PyTree = Any


def tree_to_vector(tree: PyTree) -> jnp.ndarray:
    """Flatten a pytree of arrays into one 1-D vector (canonical order)."""
    vec, _ = ravel_pytree(tree)
    return vec


def make_unflatten(tree: PyTree) -> Callable[[jnp.ndarray], PyTree]:
    """Return a function mapping a flat vector back to the structure of `tree`."""
    _, unflatten = ravel_pytree(tree)
    return unflatten


@dataclass(frozen=True)
class LeafSpec:
    """Shape/slice metadata for one leaf of the canonical flattening."""

    path: tuple  # jax key-path entries rendered as strings
    shape: tuple
    size: int
    offset: int  # start index in the flat vector


def leaf_specs(tree: PyTree) -> list[LeafSpec]:
    """Per-leaf metadata (path, shape, flat-vector offset) in canonical order."""
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(tree)
    specs = []
    offset = 0
    for path, leaf in leaves_with_paths:
        path_strs = tuple(_keystr(k) for k in path)
        size = int(leaf.size)
        specs.append(LeafSpec(path_strs, tuple(leaf.shape), size, offset))
        offset += size
    return specs


def _keystr(k) -> str:
    """Render one pytree key-path entry as a plain string."""
    if isinstance(k, jax.tree_util.DictKey):
        return str(k.key)
    if isinstance(k, jax.tree_util.SequenceKey):
        return str(k.idx)
    if isinstance(k, jax.tree_util.GetAttrKey):
        return str(k.name)
    return str(k)


def params_per_leaf(tree: PyTree) -> list[int]:
    """Number of parameters per leaf (reference: `utils/utils.py:104-115`)."""
    return [int(leaf.size) for leaf in jax.tree_util.tree_leaves(tree)]


def num_params(tree: PyTree) -> int:
    return sum(params_per_leaf(tree))


def partition(tree: PyTree, mask: PyTree) -> tuple[PyTree, PyTree]:
    """Split `tree` into (selected, rest) by a pytree of booleans (per leaf).

    Mirrors the reference's `requires_grad`-based trainable-parameter scan
    (`laplace/baselaplace.py:115-122`): selected leaves are the "trainable" set.
    Non-selected positions are replaced by `None` placeholders in each half.
    """
    selected = jax.tree_util.tree_map(lambda m, p: p if m else None, mask, tree)
    rest = jax.tree_util.tree_map(lambda m, p: None if m else p, mask, tree)
    return selected, rest


def merge(selected: PyTree, rest: PyTree) -> PyTree:
    """Inverse of `partition`."""
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b,
        selected,
        rest,
        is_leaf=lambda x: x is None,
    )
