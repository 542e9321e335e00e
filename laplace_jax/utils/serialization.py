"""Disk (de)serialization of Laplace state dicts — pickle-free.

The reference relies on `torch.save`/`torch.load` of `state_dict()`
(`docs/index.md:306-330`) and even pickles a DataLoader inside
FunctionalLaplace's state (`laplace/baselaplace.py:3232-3257`). Here state dicts
are flattened to arrays + JSON-able metadata and stored in a single `.npz`
archive: portable, no arbitrary code execution on load.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from laplace_jax.utils.matrix import Kron, KronDecomposed

__all__ = ["save_state_dict", "load_state_dict"]

_META_KEY = "__laplace_jax_meta__"


def _flatten_state(state: dict) -> tuple[dict, dict]:
    arrays, meta = {}, {}
    for key, val in state.items():
        if isinstance(val, (Kron, KronDecomposed)):
            leaves, treedef = jax.tree_util.tree_flatten(val)
            meta[key] = {
                "kind": type(val).__name__,
                "n_leaves": len(leaves),
                "aux": _kron_aux(val),
            }
            for i, leaf in enumerate(leaves):
                arrays[f"{key}::leaf{i}"] = np.asarray(leaf)
        elif isinstance(val, (jnp.ndarray, np.ndarray)):
            arrays[key] = np.asarray(val)
        elif isinstance(val, (list, tuple)) and val and all(
            isinstance(v, (jnp.ndarray, np.ndarray)) for v in val
        ):
            meta[key] = {"kind": "array_list", "n": len(val)}
            for i, v in enumerate(val):
                arrays[f"{key}::item{i}"] = np.asarray(v)
        elif isinstance(val, dict) and all(
            isinstance(v, (jnp.ndarray, np.ndarray)) for v in val.values()
        ):
            # e.g. the last-layer discovery probe batch for dict-input models
            meta[key] = {"kind": "array_dict", "keys": sorted(val.keys())}
            for k in val:
                arrays[f"{key}::key::{k}"] = np.asarray(val[k])
        elif val is None or isinstance(val, (bool, int, float, str)):
            meta[key] = {"kind": "scalar", "value": val}
        else:
            raise ValueError(
                f"Cannot serialize state entry {key!r} of type {type(val)}."
            )
    return arrays, meta


def _kron_aux(val) -> Any:
    if isinstance(val, Kron):
        return [len(F) for F in val.kfacs]
    return {
        "lens": [len(ls) for ls in val.eigenvalues],
        "damping": bool(val.damping),
    }


def save_state_dict(state: dict, path: str) -> None:
    arrays, meta = _flatten_state(state)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **arrays)


def load_state_dict(path: str) -> dict:
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
        state: dict = {}
        for key in data.files:
            if key == _META_KEY or "::" in key:
                continue
            state[key] = jnp.asarray(data[key])
        for key, m in meta.items():
            if m["kind"] == "scalar":
                state[key] = m["value"]
            elif m["kind"] == "array_list":
                state[key] = [
                    jnp.asarray(data[f"{key}::item{i}"]) for i in range(m["n"])
                ]
            elif m["kind"] == "array_dict":
                state[key] = {
                    k: jnp.asarray(data[f"{key}::key::{k}"]) for k in m["keys"]
                }
            elif m["kind"] == "Kron":
                leaves = [
                    jnp.asarray(data[f"{key}::leaf{i}"])
                    for i in range(m["n_leaves"])
                ]
                kfacs, i = [], 0
                for n in m["aux"]:
                    kfacs.append(tuple(leaves[i : i + n]))
                    i += n
                state[key] = Kron(kfacs)
            elif m["kind"] == "KronDecomposed":
                leaves = [
                    jnp.asarray(data[f"{key}::leaf{i}"])
                    for i in range(m["n_leaves"])
                ]
                lens = m["aux"]["lens"]
                total = sum(lens)
                Qs_flat = leaves[:total]
                ls_flat = leaves[total : 2 * total]
                deltas = leaves[2 * total]
                eigvecs, eigvals, i = [], [], 0
                for n in lens:
                    eigvecs.append(tuple(Qs_flat[i : i + n]))
                    eigvals.append(tuple(ls_flat[i : i + n]))
                    i += n
                state[key] = KronDecomposed(
                    eigvecs, eigvals, deltas, damping=m["aux"]["damping"]
                )
    return state
