"""Predictive evaluation over a validation loader.

Parity: `laplace/utils/utils.py:40-101` — runs the Laplace predictive on every
batch and aggregates a running metric (or an offline callable).
"""

from __future__ import annotations

import inspect
from typing import Mapping

import jax.numpy as jnp

from laplace_jax.enums import LinkApprox, PredType


def validate(
    laplace,
    val_loader,
    loss,
    pred_type: PredType | str = PredType.GLM,
    link_approx: LinkApprox | str = LinkApprox.PROBIT,
    n_samples: int = 100,
    dict_key_y: str = "labels",
) -> float:
    is_online = hasattr(loss, "update") and hasattr(loss, "compute")
    if is_online:
        loss.reset()
        # Decide the update arity from the metric's signature, NOT by calling
        # and catching TypeError: a genuine TypeError raised *inside* a user
        # metric must surface, not silently retry with fewer arguments.
        try:
            sig = inspect.signature(loss.update)
            update_takes_var = _accepts_n_positional(sig, 3)
        except (TypeError, ValueError):
            # Builtins / C extensions with no introspectable signature: fall
            # back to legacy call-probing (3-arg first, retry on TypeError).
            # Only this narrow case keeps the probe; Python metrics with a
            # real signature never have internal TypeErrors swallowed.
            update_takes_var = None
    output_means, output_vars, targets = [], [], []

    for data in val_loader:
        if isinstance(data, Mapping):
            X, y = data, data[dict_key_y]
        else:
            X, y = data
        out = laplace(
            X, pred_type=pred_type, link_approx=link_approx,
            n_samples=n_samples, fitting=True,
        )
        if isinstance(out, tuple):
            if is_online:
                if update_takes_var is None:  # uninspectable: probe once
                    try:
                        loss.update(out[0], out[1], jnp.asarray(y))
                        update_takes_var = True
                    except TypeError:
                        update_takes_var = False
                        loss.update(out[0], jnp.asarray(y))
                elif update_takes_var:
                    loss.update(out[0], out[1], jnp.asarray(y))
                else:
                    loss.update(out[0], jnp.asarray(y))
            else:
                output_means.append(out[0])
                output_vars.append(out[1])
                targets.append(jnp.asarray(y))
        else:
            if is_online:
                loss.update(out, jnp.asarray(y))
            else:
                output_means.append(out)
                targets.append(jnp.asarray(y))

    if is_online:
        return float(loss.compute())

    means = jnp.concatenate(output_means, axis=0)
    tgts = jnp.concatenate(targets, axis=0)
    if output_vars:
        variances = jnp.concatenate(output_vars, axis=0)
        return float(loss(means, variances, tgts))
    return float(loss(means, tgts))


def _accepts_n_positional(sig: inspect.Signature, n: int) -> bool:
    """True if the signature can be called with `n` positional arguments."""
    count = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD):
            count += 1
        elif p.kind is p.VAR_POSITIONAL:
            return True
    return count >= n
