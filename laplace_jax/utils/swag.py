"""Diagonal SWAG variance estimation.

Parity: `laplace/utils/swag.py:18-102` — run SGD with a large learning rate from
the MAP, track running first/second moments of the flat parameter vector over
snapshots, return clamped variances. The SGD step is one jitted optax update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from laplace_jax.enums import Likelihood
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.flatten import tree_to_vector

__all__ = ["fit_diagonal_swag_var"]


def fit_diagonal_swag_var(
    model: NNModel,
    train_loader,
    likelihood: Likelihood | str = Likelihood.CLASSIFICATION,
    n_snapshots_total: int = 40,
    snapshot_freq: int = 1,
    lr: float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 3e-4,
    min_var: float = 1e-30,
) -> jnp.ndarray:
    """Marginal parameter variances from diagonal SWAG."""
    theta = tree_to_vector(model.train_params)

    def criterion(f, y):
        if likelihood == Likelihood.REGRESSION:
            return jnp.mean((f - y) ** 2)
        logp = jax.nn.log_softmax(f, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[..., None].astype(int), axis=-1))

    optimizer = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )
    opt_state = optimizer.init(theta)

    @jax.jit
    def step(theta, opt_state, x, y):
        loss, g = jax.value_and_grad(
            lambda t: criterion(model.apply_vec(t, x), y)
        )(theta)
        updates, opt_state = optimizer.update(g, opt_state, theta)
        return optax.apply_updates(theta, updates), opt_state, loss

    mean = jnp.zeros_like(theta)
    sq_mean = jnp.zeros_like(theta)
    n_snapshots = 0
    n_epochs = snapshot_freq * n_snapshots_total

    for epoch in range(n_epochs):
        for x, y in train_loader:
            theta, opt_state, _ = step(
                theta, opt_state, jnp.asarray(x), jnp.asarray(y)
            )
        if epoch % snapshot_freq == 0:
            old_fac = n_snapshots / (n_snapshots + 1)
            new_fac = 1.0 / (n_snapshots + 1)
            mean = mean * old_fac + theta * new_fac
            sq_mean = sq_mean * old_fac + theta**2 * new_fac
            n_snapshots += 1

    return jnp.clip(sq_mean - mean**2, min=min_var)
