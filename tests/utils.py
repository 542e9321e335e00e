"""Shared test fixtures/helpers.

Counterpart of the reference's `tests/utils.py`: seeded toy datasets, a trained toy
MLP, PSD-matrix generators, and the naive-autodiff Jacobian oracle
(`tests/utils.py:85-106`) that all curvature backends are verified against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


class ToyMLP(nn.Module):
    """2-layer tanh MLP (reference `tests/utils.py:46-69` model shape)."""

    hidden: int = 20
    out_dim: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=jnp.float64, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x)
        x = nn.Dense(self.out_dim, dtype=jnp.float64, param_dtype=jnp.float64)(x)
        return x


class ToyConvNet(nn.Module):
    """Small conv net for KFAC conv-factor tests."""

    out_dim: int = 2

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        x = nn.Conv(4, (2, 2), strides=(2, 2), dtype=jnp.float64,
                    param_dtype=jnp.float64)(x)
        x = jnp.tanh(x.reshape(x.shape[0], -1))
        x = nn.Dense(20, dtype=jnp.float64, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x)
        x = nn.Dense(self.out_dim, dtype=jnp.float64, param_dtype=jnp.float64)(x)
        return x


def make_mlp(in_dim=3, hidden=20, out_dim=2, seed=711):
    model = ToyMLP(hidden=hidden, out_dim=out_dim)
    params = model.init(jax.random.key(seed), jnp.ones((1, in_dim)))
    return model, params


def classification_data(n=10, d=3, k=2, seed=711):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.integers(0, k, size=(n,)))
    return X, y


def regression_data(n=10, d=3, k=2, seed=711):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal((n, k)))
    return X, y


def sinusoid_data(n=150, sigma=0.3, seed=6):
    """1-D sinusoid regression set (reference `tests/utils.py:9-19`)."""
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(0, 8, size=(n, 1)))
    y = jnp.sin(X) + jnp.asarray(rng.standard_normal((n, 1))) * sigma
    return X, y


def get_psd_matrix(dim, seed=0):
    """Random PSD matrix (reference `tests/utils.py:72-78`)."""
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((dim, dim * 5)))
    return X @ X.T / (dim * 5)


def jacobians_naive(apply_fn, params, X):
    """Per-element autodiff Jacobian oracle (reference `tests/utils.py:85-106`).

    Computes J (batch, outputs, n_params) by differentiating each scalar output
    independently — slow but unambiguous.
    """
    from laplace_jax.utils.flatten import make_unflatten, tree_to_vector

    theta = tree_to_vector(params)
    unflatten = make_unflatten(params)

    def f_vec(t, x):
        return apply_fn(unflatten(t), x[None])[0]

    def jac_single(x):
        return jax.jacrev(f_vec)(theta, x)

    Js = jnp.stack([jac_single(X[i]) for i in range(X.shape[0])])
    f = apply_fn(params, X)
    return Js, f
