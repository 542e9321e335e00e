"""Whole-batch Jacobian fallback hygiene.

The per-sample vmapped jacrev (linear memory in batch) is the default; models
whose parameters are shape-coupled to the batch (e.g. `DenseGeneral`
with `batch_dims`) cannot trace with a singleton batch and fall back to the
whole-batch jacrev, which is QUADRATIC in batch memory. That fallback must be
loud (RuntimeWarning), and a genuine shape bug in a user model must still
raise instead of being silently absorbed by the fallback.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.nnmodel import NNModel


class _BatchCoupledNet(nn.Module):
    """Kernel shape-coupled to the batch via DenseGeneral batch_dims."""

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        h = nn.DenseGeneral(4, batch_dims=(0,), param_dtype=jnp.float64)(x)
        return h.mean(axis=1)


class _ShapeBugNet(nn.Module):
    """Broken for EVERY batch size: contracts x against a mis-shaped kernel."""

    @nn.compact
    def __call__(self, x):  # (B, D)
        w = self.param("w", nn.initializers.zeros, (x.shape[-1] + 1, 2),
                       jnp.float64)
        return x @ w  # always a shape error


def test_batch_coupled_model_warns_and_matches_naive():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, 3, 5)))
    m = _BatchCoupledNet()
    p = m.init(jax.random.key(0), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with pytest.warns(RuntimeWarning, match="QUADRATIC"):
        Js, f = be.jacobians(X)
    Js_naive = jax.jacrev(lambda t: be.model.apply_vec_curv(t, X))(
        be.model.mean_vector
    )
    np.testing.assert_allclose(np.asarray(Js), np.asarray(Js_naive), atol=1e-12)


def test_batch_coupled_subnet_warns():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((4, 3, 5)))
    m = _BatchCoupledNet()
    p = m.init(jax.random.key(0), X)
    nnm = NNModel.from_flax(m, p)
    idx = jnp.arange(8)
    be = CurvatureBackend(nnm, "classification", subnetwork_indices=idx)
    with pytest.warns(RuntimeWarning, match="QUADRATIC"):
        Js, _ = be.jacobians(X)
    assert Js.shape[-1] == 8


def test_shape_bug_model_raises():
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.standard_normal((4, 5)))
    m = _ShapeBugNet()
    # init with the bug bypassed: build params by hand
    p = {"params": {"w": jnp.zeros((6, 2), jnp.float64)}}
    be = CurvatureBackend(NNModel(m.apply, p, module=m), "classification")
    with pytest.raises(TypeError):
        with pytest.warns(RuntimeWarning):  # the fallback attempt still warns
            be.jacobians(X)


def test_healthy_model_does_not_warn(recwarn):
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((4, 5)))
    m = nn.Dense(3, param_dtype=jnp.float64)
    p = m.init(jax.random.key(0), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    be.jacobians(X)
    assert not [w for w in recwarn if issubclass(w.category, RuntimeWarning)]
