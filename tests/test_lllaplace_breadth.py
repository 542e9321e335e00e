"""Last-layer hyperparameter-form, temperature, and predictive oracles.

Mirrors reference last-layer behaviors beyond discovery/serialization
(`/root/reference/tests/test_lllaplace.py:150-364` init forms,
`:472-577` predictive semantics, `:685-712` regression GLM behavior).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from laplace_jax import DiagLLLaplace, FullLLLaplace, KronLLLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

FLAVORS = [FullLLLaplace, KronLLLaplace, DiagLLLaplace]


class MLP(nn.Module):
    n_out: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(12)(x)
        x = nn.relu(x)
        return nn.Dense(self.n_out)(x)


@pytest.fixture(scope="module")
def model():
    m = MLP()
    params = m.init(jax.random.key(0), jnp.ones((1, 3)))
    return NNModel.from_flax(m, params)


@pytest.fixture(scope="module")
def reg_loader():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((24, 3))
    y = rng.standard_normal((24, 2))
    return ArrayLoader(X, y, batch_size=12)


@pytest.fixture(scope="module")
def class_loader():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((24, 3))
    y = rng.integers(0, 2, size=(24,))
    return ArrayLoader(X, y, batch_size=12)


def test_deferred_prior_precision_vector(model, class_loader):
    # last-layer weight+bias of a Dense(12 -> 2): 26 params, 2 leaves
    la = FullLLLaplace(model, "classification",
                       prior_precision=np.full(26, 3.0))
    la.fit(class_loader)
    assert la.n_params == 26
    assert np.allclose(np.asarray(la.prior_precision_diag), 3.0)


def test_deferred_invalid_prior_precision_raises_at_fit(model, class_loader):
    la = FullLLLaplace(model, "classification",
                       prior_precision=np.full(7, 3.0))
    with pytest.raises(ValueError):
        la.fit(class_loader)


def test_explicit_layer_validates_eagerly(model):
    with pytest.raises(ValueError):
        FullLLLaplace(model, "classification", last_layer_name="Dense_1",
                      prior_precision=np.full(7, 3.0))
    la = FullLLLaplace(model, "classification", last_layer_name="Dense_1",
                       prior_precision=np.full(26, 2.0))
    assert la.n_params == 26


@pytest.mark.parametrize("flavor", FLAVORS)
def test_ll_temperature_scaling(model, class_loader, flavor):
    la1 = flavor(model, "classification", temperature=1.0)
    la2 = flavor(model, "classification", temperature=2.0)
    la1.fit(class_loader)
    la2.fit(class_loader)
    assert float(la2.log_likelihood) == pytest.approx(
        float(la1.log_likelihood) / 2.0, rel=1e-6
    )


@pytest.mark.parametrize("flavor", FLAVORS)
def test_ll_regression_glm_semantics(model, reg_loader, flavor):
    la = flavor(model, "regression", sigma_noise=0.5)
    la.fit(reg_loader)
    X = np.asarray(next(iter(reg_loader))[0][:5])
    f_mu, f_var = la(X, pred_type="glm")
    assert f_mu.shape == (5, 2)
    assert f_var.shape == (5, 2, 2)
    assert (np.diagonal(np.asarray(f_var), axis1=1, axis2=2) > 0).all()

    # strong prior shrinks predictive variance
    la_s = flavor(model, "regression", sigma_noise=0.5, prior_precision=1e5)
    la_s.fit(reg_loader)
    _, f_var_s = la_s(X, pred_type="glm")
    assert np.all(
        np.diagonal(np.asarray(f_var_s), axis1=1, axis2=2)
        <= np.diagonal(np.asarray(f_var), axis1=1, axis2=2) + 1e-12
    )


@pytest.mark.parametrize("flavor", FLAVORS)
def test_ll_classification_links(model, class_loader, flavor):
    la = flavor(model, "classification")
    la.fit(class_loader)
    X = np.asarray(next(iter(class_loader))[0][:6])
    for link in ("probit", "bridge", "bridge_norm", "mc"):
        p = np.asarray(la(X, pred_type="glm", link_approx=link))
        assert p.shape == (6, 2)
        assert np.isfinite(p).all()
        assert np.allclose(p.sum(axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_ll_predictive_samples_shapes(model, class_loader, flavor):
    la = flavor(model, "classification")
    la.fit(class_loader)
    X = np.asarray(next(iter(class_loader))[0][:4])
    for pred_type in ("glm", "nn"):
        s = np.asarray(la.predictive_samples(X, pred_type=pred_type,
                                             n_samples=7))
        assert s.shape == (7, 4, 2)
        assert np.allclose(s.sum(-1), 1.0, atol=1e-5)


def test_ll_backprop_glm(model, reg_loader):
    la = FullLLLaplace(model, "regression", enable_backprop=True)
    la.fit(reg_loader)
    X = jnp.asarray(np.random.default_rng(3).standard_normal((4, 3)))

    def obj(x):
        mu, var = la(x, pred_type="glm")
        return jnp.sum(mu) + jnp.sum(var)

    g = jax.grad(obj)(X)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

    # without enable_backprop the predictive is stop-gradiented
    la2 = FullLLLaplace(model, "regression")
    la2.fit(reg_loader)

    def obj2(x):
        mu, var = la2(x, pred_type="glm")
        return jnp.sum(mu) + jnp.sum(var)

    g2 = jax.grad(obj2)(X)
    assert np.allclose(np.asarray(g2), 0.0)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_ll_sample_shapes_and_determinism(model, class_loader, flavor):
    la = flavor(model, "classification")
    la.fit(class_loader)
    s1 = np.asarray(la.sample(5, key=jax.random.key(0)))
    s2 = np.asarray(la.sample(5, key=jax.random.key(0)))
    assert s1.shape == (5, la.n_params)
    assert np.array_equal(s1, s2)
