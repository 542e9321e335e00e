"""Differentiability through the predictive + hyperparameter semantics.

Parity: `tests/test_baselaplace.py:730-817` (backprop through GLM/NN/joint
predictives with `enable_backprop=True`), temperature scaling, and non-zero
prior mean (continual-learning scatter term).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, FullLaplace, FullLLLaplace, KronLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data, make_mlp, regression_data


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def reg_loader():
    X, y = regression_data(n=10)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
def test_glm_predictive_backprop(model, reg_loader, flavor):
    la = flavor(model, "regression", enable_backprop=True)
    la.fit(reg_loader)
    X, _ = regression_data(n=4)

    def mean_sum(x):
        f_mu, _ = la(x, pred_type="glm")
        return jnp.sum(f_mu)

    def var_sum(x):
        _, f_var = la(x, pred_type="glm")
        return jnp.sum(f_var)

    g_mu = jax.grad(mean_sum)(X)
    g_var = jax.grad(var_sum)(X)
    assert g_mu.shape == X.shape and np.isfinite(np.asarray(g_mu)).all()
    assert np.abs(np.asarray(g_mu)).max() > 0
    assert np.isfinite(np.asarray(g_var)).all()
    assert np.abs(np.asarray(g_var)).max() > 0


def test_stop_gradient_without_enable_backprop(model, reg_loader):
    la = FullLaplace(model, "regression", enable_backprop=False)
    la.fit(reg_loader)
    X, _ = regression_data(n=4)
    g = jax.grad(lambda x: jnp.sum(la(x, pred_type="glm")[0]))(X)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_ll_predictive_backprop(model, reg_loader):
    la = FullLLLaplace(model, "regression", enable_backprop=True)
    la.fit(reg_loader)
    X, _ = regression_data(n=4)
    g = jax.grad(lambda x: jnp.sum(la(x, pred_type="glm")[1]))(X)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_joint_predictive_backprop(model, reg_loader):
    la = FullLaplace(model, "regression", enable_backprop=True)
    la.fit(reg_loader)
    X, _ = regression_data(n=3)
    g = jax.grad(lambda x: jnp.sum(la(x, pred_type="glm", joint=True)[1]))(X)
    assert np.isfinite(np.asarray(g)).all()


def test_temperature_scales_posterior(model, reg_loader):
    """Lower temperature -> higher H factor -> more concentrated posterior
    (reference `baselaplace.py:592-596`)."""
    la_hot = FullLaplace(model, "regression", temperature=10.0)
    la_cold = FullLaplace(model, "regression", temperature=0.1)
    la_hot.fit(reg_loader)
    la_cold.fit(reg_loader)
    var_hot = np.trace(np.asarray(la_hot.posterior_covariance))
    var_cold = np.trace(np.asarray(la_cold.posterior_covariance))
    assert var_cold < var_hot


def test_prior_mean_enters_scatter(model, reg_loader):
    la = FullLaplace(model, "regression", prior_mean=0.0)
    la.fit(reg_loader)
    scatter0 = float(la.scatter)
    la.prior_mean = 10.0
    scatter_shift = float(la.scatter)
    assert scatter_shift > scatter0
    # marglik decreases when the prior mean moves far from the MAP
    la.prior_mean = 0.0
    m0 = float(la.log_marginal_likelihood())
    la.prior_mean = 10.0
    m1 = float(la.log_marginal_likelihood())
    assert m1 < m0


def test_frozen_params_subset(reg_loader):
    """Trainable-mask subset (the reference's requires_grad filter,
    `test_subset_params.py` analogue): frozen leaves are excluded."""
    model, params = make_mlp()
    mask = jax.tree_util.tree_map(lambda _: True, params)
    # freeze the first layer
    mask["params"]["Dense_0"]["kernel"] = False
    mask["params"]["Dense_0"]["bias"] = False
    nnm = NNModel.from_flax(model, params, trainable_mask=mask)
    assert nnm.is_subset
    la = FullLaplace(nnm, "regression")
    la.fit(reg_loader)
    assert la.n_params == 20 * 2 + 2  # only Dense_1
    X, _ = regression_data(n=4)
    f_mu, f_var = la(X, pred_type="glm")
    assert f_mu.shape == (4, 2)
    assert np.isfinite(float(la.log_marginal_likelihood()))
