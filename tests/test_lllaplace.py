"""Last-layer Laplace tests (mirrors reference `tests/test_lllaplace.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import (
    DiagLLLaplace,
    FullLaplace,
    FullLLLaplace,
    KronLLLaplace,
    Laplace,
)
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data, make_mlp, regression_data

LL_FLAVORS = [FullLLLaplace, KronLLLaplace, DiagLLLaplace]


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def class_loader():
    X, y = classification_data(n=10)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)


@pytest.mark.parametrize("flavor", LL_FLAVORS)
def test_auto_discovery_and_fit(model, class_loader, flavor):
    la = flavor(model, "classification")
    assert la.n_params is None  # deferred until first fit batch
    la.fit(class_loader)
    assert la.last_layer_path == ("Dense_1",)
    assert la.n_params == 20 * 2 + 2  # kernel + bias of Dense(2)
    X, _ = classification_data()
    probs = la(X, link_approx="probit")
    assert probs.shape == (10, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)


def test_explicit_last_layer_name(model, class_loader):
    la = FullLLLaplace(model, "classification", last_layer_name="Dense_1")
    assert la.n_params == 42
    la.fit(class_loader)
    X, _ = classification_data()
    assert la(X, link_approx="probit").shape == (10, 2)


def test_ll_equals_full_laplace_on_frozen_backbone(class_loader):
    """LL Laplace == all-weights FullLaplace when the backbone is frozen."""
    model, params = make_mlp()
    nnm_full = NNModel.from_flax(model, params)
    la_ll = FullLLLaplace(nnm_full, "classification")
    la_ll.fit(class_loader)

    mask = nnm_full.split_last_layer(("Dense_1",))
    nnm_masked = NNModel.from_flax(model, params, trainable_mask=mask)
    la_all = FullLaplace(nnm_masked, "classification")
    la_all.fit(class_loader)

    np.testing.assert_allclose(np.asarray(la_ll.H), np.asarray(la_all.H), atol=1e-10)
    X, _ = classification_data()
    np.testing.assert_allclose(
        np.asarray(la_ll(X, link_approx="probit")),
        np.asarray(la_all(X, link_approx="probit")),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        float(la_ll.log_marginal_likelihood()),
        float(la_all.log_marginal_likelihood()),
        rtol=1e-10,
    )


def test_diag_ll_functional_variance_fast(model, class_loader):
    """fast diagonal output variance == slow Jacobian path
    (reference `tests/test_lllaplace.py:579`)."""
    la = DiagLLLaplace(model, "classification")
    la.fit(class_loader)
    X, _ = classification_data()
    f_mu_fast, f_var_fast = la.functional_variance_fast(X)
    Js, f_mu = la.backend.last_layer_jacobians(X)
    f_var_slow = jnp.diagonal(la.functional_variance(Js), axis1=-2, axis2=-1)
    np.testing.assert_allclose(np.asarray(f_mu_fast), np.asarray(f_mu), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(f_var_fast), np.asarray(f_var_slow), atol=1e-10
    )


@pytest.mark.parametrize("damping", [False, True])
def test_kron_ll_functional_variance_fast(model, class_loader, damping):
    """Kron-eigenbasis fast diagonal output variance == slow Jacobian path.
    The reference stubs this (`lllaplace.py:438-441`); laplace_jax implements
    it."""
    la = KronLLLaplace(model, "classification", damping=damping)
    la.fit(class_loader)
    la.prior_precision = 0.7
    X, _ = classification_data()
    f_mu_fast, f_var_fast = la.functional_variance_fast(X)
    Js, f_mu = la.backend.last_layer_jacobians(X)
    f_var_slow = jnp.diagonal(la.functional_variance(Js), axis1=-2, axis2=-1)
    np.testing.assert_allclose(np.asarray(f_mu_fast), np.asarray(f_mu), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(f_var_fast), np.asarray(f_var_slow), atol=1e-10
    )


@pytest.mark.parametrize("flavor", LL_FLAVORS)
def test_ll_nn_predictive(model, class_loader, flavor):
    la = flavor(model, "classification")
    la.fit(class_loader)
    X, _ = classification_data()
    probs = la(X, pred_type="nn", link_approx="mc", n_samples=100)
    assert probs.shape == (10, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
    # feature-cached nn samples agree with glm in the small-variance limit
    la.prior_precision = 1e6
    probs_nn = la(X, pred_type="nn", link_approx="mc", n_samples=500,
                  key=jax.random.key(0))
    probs_glm = la(X, pred_type="glm", link_approx="mc", n_samples=500,
                   key=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(probs_nn), np.asarray(probs_glm), atol=2e-2)


def test_ll_regression_and_marglik(model):
    X, y = regression_data(n=10)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)
    for flavor in LL_FLAVORS:
        la = flavor(model, "regression", sigma_noise=0.8)
        la.fit(loader)
        f_mu, f_var = la(X, pred_type="glm")
        assert f_mu.shape == (10, 2) and f_var.shape == (10, 2, 2)
        assert np.isfinite(float(la.log_marginal_likelihood()))
        la.optimize_prior_precision(method="marglik", n_steps=10)


def test_ll_factory(model):
    la = Laplace(model, "classification", subset_of_weights="last_layer",
                 hessian_structure="kron")
    assert isinstance(la, KronLLLaplace)


def test_ll_serialization(model, class_loader):
    la = FullLLLaplace(model, "classification")
    la.fit(class_loader)
    sd = la.state_dict()
    la2 = FullLLLaplace(model, "classification")
    la2.load_state_dict(sd)
    X, _ = classification_data()
    np.testing.assert_allclose(
        np.asarray(la(X, link_approx="probit")),
        np.asarray(la2(X, link_approx="probit")),
        atol=1e-10,
    )
