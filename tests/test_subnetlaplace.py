"""Subnetwork Laplace tests (mirrors reference `tests/test_subnetlaplace.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import (
    DiagSubnetLaplace,
    FullLaplace,
    FullSubnetLaplace,
    Laplace,
)
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data, make_mlp


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def class_loader():
    X, y = classification_data(n=10)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)


def test_index_validation(model):
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, "classification", subnetwork_indices=None)
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, "classification",
                          subnetwork_indices=np.asarray([0.5, 1.5]))
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, "classification",
                          subnetwork_indices=np.asarray([0, 0, 1]))
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, "classification",
                          subnetwork_indices=np.asarray([-1, 3]))
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, "classification",
                          subnetwork_indices=np.asarray([10**6]))
    with pytest.raises(ValueError):
        FullSubnetLaplace(model, "classification",
                          subnetwork_indices=np.asarray([0, 1]), backend="hessian")


def test_full_subnet_mask_equals_all_weights(model, class_loader):
    """A subnet covering all params == all-weights FullLaplace
    (reference `test_subnetlaplace.py:673`)."""
    idx = np.arange(model.n_params)
    la_sub = FullSubnetLaplace(model, "classification", subnetwork_indices=idx)
    la_sub.fit(class_loader)
    la_all = FullLaplace(model, "classification")
    la_all.fit(class_loader)
    np.testing.assert_allclose(np.asarray(la_sub.H), np.asarray(la_all.H), atol=1e-10)
    X, _ = classification_data()
    np.testing.assert_allclose(
        np.asarray(la_sub(X, link_approx="probit")),
        np.asarray(la_all(X, link_approx="probit")),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        float(la_sub.log_marginal_likelihood()),
        float(la_all.log_marginal_likelihood()),
        rtol=1e-10,
    )


@pytest.mark.parametrize("flavor", [FullSubnetLaplace, DiagSubnetLaplace])
def test_subnet_fit_predict_sample(model, class_loader, flavor):
    idx = np.asarray([0, 5, 11, 42, 80, 101])
    la = flavor(model, "classification", subnetwork_indices=idx)
    la.fit(class_loader)
    assert la.n_params_subnet == 6
    if flavor is FullSubnetLaplace:
        assert la.H.shape == (6, 6)
    else:
        assert la.H.shape == (6,)
    X, _ = classification_data()
    probs = la(X, link_approx="probit")
    assert probs.shape == (10, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
    # samples: non-subnet coordinates stay at the MAP
    s = la.sample(20, key=jax.random.key(0))
    assert s.shape == (20, model.n_params)
    mask = np.ones(model.n_params, dtype=bool)
    mask[np.asarray(idx)] = False
    np.testing.assert_allclose(
        np.asarray(s[:, mask]),
        np.broadcast_to(np.asarray(la.mean)[mask], (20, mask.sum())),
        atol=1e-12,
    )
    assert np.asarray(s[:, ~mask]).std(0).min() > 0
    # nn predictive works off assembled full samples
    probs_nn = la(X, pred_type="nn", link_approx="mc", n_samples=20)
    assert probs_nn.shape == (10, 2)
    assert np.isfinite(float(la.log_marginal_likelihood()))


def test_subnet_factory(model):
    idx = np.asarray([0, 1, 2])
    la = Laplace(model, "classification", subset_of_weights="subnetwork",
                 hessian_structure="full", subnetwork_indices=idx)
    assert isinstance(la, FullSubnetLaplace)


def test_subnet_diag_prior(model, class_loader):
    idx = np.asarray([0, 5, 11])
    la = DiagSubnetLaplace(
        model, "classification", subnetwork_indices=idx,
        prior_precision=np.asarray([1.0, 2.0, 3.0]),
    )
    la.fit(class_loader)
    np.testing.assert_allclose(
        np.asarray(la.prior_precision_diag), [1.0, 2.0, 3.0]
    )
    with pytest.raises(ValueError):
        la.prior_precision = np.ones(5)
