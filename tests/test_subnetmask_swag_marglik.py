"""Tests for subnet masks, SWAG, and marglik_training."""

import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, FullSubnetLaplace
from laplace_jax.marglik_training import marglik_training
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.subnetmask import (
    LargestMagnitudeSubnetMask,
    LargestVarianceDiagLaplaceSubnetMask,
    LargestVarianceSWAGSubnetMask,
    LastLayerSubnetMask,
    ModuleNameSubnetMask,
    ParamNameSubnetMask,
    RandomSubnetMask,
)
from laplace_jax.utils.swag import fit_diagonal_swag_var

from .utils import classification_data, make_mlp, regression_data, sinusoid_data


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def loader():
    X, y = classification_data(n=20)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=10)


def test_random_and_magnitude_masks(model, loader):
    for cls in [RandomSubnetMask, LargestMagnitudeSubnetMask]:
        mask = cls(model, n_params_subnet=10)
        idx = mask.select(loader)
        assert len(idx) == 10 and len(np.unique(idx)) == 10
        assert mask.n_params_subnet == 10
        with pytest.raises(ValueError):
            mask.select(loader)  # already selected
    with pytest.raises(ValueError):
        RandomSubnetMask(model, n_params_subnet=10**6)
    mag = LargestMagnitudeSubnetMask(model, n_params_subnet=5)
    idx = mag.select(loader)
    theta = np.abs(np.asarray(mag.parameter_vector))
    top5 = np.sort(np.argsort(theta)[::-1][:5])
    np.testing.assert_array_equal(np.sort(idx), top5)


def test_variance_masks(model, loader):
    diag_la = DiagLaplace(model, "classification")
    mask = LargestVarianceDiagLaplaceSubnetMask(model, 8, diag_la)
    idx = mask.select(loader)
    assert len(idx) == 8
    swag_mask = LargestVarianceSWAGSubnetMask(
        model, 8, likelihood="classification", swag_n_snapshots=3, swag_lr=0.01
    )
    idx2 = swag_mask.select(loader)
    assert len(idx2) == 8


def test_name_based_masks(model, loader):
    m = ParamNameSubnetMask(model, ["params/Dense_0/bias"])
    idx = m.select(loader)
    assert len(idx) == 20  # hidden bias
    with pytest.raises(ValueError):
        ParamNameSubnetMask(model, ["params/NoSuch/kernel"]).select(loader)
    m2 = ModuleNameSubnetMask(model, ["Dense_1"])
    idx2 = m2.select(loader)
    assert len(idx2) == 42
    m3 = LastLayerSubnetMask(model)
    idx3 = m3.select(loader)
    np.testing.assert_array_equal(np.sort(idx2), np.sort(idx3))


def test_mask_feeds_subnet_laplace(model, loader):
    mask = LargestMagnitudeSubnetMask(model, n_params_subnet=12)
    idx = mask.select(loader)
    la = FullSubnetLaplace(model, "classification", subnetwork_indices=idx)
    la.fit(loader)
    X, _ = classification_data()
    assert la(X, link_approx="probit").shape == (10, 2)


def test_swag_variances(model, loader):
    var = fit_diagonal_swag_var(model, loader, "classification",
                                n_snapshots_total=4, lr=0.01)
    assert var.shape == (model.n_params,)
    assert (np.asarray(var) > 0).all()


def test_marglik_training_regression():
    X, y = sinusoid_data(n=64)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=32)
    model, params = make_mlp(in_dim=1, hidden=12, out_dim=1)
    nnm = NNModel.from_flax(model, params)
    la, nnm_out, margliks, losses = marglik_training(
        nnm, loader, likelihood="regression", hessian_structure="kron",
        n_epochs=12, n_hypersteps=5, marglik_frequency=4,
        optimizer_kwargs={"learning_rate": 1e-2},
    )
    assert len(losses) == 12
    assert len(margliks) == 15
    # training reduced the loss; hyperstep loop produced finite margliks
    assert losses[-1] < losses[0]
    assert np.isfinite(margliks).all()
    f_mu, f_var = la(jnp.asarray(X[:5]), pred_type="glm")
    assert f_mu.shape == (5, 1) and f_var.shape == (5, 1, 1)


def test_marglik_training_classification():
    X, y = classification_data(n=40)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=20)
    model, params = make_mlp()
    nnm = NNModel.from_flax(model, params)
    la, _, margliks, losses = marglik_training(
        nnm, loader, likelihood="classification", hessian_structure="diag",
        n_epochs=6, n_hypersteps=4, marglik_frequency=2,
        optimizer_kwargs={"learning_rate": 1e-2},
    )
    assert len(margliks) == 12
    probs = la(jnp.asarray(X[:5]), link_approx="probit")
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
