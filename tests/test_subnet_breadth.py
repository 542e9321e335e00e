"""Subnetwork breadth suite — predictive/marglik/sampling sweeps over mask
strategies, mirroring reference `tests/test_subnetlaplace.py:716-923`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, DiagSubnetLaplace, FullSubnetLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.subnetmask import (
    LargestMagnitudeSubnetMask,
    LargestVarianceDiagLaplaceSubnetMask,
    LastLayerSubnetMask,
    ModuleNameSubnetMask,
    ParamNameSubnetMask,
    RandomSubnetMask,
)

from .utils import classification_data, make_mlp, regression_data


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def class_loader():
    X, y = classification_data(n=12)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=6)


@pytest.fixture
def reg_loader():
    X, y = regression_data(n=12)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=6)


def _mask_indices(model, name, loader):
    if name == "random":
        return RandomSubnetMask(model, n_params_subnet=10).select(loader)
    if name == "magnitude":
        return LargestMagnitudeSubnetMask(model, n_params_subnet=10).select(loader)
    if name == "variance":
        dl = DiagLaplace(model, "classification")
        return LargestVarianceDiagLaplaceSubnetMask(
            model, n_params_subnet=10, diag_laplace_model=dl
        ).select(loader)
    if name == "param_name":
        return ParamNameSubnetMask(
            model, ["params/Dense_1/bias", "params/Dense_1/kernel"]
        ).select(loader)
    if name == "module_name":
        return ModuleNameSubnetMask(model, ["Dense_0"]).select(loader)
    if name == "last_layer":
        return LastLayerSubnetMask(model).select(loader)
    raise ValueError(name)


MASKS = ["random", "magnitude", "variance", "param_name", "module_name", "last_layer"]


@pytest.mark.parametrize("mask_name", MASKS)
@pytest.mark.parametrize("flavor", [FullSubnetLaplace, DiagSubnetLaplace])
def test_classification_predictive_over_masks(model, class_loader, flavor, mask_name):
    idx = _mask_indices(model, mask_name, class_loader)
    la = flavor(model, "classification", subnetwork_indices=idx)
    la.fit(class_loader)
    X, _ = classification_data()
    for link in ("probit", "mc", "bridge"):
        probs = np.asarray(la(X, link_approx=link, n_samples=30))
        assert probs.shape == (10, 2)
        assert np.allclose(probs.sum(-1), 1.0, atol=1e-6)
        assert (probs >= 0).all()
    probs_nn = np.asarray(la(X, pred_type="nn", link_approx="mc", n_samples=20))
    assert probs_nn.shape == (10, 2)
    assert np.allclose(probs_nn.sum(-1), 1.0, atol=1e-6)


@pytest.mark.parametrize("flavor", [FullSubnetLaplace, DiagSubnetLaplace])
def test_regression_predictive_over_masks(model, reg_loader, flavor):
    model_reg = model
    idx = RandomSubnetMask(model_reg, n_params_subnet=12).select(reg_loader)
    la = flavor(model_reg, "regression", sigma_noise=0.8,
                subnetwork_indices=idx)
    la.fit(reg_loader)
    X, _ = regression_data()
    f_mu, f_var = la(X)
    assert f_mu.shape == (10, 2) and f_var.shape == (10, 2, 2)
    v = np.diagonal(np.asarray(f_var), axis1=-2, axis2=-1)
    assert (v > 0).all()
    # joint predictive
    f_mu_j, f_cov = la(X, joint=True)
    assert f_cov.shape == (20, 20)
    assert np.allclose(
        np.asarray(f_mu_j).ravel(), np.asarray(f_mu).ravel(), atol=1e-10
    )
    # joint covariance block diagonal equals marginal variances
    cov = np.asarray(f_cov).reshape(10, 2, 10, 2)
    for b in range(10):
        assert np.allclose(cov[b, :, b, :], np.asarray(f_var)[b], atol=1e-8)
    # nn predictive returns (mean, var) for regression
    m_nn, v_nn = la(X, pred_type="nn", link_approx="mc", n_samples=30)
    assert m_nn.shape == (10, 2) and v_nn.shape == (10, 2)


@pytest.mark.parametrize("flavor", [FullSubnetLaplace, DiagSubnetLaplace])
def test_subnet_marginal_likelihood_and_tuning(model, class_loader, flavor):
    """Reference `test_subnetlaplace.py:834-867`."""
    idx = RandomSubnetMask(model, n_params_subnet=16).select(class_loader)
    la = flavor(model, "classification", subnetwork_indices=idx)
    la.fit(class_loader)
    ml_1 = float(la.log_marginal_likelihood(prior_precision=1.0))
    ml_2 = float(la.log_marginal_likelihood(prior_precision=20.0))
    assert np.isfinite(ml_1) and np.isfinite(ml_2) and ml_1 != ml_2
    # marglik is differentiable in the prior precision
    g = jax.grad(lambda lp: -la._log_marglik(jnp.exp(lp), la.sigma_noise))(
        jnp.zeros(1, dtype=jnp.float64)
    )
    assert np.isfinite(np.asarray(g)).all()
    la.optimize_prior_precision(n_steps=15)
    assert float(la.prior_precision[0]) > 0


@pytest.mark.parametrize("flavor", [FullSubnetLaplace, DiagSubnetLaplace])
def test_subnet_sample_statistics(model, class_loader, flavor):
    """Reference `test_subnetlaplace.py:869-923`: sample moments and
    determinism under an explicit key."""
    idx = RandomSubnetMask(model, n_params_subnet=10).select(class_loader)
    la = flavor(model, "classification", subnetwork_indices=idx,
                prior_precision=1e6)  # tight posterior -> samples ≈ MAP
    la.fit(class_loader)
    s = np.asarray(la.sample(1000, key=jax.random.key(7)))
    assert s.shape == (1000, model.n_params)
    assert np.allclose(s.mean(0), np.asarray(la.mean), atol=5e-2)
    s2 = np.asarray(la.sample(1000, key=jax.random.key(7)))
    assert np.array_equal(s, s2)  # deterministic under the same key
    s3 = np.asarray(la.sample(1000, key=jax.random.key(8)))
    assert not np.array_equal(s, s3)


def test_subnet_ef_backend(model, class_loader):
    """EF curvature through the subnetwork path (GGN/EF-only contract)."""
    idx = RandomSubnetMask(model, n_params_subnet=10).select(class_loader)
    la = FullSubnetLaplace(model, "classification", subnetwork_indices=idx,
                           backend="ef")
    la.fit(class_loader)
    assert la.H.shape == (10, 10)
    evals = np.linalg.eigvalsh(np.asarray(la.H))
    assert (evals > -1e-10).all()  # EF is PSD
    X, _ = classification_data()
    probs = np.asarray(la(X, link_approx="probit"))
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-6)


def test_subnet_online_fit(model, class_loader):
    """override=False accumulates curvature and N for subnet Laplace."""
    idx = RandomSubnetMask(model, n_params_subnet=8).select(class_loader)
    la = FullSubnetLaplace(model, "classification", subnetwork_indices=idx)
    la.fit(class_loader)
    H1 = np.asarray(la.H).copy()
    n1 = la.n_data
    la.fit(class_loader, override=False)
    assert la.n_data == 2 * n1
    assert np.allclose(np.asarray(la.H), 2 * H1, atol=1e-10)
