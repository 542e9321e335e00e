"""End-to-end tests for Full/Kron/Diag/LowRank Laplace.

Mirrors the reference's `tests/test_baselaplace.py` strategy: small MLPs in
float64, fit functionality, posterior precision identities, log_prob vs an exact
multivariate normal, predictive shapes/normalization, marglik differentiability,
online fit, sampling statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from laplace_jax import DiagLaplace, FullLaplace, KronLaplace, Laplace, LowRankLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data, make_mlp, regression_data

FLAVORS = [FullLaplace, KronLaplace, DiagLaplace]


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def class_loader():
    X, y = classification_data(n=10)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)


@pytest.fixture
def reg_loader():
    X, y = regression_data(n=10)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_init_and_invalid_likelihood(model, flavor):
    with pytest.raises(ValueError):
        flavor(model, "poisson")
    la = flavor(model, "classification")
    assert la.n_params == model.n_params
    if flavor is KronLaplace:  # Kron refuses until fitted (H_facs is None)
        with pytest.raises(AttributeError):
            _ = la.posterior_precision
    with pytest.raises(ValueError):
        flavor(model, "classification", sigma_noise=2.0)


@pytest.mark.parametrize("flavor", FLAVORS)
@pytest.mark.parametrize("lik", ["classification", "regression"])
def test_fit_and_marglik(model, class_loader, reg_loader, flavor, lik):
    loader = class_loader if lik == "classification" else reg_loader
    la = flavor(model, lik)
    la.fit(loader)
    assert la.n_data == 10
    assert la.n_outputs == 2
    marglik = la.log_marginal_likelihood()
    assert np.isfinite(float(marglik))
    # differentiable in prior precision
    g = jax.grad(lambda pp: la.log_marginal_likelihood(prior_precision=pp))(
        jnp.asarray([1.0])
    )
    assert np.isfinite(np.asarray(g)).all()
    if lik == "regression":
        g2 = jax.grad(
            lambda sn: la.log_marginal_likelihood(sigma_noise=sn)
        )(jnp.asarray(0.7))
        assert np.isfinite(float(g2))


def test_full_vs_diag_consistency(model, class_loader):
    full = FullLaplace(model, "classification")
    diag = DiagLaplace(model, "classification")
    full.fit(class_loader)
    diag.fit(class_loader)
    np.testing.assert_allclose(
        np.diag(np.asarray(full.H)), np.asarray(diag.H), atol=1e-10
    )
    np.testing.assert_allclose(float(full.loss), float(diag.loss), rtol=1e-10)


def test_kron_vs_full_posterior_logdet(model, class_loader):
    """Kron logdet with scalar prior equals dense logdet of its materialization."""
    kron = KronLaplace(model, "classification", prior_precision=0.7)
    kron.fit(class_loader)
    kd = kron.posterior_precision
    dense = np.asarray(kd.to_matrix(exponent=1))
    np.testing.assert_allclose(
        float(kron.log_det_posterior_precision),
        np.linalg.slogdet(dense)[1],
        rtol=1e-8,
    )


def test_full_log_prob_vs_scipy(model, reg_loader):
    la = FullLaplace(model, "regression", prior_precision=0.5)
    la.fit(reg_loader)
    P = np.asarray(la.posterior_precision)
    mean = np.asarray(la.mean)
    rng = np.random.default_rng(0)
    value = jnp.asarray(mean + 0.1 * rng.standard_normal(mean.shape))
    ref = scipy.stats.multivariate_normal(
        mean=mean, cov=np.linalg.inv(P)
    ).logpdf(np.asarray(value))
    np.testing.assert_allclose(float(la.log_prob(value)), ref, rtol=1e-6)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_classification_predictive(model, class_loader, flavor):
    la = flavor(model, "classification")
    la.fit(class_loader)
    X, _ = classification_data()
    for link in ["probit", "mc", "bridge", "bridge_norm"]:
        probs = la(X, pred_type="glm", link_approx=link)
        assert probs.shape == (10, 2)
        np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
        assert (np.asarray(probs) >= 0).all()
    probs_nn = la(X, pred_type="nn", link_approx="mc", n_samples=50)
    assert probs_nn.shape == (10, 2)
    np.testing.assert_allclose(np.asarray(probs_nn.sum(-1)), 1.0, atol=1e-6)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_regression_predictive(model, reg_loader, flavor):
    la = flavor(model, "regression")
    la.fit(reg_loader)
    X, _ = regression_data()
    f_mu, f_var = la(X, pred_type="glm")
    assert f_mu.shape == (10, 2) and f_var.shape == (10, 2, 2)
    # diagonal of f_var positive
    assert (np.diagonal(np.asarray(f_var), axis1=1, axis2=2) > 0).all()
    # joint predictive
    f_mu_j, f_cov = la(X, pred_type="glm", joint=True)
    assert f_mu_j.shape == (20,) and f_cov.shape == (20, 20)
    # joint diag equals marginal variance
    np.testing.assert_allclose(
        np.diag(np.asarray(f_cov)).reshape(10, 2),
        np.diagonal(np.asarray(f_var), axis1=1, axis2=2),
        atol=1e-8,
    )
    # nn predictive
    m, v = la(X, pred_type="nn", link_approx="mc", n_samples=100)
    assert m.shape == (10, 2) and v.shape == (10, 2)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_predictive_samples_shapes(model, class_loader, flavor):
    la = flavor(model, "classification")
    la.fit(class_loader)
    X, _ = classification_data()
    s = la.predictive_samples(X, pred_type="glm", n_samples=7)
    assert s.shape == (7, 10, 2)
    np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0, atol=1e-6)
    fs = la.functional_samples(X, pred_type="glm", n_samples=7)
    assert fs.shape == (7, 10, 2)
    fs_nn = la.functional_samples(X, pred_type="nn", n_samples=7)
    assert fs_nn.shape == (7, 10, 2)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_sample_statistics(model, class_loader, flavor):
    la = flavor(model, "classification", prior_precision=5.0)
    la.fit(class_loader)
    samples = la.sample(n_samples=20000, key=jax.random.key(0))
    assert samples.shape == (20000, la.n_params)
    emp_mean = np.asarray(samples.mean(0))
    np.testing.assert_allclose(emp_mean, np.asarray(la.mean), atol=0.05)
    # variance matches the posterior variance diagonal
    if flavor is FullLaplace:
        var_ref = np.diag(np.asarray(la.posterior_covariance))
    elif flavor is DiagLaplace:
        var_ref = np.asarray(la.posterior_variance)
    else:
        var_ref = np.asarray(la.posterior_precision.diag(exponent=-1))
    emp_var = np.asarray(samples.var(0))
    np.testing.assert_allclose(emp_var, var_ref, rtol=0.15, atol=1e-4)


def test_online_fit_full(model, class_loader):
    """fit(override=False) accumulates (reference `baselaplace.py:919-921`)."""
    la = FullLaplace(model, "classification")
    la.fit(class_loader)
    H1, loss1, n1 = la.H, la.loss, la.n_data
    la.fit(class_loader, override=False)
    assert la.n_data == 2 * n1
    np.testing.assert_allclose(np.asarray(la.H), 2 * np.asarray(H1), rtol=1e-10)
    np.testing.assert_allclose(float(la.loss), 2 * float(loss1), rtol=1e-10)


def test_online_fit_kron_rescaling(model, class_loader):
    """Online Kron fit with N-rescaled merging matches a single fit on the
    doubled dataset (reference `baselaplace.py:1779-1809`)."""
    X, y = classification_data(n=10)
    double_loader = ArrayLoader(
        np.concatenate([np.asarray(X)] * 2), np.concatenate([np.asarray(y)] * 2),
        batch_size=5,
    )
    la_online = KronLaplace(model, "classification")
    la_online.fit(class_loader)
    la_online.fit(class_loader, override=False)
    la_once = KronLaplace(model, "classification")
    la_once.fit(double_loader)
    np.testing.assert_allclose(
        np.asarray(la_online.H_facs.diag()), np.asarray(la_once.H_facs.diag()),
        rtol=1e-8,
    )
    assert la_online.n_data == la_once.n_data == 20


def test_optimize_prior_precision_marglik(model, reg_loader):
    la = FullLaplace(model, "regression")
    la.fit(reg_loader)
    marglik_before = float(la.log_marginal_likelihood())
    la.optimize_prior_precision(method="marglik", n_steps=50, lr=0.1)
    marglik_after = float(la.log_marginal_likelihood())
    assert marglik_after >= marglik_before


def test_optimize_prior_precision_gridsearch(model, class_loader):
    la = DiagLaplace(model, "classification")
    la.fit(class_loader)
    la.optimize_prior_precision(
        method="gridsearch", val_loader=class_loader, grid_size=10,
        log_prior_prec_min=-2, log_prior_prec_max=2,
    )
    assert float(la.prior_precision[0]) > 0


def test_lowrank_laplace(model, class_loader):
    la = LowRankLaplace(model, "classification", low_rank=8)
    with pytest.raises(ValueError):
        la.fit(class_loader, override=False)
    la.fit(class_loader)
    X, _ = classification_data()
    probs = la(X, pred_type="glm", link_approx="probit")
    assert probs.shape == (10, 2)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-6)
    assert np.isfinite(float(la.log_marginal_likelihood()))
    s = la.sample(50, key=jax.random.key(0))
    assert s.shape == (50, la.n_params)


def test_lowrank_matches_full_for_full_rank(model, class_loader):
    """With rank = P and a (PSD) GGN backend, LowRank must match FullLaplace:
    the truncated eigendecomposition is then exact."""
    la_lr = LowRankLaplace(model, "classification", backend="ggn",
                           low_rank=model.n_params)
    la_lr.fit(class_loader)
    la_full = FullLaplace(model, "classification", backend="ggn")
    la_full.fit(class_loader)
    X, _ = classification_data()
    p1 = la_lr(X, link_approx="probit")
    p2 = la_full(X, link_approx="probit")
    # lowrank keeps only eigvals > 1e-6; the GGN tail it discards is tiny
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-3)
    np.testing.assert_allclose(
        float(la_lr.log_marginal_likelihood()),
        float(la_full.log_marginal_likelihood()),
        rtol=1e-2,
    )


def test_factory_dispatch(model):
    la = Laplace(model, "classification", subset_of_weights="all",
                 hessian_structure="full")
    assert isinstance(la, FullLaplace)
    la = Laplace(model, "classification", subset_of_weights="all",
                 hessian_structure="kron")
    assert isinstance(la, KronLaplace)
    la = Laplace(model, "classification", subset_of_weights="all",
                 hessian_structure="diag")
    assert isinstance(la, DiagLaplace)
    with pytest.raises(ValueError):
        Laplace(model, "classification", subset_of_weights="subnetwork",
                hessian_structure="kron")


def test_reward_modeling(class_loader):
    """Bradley-Terry reward modeling: fit as classification on paired inputs,
    predict as regression (reference `baselaplace.py:59-63,1195-1197`)."""
    import flax.linen as nn

    class RewardModel(nn.Module):
        @nn.compact
        def __call__(self, x):
            # x: (B, 2, D) during fit, (B, D) during eval
            h = nn.Dense(8, param_dtype=jnp.float64)(x)
            h = jnp.tanh(h)
            out = nn.Dense(1, param_dtype=jnp.float64)(h)
            if x.ndim == 3:
                return out[..., 0]  # (B, 2) logits of the pair
            return out  # (B, 1) reward

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((12, 2, 3)))
    y = jnp.asarray(rng.integers(0, 2, size=(12,)))
    model = RewardModel()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=6)
    la = DiagLaplace(nnm, "reward_modeling")
    la.fit(loader)
    X_eval = jnp.asarray(rng.standard_normal((5, 3)))
    f_mu, f_var = la(X_eval, pred_type="glm")
    assert f_mu.shape == (5, 1) and f_var.shape == (5, 1, 1)


def test_serialization_roundtrip(model, class_loader):
    for flavor in FLAVORS:
        la = flavor(model, "classification")
        la.fit(class_loader)
        sd = la.state_dict()
        la2 = flavor(model, "classification")
        la2.load_state_dict(sd)
        X, _ = classification_data()
        np.testing.assert_allclose(
            np.asarray(la(X, link_approx="probit")),
            np.asarray(la2(X, link_approx="probit")),
            atol=1e-10,
        )
        with pytest.raises(ValueError):
            other = DiagLaplace(model, "classification") if flavor is not DiagLaplace \
                else FullLaplace(model, "classification")
            other.load_state_dict(sd)
