"""Hyperparameter-form, temperature, link, and predictive-semantics oracles.

Mirrors reference behaviors not covered by `tests/test_baselaplace.py`:
`tests/test_baselaplace.py:209-335` (init noise/precision/mean/temperature
forms), `:819-848` (regression GLM predictive semantics), `:885-898` (y-shape
validation), and the probit/bridge link outputs of `:519-558`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from laplace_jax import DiagLaplace, FullLaplace, KronLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

FLAVORS = [FullLaplace, KronLaplace, DiagLaplace]


class MLP(nn.Module):
    n_out: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(10)(x)
        x = nn.tanh(x)
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


# ---------------------------------------------------------------------------
# hyperparameter forms (reference tests/test_baselaplace.py:209-335)
# ---------------------------------------------------------------------------


def test_sigma_noise_forms(model):
    for sn in (0.3, np.float64(0.3), [0.3], np.array([0.3])):
        la = FullLaplace(model, "regression", sigma_noise=sn)
        assert float(la.sigma_noise) == pytest.approx(0.3)
    with pytest.raises(ValueError):
        FullLaplace(model, "regression", sigma_noise=[0.3, 0.4])
    with pytest.raises(ValueError):
        FullLaplace(model, "regression", sigma_noise=np.ones((2, 1)))


def test_classification_rejects_sigma_noise(model):
    with pytest.raises(ValueError):
        FullLaplace(model, "classification", sigma_noise=0.5)


def test_prior_precision_forms(model):
    P, L = model.n_params, model.n_layers
    for pp in (2.0, np.full(1, 2.0), np.full(L, 2.0), np.full(P, 2.0)):
        la = FullLaplace(model, "classification", prior_precision=pp)
        d = np.asarray(la.prior_precision_diag)
        assert d.shape == (P,)
        assert np.allclose(d, 2.0)
    with pytest.raises(ValueError):
        FullLaplace(model, "classification", prior_precision=np.full(P + 1, 2.0))
    with pytest.raises(ValueError):
        FullLaplace(model, "classification",
                    prior_precision=np.ones((P, P)))


def test_prior_precision_layerwise_expansion(model):
    L = model.n_layers
    pp = np.arange(1.0, L + 1.0)
    la = FullLaplace(model, "classification", prior_precision=pp)
    d = np.asarray(la.prior_precision_diag)
    sizes = [s.size for s in model.leaf_specs]
    expected = np.repeat(pp, sizes)
    assert np.allclose(d, expected)


def test_prior_mean_forms_and_scatter(model, class_loader):
    P = model.n_params
    with pytest.raises(ValueError):
        FullLaplace(model, "classification", prior_mean=np.zeros(P - 1))
    with pytest.raises(ValueError):
        FullLaplace(model, "classification", prior_mean=np.zeros((P, 1)))

    la = FullLaplace(model, "classification", prior_precision=1.7)
    la.fit(class_loader)
    # scatter = (theta - m)^T P0 (theta - m)
    theta = np.asarray(la.mean)
    expected = 1.7 * np.sum(theta**2)
    assert float(la.scatter) == pytest.approx(expected, rel=1e-6)

    # prior mean at the MAP zeroes the scatter
    la.prior_mean = la.mean
    assert float(la.scatter) == pytest.approx(0.0, abs=1e-10)

    # vector prior mean enters quadratically
    m = 0.1 * np.ones(P)
    la.prior_mean = m
    expected = 1.7 * np.sum((theta - m) ** 2)
    assert float(la.scatter) == pytest.approx(expected, rel=1e-6)


@pytest.mark.parametrize("flavor", FLAVORS)
def test_temperature_scales_posterior(model, class_loader, flavor):
    la1 = flavor(model, "classification", temperature=1.0)
    la2 = flavor(model, "classification", temperature=2.0)
    la1.fit(class_loader)
    la2.fit(class_loader)
    # _H_factor = 1/(sigma^2 T); with identical fits the posterior precision
    # beyond the prior halves at T=2
    d1 = np.asarray(la1.posterior_precision.diag()
                    if hasattr(la1.posterior_precision, "diag")
                    else la1.posterior_precision)
    d2 = np.asarray(la2.posterior_precision.diag()
                    if hasattr(la2.posterior_precision, "diag")
                    else la2.posterior_precision)
    if d1.ndim == 2:
        d1, d2 = np.diag(d1), np.diag(d2)
    prior = np.asarray(la1.prior_precision_diag)
    assert np.allclose(d2 - prior, (d1 - prior) / 2.0, rtol=1e-5, atol=1e-8)
    # log-likelihood scales by 1/T as well
    assert float(la2.log_likelihood) == pytest.approx(
        float(la1.log_likelihood) / 2.0, rel=1e-6
    )


# ---------------------------------------------------------------------------
# regression GLM predictive semantics (reference :819-848)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("flavor", FLAVORS)
def test_regression_glm_semantics(model, reg_loader, flavor):
    la = flavor(model, "regression", sigma_noise=0.4)
    la.fit(reg_loader)
    X = np.asarray(next(iter(reg_loader))[0][:6])

    f_mu, f_var = la(X, pred_type="glm")
    assert f_mu.shape == (6, 2)
    assert f_var.shape == (6, 2, 2)
    dvar = np.diagonal(np.asarray(f_var), axis1=1, axis2=2)
    assert (dvar > 0).all()

    # diagonal_output returns exactly the diagonal
    _, f_var_d = la(X, pred_type="glm", diagonal_output=True)
    assert f_var_d.shape == (6, 2)
    assert np.allclose(np.asarray(f_var_d), dvar, rtol=1e-6)

    # the functional (epistemic) variance is smaller with a stronger prior
    la_strong = flavor(model, "regression", sigma_noise=0.4,
                       prior_precision=1e4)
    la_strong.fit(reg_loader)
    _, f_var_s = la_strong(X, pred_type="glm")
    assert np.all(
        np.diagonal(np.asarray(f_var_s), axis1=1, axis2=2) <= dvar + 1e-12
    )


def test_regression_glm_joint_consistency(model, reg_loader):
    la = FullLaplace(model, "regression")
    la.fit(reg_loader)
    X = np.asarray(next(iter(reg_loader))[0][:4])
    f_mu, f_var = la(X, pred_type="glm")
    mu_j, cov_j = la(X, pred_type="glm", joint=True)
    assert mu_j.shape == (8,)
    assert cov_j.shape == (8, 8)
    assert np.allclose(np.asarray(mu_j), np.asarray(f_mu).ravel(), rtol=1e-6)
    # the joint covariance's block diagonal matches the marginal covariances
    cov = np.asarray(cov_j)
    for b in range(4):
        blk = cov[2 * b : 2 * b + 2, 2 * b : 2 * b + 2]
        assert np.allclose(blk, np.asarray(f_var)[b], rtol=1e-5, atol=1e-10)
    # symmetric PSD (f32 model params -> f32 tolerances)
    assert np.allclose(cov, cov.T, atol=1e-6)
    assert np.linalg.eigvalsh(cov).min() > -1e-6


def test_regression_flat_y_raises(model):
    rng = np.random.default_rng(2)
    X = rng.standard_normal((16, 3))
    y_flat = rng.standard_normal((16,))  # model has 2 outputs -> mismatch
    la = FullLaplace(model, "regression")
    with pytest.raises(ValueError):
        la.fit(ArrayLoader(X, y_flat, batch_size=8))


# ---------------------------------------------------------------------------
# classification link approximations (reference :519-558)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("link", ["probit", "bridge", "bridge_norm", "mc"])
@pytest.mark.parametrize("flavor", FLAVORS)
def test_link_approx_simplex(model, class_loader, flavor, link):
    la = flavor(model, "classification")
    la.fit(class_loader)
    X = np.asarray(next(iter(class_loader))[0][:8])
    p = np.asarray(la(X, pred_type="glm", link_approx=link))
    assert p.shape == (8, 2)
    assert np.isfinite(p).all()
    assert (p >= -1e-9).all()
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_mc_link_matches_probit_ranking(model, class_loader):
    la = FullLaplace(model, "classification")
    la.fit(class_loader)
    X = np.asarray(next(iter(class_loader))[0][:8])
    p_probit = np.asarray(la(X, pred_type="glm", link_approx="probit"))
    p_mc = np.asarray(
        la(X, pred_type="glm", link_approx="mc", n_samples=2000,
           key=jax.random.key(7))
    )
    assert (p_probit.argmax(1) == p_mc.argmax(1)).mean() >= 0.75
    assert np.abs(p_probit - p_mc).max() < 0.15


# ---------------------------------------------------------------------------
# sampling determinism
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("flavor", FLAVORS)
def test_sample_key_determinism(model, class_loader, flavor):
    la = flavor(model, "classification")
    la.fit(class_loader)
    s1 = np.asarray(la.sample(8, key=jax.random.key(3)))
    s2 = np.asarray(la.sample(8, key=jax.random.key(3)))
    s3 = np.asarray(la.sample(8, key=jax.random.key(4)))
    assert np.array_equal(s1, s2)
    assert not np.allclose(s1, s3)

    X = np.asarray(next(iter(class_loader))[0][:4])
    ps1 = np.asarray(la.predictive_samples(X, n_samples=5,
                                           key=jax.random.key(5)))
    ps2 = np.asarray(la.predictive_samples(X, n_samples=5,
                                           key=jax.random.key(5)))
    assert np.array_equal(ps1, ps2)


# ---------------------------------------------------------------------------
# invalid predictive combinations (reference :337-413 behavior checks)
# ---------------------------------------------------------------------------


def test_invalid_pred_combinations(model, class_loader):
    la = FullLaplace(model, "classification")
    la.fit(class_loader)
    X = np.asarray(next(iter(class_loader))[0][:4])
    with pytest.raises(ValueError):
        la(X, pred_type="bogus")
    with pytest.raises(ValueError):
        la(X, pred_type="glm", link_approx="bogus")
    with pytest.raises(ValueError):
        la(X, pred_type="nn", link_approx="probit")
