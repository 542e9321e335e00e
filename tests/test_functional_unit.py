"""FunctionalLaplace unit tests — SoD sampling, kernel assembly, Σ_inv
construction, functional samples, y-shape validation. Mirrors the reference's
`tests/test_functional_laplace_unit.py`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import FunctionalLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.sod import sod_indices

from .utils import classification_data, make_mlp, regression_data


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


def test_sod_indices_seeded():
    """Reference `test_functional_laplace_unit.py:68-85` (SoDSampler)."""
    i1 = sod_indices(100, 10, seed=3)
    i2 = sod_indices(100, 10, seed=3)
    i3 = sod_indices(100, 10, seed=4)
    assert np.array_equal(i1, i2)
    assert not np.array_equal(i1, i3)
    assert len(i1) == 10 == len(np.unique(i1))
    assert i1.min() >= 0 and i1.max() < 100


def test_sod_loader_subset(model):
    X, y = classification_data(n=12)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    la = FunctionalLaplace(model, "classification", n_subset=6, seed=5)
    idx = sod_indices(12, 6, seed=5)
    sub = la._subset_loader(loader, idx)
    xs = np.concatenate([np.asarray(b[0]) for b in sub])
    assert np.allclose(xs, np.asarray(X)[idx])


def test_k_mm_equals_jacobian_products_full(model):
    """K_MM storage, full (MC, MC) layout — every block must equal the raw
    Jacobian product (reference `:87-144`)."""
    X, y = regression_data(n=8)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=3)
    la = FunctionalLaplace(model, "regression", n_subset=8)
    la.fit(loader)
    Js, _ = la._jacobians(jnp.asarray(np.asarray(X)[sod_indices(8, 8, seed=0)]))
    M, C, P = Js.shape
    K_naive = np.einsum("mcp,neq,pq->mcne", np.asarray(Js), np.asarray(Js),
                        np.eye(P)).reshape(M * C, M * C)
    assert np.allclose(np.asarray(la.K_MM), K_naive, atol=1e-10)


def test_k_mm_equals_jacobian_products_blockdiag(model):
    """Block-diagonal (C, M, M) layout (reference `:146-260`)."""
    X, y = classification_data(n=8)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=3)
    la = FunctionalLaplace(
        model, "classification", n_subset=8, independent_outputs=True
    )
    la.fit(loader)
    Js, _ = la._jacobians(jnp.asarray(np.asarray(X)[sod_indices(8, 8, seed=0)]))
    K_naive = np.einsum("mcp,ncp->cmn", np.asarray(Js), np.asarray(Js))
    assert la.K_MM.shape == K_naive.shape
    assert np.allclose(np.asarray(la.K_MM), K_naive, atol=1e-10)


def test_sigma_inv_construction_regression(model):
    """Σ = gp_var·K_MM + Λ⁻¹/H_factor must be reproduced by its Cholesky
    (reference `_build_Sigma_inv`, `baselaplace.py:2376-2407`)."""
    X, y = regression_data(n=8)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    la = FunctionalLaplace(model, "regression", n_subset=8, sigma_noise=0.5)
    la.fit(loader)
    h = float(la._H_factor)  # 1/σ²
    gp_var = float(la.gp_kernel_prior_variance)
    lam = np.asarray(la.L).ravel()  # regression: Λ = I
    assert np.allclose(lam, 1.0)
    Sigma = gp_var * np.asarray(la.K_MM) + np.diag(1.0 / (h * lam))
    chol = np.asarray(la.Sigma_chol)
    assert np.allclose(chol @ chol.T, Sigma, atol=1e-10)


def test_sigma_inv_construction_classification_blockdiag(model):
    X, y = classification_data(n=8)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    la = FunctionalLaplace(
        model, "classification", n_subset=8, independent_outputs=True
    )
    la.fit(loader)
    gp_var = float(la.gp_kernel_prior_variance)
    L = np.asarray(la.L)  # (M, C) softmax-derived, in (0, 1)
    assert ((L > 0) & (L < 1)).all()
    for c in range(la.n_outputs):
        Sigma_c = gp_var * np.asarray(la.K_MM[c]) + np.diag(1.0 / L[:, c])
        chol = np.asarray(la.Sigma_chol[c])
        assert np.allclose(chol @ chol.T, Sigma_c, atol=1e-10)


def test_gp_kernel_prior_variance(model):
    X, y = classification_data(n=10)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)
    la = FunctionalLaplace(model, "classification", n_subset=5,
                           prior_precision=2.0)
    la.fit(loader)
    # (M/N) / prior_prec (reference `baselaplace.py:2731-2733`)
    assert np.isclose(float(la.gp_kernel_prior_variance), (5 / 10) / 2.0)


def test_functional_samples_moments(model):
    """Functional samples must empirically match the GP predictive moments
    (reference `test_functional_laplace_unit.py:324-356`)."""
    X, y = regression_data(n=10)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)
    la = FunctionalLaplace(model, "regression", n_subset=10)
    la.fit(loader)
    xt = jnp.asarray(np.asarray(X)[:4])
    f_mu, f_var = la._glm_predictive_distribution(xt)
    fs = np.asarray(la.functional_samples(xt, n_samples=8000,
                                          key=jax.random.key(0)))
    assert fs.shape == (8000, 4, 2)
    assert np.allclose(fs.mean(0), np.asarray(f_mu), atol=5e-2)
    var_emp = fs.var(0)
    var_diag = np.diagonal(np.asarray(f_var), axis1=-2, axis2=-1)
    assert np.allclose(var_emp, var_diag, rtol=0.15, atol=1e-3)


def test_fit_y_shape_validation(model):
    """Regression targets with the wrong ndim must raise
    (reference `test_functional_laplace_unit.py:358-371`)."""
    rng = np.random.default_rng(0)
    X = rng.standard_normal((10, 3))
    y_flat = rng.standard_normal((10,))  # (N,) instead of (N, 1)
    loader = ArrayLoader(X, y_flat, batch_size=5)
    la = FunctionalLaplace(model, "regression", n_subset=5)
    with pytest.raises(ValueError, match="dims"):
        la.fit(loader)
    la_s = FunctionalLaplace(model, "regression", n_subset=5, streaming=True)
    with pytest.raises(ValueError, match="dims"):
        la_s.fit(loader)


def test_n_subset_exceeds_n_raises(model):
    X, y = classification_data(n=6)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=3)
    la = FunctionalLaplace(model, "classification", n_subset=10)
    with pytest.raises(AssertionError):
        la.fit(loader)


def test_anisotropic_prior_rejected(model):
    with pytest.raises(ValueError, match="isotropic"):
        FunctionalLaplace(model, "classification", n_subset=5,
                          prior_precision=np.ones(3))
