"""float32 / bfloat16 tier for the core flavors.

The rest of the suite runs in float64 for tight oracles (conftest enables
x64); production TPU runs are f32/bf16. This mirrors the reference's dtype
parametrization (`tests/test_baselaplace.py:899-901`) with dtype-appropriate
tolerances: fit, posterior, predictive, marglik, prior tuning, sampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import (
    DiagLaplace,
    DiagLLLaplace,
    FullLaplace,
    FullLLLaplace,
    KronLaplace,
    KronLLLaplace,
)
from laplace_jax.models import MLP
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

ALL_CLS = [
    FullLaplace, KronLaplace, DiagLaplace,
    FullLLLaplace, KronLLLaplace, DiagLLLaplace,
]


def _setup(dtype, likelihood="classification", n=20, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 4)).astype(np.float32)
    if likelihood == "regression":
        y = rng.standard_normal((n, 2)).astype(np.float32)
        out = 2
    else:
        y = rng.integers(0, 3, size=(n,))
        out = 3
    model = MLP(hidden=(10,), out_dim=out, dtype=dtype)
    # init in f64 and cast so every dtype tier sees the SAME weights (PRNG
    # draws differ by dtype otherwise)
    params64 = MLP(hidden=(10,), out_dim=out, dtype=jnp.float64).init(
        jax.random.key(seed), jnp.asarray(X[:1], dtype=jnp.float64)
    )
    params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params64)
    nnm = NNModel.from_flax(model, params)
    X = X.astype(dtype)
    y = y.astype(dtype) if likelihood == "regression" else y
    return nnm, ArrayLoader(X, y, batch_size=8), jnp.asarray(X, dtype=dtype)


@pytest.mark.parametrize("cls", ALL_CLS)
def test_f32_fit_predict_marglik(cls):
    nnm, loader, X = _setup(jnp.float32)
    la = cls(nnm, "classification")
    la.fit(loader)
    assert la._dtype == jnp.float32

    # posterior state stays f32
    H = la.H_facs if isinstance(la, KronLaplace) else la.H
    for leaf in jax.tree_util.tree_leaves(H):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()

    ml = float(la.log_marginal_likelihood())
    assert np.isfinite(ml)
    la.optimize_prior_precision(n_steps=10)
    assert np.isfinite(float(la.log_marginal_likelihood()))

    probs = np.asarray(la(X[:6], link_approx="probit"))
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-5)
    probs_mc = np.asarray(la(X[:6], link_approx="mc", n_samples=40))
    assert np.allclose(probs_mc.sum(-1), 1.0, atol=1e-4)

    s = np.asarray(la.sample(8, key=jax.random.key(0)))
    assert s.dtype == np.float32 and np.isfinite(s).all()


@pytest.mark.parametrize("cls", [FullLaplace, KronLaplace, DiagLaplace])
def test_f32_regression_predictive_and_sigma(cls):
    nnm, loader, X = _setup(jnp.float32, likelihood="regression")
    la = cls(nnm, "regression", sigma_noise=0.7)
    la.fit(loader)
    f_mu, f_var = la(X[:6])
    assert np.isfinite(np.asarray(f_mu)).all()
    assert np.isfinite(np.asarray(f_var)).all()
    v = np.diagonal(np.asarray(f_var), axis1=-2, axis2=-1)
    assert (v >= -1e-5).all()
    # marglik differentiable in both hyperparameters at f32
    g = jax.grad(
        lambda lp, ls: -la._log_marglik(jnp.exp(lp), jnp.exp(ls)),
        argnums=(0, 1),
    )(jnp.zeros(1, jnp.float32), jnp.asarray(0.0, jnp.float32))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


@pytest.mark.parametrize("cls", [FullLaplace, KronLaplace, DiagLaplace])
def test_f32_matches_f64_within_tolerance(cls):
    """The f32 posterior must track the f64 one to single-precision accuracy."""
    nnm32, loader32, X32 = _setup(jnp.float32)
    nnm64, loader64, X64 = _setup(jnp.float64)
    la32 = cls(nnm32, "classification")
    la32.fit(loader32)
    la64 = cls(nnm64, "classification")
    la64.fit(loader64)
    p32 = np.asarray(la32(X32[:6], link_approx="probit"), np.float64)
    p64 = np.asarray(la64(X64[:6], link_approx="probit"))
    assert np.allclose(p32, p64, atol=5e-4)
    ml32 = float(la32.log_marginal_likelihood())
    ml64 = float(la64.log_marginal_likelihood())
    assert np.allclose(ml32, ml64, rtol=1e-3)


def test_f32_symeig_robust_near_singular():
    """Near-singular f32 Kron factors must decompose without NaNs (the jitter
    retry path, reference `utils/utils.py:193-228`)."""
    from laplace_jax.utils.matrix import Kron

    rng = np.random.default_rng(0)
    a = rng.standard_normal((6, 2)).astype(np.float32)
    F = jnp.asarray(a @ a.T)  # rank-2, PSD, f32
    kron = Kron([(F,), (F * 1e-30,)])
    dec = kron.decompose()
    for ls in dec.eigenvalues:
        arr = np.asarray(ls[0])
        assert np.isfinite(arr).all() and (arr >= 0).all()
    ld = np.asarray((dec + 0.5).logdet())
    assert np.isfinite(ld)


def test_bf16_diag_fit_predict():
    """bfloat16 tier where sane: diagonal posterior (elementwise ops only)."""
    nnm, loader, X = _setup(jnp.bfloat16)
    la = DiagLaplace(nnm, "classification")
    la.fit(loader)
    assert la.H.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(la.H, dtype=np.float32)).all()
    probs = np.asarray(
        la(X[:6], link_approx="probit"), dtype=np.float32
    )
    assert np.allclose(probs.sum(-1), 1.0, atol=2e-2)
    s = la.sample(4, key=jax.random.key(0))
    assert np.isfinite(np.asarray(s, dtype=np.float32)).all()
