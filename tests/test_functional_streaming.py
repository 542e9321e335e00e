"""Streaming (batch-pair, bounded-memory) GP fit must equal the cached-Jacobian
fast path — fit state, marglik, and predictives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import FunctionalLaplace
from laplace_jax.models import MLP
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


def _setup(likelihood, independent, n=20, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 4)).astype(np.float64)
    if likelihood == "regression":
        y = rng.standard_normal((n, 2)).astype(np.float64)
        out = 2
    else:
        y = rng.integers(0, 3, size=(n,))
        out = 3
    model = MLP(hidden=(7,), out_dim=out, dtype=jnp.float64)
    params = model.init(jax.random.key(seed), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, params)
    # batch 6 over n_subset 14 -> batches 6, 6, 2: uneven pair blocks
    loader = ArrayLoader(X, y, batch_size=6)

    def make(streaming):
        return FunctionalLaplace(
            nnm, likelihood, n_subset=14, independent_outputs=independent,
            streaming=streaming,
        )

    return make, loader, X


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.parametrize("independent", [False, True])
def test_streaming_equals_cached(likelihood, independent):
    make, loader, X = _setup(likelihood, independent)
    la_c = make(False)
    la_c.fit(loader)
    la_s = make(True)
    la_s.fit(loader)

    assert la_s.Js_M is None and la_c.Js_M is not None
    assert np.allclose(np.asarray(la_s.K_MM), np.asarray(la_c.K_MM), atol=1e-10)
    assert np.allclose(np.asarray(la_s.mu), np.asarray(la_c.mu), atol=1e-10)
    assert np.allclose(np.asarray(la_s.L), np.asarray(la_c.L), atol=1e-10)
    assert np.allclose(float(la_s.loss), float(la_c.loss), rtol=1e-12)
    assert np.allclose(
        float(la_s.log_marginal_likelihood()),
        float(la_c.log_marginal_likelihood()),
        rtol=1e-10,
    )

    xt = jnp.asarray(X[:5])
    m_s, v_s = la_s._glm_predictive_distribution(xt)
    m_c, v_c = la_c._glm_predictive_distribution(xt)
    assert np.allclose(np.asarray(m_s), np.asarray(m_c), atol=1e-10)
    assert np.allclose(np.asarray(v_s), np.asarray(v_c), atol=1e-10)

    if likelihood == "regression" and not independent:
        mj_s, cj_s = la_s._glm_predictive_distribution(xt, joint=True)
        mj_c, cj_c = la_c._glm_predictive_distribution(xt, joint=True)
        assert np.allclose(np.asarray(cj_s), np.asarray(cj_c), atol=1e-10)


def test_streaming_nonzero_prior_mean():
    """The jvp-based μ shift must match the einsum path with a nonzero prior mean."""
    make, loader, X = _setup("regression", False)
    la_c = make(False)
    la_c.prior_mean = 0.3
    la_c.fit(loader)
    la_s = make(True)
    la_s.prior_mean = 0.3
    la_s.fit(loader)
    assert np.allclose(np.asarray(la_s.mu), np.asarray(la_c.mu), atol=1e-10)


def test_streaming_save_load_roundtrip(tmp_path):
    make, loader, X = _setup("classification", False)
    la = make(True)
    la.fit(loader)
    path = str(tmp_path / "gp_stream.npz")
    la.save(path)

    la2 = make(True)
    la2.load(path)
    assert la2.Js_M is None and la2._sod_x is not None
    xt = jnp.asarray(X[:4])
    m1, v1 = la._glm_predictive_distribution(xt)
    m2, v2 = la2._glm_predictive_distribution(xt)
    assert np.allclose(np.asarray(v1), np.asarray(v2), atol=1e-12)


def test_auto_streaming_threshold(monkeypatch):
    import laplace_jax.functional_laplace as fl

    make, loader, X = _setup("classification", False)
    monkeypatch.setattr(fl, "_STREAMING_THRESHOLD_BYTES", 1)  # force auto on
    la = FunctionalLaplace(
        make(False).model, "classification", n_subset=14
    )
    la.fit(loader)
    assert la.Js_M is None  # auto-streamed
    probs = la(jnp.asarray(X[:4]), link_approx="probit")
    assert np.allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-8)
