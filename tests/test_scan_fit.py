"""The single-dispatch lax.scan fit accumulation must equal the per-batch loop
(the loop remains reachable via `progress_bar=True` and generic loaders)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, FullLaplace, KronLaplace
from laplace_jax.models import MLP
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


def _setup(n=14, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 5)).astype(np.float64)
    y = rng.integers(0, 3, size=(n,))
    model = MLP(hidden=(8,), out_dim=3, dtype=jnp.float64)
    params = model.init(jax.random.key(seed), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, params)
    # n=14, batch=4 -> batches 4,4,4,2: exercises the remainder path
    return nnm, ArrayLoader(X, y, batch_size=batch)


@pytest.mark.parametrize("cls", [DiagLaplace, KronLaplace, FullLaplace])
def test_scan_fit_equals_loop_fit(cls):
    nnm, loader = _setup()
    la_scan = cls(nnm, "classification")
    la_scan.fit(loader)
    la_loop = cls(nnm, "classification")
    la_loop.fit(loader, progress_bar=True)  # forces the per-batch loop

    assert np.allclose(float(la_scan.loss), float(la_loop.loss), rtol=1e-12)
    H_s = jax.tree_util.tree_leaves(la_scan.H_facs if cls is KronLaplace else la_scan.H)
    H_l = jax.tree_util.tree_leaves(la_loop.H_facs if cls is KronLaplace else la_loop.H)
    for a, b in zip(H_s, H_l):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_scan_fit_online_update():
    nnm, loader = _setup()
    la = KronLaplace(nnm, "classification")
    la.fit(loader)
    la.fit(loader, override=False)
    la2 = KronLaplace(nnm, "classification")
    la2.fit(loader, progress_bar=True)
    la2.fit(loader, override=False, progress_bar=True)
    assert la.n_data == la2.n_data == 28
    for a, b in zip(
        jax.tree_util.tree_leaves(la.H_facs), jax.tree_util.tree_leaves(la2.H_facs)
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_scan_fit_regression_and_mc():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((12, 5)).astype(np.float64)
    y = rng.standard_normal((12, 2)).astype(np.float64)
    model = MLP(hidden=(8,), out_dim=2, dtype=jnp.float64)
    params = model.init(jax.random.key(0), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, params)
    loader = ArrayLoader(X, y, batch_size=4)

    la_s = DiagLaplace(nnm, "regression")
    la_s.fit(loader, key=jax.random.key(7))
    la_l = DiagLaplace(nnm, "regression")
    la_l.fit(loader, progress_bar=True, key=jax.random.key(7))
    assert np.allclose(np.asarray(la_s.H), np.asarray(la_l.H), atol=1e-10)

    # stochastic (MC-Fisher) path: per-batch keys fold identically in both modes
    la_ms = DiagLaplace(nnm, "regression", backend="mc")
    la_ms.fit(loader, key=jax.random.key(3))
    la_ml = DiagLaplace(nnm, "regression", backend="mc")
    la_ml.fit(loader, progress_bar=True, key=jax.random.key(3))
    assert np.allclose(np.asarray(la_ms.H), np.asarray(la_ml.H), atol=1e-10)
