"""PRNG hygiene: keyless MC calls must advance state (not be bit-identical),
explicit keys must reproduce exactly.

The reference's torch generator advances across calls
(`/root/reference/laplace/baselaplace.py:697-714`); two successive MC
predictives there give different MC estimates. These tests pin the same
behavior for the internal advancing key (VERDICT r2 item 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import Laplace
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data, make_mlp, regression_data


def _fit(likelihood="classification", structure="diag", subset="all"):
    model, params = make_mlp()
    if likelihood == "classification":
        X, y = classification_data(n=12)
    else:
        X, y = regression_data(n=12)
    la = Laplace(
        (model, params), likelihood, subset_of_weights=subset,
        hessian_structure=structure,
    )
    la.fit(ArrayLoader(X, y, batch_size=12))
    return la, X


@pytest.mark.parametrize("structure", ["diag", "full", "kron"])
def test_keyless_sample_advances(structure):
    la, _ = _fit(structure=structure)
    s1 = la.sample(n_samples=5)
    s2 = la.sample(n_samples=5)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


@pytest.mark.parametrize("structure", ["diag", "full", "kron"])
def test_explicit_key_reproduces(structure):
    la, _ = _fit(structure=structure)
    k = jax.random.key(42)
    s1 = la.sample(n_samples=5, key=k)
    s2 = la.sample(n_samples=5, key=k)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_keyless_predictive_samples_advance():
    la, X = _fit(structure="diag")
    p1 = la.predictive_samples(X, n_samples=7)
    p2 = la.predictive_samples(X, n_samples=7)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))
    k = jax.random.key(3)
    q1 = la.predictive_samples(X, n_samples=7, key=k)
    q2 = la.predictive_samples(X, n_samples=7, key=k)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_keyless_mc_call_advances():
    la, X = _fit(structure="diag")
    p1 = la(X, link_approx="mc", n_samples=11)
    p2 = la(X, link_approx="mc", n_samples=11)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_keyless_nn_predictive_advances():
    la, X = _fit(structure="diag")
    p1 = la(X, pred_type="nn", link_approx="mc", n_samples=5)
    p2 = la(X, pred_type="nn", link_approx="mc", n_samples=5)
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_functional_samples_advance_and_reproduce():
    la, X = _fit(likelihood="regression", structure="full")
    f1 = la.functional_samples(X, n_samples=9)
    f2 = la.functional_samples(X, n_samples=9)
    assert not np.allclose(np.asarray(f1), np.asarray(f2))
    k = jax.random.key(0)
    g1 = la.functional_samples(X, n_samples=9, key=k)
    g2 = la.functional_samples(X, n_samples=9, key=k)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_last_layer_keyless_advances():
    la, X = _fit(structure="kron", subset="last_layer")
    s1 = la.predictive_samples(X, pred_type="nn", n_samples=5)
    s2 = la.predictive_samples(X, pred_type="nn", n_samples=5)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_fit_stays_deterministic():
    """fit's default key is deliberately fixed: repeated fits on the same data
    give identical curvature (documented determinism; only the MC predictive /
    sampling paths advance)."""
    la1, X = _fit(structure="diag")
    la2, _ = _fit(structure="diag")
    np.testing.assert_array_equal(np.asarray(la1.H), np.asarray(la2.H))
