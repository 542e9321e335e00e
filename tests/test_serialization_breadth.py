"""Serialization failure-mode and cross-flavor oracles.

Mirrors `/root/reference/tests/test_serialization.py:190-294`: loading into a
wrong flavor / hessian structure / subset-of-weights / likelihood must raise;
subnet posteriors and their indices round-trip; temperature/backprop
mismatches warn; predictions are bitwise-stable across save/load.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from laplace_jax import (
    DiagLaplace,
    DiagSubnetLaplace,
    FullLaplace,
    FullLLLaplace,
    FullSubnetLaplace,
    KronLaplace,
)
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(10)(x)
        x = nn.relu(x)
        return nn.Dense(2)(x)


@pytest.fixture(scope="module")
def model():
    m = MLP()
    params = m.init(jax.random.key(0), jnp.ones((1, 3)))
    return NNModel.from_flax(m, params)


@pytest.fixture(scope="module")
def class_loader():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((24, 3))
    y = rng.integers(0, 2, size=(24,))
    return ArrayLoader(X, y, batch_size=12)


def test_wrong_flavor_load_raises(model, class_loader):
    la = FullLaplace(model, "classification")
    la.fit(class_loader)
    sd = la.state_dict()
    for other in (KronLaplace, DiagLaplace):
        la2 = other(model, "classification")
        with pytest.raises(ValueError):
            la2.load_state_dict(sd)


def test_wrong_subset_of_weights_load_raises(model, class_loader):
    la = FullLaplace(model, "classification")
    la.fit(class_loader)
    la_ll = FullLLLaplace(model, "classification")
    with pytest.raises(ValueError):
        la_ll.load_state_dict(la.state_dict())


def test_wrong_likelihood_load_raises(model, class_loader):
    la = FullLaplace(model, "classification")
    la.fit(class_loader)
    sd = la.state_dict()
    la2 = FullLaplace(model, "regression")
    with pytest.raises(ValueError):
        la2.load_state_dict(sd)


def test_mismatched_hyperparams_warn(model, class_loader):
    la = FullLaplace(model, "classification", temperature=1.0)
    la.fit(class_loader)
    sd = la.state_dict()
    la2 = FullLaplace(model, "classification", temperature=2.0)
    with pytest.warns(UserWarning):
        la2.load_state_dict(sd)


def test_predictions_stable_across_roundtrip(model, class_loader, tmp_path):
    X = np.asarray(next(iter(class_loader))[0][:6])
    for flavor in (FullLaplace, KronLaplace, DiagLaplace):
        la = flavor(model, "classification")
        la.fit(class_loader)
        p_ref = np.asarray(la(X))
        path = str(tmp_path / f"{flavor.__name__}.npz")
        la.save(path)
        la2 = flavor(model, "classification")
        la2 = la2.load(path)
        p2 = np.asarray(la2(X))
        assert np.array_equal(p_ref, p2), flavor.__name__


def test_subnet_serialization_roundtrip(model, class_loader):
    rng = np.random.default_rng(0)
    idx = np.sort(rng.choice(model.n_params, size=9, replace=False))
    X = np.asarray(next(iter(class_loader))[0][:6])
    for flavor in (FullSubnetLaplace, DiagSubnetLaplace):
        la = flavor(model, "classification", subnetwork_indices=idx)
        la.fit(class_loader)
        sd = la.state_dict()
        la2 = flavor(model, "classification", subnetwork_indices=idx)
        la2.load_state_dict(sd)
        assert np.array_equal(np.asarray(la(X)), np.asarray(la2(X)))


def test_subnet_wrong_indices_load_raises(model, class_loader):
    rng = np.random.default_rng(0)
    idx = np.sort(rng.choice(model.n_params, size=9, replace=False))
    la = FullSubnetLaplace(model, "classification", subnetwork_indices=idx)
    la.fit(class_loader)
    sd = la.state_dict()
    other_idx = np.sort(rng.choice(model.n_params, size=7, replace=False))
    la2 = FullSubnetLaplace(model, "classification",
                            subnetwork_indices=other_idx)
    with pytest.raises(ValueError):
        la2.load_state_dict(sd)


def test_ll_wrong_last_layer_name_load_raises(model, class_loader):
    la = FullLLLaplace(model, "classification", last_layer_name="Dense_1")
    la.fit(class_loader)
    sd = la.state_dict()
    la2 = FullLLLaplace(model, "classification", last_layer_name="Dense_0")
    with pytest.raises(ValueError):
        la2.load_state_dict(sd)


def test_lowrank_mixed_dtype_fit_and_roundtrip(tmp_path):
    """f32 flax params with f64-under-x64 loader inputs promoted the Lanczos
    loss to f64 while the scan carry was initialized in theta's dtype —
    regression test for the dtype-mismatch crash, plus save/load."""
    from laplace_jax import LowRankLaplace

    class M2(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2)(nn.tanh(nn.Dense(6)(x)))

    rng = np.random.default_rng(0)
    X = rng.standard_normal((20, 3))  # float64 under the x64 test config
    y = rng.integers(0, 2, size=20)
    m = M2()
    params = m.init(jax.random.key(0), jnp.ones((1, 3), jnp.float32))
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), params)
    la = LowRankLaplace(NNModel.from_flax(m, params), "classification",
                        low_rank=5)
    la.fit(ArrayLoader(X, y, batch_size=10))
    path = str(tmp_path / "lr.npz")
    la.save(path)
    la2 = LowRankLaplace(NNModel.from_flax(m, params), "classification",
                         low_rank=5).load(path)
    Xs = jnp.asarray(X[:4])
    assert np.array_equal(np.asarray(la(Xs)), np.asarray(la2(Xs)))
