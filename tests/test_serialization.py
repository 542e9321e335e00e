"""Disk serialization round-trips (reference `tests/test_serialization.py`)."""

import numpy as np
import pytest

from laplace_jax import DiagLaplace, FullLaplace, KronLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.serialization import load_state_dict, save_state_dict

from .utils import classification_data, make_mlp


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def loader():
    X, y = classification_data(n=10)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
def test_disk_roundtrip(model, loader, flavor, tmp_path):
    la = flavor(model, "classification")
    la.fit(loader)
    path = str(tmp_path / "state.npz")
    save_state_dict(la.state_dict(), path)
    la2 = flavor(model, "classification")
    la2.load_state_dict(load_state_dict(path))
    X, _ = classification_data()
    np.testing.assert_allclose(
        np.asarray(la(X, link_approx="probit")),
        np.asarray(la2(X, link_approx="probit")),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        float(la.log_marginal_likelihood()), float(la2.log_marginal_likelihood()),
        rtol=1e-10,
    )


def test_wrong_class_rejected(model, loader, tmp_path):
    la = FullLaplace(model, "classification")
    la.fit(loader)
    path = str(tmp_path / "state.npz")
    save_state_dict(la.state_dict(), path)
    la2 = DiagLaplace(model, "classification")
    with pytest.raises(ValueError, match="wrong Laplace type"):
        la2.load_state_dict(load_state_dict(path))


def test_wrong_likelihood_rejected(model, tmp_path):
    from .utils import regression_data

    X, y = regression_data(n=10)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)
    la = FullLaplace(model, "regression")
    la.fit(loader)
    path = str(tmp_path / "state.npz")
    save_state_dict(la.state_dict(), path)
    la2 = FullLaplace(model, "classification")
    with pytest.raises(ValueError, match="likelihood"):
        la2.load_state_dict(load_state_dict(path))


def test_no_pickle_in_archive(model, loader, tmp_path):
    """Parity with the reference's no-pickle guarantee
    (`tests/test_serialization.py:158-188`): archives load with
    allow_pickle=False."""
    la = KronLaplace(model, "classification")
    la.fit(loader)
    path = str(tmp_path / "state.npz")
    save_state_dict(la.state_dict(), path)
    with np.load(path, allow_pickle=False) as data:
        assert len(data.files) > 3  # loads without pickle


def test_save_load_convenience(model, loader, tmp_path):
    la = KronLaplace(model, "classification")
    la.fit(loader)
    path = str(tmp_path / "la.npz")
    la.save(path)
    la2 = KronLaplace(model, "classification").load(path)
    X, _ = classification_data()
    np.testing.assert_allclose(
        np.asarray(la(X, link_approx="probit")),
        np.asarray(la2(X, link_approx="probit")),
        atol=1e-10,
    )
