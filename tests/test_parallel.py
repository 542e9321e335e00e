"""Sharded-fit == single-device-fit equivalence on a virtual 8-device CPU mesh.

This is the test class the reference has no counterpart for (it is single-device
only, SURVEY.md §2.6); conftest forces
`--xla_force_host_platform_device_count=8`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, FullLaplace, KronLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.parallel import DataParallel, data_mesh
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data, make_mlp, regression_data


@pytest.fixture
def model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


@pytest.fixture
def loader():
    X, y = classification_data(n=32)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=16)


def test_mesh_has_8_devices():
    mesh = data_mesh()
    assert mesh.shape["data"] == 8


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
@pytest.mark.parametrize("explicit", [False, True])
def test_sharded_fit_equals_single_device(model, loader, flavor, explicit):
    la_ref = flavor(model, "classification")
    la_ref.fit(loader)

    dp = DataParallel(data_mesh(), explicit=explicit)
    la_dp = flavor(model, "classification", parallel=dp)
    la_dp.fit(loader)

    if flavor is KronLaplace:
        np.testing.assert_allclose(
            np.asarray(la_dp.H_facs.diag()), np.asarray(la_ref.H_facs.diag()),
            rtol=1e-10,
        )
    else:
        np.testing.assert_allclose(
            np.asarray(la_dp.H), np.asarray(la_ref.H), rtol=1e-8, atol=1e-12
        )
    np.testing.assert_allclose(float(la_dp.loss), float(la_ref.loss), rtol=1e-10)
    X, _ = classification_data()
    np.testing.assert_allclose(
        np.asarray(la_dp(X, link_approx="probit")),
        np.asarray(la_ref(X, link_approx="probit")),
        atol=1e-8,
    )


def test_sharded_uneven_batch(model):
    """XLA-annotated mode handles batches not divisible by the mesh size."""
    X, y = classification_data(n=30)  # 30 not divisible by 8
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=30)
    la_ref = DiagLaplace(model, "classification")
    la_ref.fit(loader)
    la_dp = DiagLaplace(model, "classification", parallel=DataParallel(data_mesh()))
    la_dp.fit(loader)
    np.testing.assert_allclose(np.asarray(la_dp.H), np.asarray(la_ref.H), rtol=1e-8)


def test_explicit_shard_map_rejects_uneven(model):
    X, y = classification_data(n=30)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=30)
    la = DiagLaplace(model, "classification",
                     parallel=DataParallel(data_mesh(), explicit=True))
    with pytest.raises(ValueError, match="not divisible"):
        la.fit(loader)


def test_sharded_regression_full(model):
    X, y = regression_data(n=32)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=16)
    la_ref = FullLaplace(model, "regression")
    la_ref.fit(loader)
    la_dp = FullLaplace(model, "regression", parallel=DataParallel(data_mesh()))
    la_dp.fit(loader)
    np.testing.assert_allclose(
        float(la_dp.log_marginal_likelihood()),
        float(la_ref.log_marginal_likelihood()),
        rtol=1e-10,
    )


def test_sharded_predictive_matches(model, loader):
    la_ref = FullLaplace(model, "classification")
    la_ref.fit(loader)
    la_dp = FullLaplace(model, "classification", parallel=DataParallel(data_mesh()))
    la_dp.fit(loader)
    X, _ = classification_data(n=16)  # divisible by 8
    p_ref = la_ref(X, link_approx="probit")
    p_dp = la_dp(X, link_approx="probit")
    np.testing.assert_allclose(np.asarray(p_dp), np.asarray(p_ref), atol=1e-10)
    # uneven batch falls back to unsharded placement
    X2, _ = classification_data(n=10)
    p2 = la_dp(X2, link_approx="probit")
    assert p2.shape == (10, 2)
