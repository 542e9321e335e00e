"""Two-axis (DCN × ICI style) data parallelism and model-axis posterior
sharding — both must equal the single-device results (SURVEY.md §2.6 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from laplace_jax import DiagLaplace, FullLaplace, KronLaplace
from laplace_jax.models import MLP
from laplace_jax.nnmodel import NNModel
from laplace_jax.parallel import DataParallel, multihost_mesh
from laplace_jax.utils.data import ArrayLoader


def _mesh_2d(rows=4, cols=2):
    devs = np.asarray(jax.devices()[: rows * cols]).reshape(rows, cols)
    return Mesh(devs, ("replica", "data"))


def _setup(n=16, seed=0, hidden=(8,)):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, 5)).astype(np.float64)
    y = rng.integers(0, 3, size=(n,))
    model = MLP(hidden=hidden, out_dim=3, dtype=jnp.float64)
    params = model.init(jax.random.key(seed), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, params)
    return nnm, ArrayLoader(X, y, batch_size=8), X


@pytest.mark.parametrize("explicit", [False, True])
@pytest.mark.parametrize("cls", [DiagLaplace, KronLaplace])
def test_2d_mesh_fit_equals_single(cls, explicit):
    nnm, loader, X = _setup()
    dp = DataParallel(_mesh_2d(), axis_name=("replica", "data"), explicit=explicit)
    la_p = cls(nnm, "classification", parallel=dp)
    la_p.fit(loader)
    la_1 = cls(nnm, "classification")
    la_1.fit(loader)
    H_p = jax.tree_util.tree_leaves(
        la_p.H_facs if cls is KronLaplace else la_p.H
    )
    H_1 = jax.tree_util.tree_leaves(
        la_1.H_facs if cls is KronLaplace else la_1.H
    )
    for a, b in zip(H_p, H_1):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-10)
    assert np.allclose(float(la_p.loss), float(la_1.loss), rtol=1e-12)
    assert np.allclose(
        float(la_p.log_marginal_likelihood()),
        float(la_1.log_marginal_likelihood()),
        rtol=1e-10,
    )


def test_multihost_mesh_single_process_fallback():
    mesh = multihost_mesh()
    assert mesh.axis_names == ("replica", "data")
    assert mesh.shape["replica"] == 1  # one process in tests
    assert mesh.shape["data"] == len(jax.devices())
    nnm, loader, X = _setup()
    dp = DataParallel(mesh, axis_name=("replica", "data"))
    la = DiagLaplace(nnm, "classification", parallel=dp)
    la.fit(loader)
    assert np.isfinite(float(la.log_marginal_likelihood()))


def test_full_shard_posterior_equals_replicated():
    # in=5, hidden=13, out=3 -> P = (5+1)*13 + (13+1)*3 = 120, divisible by 8
    nnm, loader, X = _setup(hidden=(13,))
    la = FullLaplace(nnm, "classification")
    la.fit(loader)
    logdet_1 = float(la.log_det_posterior_precision)
    samples_1 = np.asarray(la.sample(4, key=jax.random.key(1)))
    probs_1 = np.asarray(la(jnp.asarray(X[:5]), link_approx="probit"))

    la.shard_posterior()  # 1-D model-axis mesh over all devices
    logdet_s = float(la.log_det_posterior_precision)
    samples_s = np.asarray(la.sample(4, key=jax.random.key(1)))
    probs_s = np.asarray(la(jnp.asarray(X[:5]), link_approx="probit"))

    assert np.allclose(logdet_1, logdet_s, rtol=1e-10)
    assert np.allclose(samples_1, samples_s, atol=1e-8)
    assert np.allclose(probs_1, probs_s, atol=1e-10)
    # H really is laid out over devices
    assert len(la.H.sharding.device_set) == len(jax.devices())


def test_lowrank_lanczos_sharded_equals_single():
    """Device-resident Lanczos with a sharded batch axis must equal the
    single-device result (Weak #6 in the round-1 review: Lanczos previously
    looped the loader serially per matvec)."""
    from laplace_jax import LowRankLaplace

    nnm, loader, X = _setup(n=16)
    la_1 = LowRankLaplace(nnm, "classification", backend="ggn", low_rank=5)
    la_1.fit(loader)
    dp = DataParallel(_mesh_2d(), axis_name=("replica", "data"))
    la_p = LowRankLaplace(nnm, "classification", backend="ggn", low_rank=5,
                          parallel=dp)
    la_p.fit(loader)
    (U1, l1), _ = la_1.posterior_precision
    (Up, lp), _ = la_p.posterior_precision
    assert np.allclose(np.asarray(l1), np.asarray(lp), atol=1e-8)
    # eigenvectors up to sign
    assert np.allclose(np.abs(np.asarray(U1)), np.abs(np.asarray(Up)), atol=1e-6)
    xt = jnp.asarray(X[:5])
    p1 = np.asarray(la_1(xt, link_approx="probit"))
    pp = np.asarray(la_p(xt, link_approx="probit"))
    assert np.allclose(p1, pp, atol=1e-8)
