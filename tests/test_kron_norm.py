"""Norm-layer (BatchNorm/LayerNorm/GroupNorm) support for KFAC and diag taps.

The reference skips BatchNorm modules for Kron with a warning
(`/root/reference/laplace/curvature/asdl.py:137-138`) — the posterior over
those weights falls back to the prior. laplace_jax mirrors that default
(`kron_unsupported='skip'`) and adds an exact mode (`'block'`: dense 1-factor
Fisher blocks from the tap vjp sweep) that no torch backend has.
"""

import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, KronLaplace
from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class BNCNN(nn.Module):
    norm: str = "batch"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(4, (3, 3), strides=(2, 2))(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=True)(x)
        elif self.norm == "group":
            x = nn.GroupNorm(num_groups=2)(x)
        elif self.norm == "layer":
            x = nn.LayerNorm()(x)
        x = jax.nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(6)(x)
        if self.norm == "layer":
            x = nn.LayerNorm()(x)
        x = jnp.tanh(x)
        return nn.Dense(3)(x)


def _bn_data(n=12, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((n, 6, 6, 2)), dtype=jnp.float64)
    y = jnp.asarray(rng.integers(0, 3, size=(n,)))
    return X, y


def _bn_model(norm="batch", seed=0):
    model = BNCNN(norm=norm)
    X, _ = _bn_data()
    variables = model.init(jax.random.key(seed), X[:1])
    # randomize running stats so BatchNorm is not a no-op
    if "batch_stats" in variables:
        rng = np.random.default_rng(seed + 1)
        variables = jax.tree_util.tree_map(
            lambda v: v + 0.1 * jnp.asarray(rng.standard_normal(v.shape)),
            variables,
        )
    return NNModel.from_flax(model, variables)


def test_from_flax_freezes_batch_stats():
    nnm = _bn_model("batch")
    train_paths = [s.path for s in nnm.leaf_specs]
    assert all(p[0] == "params" for p in train_paths)
    # batch_stats leaves exist in the full variables but are frozen
    frozen = [
        p
        for p, _ in jax.tree_util.tree_leaves_with_path(nnm.frozen_params)
    ]
    assert len(frozen) > 0


@pytest.mark.parametrize("norm", ["batch", "group", "layer"])
def test_kron_skip_warns_and_fits(norm):
    nnm = _bn_model(norm)
    X, y = _bn_data()
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=6)
    la = KronLaplace(nnm, "classification")
    with pytest.warns(UserWarning, match="zero curvature"):
        la.fit(loader)
    # norm-layer groups have zero curvature -> their Kron diag is exactly 0
    diag = np.asarray(la.H_facs.diag())
    for spec in nnm.leaf_specs:
        if spec.path[-1] == "scale" or (
            spec.path[-1] == "bias" and "Norm" in spec.path[-2]
        ):
            sl = slice(spec.offset, spec.offset + spec.size)
            assert np.all(diag[sl] == 0.0), spec.path
    # posterior over those weights is the prior; everything stays usable
    assert np.isfinite(float(la.log_marginal_likelihood()))
    probs = la(X[:4], link_approx="probit")
    assert np.isfinite(np.asarray(probs)).all()
    samples = la.sample(5, key=jax.random.key(0))
    assert np.isfinite(np.asarray(samples)).all()


@pytest.mark.parametrize("norm", ["batch", "group", "layer"])
def test_kron_block_matches_full_ggn_blocks(norm):
    """'block' mode: the dense 1-factor groups for norm scale/bias equal the
    corresponding diagonal blocks of the exact full GGN."""
    nnm = _bn_model(norm)
    X, y = _bn_data()
    backend_blk = CurvatureBackend(
        nnm, "classification", "ggn", kron_unsupported="block"
    )
    loss_k, kron = backend_blk.kron(X, y, N=X.shape[0])
    backend_full = CurvatureBackend(nnm, "classification", "ggn")
    loss_f, H_full = backend_full.full(X, y, N=X.shape[0])
    assert np.allclose(float(loss_k), float(loss_f), rtol=1e-10)
    H_full = np.asarray(H_full)
    checked = 0
    for spec, group in zip(nnm.leaf_specs, kron.kfacs):
        is_norm_leaf = spec.path[-1] == "scale" or (
            spec.path[-1] == "bias" and "Norm" in spec.path[-2]
        )
        if not is_norm_leaf:
            continue
        sl = slice(spec.offset, spec.offset + spec.size)
        assert len(group) == 1
        assert np.allclose(
            np.asarray(group[0]), H_full[sl, sl], atol=1e-8
        ), spec.path
        checked += 1
    assert checked >= 2


@pytest.mark.parametrize("norm", ["batch", "group", "layer"])
def test_diag_taps_exact_on_norm_layers(norm):
    """The tap-streamed diagonal equals diag(full GGN) on a norm-layer net."""
    nnm = _bn_model(norm)
    X, y = _bn_data()
    backend = CurvatureBackend(nnm, "classification", "ggn")
    assert backend._can_use_taps()
    loss_t, d_taps = backend.diag(X, y, N=X.shape[0])
    _, H_full = backend.full(X, y, N=X.shape[0])
    assert np.allclose(
        np.asarray(d_taps), np.diagonal(np.asarray(H_full)), atol=1e-8
    )


def test_diag_taps_exact_on_norm_layers_ef():
    nnm = _bn_model("batch")
    X, y = _bn_data()
    backend = CurvatureBackend(nnm, "classification", "ef")
    loss_t, d_taps = backend.diag(X, y, N=X.shape[0])
    Gs, _ = backend.gradients(X, y)
    d_naive = np.einsum("bp,bp->p", np.asarray(Gs), np.asarray(Gs))
    assert np.allclose(np.asarray(d_taps), d_naive, atol=1e-8)


def test_kron_raise_mode_still_raises():
    nnm = _bn_model("batch")
    X, y = _bn_data()
    la = KronLaplace(
        nnm, "classification", backend_kwargs={"kron_unsupported": "raise"}
    )
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=6)
    with pytest.raises(ValueError, match="KFAC is undefined"):
        la.fit(loader)


def test_kron_block_fit_end_to_end():
    nnm = _bn_model("batch")
    X, y = _bn_data()
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=6)
    la = KronLaplace(
        nnm, "classification", backend_kwargs={"kron_unsupported": "block"}
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # block mode must not warn on norm nets
        la.fit(loader)
    diag = np.asarray(la.H_facs.diag())
    for spec in nnm.leaf_specs:
        if spec.path[-1] == "scale":
            sl = slice(spec.offset, spec.offset + spec.size)
            assert np.any(diag[sl] != 0.0)
    la.optimize_prior_precision(n_steps=5)
    probs = la(X[:4], link_approx="probit")
    assert np.allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-6)


def test_diag_laplace_on_bn_wideresnet_smoke():
    """The reference's actual WRN architecture (BN) fits under kron + diag."""
    from laplace_jax.models import WideResNet16x4

    model = WideResNet16x4(num_classes=4, widen_factor=1, norm="batch")
    rng = np.random.default_rng(0)
    X = rng.standard_normal((8, 8, 8, 3)).astype(np.float64)
    y = rng.integers(0, 4, size=(8,))
    variables = model.init(jax.random.key(0), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, variables)
    loader = ArrayLoader(X, y, batch_size=4)

    la = DiagLaplace(nnm, "classification")
    la.fit(loader)
    assert np.isfinite(float(la.log_marginal_likelihood()))

    la_k = KronLaplace(nnm, "classification")
    with pytest.warns(UserWarning, match="zero curvature"):
        la_k.fit(loader)
    assert np.isfinite(float(la_k.log_marginal_likelihood()))


def test_kron_norm_serialization_roundtrip(tmp_path):
    """Zero norm-layer groups must survive the npz roundtrip and the
    decompose-on-load epilogue."""
    nnm = _bn_model("batch")
    X, y = _bn_data()
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=6)
    la = KronLaplace(nnm, "classification")
    with pytest.warns(UserWarning):
        la.fit(loader)
    la.optimize_prior_precision(n_steps=5)
    path = str(tmp_path / "bn_kron.npz")
    la.save(path)

    la2 = KronLaplace(nnm, "classification")
    la2.load(path)
    assert np.allclose(
        float(la.log_marginal_likelihood()),
        float(la2.log_marginal_likelihood()),
        rtol=1e-10,
    )
    p1 = np.asarray(la(X[:4], link_approx="probit"))
    p2 = np.asarray(la2(X[:4], link_approx="probit"))
    assert np.allclose(p1, p2, atol=1e-10)
