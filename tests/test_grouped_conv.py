"""Grouped/depthwise convolution support in the curvature path.

The im2col-matmul rewrite, KFAC activation factors, and the tap-streamed
exact diagonal all handle `feature_group_count > 1` (the reference's torch
backends silently mishandle or skip grouped convs; before this fix the kron
path here assembled wrong-shaped factors). Oracles: forward equivalence vs
the native flax conv, diag-GGN vs naive full-Jacobian contraction, KFAC
shape/normalization contracts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from laplace_jax import DiagLaplace, KronLaplace
from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import jacobians_naive


class GroupedCNN(nn.Module):
    groups: int = 4
    strides: int = 1
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), strides=(self.strides, self.strides),
                    padding=self.padding,
                    feature_group_count=self.groups)(x)
        x = jnp.tanh(x)
        return nn.Dense(3)(x.reshape(x.shape[0], -1))


def _model(groups=4, strides=1, padding="SAME"):
    m = GroupedCNN(groups=groups, strides=strides, padding=padding)
    params = m.init(jax.random.key(0), jnp.ones((1, 6, 6, 4)))
    return NNModel.from_flax(m, params)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((8, 6, 6, 4))
    y = rng.integers(0, 3, size=(8,))
    return jnp.asarray(X), jnp.asarray(y)


@pytest.mark.parametrize("groups", [1, 2, 4])
@pytest.mark.parametrize("strides,padding", [(1, "SAME"), (2, "VALID")])
def test_rewrite_forward_equivalence(data, groups, strides, padding):
    X, _ = data
    nnm = _model(groups, strides, padding)
    f_plain = nnm.module.apply(nnm.full_params(nnm.train_params), X)
    f_taps, taps = nnm.apply_with_taps(nnm.train_params, X)
    np.testing.assert_allclose(
        np.asarray(f_taps), np.asarray(f_plain), rtol=1e-12, atol=1e-12
    )
    conv_taps = [t for t in taps if t.kind == "conv"]
    assert len(conv_taps) == 1
    assert conv_taps[0].patches is not None  # rewrite engaged, not fallback


@pytest.mark.parametrize("groups", [2, 4])
def test_diag_ggn_exact_vs_naive(data, groups):
    X, y = data
    nnm = _model(groups)
    backend = CurvatureBackend(nnm, "classification")
    _, diag = backend.diag(X, y, N=X.shape[0])

    Js, f = jacobians_naive(nnm.apply, nnm.train_params, X)
    p = jax.nn.softmax(f, axis=-1)
    Lam = jnp.einsum("bi,ij->bij", p, jnp.eye(p.shape[-1])) - jnp.einsum(
        "bi,bj->bij", p, p
    )
    H_full = jnp.einsum("bcp,bcd,bdq->pq", Js, Lam, Js)
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(jnp.diagonal(H_full)),
        rtol=1e-7, atol=1e-10,
    )


@pytest.mark.parametrize("groups", [2, 4])
def test_kron_shapes_and_additivity(data, groups):
    X, y = data
    nnm = _model(groups)
    backend = CurvatureBackend(nnm, "classification")
    _, kron = backend.kron(X, y, N=X.shape[0])

    # factor shapes must match the kernel's Kron structure
    sizes = kron.group_sizes
    leaf_sizes = [s.size for s in nnm.leaf_specs]
    assert sizes == leaf_sizes

    # batch additivity: K(full batch) == K(first half) + K(second half)
    _, k1 = backend.kron(X[:4], y[:4], N=X.shape[0])
    _, k2 = backend.kron(X[4:], y[4:], N=X.shape[0])
    # A-factors carry 1/N and B-factors sum, so group-wise dense blocks add
    for F, F1, F2 in zip(kron.kfacs, k1.kfacs, k2.kfacs):
        if len(F) == 1:
            np.testing.assert_allclose(
                np.asarray(F[0]), np.asarray(F1[0] + F2[0]),
                rtol=1e-6, atol=1e-9,
            )


@pytest.mark.parametrize("flavor", [KronLaplace, DiagLaplace])
def test_grouped_fit_and_marglik(data, flavor):
    X, y = data
    nnm = _model(4)
    la = flavor(nnm, "classification")
    la.fit(ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4))
    lm = float(la.log_marginal_likelihood())
    assert np.isfinite(lm)
    p = np.asarray(la(X[:4]))
    assert np.allclose(p.sum(-1), 1.0, atol=1e-6)
    s = np.asarray(la.sample(3, key=jax.random.key(0)))
    assert np.isfinite(s).all()


def test_depthwise_conv_full_groups(data):
    # depthwise: groups == cin
    X, y = data
    nnm = _model(groups=4)  # cin=4 -> depthwise
    la = DiagLaplace(nnm, "classification")
    la.fit(ArrayLoader(np.asarray(X), np.asarray(y), batch_size=8))
    assert np.isfinite(float(la.log_marginal_likelihood()))


class CircularCNN(nn.Module):
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(6, (3, 3), padding="CIRCULAR",
                    feature_group_count=self.groups)(x)
        x = jnp.tanh(x)
        return nn.Dense(3)(x.reshape(x.shape[0], -1))


@pytest.mark.parametrize("groups", [1, 2])
def test_circular_padding_rewrite(data, groups):
    X, y = data
    m = CircularCNN(groups=groups)
    params = m.init(jax.random.key(0), jnp.ones((1, 6, 6, 4)))
    nnm = NNModel.from_flax(m, params)
    f_plain = nnm.module.apply(nnm.full_params(nnm.train_params), X)
    f_taps, taps = nnm.apply_with_taps(nnm.train_params, X)
    np.testing.assert_allclose(
        np.asarray(f_taps), np.asarray(f_plain), rtol=1e-12, atol=1e-12
    )
    assert [t for t in taps if t.kind == "conv"][0].patches is not None

    la = DiagLaplace(nnm, "classification")
    la.fit(ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4))
    assert np.isfinite(float(la.log_marginal_likelihood()))

    # diag exactness holds under circular padding too
    backend = CurvatureBackend(nnm, "classification")
    _, diag = backend.diag(X, y, N=X.shape[0])
    Js, f = jacobians_naive(nnm.apply, nnm.train_params, X)
    p = jax.nn.softmax(f, axis=-1)
    Lam = jnp.einsum("bi,ij->bij", p, jnp.eye(p.shape[-1])) - jnp.einsum(
        "bi,bj->bij", p, p
    )
    H_full = jnp.einsum("bcp,bcd,bdq->pq", Js, Lam, Js)
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(jnp.diagonal(H_full)),
        rtol=1e-7, atol=1e-10,
    )


class DilatedInputCNN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(5, (3, 3), padding=((1, 1), (1, 1)), input_dilation=2)(x)
        x = jnp.tanh(x)
        return nn.Dense(3)(x.reshape(x.shape[0], -1))


def test_input_dilation_rewrite(data):
    X, y = data
    m = DilatedInputCNN()
    params = m.init(jax.random.key(0), jnp.ones((1, 6, 6, 4)))
    nnm = NNModel.from_flax(m, params)
    f_plain = nnm.module.apply(nnm.full_params(nnm.train_params), X)
    f_taps, taps = nnm.apply_with_taps(nnm.train_params, X)
    np.testing.assert_allclose(
        np.asarray(f_taps), np.asarray(f_plain), rtol=1e-12, atol=1e-12
    )
    assert [t for t in taps if t.kind == "conv"][0].patches is not None

    backend = CurvatureBackend(nnm, "classification")
    _, diag = backend.diag(X, y, N=X.shape[0])
    Js, f = jacobians_naive(nnm.apply, nnm.train_params, X)
    p = jax.nn.softmax(f, axis=-1)
    Lam = jnp.einsum("bi,ij->bij", p, jnp.eye(p.shape[-1])) - jnp.einsum(
        "bi,bj->bij", p, p
    )
    H_full = jnp.einsum("bcp,bcd,bdq->pq", Js, Lam, Js)
    np.testing.assert_allclose(
        np.asarray(diag), np.asarray(jnp.diagonal(H_full)),
        rtol=1e-7, atol=1e-10,
    )
