"""Adversarial einsum zoo: exact coverage for non-factorizable equations.

Closes the last KFAC coverage gap (round-4 ROADMAP: "interleaved
contracted/feature labels, kernel batch axes fall back with a warning").
The torch reference needs none of this because any torch module decomposes
into hooked `nn.Linear`s (`/root/reference/laplace/curvature/curvlinops.py:
55-75`); flax models write these maps as einsums directly, so the tap layer
must either factor them (structured KFAC) or cover them EXACTLY via
per-sample vjps w.r.t. the kernel itself ("unfactored" taps).

Contract pinned here:
- batch-separable equations with no 2-factor kernel flatten (interleaved
  labels, repeated/diagonal labels, summed-out kernel axes, kernels tied to
  non-batch input axes) get exact dense Fisher blocks in KFAC and exact
  diagonals in the tap-diag path, with ZERO warnings;
- non-batch-separable layers (kernel axes tied to the batch, DenseGeneral
  batch_dims) stay skip-with-warning — per-sample semantics do not exist
  for them.
"""

import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import Laplace
from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


def _diag_oracle(be, X):
    Js, f = be.jacobians(X)
    C = f.shape[-1]
    p = jax.nn.softmax(f, -1)
    lam = jnp.einsum("bc,ck->bck", p, jnp.eye(C, dtype=f.dtype)) - jnp.einsum(
        "bc,bk->bck", p, p
    )
    return jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)


def _assert_exact_blocks(be, X, y, kron):
    _, H = be.full(X, y, N=X.shape[0])
    H = np.asarray(H)
    for spec, g in zip(be.model.leaf_specs, kron.kfacs):
        if "Einsum" not in "/".join(spec.path):
            continue
        assert len(g) == 1, spec.path
        sl = slice(spec.offset, spec.offset + spec.size)
        np.testing.assert_allclose(
            np.asarray(g[0]), H[sl, sl], atol=1e-10, err_msg=str(spec.path)
        )


# ------------------------------------------------- exact-coverage equations
class _SummedOutFeatNet(nn.Module):
    """'bi,ioz->bo': kernel axis z is summed out of the output — the (K, O)
    flatten exists but the cotangent cannot see z."""

    @nn.compact
    def __call__(self, x):  # (B, 5)
        h = nn.Einsum((5, 4, 2), "bi,ioz->bo", param_dtype=jnp.float64)(x)
        return jnp.tanh(h) @ jnp.ones((4, 3), dtype=jnp.float64)


class _RepeatedLabelNet(nn.Module):
    """'bii,io->bo': repeated (diagonal) input labels."""

    @nn.compact
    def __call__(self, x):  # (B, 4, 4)
        h = nn.Einsum((4, 5), "bii,io->bo", param_dtype=jnp.float64)(x)
        return jnp.tanh(h) @ jnp.ones((5, 3), dtype=jnp.float64)


class _SharedPosKernelNet(nn.Module):
    """'btd,tdh->bth': kernel carries the (static) position axis t — a
    per-position Dense. Shared non-batch label: per-sample semantics hold."""

    @nn.compact
    def __call__(self, x):  # (B, 3, 4)
        h = nn.Einsum((3, 4, 5), "btd,tdh->bth", param_dtype=jnp.float64)(x)
        return jnp.tanh(h).mean(axis=1) @ jnp.ones((5, 3), dtype=jnp.float64)


_ZOO = [
    (_SummedOutFeatNet, (5,)),
    (_RepeatedLabelNet, (4, 4)),
    (_SharedPosKernelNet, (3, 4)),
]


@pytest.mark.parametrize("net_cls,xshape", _ZOO)
def test_zoo_exact_block_and_diag_no_warnings(net_cls, xshape):
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.standard_normal((4,) + xshape))
    y = jnp.asarray(rng.integers(0, 3, 4))
    m = net_cls()
    p = m.init(jax.random.key(0), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # exact coverage, zero warnings
        _, kron = be.kron(X, y, N=4)
        _, d = be.diag(X, y)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, X)), atol=1e-8
    )
    _assert_exact_blocks(be, X, y, kron)
    assert sum(kron.group_sizes) == be.model.n_params


@pytest.mark.parametrize("net_cls,xshape", _ZOO)
def test_zoo_ef_diag_matches_jacobian_path(net_cls, xshape):
    """EF cotangents flow through the exact per-leaf path too."""
    rng = np.random.default_rng(8)
    X = jnp.asarray(rng.standard_normal((4,) + xshape))
    y = jnp.asarray(rng.integers(0, 3, 4))
    m = net_cls()
    p = m.init(jax.random.key(1), X)
    nnm = NNModel.from_flax(m, p)
    be = CurvatureBackend(nnm, "classification", curv_type="ef")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, d = be.diag(X, y)
    # J-path EF oracle: per-sample sum-loss gradients, squared
    Js, f = be.jacobians(X)
    pm = jax.nn.softmax(f, -1)
    ct = pm - jax.nn.one_hot(y, f.shape[-1], dtype=f.dtype)
    g = jnp.einsum("bcp,bc->bp", Js, ct)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray((g**2).sum(0)), atol=1e-8
    )


def test_zoo_end_to_end_fit_predict():
    """A mixed zoo model fits KronLaplace / DiagLaplace with zero warnings,
    finite marglik, and a normalized predictive."""

    class MixedZoo(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, 3, 4)
            h = nn.Einsum((3, 4, 5), "btd,tdh->bth",
                          param_dtype=jnp.float64)(x)
            h = jnp.tanh(h).mean(axis=1)  # (B, 5)
            h = nn.Einsum((5, 4, 2), "bi,ioz->bo",
                          param_dtype=jnp.float64)(h)
            return nn.Dense(3, param_dtype=jnp.float64)(jnp.tanh(h))

    rng = np.random.default_rng(9)
    X = np.asarray(rng.standard_normal((8, 3, 4)))
    y = np.asarray(rng.integers(0, 3, 8))
    m = MixedZoo()
    p = m.init(jax.random.key(2), jnp.asarray(X))
    loader = ArrayLoader(X, y, batch_size=4)
    for structure in ("kron", "diag"):
        la = Laplace((m, p), "classification", subset_of_weights="all",
                     hessian_structure=structure)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            la.fit(loader)
        assert np.isfinite(float(la.log_marginal_likelihood()))
        probs = la(jnp.asarray(X[:3]))
        assert np.allclose(np.asarray(probs).sum(-1), 1, atol=1e-6)


# --------------------------------------- non-separable: stays skip-with-warn
class _KernelBatchAxisNet(nn.Module):
    """'bi,bio->bo': the kernel is tied to the batch size — per-sample
    application is ill-defined, so the layer stays unsupported."""

    @nn.compact
    def __call__(self, x):  # (B, 5)
        h = nn.Einsum((4, 5, 4), "bi,bio->bo", param_dtype=jnp.float64)(x)
        return jnp.tanh(h) @ jnp.ones((4, 3), dtype=jnp.float64)


def test_kernel_batch_axis_skips_with_warning():
    rng = np.random.default_rng(10)
    X = jnp.asarray(rng.standard_normal((4, 5)))
    y = jnp.asarray(rng.integers(0, 3, 4))
    m = _KernelBatchAxisNet()
    p = m.init(jax.random.key(3), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with pytest.raises(ValueError, match="No Dense/Conv"):
        be.kron(X, y, N=4)  # only layer, and it is not separable
    # diag falls back to the J-path silently and stays exact
    _, d = be.diag(X, y)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, X)), atol=1e-8
    )


def test_dense_general_batch_dims_skips_with_warning():
    class _BatchDimsNet(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, 5)
            h = nn.DenseGeneral(4, batch_dims=(0,), axis=-1,
                                param_dtype=jnp.float64)(x)
            return jnp.tanh(h) @ jnp.ones((4, 3), dtype=jnp.float64)

    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.standard_normal((4, 5)))
    y = jnp.asarray(rng.integers(0, 3, 4))
    m = _BatchDimsNet()
    p = m.init(jax.random.key(4), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with pytest.raises(ValueError, match="No Dense/Conv"):
        be.kron(X, y, N=4)
