"""Masked convolutions (flax `nn.Conv(mask=...)`, e.g. autoregressive
PixelCNN kernels) on the im2col fast curvature path.

The mask is folded into the kernel inside the tap rewrite
(`nnmodel.py`), so the whole curvature path stays on matmul autodiff
(no slow-compiling conv-backward primitives), and the exact tap
diagonal carries the mask² factor (`diag_taps.py`). The torch
reference has no masked-conv concept (torch `nn.Conv2d` has no mask);
this covers flax's native feature with the same exactness oracles as
plain convs.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, KronLaplace
from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import jacobians_naive


def _pixelcnn_mask(kh, kw, cin, cout, include_center=False):
    """Autoregressive raster-order mask (PixelCNN 'A'/'B' style)."""
    m = np.zeros((kh, kw, cin, cout), dtype=np.float64)
    ch, cw = kh // 2, kw // 2
    m[:ch] = 1.0
    m[ch, :cw] = 1.0
    if include_center:
        m[ch, cw] = 1.0
    return jnp.asarray(m)


class MaskedConvNet(nn.Module):
    out_dim: int = 2

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        mask = _pixelcnn_mask(3, 3, x.shape[-1], 4)
        x = nn.Conv(4, (3, 3), padding="SAME", mask=mask,
                    dtype=jnp.float64, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x)
        mask2 = _pixelcnn_mask(3, 3, 4, 4, include_center=True)
        x = nn.Conv(4, (3, 3), strides=(2, 2), padding="SAME", mask=mask2,
                    dtype=jnp.float64, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x.reshape(x.shape[0], -1))
        x = nn.Dense(self.out_dim, dtype=jnp.float64,
                     param_dtype=jnp.float64)(x)
        return x


@pytest.fixture()
def masked_setup():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, 6, 6, 3)))
    y = jnp.asarray(rng.integers(0, 2, size=(4,)))
    model = MaskedConvNet()
    params = model.init(jax.random.key(0), X[:1])
    return NNModel.from_flax(model, params), model, params, X, y


def test_forward_rewrite_matches_native(masked_setup):
    """The im2col rewrite with the mask folded in reproduces the native
    masked conv exactly."""
    nnm, model, params, X, _ = masked_setup
    f_native = model.apply(params, X)
    f_taps, taps = nnm.apply_with_taps(nnm.train_params, X)
    np.testing.assert_allclose(
        np.asarray(f_taps), np.asarray(f_native), atol=1e-12
    )
    conv_taps = [t for t in taps if t.kind == "conv"]
    assert len(conv_taps) == 2
    # masked convs stay ON the fast path: patches captured, mask recorded
    for t in conv_taps:
        assert t.patches is not None
        assert t.mask is not None


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
def test_tap_diag_matches_jacobian_oracle(masked_setup, likelihood):
    """Exact tap diagonal carries mask²: equals the naive-Jacobian GGN diag
    (whose autodiff goes through kernel·mask)."""
    nnm, _, _, X, y = masked_setup
    if likelihood == "regression":
        y = jnp.asarray(
            np.random.default_rng(1).standard_normal((4, 2))
        )
    backend = CurvatureBackend(nnm, likelihood)
    Js, f = jacobians_naive(nnm.apply, nnm.train_params, X)
    if likelihood == "regression":
        d_ref = jnp.einsum("bcp,bcp->p", Js, Js)
    else:
        p = jax.nn.softmax(f, -1)
        lam = jax.vmap(jnp.diag)(p) - jnp.einsum("bc,bk->bck", p, p)
        d_ref = jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)
    _, d = backend.diag(X, y)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-9)


def test_masked_entries_have_zero_diag_curvature(masked_setup):
    """Mask-frozen kernel entries contribute nothing to the model output, so
    their exact GGN diagonal is zero."""
    nnm, model, params, X, y = masked_setup
    backend = CurvatureBackend(nnm, "classification")
    _, d = backend.diag(X, y)
    # locate the first conv kernel's slice in the flat parameter vector
    from laplace_jax.nnmodel import leaf_specs

    specs = leaf_specs(nnm.train_params)
    off = 0
    mask = np.asarray(_pixelcnn_mask(3, 3, 3, 4))
    for s in specs:
        size = int(np.prod(s.shape))
        if "Conv_0" in "/".join(s.path) and s.path[-1] == "kernel":
            dk = np.asarray(d[off:off + size]).reshape(s.shape)
            assert np.all(dk[mask == 0] == 0.0)
            assert np.any(dk[mask == 1] != 0.0)
            break
        off += size
    else:
        pytest.fail("Conv_0 kernel not found in leaf specs")


class MaskedGroupedConvNet(nn.Module):
    """Masked conv with feature_group_count > 1: exercises the mask²
    correction's grouped-patch layout claim in `diag_taps.py`."""

    @nn.compact
    def __call__(self, x):  # (B, H, W, 4)
        mask = _pixelcnn_mask(3, 3, 2, 6)  # per-group in-channels = 4/2 = 2
        x = nn.Conv(6, (3, 3), padding="SAME", feature_group_count=2,
                    mask=mask, dtype=jnp.float64, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x.reshape(x.shape[0], -1))
        return nn.Dense(2, dtype=jnp.float64, param_dtype=jnp.float64)(x)


def test_masked_grouped_conv_diag_matches_jacobian_oracle():
    """Exact tap diagonal with mask² on a GROUPED masked conv equals the
    naive-Jacobian GGN diagonal (grouped-patch (K, O) layout oracle)."""
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((4, 5, 5, 4)))
    y = jnp.asarray(rng.integers(0, 2, size=(4,)))
    model = MaskedGroupedConvNet()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    backend = CurvatureBackend(nnm, "classification")
    Js, f = jacobians_naive(nnm.apply, nnm.train_params, X)
    p = jax.nn.softmax(f, -1)
    lam = jax.vmap(jnp.diag)(p) - jnp.einsum("bc,bk->bck", p, p)
    d_ref = jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)
    _, d = backend.diag(X, y)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-9)


def test_masked_conv_laplace_fit_smoke(masked_setup):
    """Kron and Diag Laplace fit end-to-end on a masked-conv model."""
    nnm, _, _, X, y = masked_setup
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=2)
    for cls in (KronLaplace, DiagLaplace):
        la = cls(nnm, "classification")
        la.fit(loader)
        pred = la(X, pred_type="glm", link_approx="probit")
        assert np.all(np.isfinite(np.asarray(pred)))
