"""Generic exact dense blocks for KFAC-unsupported leaves.

`kron_unsupported="block"` used to cover only norm-layer scale/bias (whose
per-sample grads come from the tap vjp sweep). The generic path extends it
to ANY unsupported leaf — here an `nn.Einsum` whose interleaved kernel label
layout ("...a,bac->...bc": contracted label between two feature labels) has
no 2-factor-group flatten and therefore no Kron structure — via per-sample
vjps w.r.t. the leaf itself, gated by `kron_block_max_params`.

Reference behavior for such modules is skip-with-warning
(`/root/reference/laplace/curvature/asdl.py:137-138`); the exact-block mode
is laplace_jax-only capability.
"""

import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import KronLaplace
from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class InterleavedEinsumNet(nn.Module):
    """Dense -> interleaved-label Einsum (kernel (b, a, c): no 2-factor
    flatten) -> Dense head."""

    @nn.compact
    def __call__(self, x):
        h = jnp.tanh(nn.Dense(5)(x))
        z = nn.Einsum((2, 5, 3), "...a,bac->...bc")(h)
        z = z.reshape(z.shape[0], -1)
        return nn.Dense(3)(z)


def _setup(seed=0, n=10):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((n, 4)), dtype=jnp.float64)
    y = jnp.asarray(rng.integers(0, 3, size=(n,)))
    model = InterleavedEinsumNet()
    params = model.init(jax.random.key(seed), X[:1])
    return NNModel.from_flax(model, params), X, y


def _einsum_leaves(nnm):
    return [s for s in nnm.leaf_specs if "Einsum" in "/".join(s.path)]


def test_generic_block_matches_full_ggn():
    """Exact blocks for the interleaved einsum kernel/bias equal the
    corresponding diagonal blocks of the full GGN."""
    nnm, X, y = _setup()
    backend_blk = CurvatureBackend(
        nnm, "classification", "ggn", kron_unsupported="block"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # block mode must cover everything
        loss_k, kron = backend_blk.kron(X, y, N=X.shape[0])
    backend_full = CurvatureBackend(nnm, "classification", "ggn")
    loss_f, H_full = backend_full.full(X, y, N=X.shape[0])
    assert np.allclose(float(loss_k), float(loss_f), rtol=1e-10)
    H_full = np.asarray(H_full)
    es = _einsum_leaves(nnm)
    assert len(es) >= 1
    by_path = {s.path: g for s, g in zip(nnm.leaf_specs, kron.kfacs)}
    for spec in es:
        group = by_path[spec.path]
        assert len(group) == 1, spec.path
        sl = slice(spec.offset, spec.offset + spec.size)
        np.testing.assert_allclose(
            np.asarray(group[0]), H_full[sl, sl], atol=1e-8,
            err_msg=str(spec.path),
        )


def test_generic_block_fit_end_to_end():
    """KronLaplace fit with block mode on the einsum net: no skip warning,
    finite marglik/predictive, and the posterior actually uses the block
    (differs from a prior-only posterior forced via kron_block_max_params=1).

    Note the DEFAULT mode now also takes the exact-block path for separable
    unfactored einsums (round-5 coverage closure), so the prior-only
    contrast requires disabling blocks via the size gate."""
    nnm, X, y = _setup()
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)
    la = KronLaplace(
        nnm, "classification",
        backend_kwargs={"kron_unsupported": "block"},
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        la.fit(loader)
    assert np.isfinite(float(la.log_marginal_likelihood()))
    probs = la(X[:4], link_approx="probit")
    assert np.isfinite(np.asarray(probs)).all()

    # default mode now matches block mode exactly on this net
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        la_default = KronLaplace(nnm, "classification")
        la_default.fit(loader)
    assert float(la.log_marginal_likelihood()) == pytest.approx(
        float(la_default.log_marginal_likelihood())
    )

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        la_skip = KronLaplace(
            nnm, "classification",
            backend_kwargs={"kron_block_max_params": 1},
        )
        la_skip.fit(loader)
    assert float(la.log_marginal_likelihood()) != pytest.approx(
        float(la_skip.log_marginal_likelihood())
    )


def test_block_max_params_gate_falls_back_to_skip():
    """Leaves above kron_block_max_params get zero blocks + warning."""
    nnm, X, y = _setup()
    backend = CurvatureBackend(
        nnm, "classification", "ggn",
        kron_unsupported="block", kron_block_max_params=4,
    )
    with pytest.warns(UserWarning, match="zero curvature"):
        _, kron = backend.kron(X, y, N=X.shape[0])
    es = _einsum_leaves(nnm)
    by_path = {s.path: g for s, g in zip(nnm.leaf_specs, kron.kfacs)}
    for spec in es:
        assert np.allclose(np.asarray(by_path[spec.path][0]), 0.0)


def test_generic_block_mc_and_ef_run():
    """The generic block path composes with MC-Fisher and EF cotangents."""
    nnm, X, y = _setup()
    for kw in (
        {"stochastic": True, "num_samples": 2},
        {"curv_type": "ef"},
    ):
        backend = CurvatureBackend(
            nnm, "classification", kron_unsupported="block", **kw
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            _, kron = backend.kron(
                X, y, N=X.shape[0], key=jax.random.key(0)
            )
        es = _einsum_leaves(nnm)
        by_path = {s.path: g for s, g in zip(nnm.leaf_specs, kron.kfacs)}
        for spec in es:
            blk = np.asarray(by_path[spec.path][0])
            assert np.isfinite(blk).all()
            assert not np.allclose(blk, 0.0)
            np.testing.assert_allclose(blk, blk.T, atol=1e-10)
