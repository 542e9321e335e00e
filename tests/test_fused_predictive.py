"""Fused single-program GLM predictive == eager path, bitwise-tolerance.

The fused path (`BaseLaplace._fused_entry`) runs Jacobians -> posterior solve
-> link/sampling as ONE jitted program with the posterior state as a pytree
argument. These tests pin (a) numerical parity with the eager path for every
flavor/link/entry, (b) that prior-precision updates flow through WITHOUT
retracing (state is an argument, not a closure constant), and (c) that the
kill switch routes back to the eager path. Reference semantics:
`/root/reference/laplace/baselaplace.py:1111-1342`.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from laplace_jax import Laplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class MLP(nn.Module):
    out: int = 3

    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(16)(x))
        return nn.Dense(self.out)(x)


def _fit(likelihood, sow, hs, out=3):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((32, 4))
    if likelihood == "classification":
        y = rng.integers(0, out, size=(32,))
    else:
        y = rng.standard_normal((32, out))
    loader = ArrayLoader(X, y, batch_size=16)
    m = MLP(out)
    params = m.init(jax.random.key(0), jnp.asarray(X[:1]))
    la = Laplace(NNModel.from_flax(m, params), likelihood,
                 subset_of_weights=sow, hessian_structure=hs)
    la.fit(loader)
    return la, jnp.asarray(X[:5])


def _eager(la, fn):
    os.environ["LAPLACE_FUSED_PREDICTIVE"] = "0"
    try:
        return fn()
    finally:
        del os.environ["LAPLACE_FUSED_PREDICTIVE"]


FLAVORS = [
    ("all", "full"), ("all", "kron"), ("all", "diag"),
    ("last_layer", "full"), ("last_layer", "kron"), ("last_layer", "diag"),
]


@pytest.mark.parametrize("sow,hs", FLAVORS)
@pytest.mark.parametrize("link", ["probit", "bridge", "bridge_norm", "mc"])
def test_call_parity(sow, hs, link):
    la, xt = _fit("classification", sow, hs)
    key = jax.random.key(7)
    kw = dict(link_approx=link, key=key)
    p_f = la(xt, **kw)
    p_e = _eager(la, lambda: la(xt, **kw))
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_e), atol=1e-10)
    np.testing.assert_allclose(np.asarray(p_f).sum(-1), 1.0, atol=1e-8)
    assert la._pred_programs  # fused path actually built a program


@pytest.mark.parametrize("sow,hs", FLAVORS)
def test_samples_parity(sow, hs):
    la, xt = _fit("classification", sow, hs)
    key = jax.random.key(3)
    s_f = la.predictive_samples(xt, n_samples=6, key=key)
    s_e = _eager(la, lambda: la.predictive_samples(xt, n_samples=6, key=key))
    np.testing.assert_allclose(np.asarray(s_f), np.asarray(s_e), atol=1e-10)
    f_f = la.functional_samples(xt, n_samples=6, key=key)
    f_e = _eager(la, lambda: la.functional_samples(xt, n_samples=6, key=key))
    np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_e), atol=1e-10)


@pytest.mark.parametrize("kwargs", [dict(), dict(diagonal_output=True),
                                    dict(joint=True)])
def test_regression_parity(kwargs):
    la, xt = _fit("regression", "all", "kron", out=2)
    out_f = la(xt, **kwargs)
    out_e = _eager(la, lambda: la(xt, **kwargs))
    for a, b in zip(out_f, out_e):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_prior_update_no_retrace():
    """Changing the prior precision must neither retrace the program nor
    return stale results (state flows in as a jit argument)."""
    la, xt = _fit("classification", "all", "kron")
    p0 = np.asarray(la(xt))
    (prog,) = la._pred_programs.values()
    assert prog._cache_size() == 1
    la.prior_precision = 25.0
    p1 = np.asarray(la(xt))
    assert prog._cache_size() == 1  # same program, new state values
    assert not np.allclose(p0, p1)  # the new prior actually took effect
    p1_e = _eager(la, lambda: la(xt))
    np.testing.assert_allclose(p1, np.asarray(p1_e), atol=1e-10)


def test_refit_no_retrace():
    """Online-style refit keeps the compiled predictive program."""
    la, xt = _fit("classification", "all", "diag")
    la(xt)
    (prog,) = la._pred_programs.values()
    assert prog._cache_size() == 1
    rng = np.random.default_rng(1)
    X2 = rng.standard_normal((32, 4))
    y2 = rng.integers(0, 3, size=(32,))
    la.fit(ArrayLoader(X2, y2, batch_size=16))
    la(xt)
    assert prog._cache_size() == 1


def test_kill_switch_routes_eager():
    la, xt = _fit("classification", "all", "full")
    _eager(la, lambda: la(xt))
    assert not la._pred_programs


def test_backprop_through_fused():
    """enable_backprop: gradients w.r.t. x flow through the fused program."""
    rng = np.random.default_rng(0)
    X = rng.standard_normal((32, 4))
    y = rng.integers(0, 3, size=(32,))
    m = MLP(3)
    params = m.init(jax.random.key(0), jnp.asarray(X[:1]))
    la = Laplace(NNModel.from_flax(m, params), "classification",
                 subset_of_weights="all", hessian_structure="kron",
                 enable_backprop=True)
    la.fit(ArrayLoader(X, y, batch_size=16))

    def loss(xt):
        return la(xt).sum()

    gr = jax.grad(loss)(jnp.asarray(X[:3]))
    assert np.isfinite(np.asarray(gr)).all()
    assert float(jnp.abs(gr).sum()) > 0


@pytest.mark.parametrize("hs", ["full", "kron", "diag"])
def test_temperature_change_rebuilds_program(hs):
    """temperature is a trace-time constant in the fused program, so changing
    it must key a NEW program (fused == eager after the change)."""
    la, xt = _fit("classification", "all", hs)
    before = np.asarray(la(xt, link_approx="probit"))
    la.temperature = 3.0
    hot = np.asarray(la(xt, link_approx="probit"))
    ref = np.asarray(_eager(la, lambda: la(xt, link_approx="probit")))
    np.testing.assert_allclose(hot, ref, atol=1e-6)
    if hs != "full":
        # kron/diag recompute the posterior from H on every predictive, so
        # the new temperature acts immediately; FullLaplace caches its
        # posterior scale at fit time (same as the eager path — parity
        # above is the contract, not post-fit temperature sensitivity)
        assert np.abs(hot - before).max() > 1e-4
