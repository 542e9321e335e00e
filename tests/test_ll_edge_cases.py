"""Last-layer auto-discovery edge cases — no-Dense models, nested modules,
explicit names, feature reduction on sequence models. Mirrors the reference's
`tests/test_lllaplace.py` discovery coverage (`:114-143` and around)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLLLaplace, FullLLLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data


class NoDense(nn.Module):
    """A model with no Dense layer — discovery falls back to the last
    parameterized tapped layer (the Conv head), beyond the reference, which
    requires a linear head (`feature_extractor.py:144-145`)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(4, (2,), dtype=jnp.float64, param_dtype=jnp.float64)(x)
        return x.mean(axis=1)


class NoTappedLayers(nn.Module):
    """Only a bare self.param — nothing tapped, discovery must fail cleanly."""

    @nn.compact
    def __call__(self, x):
        w = self.param("w", nn.initializers.ones_init(), (x.shape[-1], 2),
                       jnp.float64)
        return (x @ w).mean(axis=1)


class Nested(nn.Module):
    """The classifier Dense lives two module levels deep."""

    class Head(nn.Module):
        class Inner(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Dense(2, dtype=jnp.float64, param_dtype=jnp.float64)(x)

        @nn.compact
        def __call__(self, x):
            x = nn.Dense(6, dtype=jnp.float64, param_dtype=jnp.float64)(x)
            return Nested.Head.Inner()(jnp.tanh(x))

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(8, dtype=jnp.float64, param_dtype=jnp.float64)(x)
        return Nested.Head()(jnp.tanh(x))


class DenseNotLast(nn.Module):
    """Computation continues after the last Dense — discovery still picks the
    last *executed* Dense (reference picks the last module producing the
    output path, `feature_extractor.py:159-216`)."""

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(5, dtype=jnp.float64, param_dtype=jnp.float64)(x)
        x = nn.Dense(2, dtype=jnp.float64, param_dtype=jnp.float64)(jnp.tanh(x))
        return jax.nn.log_softmax(x)  # post-processing after the Dense


def _loader(n=10):
    X, y = classification_data(n=n)
    return ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5), X


def test_no_dense_model_uses_conv_head():
    """Conv-headed model: discovery picks the Conv, generic-Jacobian last
    layer fits and predicts (VERDICT r2 item 7)."""
    model = NoDense()
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, 6, 3)))
    params = model.init(jax.random.key(0), X)
    nnm = NNModel.from_flax(model, params)
    la = FullLLLaplace(nnm, "classification")
    loader = ArrayLoader(np.asarray(X), np.zeros(4, dtype=int), batch_size=2)
    la.fit(loader)
    assert la._head_kind == "conv"
    assert la.last_layer_path == ("Conv_0",)
    p = la(X[:2])
    assert np.allclose(np.asarray(p).sum(-1), 1, atol=1e-8)


def test_no_tapped_layer_model_raises():
    model = NoTappedLayers()
    X = jnp.ones((4, 6, 3), dtype=jnp.float64)
    params = model.init(jax.random.key(0), X)
    nnm = NNModel.from_flax(model, params)
    la = FullLLLaplace(nnm, "classification")
    loader = ArrayLoader(np.asarray(X), np.zeros(4, dtype=int), batch_size=2)
    with pytest.raises(ValueError, match="No Dense layer"):
        la.fit(loader)


def test_nested_module_discovery():
    model = Nested()
    loader, X = _loader()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    la = FullLLLaplace(nnm, "classification")
    la.fit(loader)
    assert la.last_layer_path == ("Head_0", "Inner_0", "Dense_0")
    # posterior covers exactly that layer's parameters
    assert la.n_params == 6 * 2 + 2
    probs = np.asarray(la(X, link_approx="probit"))
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-8)


def test_dense_followed_by_postprocessing():
    model = DenseNotLast()
    loader, X = _loader()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    la = DiagLLLaplace(nnm, "classification")
    la.fit(loader)
    assert la.last_layer_path == ("Dense_1",)
    assert la.n_params == 5 * 2 + 2


def test_explicit_last_layer_name_nested():
    model = Nested()
    loader, X = _loader()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    la = FullLLLaplace(nnm, "classification",
                       last_layer_name="Head_0/Inner_0/Dense_0")
    la.fit(loader)
    assert la.n_params == 14


def test_wrong_last_layer_name_raises():
    model = Nested()
    loader, X = _loader()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    with pytest.raises(ValueError, match="No parameters found"):
        FullLLLaplace(nnm, "classification", last_layer_name="Bogus_9")


def test_sequence_model_feature_reduction():
    """(B, T, D) features reduce to (B, D) for the last-layer GLM predictive
    (reference `feature_extractor.py:112-127`)."""

    class SeqModel(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, T, D)
            x = nn.Dense(6, dtype=jnp.float64, param_dtype=jnp.float64)(x)
            x = jnp.tanh(x.mean(axis=1))  # pool the sequence
            return nn.Dense(2, dtype=jnp.float64, param_dtype=jnp.float64)(x)

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((8, 4, 3)))
    y = jnp.asarray(rng.integers(0, 2, size=(8,)))
    model = SeqModel()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    la = FullLLLaplace(nnm, "classification")
    la.fit(loader)
    probs = np.asarray(la(X, link_approx="probit"))
    assert probs.shape == (8, 2)
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-8)


def test_ll_online_fit_refused():
    """LL never supports override=False (reference `lllaplace.py:182-185`)."""
    from .utils import make_mlp

    model, params = make_mlp()
    nnm = NNModel.from_flax(model, params)
    loader, _ = _loader()
    la = FullLLLaplace(nnm, "classification")
    la.fit(loader)
    with pytest.raises(ValueError, match="override"):
        la.fit(loader, override=False)
