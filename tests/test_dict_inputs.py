"""Dict-shaped (HF-style) batch support + feature reduction.

Parity targets: dict batches keyed by `dict_key_x`/`dict_key_y`
(reference `baselaplace.py:77-84`, `:970-974`) and `FeatureReduction` for
(B, T, D) penultimate features (reference `feature_extractor.py:112-127`).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import DiagLaplace, FullLLLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class SeqClassifier(nn.Module):
    """Embeds token ids, mean-pools, classifies — HF-ish shape."""

    vocab: int = 32
    dim: int = 8
    num_classes: int = 3

    @nn.compact
    def __call__(self, batch):
        ids = batch["input_ids"]
        x = nn.Embed(self.vocab, self.dim, param_dtype=jnp.float64)(ids)
        x = jnp.tanh(nn.Dense(self.dim, param_dtype=jnp.float64)(x))
        x = x.mean(axis=1)
        return nn.Dense(self.num_classes, param_dtype=jnp.float64)(x)


@pytest.fixture
def dict_data():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 32, size=(20, 6))
    labels = rng.integers(0, 3, size=(20,))
    return {"input_ids": ids, "labels": labels}


@pytest.fixture
def seq_model(dict_data):
    model = SeqClassifier()
    probe = {k: jnp.asarray(v[:1]) for k, v in dict_data.items()}
    params = model.init(jax.random.key(0), probe)
    return NNModel.from_flax(model, params)


def test_dict_fit_and_predict(seq_model, dict_data):
    loader = ArrayLoader(dict_data, batch_size=10)
    la = DiagLaplace(seq_model, "classification")
    la.fit(loader)
    assert la.n_data == 20
    test = {k: jnp.asarray(v[:5]) for k, v in dict_data.items()}
    probs = la(test, link_approx="probit")
    assert probs.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-8)


def test_dict_last_layer(seq_model, dict_data):
    loader = ArrayLoader(dict_data, batch_size=10)
    la = FullLLLaplace(seq_model, "classification")
    la.fit(loader)
    assert la.last_layer_path == ("Dense_1",)
    test = {k: jnp.asarray(v[:5]) for k, v in dict_data.items()}
    probs = la(test, link_approx="probit")
    assert probs.shape == (5, 3)


class SeqFeatureModel(nn.Module):
    """Last Dense applied per-token then pooled — exercises feature_reduction."""

    @nn.compact
    def __call__(self, x):  # x: (B, T, D) float
        h = jnp.tanh(nn.Dense(8, param_dtype=jnp.float64)(x))
        out = nn.Dense(2, param_dtype=jnp.float64)(h)  # (B, T, 2)
        return out.mean(axis=1)  # (B, 2)


@pytest.mark.parametrize("reduction", ["pick_first", "pick_last", "average"])
def test_feature_reduction(reduction):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((12, 5, 4))
    model = SeqFeatureModel()
    params = model.init(jax.random.key(0), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, params)
    f, feats = nnm.apply_with_features(
        nnm.train_params, jnp.asarray(X), ("Dense_1",), reduction
    )
    assert feats.shape == (12, 8)
    h = np.tanh(
        np.asarray(X) @ np.asarray(params["params"]["Dense_0"]["kernel"])
        + np.asarray(params["params"]["Dense_0"]["bias"])
    )
    if reduction == "pick_first":
        expected = h[:, 0]
    elif reduction == "pick_last":
        expected = h[:, -1]
    else:
        expected = h.mean(1)
    np.testing.assert_allclose(np.asarray(feats), expected, atol=1e-12)


def test_nnmodel_wrap_variants():
    from .utils import make_mlp

    model, params = make_mlp()
    nnm1 = NNModel.wrap((model, params))
    nnm2 = NNModel.wrap(model, params)
    nnm3 = NNModel.wrap(lambda p, x: model.apply(p, x), params)
    nnm4 = NNModel.wrap(nnm1)
    X = jnp.ones((2, 3))
    for n in (nnm2, nnm3, nnm4):
        np.testing.assert_allclose(
            np.asarray(nnm1.apply(nnm1.train_params, X)),
            np.asarray(n.apply(n.train_params, X)),
        )
    with pytest.raises(ValueError):
        NNModel.wrap(42)
