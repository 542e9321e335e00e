"""Frozen-subset-of-params compatibility matrix and the no-pickle
serialization guarantee (reference `tests/test_subset_params.py` and
`tests/test_serialization.py:158-188`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from laplace_jax import DiagLaplace, FullLaplace, KronLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(8)(x)
        x = nn.tanh(x)
        return nn.Dense(2)(x)


def _frozen_first_layer_model():
    m = MLP()
    params = m.init(jax.random.key(0), jnp.ones((1, 3)))
    mask = jax.tree_util.tree_map(lambda _: True, params)
    # freeze Dense_0 entirely
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: not any(
            getattr(p, "key", None) == "Dense_0" for p in path
        ),
        params,
    )
    return NNModel(
        lambda p, x: m.apply(p, x), params, trainable_mask=mask, module=m
    )


@pytest.fixture(scope="module")
def loader():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((24, 3))
    y = rng.integers(0, 2, size=(24,))
    return ArrayLoader(X, y, batch_size=12)


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
def test_frozen_subset_all_flavors(loader, flavor):
    nnm = _frozen_first_layer_model()
    full = MLP()
    n_full = sum(
        int(np.prod(np.asarray(l.shape)))
        for l in jax.tree_util.tree_leaves(
            full.init(jax.random.key(0), jnp.ones((1, 3)))
        )
    )
    assert nnm.n_params < n_full  # mask actually restricts

    la = flavor(nnm, "classification")
    la.fit(loader)
    assert la.mean.shape == (nnm.n_params,)
    p = np.asarray(la(np.asarray(next(iter(loader))[0][:4])))
    assert np.allclose(p.sum(-1), 1.0, atol=1e-5)
    # marglik differentiable over the restricted space
    lm = float(la.log_marginal_likelihood())
    assert np.isfinite(lm)
    s = np.asarray(la.sample(3, key=jax.random.key(0)))
    assert s.shape == (3, nnm.n_params)


@pytest.mark.parametrize("flavor", [FullLaplace, KronLaplace, DiagLaplace])
def test_saved_files_are_pickle_free(tmp_path, loader, flavor):
    m = MLP()
    params = m.init(jax.random.key(0), jnp.ones((1, 3)))
    la = flavor(NNModel.from_flax(m, params), "classification")
    la.fit(loader)
    path = str(tmp_path / "state.npz")
    la.save(path)
    # the archive must load with pickle disabled — i.e. contain only plain
    # arrays (the reference's torch.save files famously don't satisfy this)
    with np.load(path, allow_pickle=False) as data:
        assert len(data.files) > 0
        for k in data.files:
            _ = data[k]
