"""Fit-loop data handling hardening (VERDICT r2 item 8):

- one-shot (generator) loaders must raise up front, not silently fit a
  zero-curvature posterior after the probe consumes the first batch;
- empty loaders raise;
- the EF accumulation chunk size is a backend kwarg whose value never changes
  the result.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import Laplace
from laplace_jax.curvature.backend import CurvatureBackend, _default_ef_chunk
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data, make_mlp


@pytest.mark.parametrize("structure", ["diag", "full", "kron", "lowrank"])
def test_generator_loader_raises(structure):
    model, params = make_mlp()
    X, y = classification_data(n=8)
    la = Laplace((model, params), "classification", subset_of_weights="all",
                 hessian_structure=structure)
    gen = ((X[i : i + 4], y[i : i + 4]) for i in range(0, 8, 4))
    with pytest.raises(ValueError, match="one-shot iterator"):
        la.fit(gen)


def test_generator_loader_raises_gp():
    model, params = make_mlp()
    X, y = classification_data(n=8)
    la = Laplace((model, params), "classification", subset_of_weights="all",
                 hessian_structure="gp", n_subset=4)
    gen = ((X[i : i + 4], y[i : i + 4]) for i in range(0, 8, 4))
    with pytest.raises(ValueError, match="one-shot iterator"):
        la.fit(gen)


def test_non_iterable_loader_raises():
    model, params = make_mlp()
    la = Laplace((model, params), "classification", subset_of_weights="all",
                 hessian_structure="diag")
    with pytest.raises(ValueError, match="iterable"):
        la.fit(42)


class _EmptyLoader:
    n_data = 0

    def __iter__(self):
        return iter([])


def test_empty_loader_raises():
    model, params = make_mlp()
    la = Laplace((model, params), "classification", subset_of_weights="all",
                 hessian_structure="diag")
    with pytest.raises((RuntimeError, StopIteration)):
        la.fit(_EmptyLoader())


@pytest.mark.parametrize("mode", ["full", "diag"])
def test_ef_chunk_size_invariance(mode):
    """EF result is chunk-size invariant; kwarg plumbs through Laplace."""
    model, params = make_mlp()
    X, y = classification_data(n=11)
    nnm = NNModel.wrap((model, params))
    results = []
    for chunk in (1, 3, 11, None):
        be = CurvatureBackend(nnm, "classification", curv_type="ef",
                              ef_chunk_size=chunk)
        if mode == "full":
            loss, H = be.full(X, y)
        else:
            loss, H = be.diag(X, y)
        results.append((np.asarray(loss), np.asarray(H)))
    for loss, H in results[1:]:
        np.testing.assert_allclose(loss, results[0][0], rtol=1e-12)
        np.testing.assert_allclose(H, results[0][1], rtol=1e-10, atol=1e-12)


def test_ef_chunk_kwarg_via_laplace():
    model, params = make_mlp()
    X, y = classification_data(n=9)
    la = Laplace((model, params), "classification", subset_of_weights="all",
                 hessian_structure="diag", backend="ef",
                 backend_kwargs={"ef_chunk_size": 2})
    la.fit(ArrayLoader(X, y, batch_size=9))
    assert la.backend.ef_chunk_size == 2
    la2 = Laplace((model, params), "classification", subset_of_weights="all",
                  hessian_structure="diag", backend="ef")
    la2.fit(ArrayLoader(X, y, batch_size=9))
    np.testing.assert_allclose(np.asarray(la.H), np.asarray(la2.H),
                               rtol=1e-10, atol=1e-12)


def test_ef_chunk_validation():
    model, params = make_mlp()
    nnm = NNModel.wrap((model, params))
    with pytest.raises(ValueError, match="ef_chunk_size"):
        CurvatureBackend(nnm, "classification", curv_type="ef", ef_chunk_size=0)


def test_default_ef_chunk_memory_aware():
    assert _default_ef_chunk(100) == 128  # tiny model: max chunk
    assert _default_ef_chunk(10**9) == 4  # huge model: min chunk
    mid = _default_ef_chunk(10**6, itemsize=4)
    assert 4 <= mid <= 128
    # monotone non-increasing in P
    assert _default_ef_chunk(10**5) >= _default_ef_chunk(10**7)
