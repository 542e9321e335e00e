"""Multi-device Kron.decompose == single-device (virtual 8-CPU mesh).

The decompose epilogue dominates single-chip KFAC fit wall time; per-factor
eigh problems are independent, so `Kron.decompose(devices=...)` spreads them
across a mesh with greedy cost balancing (see `utils/matrix.py`). No
reference counterpart (single-device library, SURVEY.md §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import KronLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.parallel import DataParallel, data_mesh
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.matrix import Kron

from .utils import classification_data, make_mlp


def _random_kron(seed=0):
    rng = np.random.default_rng(seed)
    kfacs = []
    for n_in, n_out in [(17, 5), (9, 3), (33, 7)]:
        A = rng.standard_normal((n_in, n_in))
        B = rng.standard_normal((n_out, n_out))
        kfacs.append((jnp.asarray(A @ A.T), jnp.asarray(B @ B.T)))
        bias = rng.standard_normal((n_out, n_out))
        kfacs.append((jnp.asarray(bias @ bias.T),))
    return Kron(kfacs)


def test_multi_device_decompose_matches_single():
    K = _random_kron()
    ref = K.decompose()
    multi = K.decompose(devices=jax.devices())
    assert len(jax.devices()) == 8
    for (Qr, lr), (Qm, lm) in zip(
        zip(ref.eigenvectors, ref.eigenvalues),
        zip(multi.eigenvectors, multi.eigenvalues),
    ):
        for qr, qm, er, em in zip(Qr, Qm, lr, lm):
            np.testing.assert_allclose(np.asarray(er), np.asarray(em),
                                       rtol=1e-10, atol=1e-12)
            # eigenvectors may differ by sign/rotation within degenerate
            # eigenspaces; compare the reconstructed matrices
            Rr = np.asarray(qr) * np.asarray(er) @ np.asarray(qr).T
            Rm = np.asarray(qm) * np.asarray(em) @ np.asarray(qm).T
            np.testing.assert_allclose(Rr, Rm, rtol=1e-8, atol=1e-10)


def test_multi_device_decompose_mesh_argument():
    K = _random_kron(1)
    ref = K.decompose()
    multi = K.decompose(devices=data_mesh())
    deltas = jnp.ones(len(K))
    np.testing.assert_allclose(
        np.asarray((multi + deltas).logdet()),
        np.asarray((ref + deltas).logdet()),
        rtol=1e-10,
    )


def test_kron_fit_with_parallel_decomposes_on_mesh():
    model, params = make_mlp()
    nnm = NNModel.from_flax(model, params)
    X, y = classification_data(n=32)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=16)

    la_ref = KronLaplace(nnm, "classification")
    la_ref.fit(loader)
    la_dp = KronLaplace(nnm, "classification",
                        parallel=DataParallel(data_mesh()))
    la_dp.fit(loader)

    np.testing.assert_allclose(
        np.asarray(la_dp.log_marginal_likelihood()),
        np.asarray(la_ref.log_marginal_likelihood()),
        rtol=1e-8,
    )
    Xs = jnp.asarray(np.asarray(X[:5]))
    np.testing.assert_allclose(
        np.asarray(la_dp(Xs)), np.asarray(la_ref(Xs)), rtol=1e-6, atol=1e-8
    )
