"""Oracles for SBR stage A (`laplace_jax.ops.band.band_reduce`).

Checks, at LAPACK-parity tolerances in f64: the output is banded, the
transform is an exact similarity (Q B Q^T = A with Q rebuilt from the
returned reflectors via `apply_q`), Q is orthogonal, and eigenvalues are
preserved — across sizes that exercise padding, window classes, and
multiple panels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.ops.band import band_reduce
from laplace_jax.ops.tridiag import apply_q


def _spd(k, n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((k, n, n)).astype(dtype)
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n)


@pytest.mark.parametrize(
    "k,n,b",
    [
        (2, 16, 4),
        (1, 33, 8),   # odd n, tail panel
        (3, 64, 8),
        (2, 96, 16),  # multiple window classes
        (1, 130, 32),
        (2, 40, 64),  # n < b+2: no-op path
    ],
)
def test_band_similarity_and_orthogonality(k, n, b):
    A = _spd(k, n, seed=n + b)
    B, V, taus = band_reduce(A, b=b)
    Bn = np.asarray(B)
    # banded
    i = np.arange(n)
    outside = np.abs(i[:, None] - i[None, :]) > b
    if outside.any():
        assert np.abs(Bn[:, outside]).max() < 1e-10
    # symmetric
    np.testing.assert_allclose(Bn, np.swapaxes(Bn, 1, 2), atol=1e-12)
    # Q orthogonal and Q B Q^T = A
    Q = np.asarray(
        apply_q(V, taus, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype),
                                          (k, n, n)))
    )
    for kk in range(k):
        np.testing.assert_allclose(
            Q[kk].T @ Q[kk], np.eye(n), atol=1e-12
        )
        np.testing.assert_allclose(
            Q[kk] @ Bn[kk] @ Q[kk].T, np.asarray(A)[kk], atol=1e-9
        )
    # spectrum preserved
    for kk in range(k):
        np.testing.assert_allclose(
            np.linalg.eigvalsh(Bn[kk]),
            np.linalg.eigvalsh(np.asarray(A)[kk]),
            atol=1e-9,
        )


def test_band_reduce_f32_accuracy():
    A = _spd(2, 128, seed=7, dtype=np.float32)
    B, V, taus = band_reduce(A, b=16)
    Q = np.asarray(
        apply_q(V, taus, jnp.broadcast_to(jnp.eye(128, dtype=A.dtype),
                                          (2, 128, 128))),
        np.float64,
    )
    Bn = np.asarray(B, np.float64)
    An = np.asarray(A, np.float64)
    nrm = np.abs(An).max()
    for kk in range(2):
        assert np.abs(Q[kk].T @ Q[kk] - np.eye(128)).max() < 1e-5
        assert np.abs(Q[kk] @ Bn[kk] @ Q[kk].T - An[kk]).max() / nrm < 1e-5


def test_band_reduce_rank_deficient():
    """Zero rows/columns (dead units in a KFAC factor) take the trivial-
    reflector path without NaNs."""
    A = np.array(_spd(1, 48, seed=3))
    A[:, 10:20, :] = 0.0
    A[:, :, 10:20] = 0.0
    B, V, taus = band_reduce(jnp.asarray(A), b=8)
    assert np.isfinite(np.asarray(B)).all()
    np.testing.assert_allclose(
        np.linalg.eigvalsh(np.asarray(B)[0]),
        np.linalg.eigvalsh(A[0]),
        atol=1e-9,
    )
