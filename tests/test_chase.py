"""Oracles for SBR stage B (`laplace_jax.ops.chase`): band -> tridiagonal
bulge chasing and the grouped compact-WY application of the chase transform.

Checks at LAPACK-parity tolerances in f64: the output is exactly
tridiagonal-consistent (spectrum preserved), the chase transform rebuilt via
`apply_chase_q` is orthogonal and an exact similarity, the grouped-WY apply
matches a naive per-reflector reference, and the FULL SBR chain
(band_reduce -> band_to_tridiag -> tridiag_eigh -> apply_chase_q -> apply_q)
reproduces `numpy.linalg.eigh` — the same oracle battery as
`tests/test_tridiag_eig.py` for the one-stage path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.ops.band import band_reduce
from laplace_jax.ops.chase import apply_chase_q, band_to_tridiag
from laplace_jax.ops.tridiag import apply_q


def _spd(k, n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((k, n, n)).astype(dtype)
    return np.einsum("kij,klj->kil", A, A) / n


def _band_of(A, b):
    k, n, _ = A.shape
    i = np.arange(n)
    mask = np.abs(i[:, None] - i[None, :]) <= b
    return A * mask[None]


def _tridiag_dense(d, e):
    K, n = d.shape
    T = np.zeros((K, n, n), d.dtype)
    i = np.arange(n)
    T[:, i, i] = d
    T[:, i[:-1], i[1:]] = e
    T[:, i[1:], i[:-1]] = e
    return T


def _q_naive(Vlog, taulog, n, b):
    """Reference Q: apply reflectors one by one in execution order.

    Q = H_0 H_1 ... with H in time order time(s, t) = 3 s + t; reflector
    (s, t) sits in Vlog[:, s + t*b + 1 : s + (t+1)*b + 1, s]."""
    K = Vlog.shape[0]
    n_sweeps = Vlog.shape[2]
    TCAP = taulog.shape[1]
    tasks = []
    for s in range(n_sweeps):
        for t in range(TCAP):
            tasks.append((3 * s + t, s, t))
    tasks.sort()
    Q = np.broadcast_to(np.eye(n, dtype=Vlog.dtype), (K, n, n)).copy()
    for _, s, t in tasks:
        r0 = s + t * b + 1
        if r0 >= n:
            continue
        tau = np.asarray(taulog[:, t, s])
        if np.all(tau == 0):
            continue
        v = np.zeros((K, n), Vlog.dtype)
        r1 = min(r0 + b, n)
        v[:, r0:r1] = np.asarray(Vlog[:, r0:r1, s])
        # right-multiply: Q <- Q @ H (execution order => product order)
        Qv = Q @ v[:, :, None]  # (K, n, 1)
        Q = Q - tau[:, None, None] * Qv * v[:, None, :]
    return Q


@pytest.mark.parametrize(
    "k,n,b",
    [
        (2, 24, 4),
        (1, 37, 4),   # n not a multiple of b
        (2, 40, 8),
        (1, 70, 16),
        (3, 33, 8),
        (1, 20, 16),  # chain length 1-2
        (2, 6, 2),    # minimal bandwidth
    ],
)
def test_chase_similarity_spectrum_orthogonality(k, n, b):
    A = _band_of(_spd(k, n, seed=n * 7 + b), b)
    d, e, Vlog, taulog = band_to_tridiag(jnp.asarray(A), b=b)
    d, e = np.asarray(d), np.asarray(e)
    T = _tridiag_dense(d, e)
    # spectrum preserved by the chase
    for kk in range(k):
        np.testing.assert_allclose(
            np.linalg.eigvalsh(T[kk]), np.linalg.eigvalsh(A[kk]), atol=1e-9
        )
    # Q from grouped-WY apply: orthogonal, and Q T Q^T = A
    Q = np.asarray(
        apply_chase_q(
            Vlog, taulog,
            jnp.broadcast_to(jnp.eye(n, dtype=jnp.float64), (k, n, n)), b=b,
        )
    )
    for kk in range(k):
        np.testing.assert_allclose(Q[kk].T @ Q[kk], np.eye(n), atol=1e-11)
        np.testing.assert_allclose(
            Q[kk] @ T[kk] @ Q[kk].T, A[kk], atol=1e-9
        )


@pytest.mark.parametrize("k,n,b,g", [(2, 40, 8, 8), (1, 52, 4, 3), (2, 33, 8, 5)])
def test_grouped_wy_matches_naive_reference(k, n, b, g):
    A = _band_of(_spd(k, n, seed=n + b), b)
    d, e, Vlog, taulog = band_to_tridiag(jnp.asarray(A), b=b)
    Q_ref = _q_naive(Vlog, taulog, n, b)
    S = jnp.asarray(_spd(k, n, seed=5)[:, :, : n // 2 + 1])
    got = np.asarray(apply_chase_q(Vlog, taulog, S, b=b, g=g))
    want = Q_ref @ np.asarray(S)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_chase_rank_deficient():
    """Zero blocks (dead units) take trivial reflectors without NaNs."""
    A = _band_of(_spd(1, 40, seed=3), 8)
    A[:, 10:20, :] = 0.0
    A[:, :, 10:20] = 0.0
    A = _band_of(A, 8)
    d, e, Vlog, taulog = band_to_tridiag(jnp.asarray(A), b=8)
    assert np.isfinite(np.asarray(d)).all()
    assert np.isfinite(np.asarray(e)).all()
    T = _tridiag_dense(np.asarray(d), np.asarray(e))
    np.testing.assert_allclose(
        np.linalg.eigvalsh(T[0]), np.linalg.eigvalsh(A[0]), atol=1e-9
    )


@pytest.mark.parametrize("k,n,b", [(2, 48, 8), (1, 75, 16), (2, 96, 32)])
def test_full_sbr_chain_matches_lapack(k, n, b):
    """band_reduce -> chase -> D&C -> back-transforms == numpy eigh."""
    from laplace_jax.ops.tridiag_eig import tridiag_eigh

    A = _spd(k, n, seed=n)
    Bb, V1, t1 = band_reduce(jnp.asarray(A), b=b)
    d, e, V2, t2 = band_to_tridiag(Bb, b=b)
    lam, Ut = tridiag_eigh(d, e)
    U2 = apply_chase_q(V2, t2, Ut, b=b)
    vecs = np.asarray(apply_q(V1, t1, U2))
    lam = np.asarray(lam)
    for kk in range(k):
        w_ref = np.linalg.eigvalsh(A[kk])
        np.testing.assert_allclose(lam[kk], w_ref, atol=1e-9)
        V = vecs[kk]
        np.testing.assert_allclose(V.T @ V, np.eye(n), atol=1e-10)
        np.testing.assert_allclose(
            V @ np.diag(lam[kk]) @ V.T, A[kk], atol=1e-8
        )
