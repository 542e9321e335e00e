"""Oracles for the blocked Householder tridiagonalization (stage 1 of the
two-stage eigensolver, `laplace_jax.ops.tridiag`).

Checks, in float64 on CPU: A == Q T Q^T with T assembled from (d, e) and
Q = apply_q(V, taus, I); Q orthonormal; eig(T) == eig(A). Sizes straddle the
panel width and window-class boundaries, plus tiny-n direct paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.ops.tridiag import apply_q, tridiagonalize


def _sym_stack(rng, k, n):
    A = rng.standard_normal((k, n, n))
    return jnp.asarray((A + A.transpose(0, 2, 1)) / 2)


def _assemble_T(d, e):
    d, e = np.asarray(d), np.asarray(e)
    K, n = d.shape
    T = np.zeros((K, n, n))
    for k in range(K):
        T[k] = np.diag(d[k]) + np.diag(e[k], -1) + np.diag(e[k], 1)
    return T


def _check(A, nb=16, n_classes=4, tol=1e-11):
    K, n, _ = A.shape
    d, e, V, taus = tridiagonalize(A, nb=nb, n_classes=n_classes)
    T = _assemble_T(d, e)
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (K, n, n))
    Q = np.asarray(apply_q(V, taus, I, nb=nb))
    rec = np.einsum("kij,kjl,kml->kim", Q, T, Q)
    np.testing.assert_allclose(rec, np.asarray(A), atol=tol)
    orth = np.einsum("kij,kil->kjl", Q, Q)
    np.testing.assert_allclose(
        orth, np.broadcast_to(np.eye(n), (K, n, n)), atol=tol
    )
    for k in range(K):
        np.testing.assert_allclose(
            np.sort(np.linalg.eigvalsh(T[k])),
            np.sort(np.linalg.eigvalsh(np.asarray(A[k]))),
            atol=tol * max(1.0, float(jnp.abs(A[k]).max())),
        )


@pytest.mark.parametrize("k,n", [(3, 17), (2, 65), (1, 200), (4, 33)])
def test_tridiagonalize_roundtrip(k, n):
    rng = np.random.default_rng(0)
    _check(_sym_stack(rng, k, n))


def test_nonuniform_window_boundaries():
    rng = np.random.default_rng(1)
    # n not a multiple of nb or the class granularity
    _check(_sym_stack(rng, 2, 143), nb=32, n_classes=3)


@pytest.mark.parametrize("n", [1, 2, 3])
def test_tiny_n(n):
    rng = np.random.default_rng(2)
    _check(_sym_stack(rng, 2, n))


def test_psd_kfac_like_spectrum():
    rng = np.random.default_rng(3)
    n = 96
    Q = np.linalg.qr(rng.standard_normal((2, n, n)))[0]
    lam = np.exp(-np.linspace(0.0, 10.0, n))[None] * (1 + rng.random((2, n)))
    A = np.einsum("kij,kj,klj->kil", Q, lam, Q)
    _check(jnp.asarray((A + np.swapaxes(A, 1, 2)) / 2))


def test_float32():
    rng = np.random.default_rng(4)
    A = _sym_stack(rng, 2, 80).astype(jnp.float32)
    d, e, V, taus = tridiagonalize(A, nb=16, n_classes=4)
    T = _assemble_T(d, e)
    I = jnp.broadcast_to(jnp.eye(80, dtype=A.dtype), (2, 80, 80))
    Q = np.asarray(apply_q(V, taus, I, nb=16))
    rec = np.einsum("kij,kjl,kml->kim", Q, T, Q)
    np.testing.assert_allclose(rec, np.asarray(A), atol=5e-5)
