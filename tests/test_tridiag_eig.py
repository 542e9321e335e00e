"""Oracles for the batched tridiagonal secular D&C eigensolver and the full
two-stage `eigh_stack_ts` path (`laplace_jax.ops.tridiag_eig`).

LAPACK-parity targets in float64 on CPU: eigenvalues, orthogonality, and
reconstruction all at ~n*eps. The merge kernel is additionally stressed on
the classic secular hard cases — tiny rho (nearly-deflated whole update),
wide-dynamic-range z (gray-zone entries between deflation and O(1)),
duplicate and clustered poles — and float32 end-to-end accuracy is pinned
on a KFAC-like decayed PSD spectrum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.ops.tridiag_eig import (
    _jacobi_eigh,
    _merge_level,
    eigh_stack_ts,
    tridiag_eigh,
)


def _tridiag_dense(d, e):
    d, e = np.asarray(d), np.asarray(e)
    K, n = d.shape
    T = np.zeros((K, n, n))
    for k in range(K):
        T[k] = np.diag(d[k]) + np.diag(e[k], 1) + np.diag(e[k], -1)
    return T


def _check_eigh(A, vals, vecs, tol):
    A = np.asarray(A, np.float64)
    vals = np.asarray(vals, np.float64)
    vecs = np.asarray(vecs, np.float64)
    K, n, _ = A.shape
    ref = np.sort(np.linalg.eigvalsh(A), axis=1)
    np.testing.assert_allclose(vals, ref, atol=tol, rtol=tol)
    G = np.einsum("kji,kjl->kil", vecs, vecs)
    np.testing.assert_allclose(
        G, np.broadcast_to(np.eye(n), (K, n, n)), atol=tol
    )
    R = np.einsum("kij,kj,klj->kil", vecs, vals, vecs)
    np.testing.assert_allclose(R, A, atol=tol)


def test_jacobi_base():
    rng = np.random.default_rng(0)
    for B, m in [(4, 7), (6, 36), (2, 48), (3, 1)]:
        A = rng.standard_normal((B, m, m))
        A = jnp.asarray((A + A.transpose(0, 2, 1)) / 2)
        vals, vecs = _jacobi_eigh(A)
        _check_eigh(A, vals, vecs, 1e-11)


def _merge_check(D, z, rho, tol=1e-12):
    D = np.atleast_2d(D).astype(float)
    z = np.atleast_2d(z).astype(float)
    M = D.shape[1]
    U = np.broadcast_to(np.eye(M), (1, M, M)).copy()
    lam, Un = _merge_level(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray([rho]),
        jnp.asarray(z), 40, 3,
    )
    A = (np.diag(D[0]) + rho * np.outer(z[0], z[0]))[None]
    _check_eigh(A, lam, Un, tol)


def test_merge_secular_hard_cases():
    rng = np.random.default_rng(1)
    M = 32
    ds = np.sort(rng.standard_normal(M))
    _merge_check(ds, rng.standard_normal(M), 0.7)
    # tiny rho: whole update nearly deflates; needs RELATIVE root accuracy
    _merge_check(np.sort(rng.standard_normal(M)), rng.standard_normal(M),
                 1e-14)
    # gray-zone z entries (the sqrt(eps) trap for quadratic deflation tests)
    _merge_check(np.sort(rng.standard_normal(M)),
                 rng.standard_normal(M) * np.exp(-30 * rng.random(M)), 1.5)
    # duplicate + clustered poles -> run deflation closed form
    D = np.sort(rng.standard_normal(M))
    D[5] = D[4]
    D[6] = D[4]
    _merge_check(D, rng.standard_normal(M), 1.3)
    D2 = np.sort(rng.standard_normal(M))
    D2[10:15] = D2[10]
    z = rng.standard_normal(M)
    z[11] = 0.0
    _merge_check(D2, z, 2.0)
    # rho = 0: pure permutation merge
    _merge_check(np.sort(rng.standard_normal(M)), rng.standard_normal(M),
                 0.0)


@pytest.mark.parametrize("k,n", [(3, 50), (2, 130), (1, 300), (2, 144)])
def test_tridiag_eigh_random(k, n):
    rng = np.random.default_rng(2)
    d = jnp.asarray(rng.standard_normal((k, n)))
    e = jnp.asarray(rng.standard_normal((k, n - 1)))
    lam, U = tridiag_eigh(d, e)
    _check_eigh(_tridiag_dense(d, e), lam, U, 5e-13)


def test_tridiag_eigh_tiny_and_base_sizes():
    rng = np.random.default_rng(3)
    for n in [1, 2, 3, 17, 48]:
        d = jnp.asarray(rng.standard_normal((2, n)))
        e = jnp.asarray(rng.standard_normal((2, max(n - 1, 0))))
        lam, U = tridiag_eigh(d, e)
        _check_eigh(_tridiag_dense(d, e), lam, U, 1e-11)


def test_tridiag_eigh_zero_couplings():
    # decoupled blocks (e = 0 at merge boundaries) exercise rho = 0 merges
    rng = np.random.default_rng(4)
    n = 96
    d = rng.standard_normal((2, n))
    e = rng.standard_normal((2, n - 1))
    e[:, 31] = 0.0
    e[:, 63] = 0.0
    lam, U = tridiag_eigh(jnp.asarray(d), jnp.asarray(e))
    _check_eigh(_tridiag_dense(d, e), lam, U, 5e-13)


def _psd_stack(rng, k, n, decay, dtype):
    Q = np.linalg.qr(rng.standard_normal((k, n, n)))[0]
    lam = np.exp(-np.linspace(0.0, decay, n))[None] * (1 + rng.random((k, n)))
    A = np.einsum("kij,kj,klj->kil", Q, lam, Q)
    return jnp.asarray((A + np.swapaxes(A, 1, 2)) / 2, dtype=dtype)


def test_eigh_stack_ts_psd_f64():
    rng = np.random.default_rng(5)
    A = _psd_stack(rng, 2, 256, 18.0, jnp.float64)
    vals, vecs = eigh_stack_ts(A)
    _check_eigh(A, vals, vecs, 1e-12)


def test_eigh_stack_ts_indefinite_f64():
    rng = np.random.default_rng(6)
    A = rng.standard_normal((2, 200, 200))
    A = jnp.asarray((A + A.transpose(0, 2, 1)) / 2)
    vals, vecs = eigh_stack_ts(A)
    _check_eigh(A, vals, vecs, 1e-12)


def test_eigh_stack_ts_f32_kfac_spectrum():
    # decayed spectrum clusters at ~0 below f32 noise: the CholeskyQR2
    # polish must hold orthogonality at ~eps32 level
    rng = np.random.default_rng(7)
    A = _psd_stack(rng, 2, 256, 18.0, jnp.float32)
    vals, vecs = eigh_stack_ts(A)
    _check_eigh(A, vals, vecs, 2e-5)


def test_eigh_stack_ts_sizes_straddle_padding():
    # sizes that need pad entries (n not m0 * 2^L) and sizes that fit exactly
    rng = np.random.default_rng(8)
    for n in [129, 257, 384, 100]:
        A = rng.standard_normal((1, n, n))
        A = jnp.asarray((A + A.transpose(0, 2, 1)) / 2)
        vals, vecs = eigh_stack_ts(A)
        _check_eigh(A, vals, vecs, 5e-12)
