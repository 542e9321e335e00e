"""Correctness oracles for the level-batched spectral D&C eigensolver.

`eigh_stack_dc` must be a drop-in for `jnp.linalg.eigh` on a (k, n, n) stack:
ascending eigenvalues, orthonormal eigenvectors, exact reconstruction. Tested
against LAPACK on CPU in float64 (tight) and float32 (loose), over PSD
KFAC-like heavy-tailed spectra, indefinite matrices, near-diagonal and
rank-deficient edge cases, and sizes straddling the termination/bucket
boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.ops.eigh_dc import eigh_stack_dc


def _psd_stack(rng, k, n, decay=8.0, dtype=jnp.float64):
    Q = np.linalg.qr(rng.standard_normal((k, n, n)))[0]
    lam = np.exp(-np.linspace(0.0, decay, n))[None] * (1 + rng.random((k, n)))
    A = np.einsum("kij,kj,klj->kil", Q, lam, Q)
    return jnp.asarray((A + np.swapaxes(A, 1, 2)) / 2, dtype=dtype)


def _check(A, vals, vecs, tol):
    ref_vals, _ = jnp.linalg.eigh(A)
    np.testing.assert_allclose(vals, ref_vals, atol=tol, rtol=tol)
    R = jnp.einsum("kij,kj,klj->kil", vecs, vals, vecs)
    np.testing.assert_allclose(R, A, atol=tol)
    I = jnp.eye(A.shape[-1], dtype=A.dtype)
    G = jnp.einsum("kji,kjl->kil", vecs, vecs)
    np.testing.assert_allclose(G, jnp.broadcast_to(I, G.shape), atol=tol)


@pytest.mark.parametrize("k,n", [(3, 300), (1, 520), (2, 257)])
def test_psd_stack_matches_lapack_f64(k, n):
    rng = np.random.default_rng(0)
    A = _psd_stack(rng, k, n)
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    _check(A, vals, vecs, 1e-9)


def test_indefinite_stack():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((2, 400, 400))
    A = jnp.asarray((A + np.swapaxes(A, 1, 2)) / 2)
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    _check(A, vals, vecs, 1e-9)


def test_float32_psd():
    rng = np.random.default_rng(2)
    A = _psd_stack(rng, 2, 384, decay=6.0, dtype=jnp.float32)
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    ref_vals, _ = jnp.linalg.eigh(A)
    # f32 QDWH D&C: absolute error scales with ||A||~1
    np.testing.assert_allclose(vals, ref_vals, atol=5e-4)
    R = jnp.einsum("kij,kj,klj->kil", vecs, vals, vecs)
    np.testing.assert_allclose(R, A, atol=5e-4)


def test_small_n_direct_path():
    rng = np.random.default_rng(3)
    A = _psd_stack(rng, 4, 64)
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    _check(A, vals, vecs, 1e-10)


def test_near_diagonal_early_exit():
    rng = np.random.default_rng(4)
    n = 300
    d = np.sort(rng.random(n))
    A = np.diag(d) + 1e-300 * rng.standard_normal((n, n))
    A = jnp.asarray((A + A.T) / 2)[None]
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    _check(A, vals, vecs, 1e-9)


def test_rank_deficient():
    rng = np.random.default_rng(5)
    n, r = 320, 10
    U = np.linalg.qr(rng.standard_normal((n, r)))[0]
    A = jnp.asarray(U @ np.diag(1 + rng.random(r)) @ U.T)[None]
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    ref_vals, _ = jnp.linalg.eigh(A)
    np.testing.assert_allclose(vals, ref_vals, atol=1e-8)
    R = jnp.einsum("kij,kj,klj->kil", vecs, vals, vecs)
    np.testing.assert_allclose(R, A, atol=1e-8)


def test_identical_eigenvalues():
    # c*I triggers the nearly-diagonal exit at the first level
    A = 3.0 * jnp.broadcast_to(jnp.eye(300), (2, 300, 300))
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    _check(A, vals, vecs, 1e-10)


def test_mixed_scale_stack():
    # factors of wildly different norms in one stack (KFAC reality)
    rng = np.random.default_rng(6)
    A = _psd_stack(rng, 3, 280)
    A = A * jnp.asarray([1e-6, 1.0, 1e6])[:, None, None]
    vals, vecs = eigh_stack_dc(A, termination_size=128)
    ref_vals, _ = jnp.linalg.eigh(A)
    for i in range(3):
        s = float(jnp.max(jnp.abs(ref_vals[i])))
        np.testing.assert_allclose(vals[i] / s, ref_vals[i] / s, atol=1e-9)


def test_scale_alone_matches():
    # each scaled matrix solved alone (exercises k=1 padding paths)
    rng = np.random.default_rng(6)
    A = _psd_stack(rng, 3, 280)
    for i, s in enumerate([1e-6, 1.0, 1e6]):
        H = (A[i] * s)[None]
        vals, vecs = eigh_stack_dc(H, termination_size=128)
        ref_vals, _ = jnp.linalg.eigh(H)
        sc = float(jnp.max(jnp.abs(ref_vals)))
        np.testing.assert_allclose(vals / sc, ref_vals / sc, atol=1e-9)
        I = jnp.eye(280)
        np.testing.assert_allclose(vecs[0].T @ vecs[0], I, atol=1e-9)


def test_pooled_multi_class():
    # several shape classes pooled through one driver run
    from laplace_jax.ops.eigh_dc import eigh_pooled_dc

    rng = np.random.default_rng(7)
    stacks = [_psd_stack(rng, 2, 300), _psd_stack(rng, 3, 200, decay=4.0),
              _psd_stack(rng, 1, 410)]
    outs = eigh_pooled_dc(stacks, termination_size=128)
    for A, (vals, vecs) in zip(stacks, outs):
        _check(A, vals, vecs, 1e-9)
