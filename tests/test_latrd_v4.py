"""Oracles for the symmetric-half STRIP-streaming LATRD kernel
(`laplace_jax.ops.latrd_pallas_v4`) in interpret mode on CPU.

Same invariants as `tests/test_latrd_pallas.py` / `test_latrd_v3.py`:
A == Q T Q^T with Q = apply_q(V, taus, I), Q orthonormal, eig(T) ==
eig(A), and the full two-stage chain. H (chunk height) is swept across
the interesting regimes: H == T (each chunk one tile), H covering whole
strips, and H leaving ragged last chunks that exercise the overrun
masks (chunks crossing the window end and the k-segment boundary).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.ops.latrd_pallas_v4 import tridiagonalize_pallas_v4
from laplace_jax.ops.tridiag import apply_q


def _sym_stack(rng, k, n, dtype=np.float32):
    A = rng.standard_normal((k, n, n))
    return jnp.asarray(((A + A.transpose(0, 2, 1)) / 2).astype(dtype))


def _assemble_T(d, e):
    d, e = np.asarray(d), np.asarray(e)
    K, n = d.shape
    T = np.zeros((K, n, n))
    for k in range(K):
        T[k] = np.diag(d[k]) + np.diag(e[k], -1) + np.diag(e[k], 1)
    return T


def _check(A, nb=16, n_classes=2, T=None, H=None, tol=2e-4):
    K, n, _ = A.shape
    d, e, V, taus = tridiagonalize_pallas_v4(
        A, nb=nb, n_classes=n_classes, T=T, H=H, interpret=True
    )
    Tm = _assemble_T(d, e)
    I = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (K, n, n))
    Q = np.asarray(apply_q(V, taus, I, nb=max(8, min(nb, n))))
    rec = np.einsum("kij,kjl,kml->kim", Q, Tm, Q)
    scale = max(1.0, float(jnp.abs(A).max()))
    np.testing.assert_allclose(rec, np.asarray(A), atol=tol * scale)
    orth = np.einsum("kij,kil->kjl", Q, Q)
    np.testing.assert_allclose(
        orth, np.broadcast_to(np.eye(n), (K, n, n)), atol=tol
    )
    for k in range(K):
        np.testing.assert_allclose(
            np.sort(np.linalg.eigvalsh(Tm[k].astype(np.float64))),
            np.sort(np.linalg.eigvalsh(np.asarray(A[k], np.float64))),
            atol=tol * scale,
        )


@pytest.mark.parametrize("k,n", [(2, 40), (1, 130), (3, 33)])
def test_v4_roundtrip(k, n):
    rng = np.random.default_rng(0)
    _check(_sym_stack(rng, k, n))


@pytest.mark.parametrize("H", [128, 256, 384])
def test_v4_multi_window_chunk_heights(H):
    # n large enough for >1 window class AND >1 tile per window (T=128);
    # H=128: one tile per chunk; 256/384: ragged strips + k-boundary
    # overrun (K=2 planes)
    rng = np.random.default_rng(1)
    _check(_sym_stack(rng, 2, 300), nb=32, n_classes=3, T=128, H=H)


def test_v4_default_H_covers_window():
    # H=None -> min(4T, m): chunks taller than most strips
    rng = np.random.default_rng(5)
    _check(_sym_stack(rng, 2, 260), nb=16, n_classes=2, T=128)


def test_v4_psd_kfac_like_spectrum():
    rng = np.random.default_rng(3)
    n = 64
    Q = np.linalg.qr(rng.standard_normal((2, n, n)))[0]
    lam = np.exp(-np.linspace(0.0, 10.0, n))[None] * (1 + rng.random((2, n)))
    A = np.einsum("kij,kj,klj->kil", Q, lam, Q)
    _check(jnp.asarray(((A + np.swapaxes(A, 1, 2)) / 2).astype(np.float32)))


@pytest.mark.parametrize("n", [1, 2])
def test_v4_tiny_n_delegates(n):
    rng = np.random.default_rng(2)
    A = _sym_stack(rng, 2, n)
    d, e, V, taus = tridiagonalize_pallas_v4(A, interpret=True)
    assert d.shape == (2, n)


def test_v4_feeds_stage2():
    """Full two-stage chain with the v4 stage 1: eigenpairs match numpy."""
    from laplace_jax.ops.tridiag_eig import tridiag_eigh

    rng = np.random.default_rng(4)
    A = _sym_stack(rng, 2, 48)
    d, e, V, taus = tridiagonalize_pallas_v4(A, nb=16, interpret=True)
    lam, Ut = tridiag_eigh(d, e, base_size=16)
    vecs = np.asarray(apply_q(V, taus, Ut, nb=16))
    lam = np.asarray(lam)
    ew = np.linalg.eigvalsh(np.asarray(A, np.float64))
    np.testing.assert_allclose(np.sort(lam, axis=1), ew, atol=2e-4)
    Av = np.einsum("kij,kjl->kil", np.asarray(A, np.float64),
                   vecs.astype(np.float64))
    res = Av - lam[:, None, :] * vecs
    assert np.abs(res).max() < 5e-4


def test_v4_nb_not_multiple_of_8_rounds_down():
    """The kernel's U/W panel writes are 8-row RMW slices; a user nb=20
    must round to 16 instead of writing past the (2nb, KM) panel."""
    rng = np.random.default_rng(6)
    _check(_sym_stack(rng, 2, 130), nb=20)


def test_v4_nb_larger_than_class_granularity():
    """nb above the T-rounded class size: S must round the nb term up to a
    multiple of T or the (K*m, nt, T) tile reshape fails at trace time."""
    rng = np.random.default_rng(7)
    _check(_sym_stack(rng, 2, 300), nb=200, n_classes=4, T=128)


def test_v4_ragged_H_rounds_to_tile():
    """H=100 < T=128 used to give h = H//T = 0 (ZeroDivisionError) and a
    false pl.multiple_of alignment promise; it must round up to T."""
    rng = np.random.default_rng(8)
    _check(_sym_stack(rng, 2, 300), nb=32, n_classes=3, T=128, H=100)
