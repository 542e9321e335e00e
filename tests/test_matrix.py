"""Math-identity tests for Kron / KronDecomposed.

Mirrors the reference's `tests/test_matrix.py` strategy: decompose-reconstruction,
logdet vs dense, bmm exponents (1, -1, -0.5) vs dense matrix powers, diag vs dense.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.utils import Kron, KronDecomposed
from laplace_jax.utils.linalg import block_diag, kron as kron_prod

from .utils import get_psd_matrix, make_mlp


@pytest.fixture
def small_kron():
    # two groups: a 2-factor (3x3) ⊗ (2x2) weight group and a 1-factor bias group
    A = get_psd_matrix(3, seed=1)
    B = get_psd_matrix(2, seed=2)
    F = get_psd_matrix(2, seed=3)
    return Kron([(A, B), (F,)])


def dense_of(k: Kron):
    return np.asarray(k.to_matrix())


def test_init_from_params_shapes():
    _, params = make_mlp(in_dim=3, hidden=5, out_dim=2)
    k = Kron.init_from_params(params)
    # flax order per Dense layer: bias then kernel
    sizes = [F[0].shape[0] if len(F) == 1 else (F[0].shape[0], F[1].shape[0])
             for F in k.kfacs]
    assert sizes == [5, (3, 5), 2, (5, 2)]
    assert sum(k.group_sizes) == 5 + 15 + 2 + 10


def test_add_and_mul(small_kron):
    # __add__ is factor-wise (KFAC accumulation): 2-factor blocks quadruple,
    # 1-factor blocks double (reference `matrix.py:79-98` semantics)
    k2 = small_kron + small_kron
    d, d2 = dense_of(small_kron), dense_of(k2)
    np.testing.assert_allclose(d2[:6, :6], 4 * d[:6, :6], rtol=1e-10)
    np.testing.assert_allclose(d2[6:, 6:], 2 * d[6:, 6:], rtol=1e-10)
    # scalar multiply distributes scalar**(1/len(F)) so the dense product of
    # every block scales linearly (reference `matrix.py:100-118`)
    k3 = small_kron * 3.0
    np.testing.assert_allclose(dense_of(k3), 3 * dense_of(small_kron), rtol=1e-10)


def test_decompose_reconstruction(small_kron):
    kd = small_kron.decompose()
    np.testing.assert_allclose(
        np.asarray(kd.to_matrix(exponent=1)), dense_of(small_kron), atol=1e-8
    )


def test_logdet_vs_dense(small_kron):
    kd = small_kron.decompose() + jnp.asarray(0.1)
    M = dense_of(small_kron)
    # delta adds 0.1 to the kron-eigenvalue grid, i.e. to the full eigenspectrum
    # of each block -> equals logdet of (block + 0.1 I) in the kron eigenbasis
    dense = np.asarray(kd.to_matrix(exponent=1))
    sign, expected = np.linalg.slogdet(dense)
    assert sign > 0
    np.testing.assert_allclose(float(kd.logdet()), expected, rtol=1e-8)
    # undeltaed logdet matches the raw Kron logdet for PD factors
    np.testing.assert_allclose(
        float(small_kron.logdet()), np.linalg.slogdet(M)[1], rtol=1e-8
    )


@pytest.mark.parametrize("exponent", [1.0, -1.0, -0.5])
def test_bmm_exponents(small_kron, exponent):
    kd = small_kron.decompose() + jnp.asarray(0.2)
    dense = np.asarray(kd.to_matrix(exponent=exponent))
    rng = np.random.default_rng(0)
    W = jnp.asarray(rng.standard_normal((4, 3, sum(small_kron.group_sizes))))
    got = np.asarray(kd.bmm(W, exponent=exponent))
    expected = np.einsum("pq,bkq->bkp", dense, np.asarray(W))
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_kron_bmm_exponent_one(small_kron):
    rng = np.random.default_rng(0)
    P = sum(small_kron.group_sizes)
    W = jnp.asarray(rng.standard_normal((4, 3, P)))
    got = np.asarray(small_kron.bmm(W))
    expected = np.einsum("pq,bkq->bkp", dense_of(small_kron), np.asarray(W))
    np.testing.assert_allclose(got, expected, atol=1e-10)
    # 1-dim and 2-dim variants
    v = jnp.asarray(rng.standard_normal(P))
    np.testing.assert_allclose(
        np.asarray(small_kron.bmm(v)), dense_of(small_kron) @ np.asarray(v), atol=1e-10
    )


def test_diag_vs_dense(small_kron):
    np.testing.assert_allclose(
        np.asarray(small_kron.diag()), np.diag(dense_of(small_kron)), atol=1e-10
    )
    kd = small_kron.decompose() + jnp.asarray(0.3)
    np.testing.assert_allclose(
        np.asarray(kd.diag(exponent=-1)),
        np.diag(np.asarray(kd.to_matrix(exponent=-1))),
        atol=1e-8,
    )


def test_damping_semantics(small_kron):
    delta = jnp.asarray(0.5)
    kd = small_kron.decompose(damping=True) + delta
    # damped eigen grid is (lA + sqrt(d)) x (lB + sqrt(d)) for 2-factor groups
    lA, lB = kd.eigenvalues[0]
    expected_grid = np.outer(
        np.asarray(lA) + np.sqrt(0.5), np.asarray(lB) + np.sqrt(0.5)
    )
    QA, QB = kd.eigenvectors[0]
    Q = np.asarray(kron_prod(QA, QB))
    dense_block = Q @ np.diag(expected_grid.ravel()) @ Q.T
    got = np.asarray(kd.to_matrix(exponent=1))[:6, :6]
    np.testing.assert_allclose(got, dense_block, atol=1e-8)


def test_inv_square_form(small_kron):
    kd = small_kron.decompose() + jnp.asarray(0.2)
    P = sum(small_kron.group_sizes)
    rng = np.random.default_rng(1)
    W = jnp.asarray(rng.standard_normal((4, 3, P)))
    got = np.asarray(kd.inv_square_form(W))
    Pinv = np.asarray(kd.to_matrix(exponent=-1))
    expected = np.einsum("bkp,pq,blq->bkl", np.asarray(W), Pinv, np.asarray(W))
    np.testing.assert_allclose(got, expected, atol=1e-8)


def test_kron_is_pytree(small_kron):
    leaves, treedef = jax.tree_util.tree_flatten(small_kron)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(dense_of(rebuilt), dense_of(small_kron))

    # usable inside jit: sum two Krons
    @jax.jit
    def add(a, b):
        return a + b

    doubled = add(small_kron, small_kron)
    d, d2 = dense_of(small_kron), dense_of(doubled)
    np.testing.assert_allclose(d2[:6, :6], 4 * d[:6, :6], rtol=1e-10)
    np.testing.assert_allclose(d2[6:, 6:], 2 * d[6:, 6:], rtol=1e-10)


def test_logdet_differentiable_in_delta(small_kron):
    kd = small_kron.decompose()

    def f(delta):
        return (kd + delta).logdet()

    g = jax.grad(f)(jnp.asarray(0.5))
    # d/dd logdet(M + d I) = trace((M + d I)^{-1})
    dense = np.asarray((kd + jnp.asarray(0.5)).to_matrix(exponent=-1))
    np.testing.assert_allclose(float(g), np.trace(dense), rtol=1e-6)
