"""Unit tests for dense linalg + flatten + prior utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from laplace_jax.utils import (
    block_diag,
    expand_prior_precision,
    expand_prior_precision_sizes,
    fix_prior_prec_structure,
    invsqrt_precision,
    kron,
    leaf_specs,
    make_unflatten,
    normal_samples,
    num_params,
    symeig,
    tree_to_vector,
)

from .utils import get_psd_matrix, make_mlp


def test_symeig_psd():
    M = get_psd_matrix(6)
    L, W = symeig(M)
    np.testing.assert_allclose(
        np.asarray(W @ jnp.diag(L) @ W.T), np.asarray(M), atol=1e-8
    )
    assert (np.asarray(L) >= 0).all()


def test_invsqrt_precision():
    M = get_psd_matrix(5) + 0.1 * jnp.eye(5)
    S = invsqrt_precision(M)
    np.testing.assert_allclose(
        np.asarray(S @ S.T), np.linalg.inv(np.asarray(M)), atol=1e-10
    )
    assert np.allclose(np.triu(np.asarray(S), 1), 0.0)  # lower triangular


def test_kron_and_block_diag():
    A = jnp.arange(4.0).reshape(2, 2)
    B = jnp.eye(3)
    np.testing.assert_allclose(np.asarray(kron(A, B)), np.kron(A, B))
    M = block_diag([A, B])
    assert M.shape == (5, 5)
    np.testing.assert_allclose(np.asarray(M[:2, :2]), np.asarray(A))


def test_flatten_roundtrip():
    _, params = make_mlp()
    vec = tree_to_vector(params)
    unflatten = make_unflatten(params)
    params2 = unflatten(vec)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    specs = leaf_specs(params)
    assert specs[0].offset == 0
    assert sum(s.size for s in specs) == num_params(params) == vec.shape[0]


def test_normal_samples_diag_and_full():
    key = jax.random.key(0)
    mean = jnp.zeros((4, 3))
    var_diag = jnp.ones((4, 3)) * 4.0
    s = normal_samples(mean, var_diag, 100000, key)
    assert s.shape == (100000, 4, 3)
    np.testing.assert_allclose(np.asarray(s.std(0)), 2.0, atol=0.05)

    cov = jnp.broadcast_to(get_psd_matrix(3) + 0.1 * jnp.eye(3), (4, 3, 3))
    s = normal_samples(mean, cov, 200000, key)
    emp_cov = np.cov(np.asarray(s[:, 0, :]).T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov[0]), atol=0.05)


def test_prior_expansion():
    _, params = make_mlp(in_dim=3, hidden=5, out_dim=2)
    p = params["params"]
    P = num_params(p)
    n_leaves = len(jax.tree_util.tree_leaves(p))
    # scalar
    d = expand_prior_precision(jnp.asarray([2.0]), p)
    assert d.shape == (P,) and float(d[0]) == 2.0
    # per-leaf
    d = expand_prior_precision(jnp.arange(1.0, n_leaves + 1), p)
    assert d.shape == (P,)
    sizes = [int(x.size) for x in jax.tree_util.tree_leaves(p)]
    d2 = expand_prior_precision_sizes(jnp.arange(1.0, n_leaves + 1), sizes)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2))
    # structure init
    assert fix_prior_prec_structure(1.0, "scalar", n_leaves, P).shape == (1,)
    assert fix_prior_prec_structure(1.0, "layerwise", n_leaves, P).shape == (n_leaves,)
    assert fix_prior_prec_structure(1.0, "diag", n_leaves, P).shape == (P,)


def test_im2col_matches_conv():
    import jax.numpy as jnp
    from laplace_jax.ops.im2col import im2col

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 3)))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 5)))
    for pad, stride, dil in [("SAME", (1, 1), (1, 1)), ("VALID", (2, 2), (1, 1)),
                             ("SAME", (2, 2), (2, 2))]:
        ref = jax.lax.conv_general_dilated(
            x, k, stride, pad, rhs_dilation=dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        p = im2col(x, (3, 3), stride, pad, dil)
        out = p @ k.reshape(-1, 5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-10)


def test_syrk_cpu_fallback():
    from laplace_jax.ops.syrk import syrk, syrk_reference

    rng = np.random.default_rng(4)
    A = jnp.asarray(rng.standard_normal((40, 256)))
    np.testing.assert_allclose(
        np.asarray(syrk(A)), np.asarray(syrk_reference(A)), atol=1e-10
    )
