"""Curvature backend tests against naive-autodiff oracles.

Replicates the reference's test strategy (SURVEY.md §4): Jacobians vs the
per-element oracle (`tests/test_jacobians.py`), GGN/EF/Hessian identities, and the
KFAC normalization contract (single-point exactness, batch additivity,
N-proportionality — `tests/test_curv_backends_asdl.py:296-360`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax.curvature import CurvatureBackend
from laplace_jax.nnmodel import NNModel

from .utils import (
    ToyConvNet,
    classification_data,
    jacobians_naive,
    make_mlp,
    regression_data,
)


@pytest.fixture
def mlp_model():
    model, params = make_mlp()
    return NNModel.from_flax(model, params)


def dense_kron(kron):
    return np.asarray(kron.to_matrix())


# --------------------------------------------------------------- jacobians
def test_jacobians_vs_naive(mlp_model):
    X, _ = classification_data()
    backend = CurvatureBackend(mlp_model, "classification")
    Js, f = backend.jacobians(X)
    Js_ref, f_ref = jacobians_naive(mlp_model.apply, mlp_model.train_params, X)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Js), np.asarray(Js_ref), atol=1e-12)


def test_last_layer_jacobians(mlp_model):
    X, _ = classification_data()
    path = mlp_model.find_last_layer(X)
    assert path == ("Dense_1",)
    mask = mlp_model.split_last_layer(path)
    ll_model = NNModel.from_flax(mlp_model.module, mlp_model.params, trainable_mask=mask)
    backend = CurvatureBackend(
        ll_model, "classification", last_layer=True, last_layer_path=path
    )
    Js, f = backend.last_layer_jacobians(X)
    Js_ref, f_ref = jacobians_naive(ll_model.apply, ll_model.train_params, X)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Js), np.asarray(Js_ref), atol=1e-12)


# --------------------------------------------------------------- gradients/EF
def test_gradients_and_ef(mlp_model):
    X, y = classification_data()
    backend = CurvatureBackend(mlp_model, "classification", curv_type="ef")
    Gs, loss = backend.gradients(X, y)
    assert Gs.shape == (X.shape[0], mlp_model.n_params)
    # sum of per-sample grads == grad of total loss
    theta = mlp_model.mean_vector
    total_grad = jax.grad(
        lambda t: backend.lossfunc(mlp_model.apply_vec(t, X), y)
    )(theta)
    np.testing.assert_allclose(
        np.asarray(Gs.sum(0)), np.asarray(total_grad), atol=1e-10
    )
    loss_ef, H_ef = backend.full(X, y)
    np.testing.assert_allclose(
        np.asarray(H_ef), np.asarray(jnp.einsum("bp,bq->pq", Gs, Gs)), atol=1e-10
    )
    loss_d, d_ef = backend.diag(X, y)
    np.testing.assert_allclose(np.asarray(d_ef), np.diag(np.asarray(H_ef)), atol=1e-10)


# --------------------------------------------------------------- GGN
@pytest.mark.parametrize("likelihood", ["classification", "regression"])
def test_full_ggn_vs_manual(mlp_model, likelihood):
    if likelihood == "classification":
        X, y = classification_data()
    else:
        X, y = regression_data()
    backend = CurvatureBackend(mlp_model, likelihood)
    loss, H = backend.full(X, y)
    Js, f = jacobians_naive(mlp_model.apply, mlp_model.train_params, X)
    if likelihood == "regression":
        H_ref = jnp.einsum("bcp,bcq->pq", Js, Js)
    else:
        p = jax.nn.softmax(f, -1)
        lam = jax.vmap(jnp.diag)(p) - jnp.einsum("bc,bk->bck", p, p)
        H_ref = jnp.einsum("bcp,bck,bkq->pq", Js, lam, Js)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref), atol=1e-10)
    loss_d, d = backend.diag(X, y)
    np.testing.assert_allclose(np.asarray(d), np.diag(np.asarray(H_ref)), atol=1e-10)
    assert np.allclose(float(loss), float(loss_d))


def test_full_hessian_regression_equals_ggn_plus_residual_term(mlp_model):
    # for regression, Hessian = GGN + second-order residual term; just check
    # symmetry and that it matches autodiff hessian of the scaled loss
    X, y = regression_data()
    backend = CurvatureBackend(mlp_model, "regression", curv_type="hessian")
    loss, H = backend.full(X, y)
    theta = mlp_model.mean_vector
    H_ref = 0.5 * jax.hessian(
        lambda t: jnp.sum((mlp_model.apply_vec(t, X) - y) ** 2)
    )(theta)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref), atol=1e-10)


def test_mc_fisher_close_to_exact(mlp_model):
    X, y = classification_data(n=30)
    exact = CurvatureBackend(mlp_model, "classification")
    mc = CurvatureBackend(mlp_model, "classification", stochastic=True, num_samples=600)
    _, H = exact.full(X, y)
    _, H_mc = mc.full(X, y, key=jax.random.key(1))
    rel = float(jnp.linalg.norm(H - H_mc) / jnp.linalg.norm(H))
    assert rel < 0.25


# --------------------------------------------------------------- KFAC
@pytest.mark.parametrize("likelihood", ["classification", "regression"])
def test_kfac_single_point_exact(mlp_model, likelihood):
    """KFAC == exact GGN block-diagonal for a single data point (reference
    `tests/test_curv_backends_backpack.py:120-129`)."""
    if likelihood == "classification":
        X, y = classification_data()
    else:
        X, y = regression_data()
    backend = CurvatureBackend(mlp_model, likelihood)
    loss_d, dggn = backend.diag(X[:1], y[:1])
    loss_k, kron = backend.kron(X[:1], y[:1], N=1)
    np.testing.assert_allclose(np.asarray(kron.diag()), np.asarray(dggn), atol=1e-9)
    assert np.allclose(float(loss_d), float(loss_k))


def test_kfac_batching_correction(mlp_model):
    """kron(first half, N) + kron(second half, N) == kron(all, N)
    (reference `tests/test_curv_backends_backpack.py:131-145`)."""
    X, y = classification_data()
    backend = CurvatureBackend(mlp_model, "classification")
    N = X.shape[0]
    M = N // 2
    _, kron_full = backend.kron(X, y, N=N)
    l1, k1 = backend.kron(X[:M], y[:M], N=N)
    l2, k2 = backend.kron(X[M:], y[M:], N=N)
    np.testing.assert_allclose(
        np.asarray((k1 + k2).diag()), np.asarray(kron_full.diag()), atol=1e-10
    )


def test_kfac_normalization(mlp_model):
    """7 identical points with N=7 == 7 * kron(single, N=1)
    (reference `tests/test_curv_backends_asdl.py:318-330`)."""
    X, y = classification_data()
    xi, yi = X[:1], y[:1]
    backend = CurvatureBackend(mlp_model, "classification")
    loss, kron1 = backend.kron(xi, yi, N=1)
    X7 = jnp.repeat(xi, 7, axis=0)
    y7 = jnp.repeat(yi, 7, axis=0)
    loss7, kron7 = backend.kron(X7, y7, N=7)
    np.testing.assert_allclose(
        np.asarray((7 * kron1).diag()), np.asarray(kron7.diag()), atol=1e-10
    )
    np.testing.assert_allclose(float(7 * loss), float(loss7), rtol=1e-10)


def test_kfac_ef_single_point_exact(mlp_model):
    X, y = classification_data()
    backend = CurvatureBackend(mlp_model, "classification", curv_type="ef")
    _, def_ = backend.diag(X[:1], y[:1])
    _, kron = backend.kron(X[:1], y[:1], N=1)
    np.testing.assert_allclose(np.asarray(kron.diag()), np.asarray(def_), atol=1e-10)


def test_kfac_conv_runs_and_single_point_exact():
    model = ToyConvNet()
    X = jnp.asarray(np.random.default_rng(0).standard_normal((3, 6, 6, 3)))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 2, size=(3,)))
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    backend = CurvatureBackend(nnm, "classification")
    loss, kron = backend.kron(X, y, N=3)
    assert sum(kron.group_sizes) == nnm.n_params
    # conv KFAC is approximate even for one point (weight sharing); check the
    # bias/dense blocks instead: build a dense-only comparison via diag
    _, dggn = backend.diag(X[:1], y[:1])
    _, kron1 = backend.kron(X[:1], y[:1], N=1)
    d_kron = np.asarray(kron1.diag())
    d_ref = np.asarray(dggn)
    # dense (non-conv) params: everything after the conv kernel/bias leaves
    specs = nnm.leaf_specs
    for s in specs:
        if "Conv" in "".join(s.path):
            continue
        sl = slice(s.offset, s.offset + s.size)
        np.testing.assert_allclose(d_kron[sl], d_ref[sl], atol=1e-9)


def test_conv_patches_match_conv():
    """patches @ flattened kernel == conv output (validates patch ordering)."""
    from laplace_jax.curvature import conv_patches

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 5, 3)))
    kernel = jnp.asarray(rng.standard_normal((2, 2, 3, 4)))
    out_ref = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    spec = dict(kernel_size=(2, 2), strides=(2, 2), padding="VALID",
                input_dilation=None, kernel_dilation=None, feature_group_count=1)
    patches = conv_patches(x, spec)  # (B, T, kh*kw*in)
    out = patches @ kernel.reshape(-1, 4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref.reshape(2, -1, 4)), atol=1e-10
    )


# --------------------------------------------------------------- subnetwork
def test_subnetwork_slicing(mlp_model):
    X, y = classification_data()
    idx = jnp.asarray([0, 3, 7, 20, 50])
    backend = CurvatureBackend(mlp_model, "classification", subnetwork_indices=idx)
    Js, f = backend.jacobians(X)
    assert Js.shape[-1] == 5
    full_backend = CurvatureBackend(mlp_model, "classification")
    Js_full, _ = full_backend.jacobians(X)
    np.testing.assert_allclose(np.asarray(Js), np.asarray(Js_full[:, :, idx]))
    _, H = backend.full(X, y)
    assert H.shape == (5, 5)
    _, H_full = full_backend.full(X, y)
    np.testing.assert_allclose(
        np.asarray(H), np.asarray(H_full[idx][:, idx]), atol=1e-10
    )


# --------------------------------------------------------------- lowrank
def test_lanczos_lowrank_matches_dense_eigh(mlp_model):
    from laplace_jax.utils.data import ArrayLoader

    X, y = classification_data(n=20)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=10)
    backend = CurvatureBackend(mlp_model, "classification", curv_type="hessian")
    V, lam, loss = backend.eig_lowrank(loader, low_rank=6)
    # dense reference: total Hessian over both batches
    l1, H1 = backend.full(X[:10], y[:10])
    l2, H2 = backend.full(X[10:], y[10:])
    # backend.full scales by factor (1.0 here); hessian of unscaled sum loss
    H = np.asarray(H1 + H2)
    evals = np.linalg.eigvalsh(H)[::-1]
    np.testing.assert_allclose(np.asarray(lam), evals[: len(lam)], rtol=1e-6, atol=1e-8)
    # eigvec property: H v ≈ λ v
    Hv = H @ np.asarray(V)
    np.testing.assert_allclose(Hv, np.asarray(V * lam), atol=1e-6)
    np.testing.assert_allclose(float(loss), float(l1 + l2), rtol=1e-10)


def test_kfac_nested_module_paths():
    """Regression: a root-level Conv_0 must not claim nested Block/Conv_0
    leaves — KFAC factors must align with each leaf's exact module."""
    import flax.linen as nn

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            return jax.nn.relu(nn.Dense(4, param_dtype=jnp.float64)(x))

    class Nested(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(4, param_dtype=jnp.float64)(x)  # root Dense_0
            x = Block()(x)  # Block_0/Dense_0
            return nn.Dense(2, param_dtype=jnp.float64)(x)

    rngs = np.random.default_rng(0)
    X = jnp.asarray(rngs.standard_normal((6, 3)))
    y = jnp.asarray(rngs.integers(0, 2, size=(6,)))
    model = Nested()
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    backend = CurvatureBackend(nnm, "classification")
    loss, kron = backend.kron(X[:1], y[:1], N=1)
    assert sum(kron.group_sizes) == nnm.n_params
    _, dggn = backend.diag(X[:1], y[:1])
    np.testing.assert_allclose(np.asarray(kron.diag()), np.asarray(dggn), atol=1e-9)


@pytest.mark.parametrize("likelihood", ["classification", "regression"])
@pytest.mark.parametrize("curv", ["ggn", "ef"])
def test_diag_taps_equals_jacobian_path(mlp_model, likelihood, curv):
    """The tap-based streaming diagonal equals the J-based einsum exactly."""
    from laplace_jax.curvature.diag_taps import diag_curvature_taps

    if likelihood == "classification":
        X, y = classification_data()
    else:
        X, y = regression_data()
    backend = CurvatureBackend(mlp_model, likelihood, curv_type=curv)
    # reference values via the explicit Jacobian/gradient paths
    if curv == "ef":
        Gs, loss_ref = backend.gradients(X, y)
        d_ref = backend.factor * jnp.einsum("bp,bp->p", Gs, Gs)
    else:
        Js, f = jacobians_naive(mlp_model.apply, mlp_model.train_params, X)
        if likelihood == "regression":
            d_ref = jnp.einsum("bcp,bcp->p", Js, Js)
        else:
            p = jax.nn.softmax(f, -1)
            lam = jax.vmap(jnp.diag)(p) - jnp.einsum("bc,bk->bck", p, p)
            d_ref = jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)
    loss, d = backend.diag(X, y)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-10)


def test_diag_taps_conv_matches_jacobian():
    model = ToyConvNet()
    X = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6, 6, 3)))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 2, size=(4,)))
    params = model.init(jax.random.key(0), X[:1])
    nnm = NNModel.from_flax(model, params)
    backend = CurvatureBackend(nnm, "classification")
    Js, f = jacobians_naive(nnm.apply, nnm.train_params, X)
    p = jax.nn.softmax(f, -1)
    lam = jax.vmap(jnp.diag)(p) - jnp.einsum("bc,bk->bck", p, p)
    d_ref = jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)
    _, d = backend.diag(X, y)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-9)


def test_invalid_structure_backend_combos(mlp_model):
    """KFAC x exact-Hessian and low-rank x EF are undefined; clean errors."""
    from laplace_jax.utils.data import ArrayLoader

    X, y = classification_data()
    be = CurvatureBackend(mlp_model, "classification", curv_type="hessian")
    with pytest.raises(ValueError, match="KFAC with the exact Hessian"):
        be.kron(X, y, N=10)
    be_ef = CurvatureBackend(mlp_model, "classification", curv_type="ef")
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=5)
    with pytest.raises(ValueError, match="not 'ef'"):
        be_ef.eig_lowrank(loader, low_rank=3)


def test_lanczos_one_shot_loader_loss(mlp_model):
    """The stacked Lanczos path must compute the loss from the stacked arrays:
    a one-shot (generator-backed) loader is exhausted by stacking and can't be
    re-iterated (round-2 review finding)."""
    import numpy as np
    from laplace_jax.curvature.backend import CurvatureBackend
    from .utils import classification_data
    from laplace_jax.utils.data import ArrayLoader

    X, y = classification_data(n=8)

    class OneShotLoader:
        n_data = 8

        def __init__(self):
            self._used = False

        def __iter__(self):
            assert not self._used, "loader iterated twice"
            self._used = True
            yield np.asarray(X[:4]), np.asarray(y[:4])
            yield np.asarray(X[4:]), np.asarray(y[4:])

    backend = CurvatureBackend(mlp_model, "classification", "ggn")
    U1, l1, loss1 = backend.eig_lowrank(OneShotLoader(), low_rank=3)
    U2, l2, loss2 = backend.eig_lowrank(
        ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4), low_rank=3
    )
    assert float(loss1) != 0.0
    assert np.allclose(float(loss1), float(loss2), rtol=1e-12)
    assert np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-10)
