"""DenseGeneral / Einsum / attention curvature coverage (VERDICT r2 item 3)
and non-Dense last-layer heads (item 7).

The torch reference captures attention projections because torch attention
decomposes into `nn.Linear`s that its backends hook
(`/root/reference/laplace/curvature/curvlinops.py:55-75`); flax attention is
built on `nn.DenseGeneral`, intercepted here via the tap machinery. Oracles:
exact equality with an equivalent `nn.Dense`, and the naive-Jacobian
contraction at 1e-8.
"""

import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laplace_jax import Laplace
from laplace_jax.curvature.backend import CurvatureBackend
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

from .utils import classification_data


def _diag_oracle(be, X):
    """Exact GGN diagonal from materialized Jacobians."""
    Js, f = be.jacobians(X)
    C = f.shape[-1]
    p = jax.nn.softmax(f, -1)
    lam = jnp.einsum("bc,ck->bck", p, jnp.eye(C, dtype=f.dtype)) - jnp.einsum(
        "bc,bk->bck", p, p
    )
    return jnp.einsum("bcp,bck,bkp->p", Js, lam, Js)


# --------------------------------------------------------------- equivalence
class _DenseNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(4, param_dtype=jnp.float64)(x)


class _DGNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.DenseGeneral(4, param_dtype=jnp.float64)(x)


class _EinsumNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Einsum((5, 4), "bd,dh->bh", param_dtype=jnp.float64)(x)


@pytest.mark.parametrize("cls", [_DGNet, _EinsumNet])
def test_equivalent_to_dense(cls):
    """DenseGeneral(k, axis=-1) and Einsum('bd,dh->bh') carry identical
    curvature to nn.Dense(k) with the same weights."""
    X, y = classification_data(n=7, d=5, k=4)
    md = _DenseNet()
    pd = md.init(jax.random.key(0), X)
    W = pd["params"]["Dense_0"]["kernel"]
    b = pd["params"]["Dense_0"]["bias"]
    mg = cls()
    name = "DenseGeneral_0" if cls is _DGNet else "Einsum_0"
    pg = {"params": {name: {"kernel": W, "bias": b}}}
    np.testing.assert_allclose(
        np.asarray(md.apply(pd, X)), np.asarray(mg.apply(pg, X)), atol=1e-12
    )
    bd = CurvatureBackend(NNModel.from_flax(md, pd), "classification")
    bg = CurvatureBackend(NNModel.from_flax(mg, pg), "classification")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        l1, k1 = bd.kron(X, y, N=7)
        l2, k2 = bg.kron(X, y, N=7)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(k1.to_matrix()), np.asarray(k2.to_matrix()), atol=1e-12
    )
    d1 = bd.diag(X, y)[1]
    d2 = bg.diag(X, y)[1]
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-12)


# ------------------------------------------------------- multi-axis features
class _MultiFeatNet(nn.Module):
    """DenseGeneral with tuple features (QKV-projection shape)."""

    @nn.compact
    def __call__(self, x):
        h = nn.DenseGeneral((2, 3), param_dtype=jnp.float64)(x)  # (B, 2, 3)
        h = jnp.tanh(h.reshape(h.shape[0], -1))
        return nn.Dense(3, param_dtype=jnp.float64)(h)


class _MultiAxisNet(nn.Module):
    """DenseGeneral contracting two axes (attention-out-projection shape)."""

    @nn.compact
    def __call__(self, x):  # x: (B, T, D)
        h = nn.DenseGeneral((2, 4), param_dtype=jnp.float64)(x)  # (B, T, 2, 4)
        h = nn.DenseGeneral(6, axis=(-2, -1), param_dtype=jnp.float64)(h)
        return jnp.tanh(h).mean(axis=1) @ jnp.ones((6, 3), dtype=jnp.float64)


class _SeqEinsumNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # x: (B, T, D)
        h = nn.Einsum((5, 2, 3), "btd,dhk->bthk", param_dtype=jnp.float64)(x)
        h = jnp.tanh(h.reshape(h.shape[0], -1))
        return nn.Dense(2, param_dtype=jnp.float64)(h)


def test_multi_feature_densegeneral_diag_oracle():
    X, y = classification_data(n=6, d=5, k=3)
    m = _MultiFeatNet()
    p = m.init(jax.random.key(1), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, d = be.diag(X, y)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, X)), atol=1e-8
    )


def test_multi_axis_densegeneral_diag_oracle_and_kron_shapes():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, 3, 5)))
    y = jnp.asarray(rng.integers(0, 3, 4))
    m = _MultiAxisNet()
    p = m.init(jax.random.key(2), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, d = be.diag(X, y)
        _, kron = be.kron(X, y, N=4)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, X)), atol=1e-8
    )
    # groups in flatten order: DG0 bias (2,4)->8; DG0 kernel (5)x(2*4);
    # DG1 bias (6); DG1 kernel (2*4)x(6)
    shapes = [tuple(F.shape[0] for F in g) for g in kron.kfacs]
    assert shapes == [(8,), (5, 8), (6,), (8, 6)]


def test_seq_einsum_diag_oracle():
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((4, 3, 5)))
    y = jnp.asarray(rng.integers(0, 2, 4))
    m = _SeqEinsumNet()
    p = m.init(jax.random.key(3), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, d = be.diag(X, y)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, X)), atol=1e-8
    )


# ----------------------------------------------------------------- attention
class TinyTransformer(nn.Module):
    n_classes: int = 3

    @nn.compact
    def __call__(self, x):  # (B, T, D)
        h = nn.MultiHeadDotProductAttention(
            num_heads=2, qkv_features=8, param_dtype=jnp.float64,
            deterministic=True,
        )(x)
        h = nn.LayerNorm(param_dtype=jnp.float64)(x + h)
        h = h.mean(axis=1)
        return nn.Dense(self.n_classes, param_dtype=jnp.float64)(h)


def _attn_setup(n=6):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((n, 4, 8)))
    y = jnp.asarray(rng.integers(0, 3, n))
    m = TinyTransformer()
    p = m.init(jax.random.key(0), X)
    return m, p, X, y


def test_attention_kfac_no_skips():
    """All-weights KFAC on flax attention: every QKV/out projection gets real
    factors; with norm blocks enabled there are NO skip warnings at all."""
    m, p, X, y = _attn_setup()
    nnm = NNModel.from_flax(m, p)
    be = CurvatureBackend(nnm, "classification", kron_unsupported="block")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, kron = be.kron(X, y, N=6)
    assert sum(kron.group_sizes) == nnm.n_params
    # every factor non-zero (no silent zero-curvature projections)
    for g in kron.kfacs:
        for F in g:
            assert float(jnp.abs(F).max()) > 0


def test_attention_diag_oracle():
    m, p, X, y = _attn_setup()
    be = CurvatureBackend(
        NNModel.from_flax(m, p), "classification", kron_unsupported="block"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, d = be.diag(X, y)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, X)), atol=1e-8
    )


@pytest.mark.parametrize("structure", ["kron", "diag"])
def test_attention_end_to_end(structure):
    m, p, X, y = _attn_setup(n=8)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    la = Laplace((m, p), "classification", subset_of_weights="all",
                 hessian_structure=structure,
                 backend_kwargs={"kron_unsupported": "block"})
    la.fit(loader)
    probs = la(X[:3])
    assert np.allclose(np.asarray(probs).sum(-1), 1, atol=1e-6)
    la.optimize_prior_precision(n_steps=10)
    assert np.isfinite(float(la.log_marginal_likelihood()))


def test_attention_loop_path_matches_scan():
    """The progress-bar (python-loop) fit path gives the same posterior as the
    lax.scan path — the lazy H assignment must agree."""
    m, p, X, y = _attn_setup(n=8)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    las = []
    for pb in (False, True):
        la = Laplace((m, p), "classification", subset_of_weights="all",
                     hessian_structure="kron",
                     backend_kwargs={"kron_unsupported": "block"})
        la.fit(loader, progress_bar=pb)
        las.append(la)
    m0 = las[0].H_facs.to_matrix()
    m1 = las[1].H_facs.to_matrix()
    np.testing.assert_allclose(np.asarray(m0), np.asarray(m1), atol=1e-10)


# ----------------------------------------------------------------- embedding
class _EmbedNet(nn.Module):
    vocab: int = 11
    dim: int = 6

    @nn.compact
    def __call__(self, ids):
        x = nn.Embed(self.vocab, self.dim, param_dtype=jnp.float64)(ids)
        x = jnp.tanh(x).mean(axis=1)
        return nn.Dense(3, param_dtype=jnp.float64)(x)


def _embed_setup(n=5, t=4):
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 11, (n, t)))
    y = jnp.asarray(rng.integers(0, 3, n))
    m = _EmbedNet()
    p = m.init(jax.random.key(0), ids)
    return m, p, ids, y


def test_embed_diag_oracle():
    """Embedding tap diagonal equals the naive Jacobian contraction."""
    m, p, ids, y = _embed_setup()
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, d = be.diag(ids, y)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, ids)), atol=1e-12
    )


def test_embed_kfac_single_point_exact():
    """One data point, one position: the embedding KFAC block (one-hot A ⊗
    output-grad B) equals the exact GGN block."""
    m, p, _, _ = _embed_setup()
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    rng = np.random.default_rng(1)
    ids1 = jnp.asarray(rng.integers(0, 11, (1, 1)))
    y1 = jnp.asarray([1])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, kr = be.kron(ids1, y1, N=1)
    Js, f = be.jacobians(ids1)
    C = f.shape[-1]
    sm = jax.nn.softmax(f, -1)
    lam = jnp.einsum("bc,ck->bck", sm, jnp.eye(C)) - jnp.einsum(
        "bc,bk->bck", sm, sm
    )
    H = jnp.einsum("bcp,bck,bkq->pq", Js, lam, Js)
    P_embed = 11 * 6  # embedding leaf flattens last (alphabetical order)
    np.testing.assert_allclose(
        np.asarray(kr.to_matrix()[-P_embed:, -P_embed:]),
        np.asarray(H[-P_embed:, -P_embed:]),
        atol=1e-12,
    )


def test_embed_end_to_end_all_weights():
    m, p, ids, y = _embed_setup(n=8)
    loader = ArrayLoader(np.asarray(ids), np.asarray(y), batch_size=4)
    for structure in ("diag", "kron"):
        la = Laplace((m, p), "classification", subset_of_weights="all",
                     hessian_structure=structure)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no skip warnings: Embed covered
            la.fit(loader)
        probs = la(ids[:3])
        assert np.allclose(np.asarray(probs).sum(-1), 1, atol=1e-6)


# ------------------------------------------------------- unsupported configs
class _BatchDimsNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, T, D) with batch_dims=(0,)
        h = nn.DenseGeneral(4, batch_dims=(0,), param_dtype=jnp.float64)(x)
        return h.mean(axis=1)


def test_batch_dims_densegeneral_skips_cleanly():
    """batch_dims kernels have no A ⊗ B structure: KFAC zero-curvature skip
    with warning, diag falls back to the exact Jacobian path."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, 3, 5)))
    y = jnp.asarray(rng.integers(0, 4, 4))
    m = _BatchDimsNet()
    p = m.init(jax.random.key(0), X)
    be = CurvatureBackend(NNModel.from_flax(m, p), "classification")
    with pytest.raises(ValueError, match="No Dense/Conv"):
        be.kron(X, y, N=4)  # only layer is unsupported -> clean error
    # diag: TapUnsupported -> silent fallback to the J-path, still exact
    _, d = be.diag(X, y)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(_diag_oracle(be, X)), atol=1e-8
    )


# ------------------------------------------------- non-Dense last-layer heads
class _DGHead(nn.Module):
    """Model whose final layer is a multi-feature DenseGeneral."""

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(6, param_dtype=jnp.float64)(x)
        h = jnp.tanh(h)
        o = nn.DenseGeneral((2, 2), param_dtype=jnp.float64)(h)
        return o.reshape(o.shape[0], -1)


@pytest.mark.parametrize("structure", ["full", "diag", "kron"])
def test_attention_last_layer(structure):
    """Last-layer Laplace on the transformer still picks the Dense head."""
    m, p, X, y = _attn_setup(n=8)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    la = Laplace((m, p), "classification", subset_of_weights="last_layer",
                 hessian_structure=structure)
    la.fit(loader)
    assert la._head_kind == "dense"
    probs = la(X[:3])
    assert np.allclose(np.asarray(probs).sum(-1), 1, atol=1e-6)


@pytest.mark.parametrize("structure", ["full", "diag", "kron"])
def test_densegeneral_head_last_layer(structure):
    """Explicitly-named DenseGeneral head: generic-Jacobian last layer."""
    X, y = classification_data(n=8, d=5, k=4)
    m = _DGHead()
    p = m.init(jax.random.key(0), X)
    loader = ArrayLoader(np.asarray(X), np.asarray(y), batch_size=4)
    la = Laplace((m, p), "classification", subset_of_weights="last_layer",
                 hessian_structure=structure,
                 last_layer_name="DenseGeneral_0")
    la.fit(loader)
    assert la._head_kind == "dense_general"
    # Jacobian oracle for the head
    Js, _ = la.backend._jacobians_dispatch(X[:4])
    Js_naive = jax.jacrev(lambda t: la.model.apply_vec(t, X[:4]))(
        la.model.mean_vector
    )
    np.testing.assert_allclose(np.asarray(Js), np.asarray(Js_naive), atol=1e-10)
    probs = la(X[:3])
    assert np.allclose(np.asarray(probs).sum(-1), 1, atol=1e-6)
    pn = la(X[:3], pred_type="nn", link_approx="mc", n_samples=8)
    assert np.allclose(np.asarray(pn).sum(-1), 1, atol=1e-6)
