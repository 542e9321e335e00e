"""Numerical parity against torch autograd ground truth.

BASELINE.md target: "within 1e-4 of torch reference". The reference library's
third-party deps aren't installed here, so parity is checked against plain
torch-autograd computations of the same quantities (loss, GGN, posterior,
marglik, GLM predictive) on an identical model: weights are copied between
frameworks, data is shared, and results must agree far tighter than 1e-4.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from laplace_jax import FullLaplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class JaxMLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(7, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x)
        return nn.Dense(2, param_dtype=jnp.float64)(x)


def make_pair(seed=0):
    """Same-weights torch and jax MLPs (3 -> 7 -> 2, tanh)."""
    tmodel = torch.nn.Sequential(
        torch.nn.Linear(3, 7), torch.nn.Tanh(), torch.nn.Linear(7, 2)
    ).double()
    torch.manual_seed(seed)
    for p in tmodel.parameters():
        torch.nn.init.normal_(p, std=0.5)

    jmodel = JaxMLP()
    params = jmodel.init(jax.random.key(0), jnp.ones((1, 3)))
    # copy torch weights (out, in) -> jax kernels (in, out)
    W0 = tmodel[0].weight.detach().numpy().T
    b0 = tmodel[0].bias.detach().numpy()
    W1 = tmodel[2].weight.detach().numpy().T
    b1 = tmodel[2].bias.detach().numpy()
    params = {
        "params": {
            "Dense_0": {"kernel": jnp.asarray(W0), "bias": jnp.asarray(b0)},
            "Dense_1": {"kernel": jnp.asarray(W1), "bias": jnp.asarray(b1)},
        }
    }
    return tmodel, NNModel.from_flax(jmodel, params)


def torch_jacobians(tmodel, X):
    """Per-sample Jacobians d f / d θ in the JAX canonical flatten order
    (alphabetical: Dense_0/bias, Dense_0/kernel(in,out), Dense_1/bias, ...)."""
    Xs = torch.tensor(np.asarray(X))
    rows = []
    for n in range(Xs.shape[0]):
        per_out = []
        f = tmodel(Xs[n : n + 1])[0]
        for c in range(f.shape[0]):
            tmodel.zero_grad()
            grads = torch.autograd.grad(f[c], list(tmodel.parameters()),
                                        retain_graph=True)
            gW0, gb0, gW1, gb1 = grads
            flat = np.concatenate([
                gb0.numpy().ravel(), gW0.numpy().T.ravel(),
                gb1.numpy().ravel(), gW1.numpy().T.ravel(),
            ])
            per_out.append(flat)
            f = tmodel(Xs[n : n + 1])[0]
        rows.append(np.stack(per_out))
    return np.stack(rows)  # (B, C, P)


@pytest.fixture
def data():
    rng = np.random.default_rng(7)
    X = rng.standard_normal((12, 3))
    y = rng.integers(0, 2, size=(12,))
    return X, y


def test_forward_and_jacobian_parity(data):
    X, _ = data
    tmodel, nnm = make_pair()
    f_t = tmodel(torch.tensor(X)).detach().numpy()
    f_j = np.asarray(nnm.apply(nnm.train_params, jnp.asarray(X)))
    np.testing.assert_allclose(f_j, f_t, atol=1e-12)

    from laplace_jax.curvature import CurvatureBackend

    be = CurvatureBackend(nnm, "classification")
    Js_j, _ = be.jacobians(jnp.asarray(X))
    Js_t = torch_jacobians(tmodel, X)
    np.testing.assert_allclose(np.asarray(Js_j), Js_t, atol=1e-10)


def test_full_laplace_parity(data):
    """FullLaplace pipeline vs a torch-autograd replica of the reference math
    (`baselaplace.py:1572-1703`): GGN, posterior precision, log marglik, and
    the probit GLM predictive."""
    X, y = data
    tmodel, nnm = make_pair()
    Xt, yt = torch.tensor(X), torch.tensor(y)

    # --- torch side: exact GGN + marglik, reference formulas
    Js = torch.tensor(torch_jacobians(tmodel, X))
    f = tmodel(Xt)
    p = torch.softmax(f, -1)
    lam = torch.diag_embed(p) - torch.einsum("bc,bk->bck", p, p)
    H_t = torch.einsum("bcp,bck,bkq->pq", Js, lam, Js).detach()
    loss_t = torch.nn.functional.cross_entropy(f, yt, reduction="sum").detach()
    prior_prec = 1.3
    P_t = H_t + prior_prec * torch.eye(H_t.shape[0], dtype=torch.double)
    n_params = H_t.shape[0]
    log_marglik_t = (
        -loss_t
        - 0.5 * (torch.logdet(P_t) - n_params * np.log(prior_prec))
        - 0.5 * prior_prec * sum(
            (q.detach() ** 2).sum() for q in tmodel.parameters()
        )
    )
    # probit predictive
    Sigma_t = torch.linalg.inv(P_t)
    f_var_t = torch.einsum("ncp,pq,nkq->nck", Js, Sigma_t, Js)
    kappa = 1.0 / torch.sqrt(
        1.0 + np.pi / 8 * torch.diagonal(f_var_t, dim1=1, dim2=2)
    )
    probs_t = torch.softmax(kappa * f.detach(), -1).numpy()

    # --- jax side
    loader = ArrayLoader(X, y, batch_size=6)
    la = FullLaplace(nnm, "classification", prior_precision=prior_prec)
    la.fit(loader)
    np.testing.assert_allclose(np.asarray(la.H), H_t.numpy(), atol=1e-10)
    np.testing.assert_allclose(float(la.loss), float(loss_t), rtol=1e-12)
    np.testing.assert_allclose(
        float(la.log_marginal_likelihood()), float(log_marglik_t), rtol=1e-10
    )
    probs_j = np.asarray(la(jnp.asarray(X), link_approx="probit"))
    np.testing.assert_allclose(probs_j, probs_t, atol=1e-10)


def test_kfac_parity_single_layer(data):
    """KFAC factors for a single linear model equal torch-computed
    A = Σ aaᵀ/N and B = Σ_c g gᵀ (TYPE2)."""
    X, y = data
    rng = np.random.default_rng(1)
    W = rng.standard_normal((3, 2))
    b = rng.standard_normal(2)

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2, param_dtype=jnp.float64)(x)

    m = Lin()
    params = {"params": {"Dense_0": {"kernel": jnp.asarray(W), "bias": jnp.asarray(b)}}}
    nnm = NNModel.from_flax(m, params)
    from laplace_jax.curvature import CurvatureBackend

    be = CurvatureBackend(nnm, "classification")
    _, kron = be.kron(jnp.asarray(X), jnp.asarray(y), N=len(X))

    Xt = torch.tensor(X)
    f = Xt @ torch.tensor(W) + torch.tensor(b)
    p = torch.softmax(f, -1)
    # B = Σ_n Λ_n (exact for the output layer), A = Σ aaᵀ / N
    lam = torch.diag_embed(p) - torch.einsum("bc,bk->bck", p, p)
    B_t = lam.sum(0).numpy()
    A_t = (Xt.T @ Xt).numpy() / len(X)
    # leaf order: bias group [B], kernel group (A, B)
    np.testing.assert_allclose(np.asarray(kron.kfacs[0][0]), B_t, atol=1e-10)
    np.testing.assert_allclose(np.asarray(kron.kfacs[1][0]), A_t, atol=1e-10)
    np.testing.assert_allclose(np.asarray(kron.kfacs[1][1]), B_t, atol=1e-10)


class JaxBNCNN(nn.Module):
    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        # explicit symmetric padding to match torch's padding=1
        x = nn.Conv(4, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    param_dtype=jnp.float64)(x)
        x = nn.BatchNorm(use_running_average=True, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(3, param_dtype=jnp.float64)(x)


def make_bn_pair(seed=0):
    """Same-weights torch/jax conv+BN nets (eval-mode BN, shared stats)."""

    class TorchBNCNN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(2, 4, 3, stride=2, padding=1)
            self.bn = torch.nn.BatchNorm2d(4)
            self.fc = torch.nn.Linear(4 * 3 * 3, 3)

        def forward(self, x):  # (B, C, H, W)
            x = torch.tanh(self.bn(self.conv(x)))
            x = x.permute(0, 2, 3, 1).flatten(1)  # match flax (h, w, c) order
            return self.fc(x)

    tmodel = TorchBNCNN().double().eval()
    torch.manual_seed(seed)
    for p in tmodel.parameters():
        torch.nn.init.normal_(p, std=0.5)
    with torch.no_grad():
        tmodel.bn.running_mean.normal_(0.0, 0.3)
        tmodel.bn.running_var.uniform_(0.5, 1.5)

    jmodel = JaxBNCNN()
    X0 = jnp.ones((1, 6, 6, 2), dtype=jnp.float64)
    variables = jmodel.init(jax.random.key(0), X0)
    variables = {
        "params": {
            "Conv_0": {
                "kernel": jnp.asarray(
                    tmodel.conv.weight.detach().numpy().transpose(2, 3, 1, 0)
                ),
                "bias": jnp.asarray(tmodel.conv.bias.detach().numpy()),
            },
            "BatchNorm_0": {
                "scale": jnp.asarray(tmodel.bn.weight.detach().numpy()),
                "bias": jnp.asarray(tmodel.bn.bias.detach().numpy()),
            },
            "Dense_0": {
                "kernel": jnp.asarray(tmodel.fc.weight.detach().numpy().T),
                "bias": jnp.asarray(tmodel.fc.bias.detach().numpy()),
            },
        },
        "batch_stats": {
            "BatchNorm_0": {
                "mean": jnp.asarray(tmodel.bn.running_mean.numpy()),
                "var": jnp.asarray(tmodel.bn.running_var.numpy()),
            }
        },
    }
    return tmodel, NNModel.from_flax(jmodel, variables)


def _torch_flat_grads(tmodel, scalar):
    """Gradient of `scalar` w.r.t. all params in the jax canonical order
    (alphabetical modules: BatchNorm(bias, scale), Conv(bias, kernel),
    Dense(bias, kernel); conv kernel permuted to (kh, kw, in, out))."""
    tmodel.zero_grad()
    grads = torch.autograd.grad(scalar, list(tmodel.parameters()),
                                retain_graph=True)
    g_convW, g_convb, g_bnW, g_bnb, g_fcW, g_fcb = grads
    return np.concatenate([
        g_bnb.numpy().ravel(), g_bnW.numpy().ravel(),
        g_convb.numpy().ravel(),
        g_convW.numpy().transpose(2, 3, 1, 0).ravel(),
        g_fcb.numpy().ravel(), g_fcW.numpy().T.ravel(),
    ])


def test_bn_net_forward_and_curvature_parity(data):
    """Forward, per-sample gradients, exact GGN diag (norm taps) and the
    norm-layer dense Fisher blocks all match torch autograd on a BN net."""
    from laplace_jax.curvature.backend import CurvatureBackend

    rng = np.random.default_rng(3)
    X = rng.standard_normal((8, 6, 6, 2))
    y = rng.integers(0, 3, size=(8,))
    tmodel, nnm = make_bn_pair()

    # forward parity (BN eval mode with shared running stats)
    Xt = torch.tensor(X.transpose(0, 3, 1, 2))
    f_t = tmodel(Xt).detach().numpy()
    f_j = np.asarray(nnm.apply(nnm.train_params, jnp.asarray(X)))
    np.testing.assert_allclose(f_j, f_t, atol=1e-12)

    # per-sample loss-gradient parity (includes BN scale/bias)
    backend = CurvatureBackend(nnm, "classification", "ggn")
    Gs, loss = backend.gradients(jnp.asarray(X), jnp.asarray(y))
    lossfn = torch.nn.CrossEntropyLoss(reduction="sum")
    yt = torch.tensor(np.asarray(y))
    for n in range(4):
        ln = lossfn(tmodel(Xt[n : n + 1]), yt[n : n + 1])
        g_t = _torch_flat_grads(tmodel, ln)
        np.testing.assert_allclose(np.asarray(Gs[n]), g_t, atol=1e-10)

    # exact tap-streamed GGN diagonal == torch-assembled J^T Λ J diagonal
    _, d_taps = backend.diag(jnp.asarray(X), jnp.asarray(y))
    P = nnm.n_params
    J_rows = []
    for n in range(X.shape[0]):
        f = tmodel(Xt[n : n + 1])[0]
        J_rows.append(np.stack([
            _torch_flat_grads(tmodel, f[c]) for c in range(3)
        ]))
    J = np.stack(J_rows)  # (B, C, P)
    p_t = torch.softmax(tmodel(Xt), dim=-1).detach().numpy()
    lam = np.einsum("bc,ck->bck", p_t, np.eye(3)) - np.einsum(
        "bc,bk->bck", p_t, p_t
    )
    d_torch = np.einsum("bcp,bck,bkp->p", J, lam, J)
    np.testing.assert_allclose(np.asarray(d_taps), d_torch, atol=1e-10)

    # norm-layer dense Fisher blocks (kron_unsupported='block') vs torch GGN
    backend_blk = CurvatureBackend(
        nnm, "classification", "ggn", kron_unsupported="block"
    )
    _, kron = backend_blk.kron(jnp.asarray(X), jnp.asarray(y), N=X.shape[0])
    H_torch = np.einsum("bcp,bck,bkq->pq", J, lam, J)
    for spec, group in zip(nnm.leaf_specs, kron.kfacs):
        if "BatchNorm" not in spec.path[-2]:
            continue
        sl = slice(spec.offset, spec.offset + spec.size)
        np.testing.assert_allclose(
            np.asarray(group[0]), H_torch[sl, sl], atol=1e-10
        ), spec.path
