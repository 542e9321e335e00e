"""Torch-CPU baselines for every tracked benchmark metric.

The reference (`laplace-torch`) computes everything through torch autograd:
KFAC via curvlinops-style hooks + C sqrt-Hessian backward passes
(`laplace/curvature/curvlinops.py:55-108`), Jacobians via functorch
(`laplace/curvature/curvature.py:88-129`), marglik tuning via Adam on
leaf log-precision tensors (`laplace/baselaplace.py:466-485`), the GP fit
via batch-pair NTK kernel blocks (`laplace/baselaplace.py:2420-2534`), and
`marglik_training` via Alg. 1 (`laplace/marglik_training.py:34-361`). Its
dependencies (curvlinops/ASDL/BackPACK) are not installed here, so this
script reimplements exactly those computational patterns in plain torch —
same hooks, same per-output backward passes, same factor contractions,
same batch loops — on workloads IDENTICAL in shape to `bench.py`'s phases,
so each wall-clock is a faithful stand-in for "reference pattern on CPU
torch" and yields a per-metric `vs_baseline` ratio.

Run: python bench_torch_baseline.py [N] [batch] [--phase name ...]
Prints one merged-JSON line on stdout (incremental lines as phases finish).
Phases: kfac (also emits marglik + glm), gp, subnet, marglik_training, reward.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

result: dict = {}


def emit() -> None:
    print(json.dumps(result), flush=True)


def status(msg: str) -> None:
    print(f"[torch-baseline] {msg}", file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# Models (shape-identical to bench.py's flax models)
# --------------------------------------------------------------------------


class ResidualBlock(nn.Module):
    def __init__(self, in_ch, channels, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, channels, 3, stride=stride, padding=1, bias=False)
        self.conv2 = nn.Conv2d(channels, channels, 3, padding=1, bias=False)
        self.proj = (
            nn.Conv2d(in_ch, channels, 1, stride=stride, bias=False)
            if (stride != 1 or in_ch != channels)
            else None
        )

    def forward(self, x):
        y = F.relu(self.conv1(x))
        y = self.conv2(y)
        r = self.proj(x) if self.proj is not None else x
        return F.relu(r + y)


class ResNet18(nn.Module):
    def __init__(self, num_classes=10, width=64):
        super().__init__()
        self.stem = nn.Conv2d(3, width, 3, padding=1, bias=False)
        blocks = []
        in_ch = width
        for i, n_blocks in enumerate((2, 2, 2, 2)):
            ch = width * (2**i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(ResidualBlock(in_ch, ch, stride))
                in_ch = ch
        self.blocks = nn.Sequential(*blocks)
        self.head = nn.Linear(in_ch, num_classes)

    def forward(self, x):
        x = F.relu(self.stem(x))
        x = self.blocks(x)
        x = x.mean(dim=(2, 3))
        return self.head(x)


class LeNet(nn.Module):
    """Matches laplace_jax.models.LeNet (flax SAME padding, avg pools)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 6, 5, padding=2)
        self.conv2 = nn.Conv2d(6, 16, 5, padding=2)
        self.fc1 = nn.Linear(16 * 7 * 7, 120)
        self.fc2 = nn.Linear(120, 84)
        self.fc3 = nn.Linear(84, num_classes)

    def forward(self, x):
        x = F.avg_pool2d(F.relu(self.conv1(x)), 2)
        x = F.avg_pool2d(F.relu(self.conv2(x)), 2)
        x = x.flatten(1)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return self.fc3(x)


class BenchCNN(nn.Module):
    """Matches bench.py's BenchCNN (CIFAR-shaped, ~130k params)."""

    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 3, padding=1)
        self.conv2 = nn.Conv2d(32, 64, 3, stride=2, padding=1)
        self.conv3 = nn.Conv2d(64, 64, 3, padding=1)
        self.conv4 = nn.Conv2d(64, 128, 3, stride=2, padding=1)
        self.head = nn.Linear(128, num_classes)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        x = F.relu(self.conv4(x))
        x = x.mean(dim=(2, 3))
        return self.head(x)


class RewardTransformer(nn.Module):
    """Matches bench.py's RewardTransformer (4 blocks, d=256, seq 128)."""

    def __init__(self, vocab=4096, d=256, n_heads=8, mlp=1024, n_blocks=4):
        super().__init__()
        self.embed = nn.Embedding(vocab, d)
        self.attns = nn.ModuleList(
            nn.MultiheadAttention(d, n_heads, batch_first=True)
            for _ in range(n_blocks)
        )
        self.ln1 = nn.ModuleList(nn.LayerNorm(d) for _ in range(n_blocks))
        self.mlps = nn.ModuleList(
            nn.Sequential(nn.Linear(d, mlp), nn.GELU(), nn.Linear(mlp, d))
            for _ in range(n_blocks)
        )
        self.ln2 = nn.ModuleList(nn.LayerNorm(d) for _ in range(n_blocks))
        self.head = nn.Linear(d, 2)

    def forward(self, ids):
        x = self.embed(ids)
        for attn, l1, mlp, l2 in zip(self.attns, self.ln1, self.mlps, self.ln2):
            a, _ = attn(x, x, x, need_weights=False)
            x = l1(x + a)
            x = l2(x + mlp(x))
        return self.head(x.mean(dim=1))


# --------------------------------------------------------------------------
# Reference-pattern building blocks
# --------------------------------------------------------------------------


def functorch_jacobians(model, params_dict, X):
    """Reference `CurvatureInterface.jacobians` (`curvature.py:88-129`):
    jacrev over functional_call, flatten + concat per-param."""

    def f(p, x):
        return torch.func.functional_call(model, p, (x.unsqueeze(0),)).squeeze(0)

    jac = torch.func.vmap(torch.func.jacrev(f), in_dims=(None, 0))(params_dict, X)
    Js = torch.cat([j.flatten(2) for j in jac.values()], dim=-1)
    with torch.no_grad():
        f_mu = model(X)
    return Js, f_mu


def kfac_fit(model, loader, n_outputs, N, modules=None, eig=True):
    """Reference-pattern KFAC fit: per-batch hook capture + C sqrt-Hessian
    backward passes, factor accumulation across batches
    (`curvlinops.py:55-108`, batch loop `baselaplace.py:969-985`)."""
    if modules is None:
        modules = [
            m for m in model.modules() if isinstance(m, (nn.Linear, nn.Conv2d))
        ]
    A_facs = {m: None for m in modules}
    B_facs = {m: None for m in modules}
    inputs = {}
    handles = []

    def fwd_hook(mod, inp, out):
        inputs[mod] = inp[0].detach()

    for m in modules:
        handles.append(m.register_forward_hook(fwd_hook))

    loss_total = 0.0
    for X, y in loader:
        # forward with captured inputs
        f = model(X)
        loss_total += float(F.cross_entropy(f, y, reduction="sum"))
        p = torch.softmax(f, dim=-1)

        # A factors from captured inputs (im2col for conv), scaled 1/N
        batch_A = {}
        for m in modules:
            a = inputs[m]
            if isinstance(m, nn.Conv2d):
                patches = F.unfold(a, m.kernel_size, dilation=m.dilation,
                                   padding=m.padding, stride=m.stride)
                a2 = patches.transpose(1, 2).reshape(-1, patches.shape[1])
                T = patches.shape[2]
                batch_A[m] = a2.T @ a2 / (N * T)
            else:
                a2 = a.reshape(-1, a.shape[-1])
                T = a2.shape[0] // a.shape[0]
                batch_A[m] = a2.T @ a2 / (N * T)

        # B factors: C backward passes with sqrt-Λ cotangents (TYPE2)
        batch_B = {m: None for m in modules}
        C = f.shape[-1]
        grads_store = {}

        def bwd_hook(mod, grad_input, grad_output):
            grads_store[mod] = grad_output[0].detach()

        bhandles = [m.register_full_backward_hook(bwd_hook) for m in modules]
        for c in range(C):
            model.zero_grad()
            eye_c = torch.zeros_like(p)
            eye_c[:, c] = 1.0
            s_c = torch.sqrt(p[:, c : c + 1]) * (eye_c - p)  # Λ^{1/2} column
            f2 = model(X)
            f2.backward(s_c, retain_graph=False)
            for m in modules:
                g = grads_store[m]
                g2 = g.transpose(1, -1).reshape(-1, g.shape[1]) if g.ndim == 4 \
                    else g.reshape(-1, g.shape[-1])
                contrib = g2.T @ g2
                batch_B[m] = contrib if batch_B[m] is None else batch_B[m] + contrib
        for h in bhandles:
            h.remove()

        for m in modules:
            A_facs[m] = batch_A[m] if A_facs[m] is None else A_facs[m] + batch_A[m]
            B_facs[m] = batch_B[m] if B_facs[m] is None else B_facs[m] + batch_B[m]

    for h in handles:
        h.remove()

    eigs = []
    if eig:
        # eigendecompose every factor (the reference's fit epilogue,
        # `laplace/baselaplace.py:1808` -> `utils/matrix.py:123-150`)
        for m in modules:
            lA, _ = torch.linalg.eigh(A_facs[m])
            lB, _ = torch.linalg.eigh(B_facs[m])
            eigs.append((lA, lB))
    return loss_total, eigs, modules


# --------------------------------------------------------------------------
# Phases
# --------------------------------------------------------------------------


def phase_kfac_and_marglik(N, batch, run_marglik=True):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    X = torch.tensor(rng.standard_normal((N, 3, 32, 32)), dtype=torch.float32)
    y = torch.tensor(rng.integers(0, 10, size=(N,)))
    loader = [(X[i : i + batch], y[i : i + batch]) for i in range(0, N, batch)]
    model = ResNet18()
    model.eval()

    with torch.no_grad():
        model(X[:1])  # warm up allocators

    t0 = time.perf_counter()
    loss, eigs, modules = kfac_fit(model, loader, n_outputs=10, N=N)
    result["torch_cpu_kfac_fit_sec"] = time.perf_counter() - t0
    result["N"] = N
    result["batch"] = batch
    emit()

    if not run_marglik:
        return

    # ---- marglik steps/s: Adam on log prior precision against the
    # eigendecomposed Kron marglik (reference `baselaplace.py:466-485` +
    # `utils/matrix.py:381-404`). Uses the REAL fitted eigenvalues and the
    # model's per-group squared parameter norms, as the reference would.
    sq_norms = [
        float((sum(p.pow(2).sum() for p in m.parameters())).item())
        for m in modules
    ]
    loss_t = torch.tensor(loss)

    def neg_marglik(log_prior_prec):
        delta = log_prior_prec.exp()
        log_det_ratio = torch.tensor(0.0)
        scatter = torch.tensor(0.0)
        n_params = 0
        for (lA, lB), sq in zip(eigs, sq_norms):
            lam = torch.outer(lB.clamp_min(0.0), lA.clamp_min(0.0))
            log_det_ratio = log_det_ratio + torch.log(lam * N + delta).sum()
            n_params += lam.numel()
            scatter = scatter + delta * sq
        log_det_ratio = log_det_ratio - n_params * log_prior_prec
        log_lik = -loss_t
        return -(log_lik - 0.5 * (log_det_ratio + scatter))

    log_prior_prec = torch.zeros(1, requires_grad=True)
    hyper_opt = torch.optim.Adam([log_prior_prec], lr=0.1)
    n_steps = 100
    # one warm step outside the timer (mirrors bench.py's warm-up call)
    hyper_opt.zero_grad(); neg_marglik(log_prior_prec).backward(); hyper_opt.step()
    t0 = time.perf_counter()
    for _ in range(n_steps):
        hyper_opt.zero_grad()
        neg_marglik(log_prior_prec).backward()
        hyper_opt.step()
    result["torch_cpu_marglik_steps_per_sec"] = n_steps / (time.perf_counter() - t0)
    emit()

    # ---- GLM predictive samples/s on the last-layer FULL posterior
    # (reference `_glm_predictive_distribution` `baselaplace.py:1306-1342` +
    # `last_layer_jacobians` `curvature.py:131-167` + `normal_samples`).
    feats = {}
    h = model.head.register_forward_hook(
        lambda m, i, o: feats.__setitem__("phi", i[0].detach())
    )
    C, D = 10, model.head.in_features
    P_ll = C * D + C
    H = torch.zeros(P_ll, P_ll)
    with torch.no_grad():
        for Xb, yb in loader:
            f = model(Xb)
            phi = feats["phi"]
            eye = torch.eye(C)
            Js = torch.cat(
                [torch.einsum("bd,cp->bcpd", phi, eye).flatten(2),
                 eye.expand(phi.shape[0], C, C)], dim=2,
            )
            p = torch.softmax(f, dim=-1)
            Lam = torch.diag_embed(p) - torch.einsum("bc,bk->bck", p, p)
            H += torch.einsum("bcp,bck,bkq->pq", Js, Lam, Js)
    prec = H + torch.eye(P_ll)
    cov = torch.linalg.inv(prec)
    n_samples, reps = 100, max(1, N // batch)
    Xb = X[:batch]
    t0 = time.perf_counter()
    for _ in range(reps):
        with torch.no_grad():
            f_mu = model(Xb)
            phi = feats["phi"]
            eye = torch.eye(C)
            Js = torch.cat(
                [torch.einsum("bd,cp->bcpd", phi, eye).flatten(2),
                 eye.expand(phi.shape[0], C, C)], dim=2,
            )
            f_var = torch.einsum("bcp,pq,bkq->bck", Js, cov, Js)
            L = torch.linalg.cholesky(
                f_var + 1e-6 * torch.eye(C).expand_as(f_var)
            )
            eps = torch.randn(n_samples, batch, C)
            samples = f_mu.unsqueeze(0) + torch.einsum(
                "bck,sbk->sbc", L, eps
            )
            torch.softmax(samples, dim=-1)
    dt = time.perf_counter() - t0
    h.remove()
    result["torch_cpu_glm_predictive_samples_per_sec"] = reps * batch * n_samples / dt
    emit()


def phase_gp():
    """FunctionalLaplace fit+predict, LeNet/FMNIST-shaped, M=512 of N=2048,
    batch 128 — identical to bench.py's gp phase. Reference pattern:
    batch-pair NTK kernel blocks from functorch Jacobians
    (`baselaplace.py:2420-2534`)."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    N, M, batch, C = 2048, 512, 128, 10
    Xg = torch.tensor(rng.standard_normal((N, 1, 28, 28)), dtype=torch.float32)
    yg = torch.tensor(rng.integers(0, 10, size=(N,)))
    model = LeNet()
    model.eval()
    params = dict(model.named_parameters())

    # SoD: seeded choice without replacement (`utils/utils.py:252-261`)
    sod = np.random.default_rng(0).choice(N, size=M, replace=False)
    Xs, ys = Xg[sod], yg[sod]
    batches = [
        (Xs[i : i + batch], ys[i : i + batch]) for i in range(0, M, batch)
    ]

    t0 = time.perf_counter()
    Js_list, mu_list = [], []
    for Xb, _ in batches:
        Js, f_mu = functorch_jacobians(model, params, Xb)
        Js_list.append(Js)
        mu_list.append(f_mu)
    # K_MM blocks for j >= i (`baselaplace.py:2420-2534`), full MC x MC
    K = torch.zeros(M * C, M * C)
    offs = np.cumsum([0] + [b[0].shape[0] for b in batches])
    for i, Ji in enumerate(Js_list):
        for j in range(i, len(Js_list)):
            Jj = Js_list[j]
            blk = Ji.flatten(0, 1) @ Jj.flatten(0, 1).T
            K[offs[i] * C : offs[i + 1] * C, offs[j] * C : offs[j + 1] * C] = blk
            if j > i:
                K[offs[j] * C : offs[j + 1] * C, offs[i] * C : offs[i + 1] * C] = blk.T
    # likelihood Hessian Λ per point and Σ = K + Λ^{-1} cholesky
    f_M = torch.cat(mu_list)
    p = torch.softmax(f_M, dim=-1)
    Lam = torch.diag_embed(p) - torch.einsum("bc,bk->bck", p, p)
    Lam_inv = torch.linalg.inv(Lam + 1e-6 * torch.eye(C))
    Sigma = K + torch.block_diag(*Lam_inv)
    torch.linalg.cholesky(Sigma + 1e-6 * torch.eye(M * C))
    result["torch_cpu_gp_fit_sec"] = time.perf_counter() - t0
    emit()

    t0 = time.perf_counter()
    Jstar, f_star = functorch_jacobians(model, params, Xg[:64])
    J_M = torch.cat(Js_list).flatten(0, 1)
    K_star = Jstar.flatten(0, 1) @ J_M.T
    v = torch.cholesky_solve(
        K_star.T, torch.linalg.cholesky(Sigma + 1e-6 * torch.eye(M * C))
    )
    k_ss = torch.einsum("bp,bp->b", Jstar.flatten(0, 1), Jstar.flatten(0, 1))
    f_var = k_ss - torch.einsum("mb,mb->b", K_star.T, v)
    torch.softmax(f_star / torch.sqrt(1 + np.pi / 8 * f_var.view(64, C)), -1)
    result["torch_cpu_gp_predict_sec"] = time.perf_counter() - t0
    emit()


def phase_subnet():
    """Subnetwork full-Hessian fit: BenchCNN, 128 largest-magnitude params,
    N=256, batch 64, classification — identical to bench.py's subnet phase.
    Reference pattern: full functorch Jacobians sliced by subnetwork indices
    (`curvature.py:116-121`), H = Σ JᵀΛJ (`subnetlaplace.py`)."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    N, batch = 256, 64
    X = torch.tensor(rng.standard_normal((N, 3, 32, 32)), dtype=torch.float32)
    y = torch.tensor(rng.integers(0, 10, size=(N,)))
    model = BenchCNN()
    model.eval()
    params = dict(model.named_parameters())
    theta = torch.cat([p.flatten() for p in params.values()])
    idx = torch.topk(theta.abs(), 128).indices.sort().values

    loader = [(X[i : i + batch], y[i : i + batch]) for i in range(0, N, batch)]
    t0 = time.perf_counter()
    H = torch.zeros(128, 128)
    for Xb, _ in loader:
        Js, f_mu = functorch_jacobians(model, params, Xb)
        Js = Js[:, :, idx]  # subnet slice, reference `curvature.py:116-121`
        p = torch.softmax(f_mu, dim=-1)
        Lam = torch.diag_embed(p) - torch.einsum("bc,bk->bck", p, p)
        H += torch.einsum("bcp,bck,bkq->pq", Js, Lam, Js)
    torch.linalg.cholesky(H + torch.eye(128))
    result["torch_cpu_subnet_full_fit_sec"] = time.perf_counter() - t0
    emit()


def phase_marglik_training():
    """marglik_training (Immer Alg. 1) on BenchCNN/CIFAR-shaped data, N=1024,
    batch 256, 2 epochs, marglik_frequency=1, n_hypersteps=10 — identical to
    bench.py's marglik_training phase. Reference `marglik_training.py:34-361`."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    N, batch, C = 1024, 256, 10
    X = torch.tensor(rng.standard_normal((N, 3, 32, 32)), dtype=torch.float32)
    y = torch.tensor(rng.integers(0, 10, size=(N,)))
    loader = [(X[i : i + batch], y[i : i + batch]) for i in range(0, N, batch)]
    model = BenchCNN()
    n_epochs, n_hypersteps = 2, 10

    log_prior_prec = torch.zeros(1, requires_grad=True)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    hyper_opt = torch.optim.Adam([log_prior_prec], lr=0.1)

    t0 = time.perf_counter()
    for _ in range(n_epochs):
        # inner loop: loss + prior regularizer (`marglik_training.py:254-257`)
        model.train()
        for Xb, yb in loader:
            opt.zero_grad()
            f = model(Xb)
            theta = torch.cat([p.flatten() for p in model.parameters()])
            delta = log_prior_prec.detach().exp()
            loss = F.cross_entropy(f, yb) + 0.5 * delta * theta.pow(2).sum() / N
            loss.backward()
            opt.step()
        # hyper loop: fresh KFAC fit + Adam steps on the marglik
        # (`marglik_training.py:289-314`)
        model.eval()
        loss_fit, eigs, modules = kfac_fit(model, loader, C, N)
        sq_norms = [
            float(sum(p.pow(2).sum() for p in m.parameters()).item())
            for m in modules
        ]
        loss_t = torch.tensor(loss_fit)
        for _ in range(n_hypersteps):
            hyper_opt.zero_grad()
            delta = log_prior_prec.exp()
            log_det_ratio = torch.tensor(0.0)
            scatter = torch.tensor(0.0)
            n_params = 0
            for (lA, lB), sq in zip(eigs, sq_norms):
                lam = torch.outer(lB.clamp_min(0.0), lA.clamp_min(0.0))
                log_det_ratio = log_det_ratio + torch.log(lam * N + delta).sum()
                n_params += lam.numel()
                scatter = scatter + delta * sq
            log_det_ratio = log_det_ratio - n_params * log_prior_prec.squeeze()
            ((-(-loss_t) + 0.5 * (log_det_ratio + scatter))).backward()
            hyper_opt.step()
    result["torch_cpu_marglik_training_epochs_per_sec"] = n_epochs / (
        time.perf_counter() - t0
    )
    emit()


def phase_reward():
    """Reward-model last-layer KFAC fit: 4-block transformer, vocab 4096,
    d=256, seq 128, N=512, batch 64 — identical to bench.py's reward phase.
    Reference pattern: body frozen (last-layer subset), hook on the head,
    C=2 sqrt-Hessian backward passes per batch."""
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    N, batch, seq = 512, 64, 128
    ids = torch.tensor(rng.integers(0, 4096, size=(N, seq)))
    y = torch.tensor(rng.integers(0, 2, size=(N,)))
    loader = [(ids[i : i + batch], y[i : i + batch]) for i in range(0, N, batch)]
    model = RewardTransformer()
    model.eval()
    # last-layer subset: freeze the body (reference LLLaplace semantics)
    for name, p in model.named_parameters():
        p.requires_grad_(name.startswith("head"))
    with torch.no_grad():
        model(ids[:1])

    t0 = time.perf_counter()
    kfac_fit(model, loader, n_outputs=2, N=N, modules=[model.head])
    result["torch_cpu_reward_ll_fit_sec"] = time.perf_counter() - t0
    emit()


PHASES = {
    "kfac": lambda N, b: phase_kfac_and_marglik(N, b),
    "gp": lambda N, b: phase_gp(),
    "subnet": lambda N, b: phase_subnet(),
    "marglik_training": lambda N, b: phase_marglik_training(),
    "reward": lambda N, b: phase_reward(),
}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(args[0]) if len(args) > 0 else 512
    batch = int(args[1]) if len(args) > 1 else 64
    if "--phase" in sys.argv:
        names = sys.argv[sys.argv.index("--phase") + 1 :]
    else:
        names = list(PHASES)
    for name in names:
        status(f"start {name}")
        t0 = time.perf_counter()
        try:
            PHASES[name](N, batch)
        except Exception as exc:  # fault isolation
            status(f"FAIL {name}: {type(exc).__name__}: {exc}")
        status(f"done {name} in {time.perf_counter() - t0:.1f}s")
    emit()


if __name__ == "__main__":
    main()
