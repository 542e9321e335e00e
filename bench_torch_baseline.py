"""Torch-CPU baseline for the KFAC-fit benchmark.

The reference (`laplace-torch`) computes KFAC via curvlinops'
`KFACLinearOperator`: forward hooks record per-module inputs, C square-root
loss-Hessian backward passes record per-module output gradients, and the
factors are `A = Σ a aᵀ`, `B = Σ g gᵀ` (see `laplace/curvature/curvlinops.py:
55-108`). Its dependencies are not installed here, so this script reimplements
exactly that computational pattern in plain torch (same hooks, same C backward
passes, same factor contractions, same batch loop as
`laplace/baselaplace.py:969-985`) on an identical norm-free ResNet-18, so the
wall-clock is a faithful stand-in for "reference KFAC fit on CPU torch".

Run: python bench_torch_baseline.py [N] [batch]  → prints seconds on stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


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


def kfac_fit(model, loader, n_outputs, N):
    """Reference-pattern KFAC fit: per-batch hook capture + C sqrt-Hessian
    backward passes, factor accumulation across batches."""
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

    # eigendecompose every factor (the reference's fit epilogue,
    # `laplace/baselaplace.py:1808` -> `utils/matrix.py:123-150`)
    for m in modules:
        torch.linalg.eigh(A_facs[m])
        torch.linalg.eigh(B_facs[m])
    return loss_total


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
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
    kfac_fit(model, loader, n_outputs=10, N=N)
    t1 = time.perf_counter()
    print(json.dumps({"torch_cpu_kfac_fit_sec": t1 - t0, "N": N, "batch": batch}))


if __name__ == "__main__":
    main()
