"""Benchmark: KFAC fit on ResNet-18/CIFAR + predictive/marglik throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...extras}

Headline metric: all-weights KFAC fit seconds (factor accumulation over the
loader + eigendecomposition epilogue) on ResNet-18 with CIFAR-10-shaped
synthetic data — the BASELINE.md target workload. `vs_baseline` is the speedup
over the torch-CPU reference-pattern implementation (`bench_torch_baseline.py`,
cached in `bench_baseline.json`).

Secondary metrics (extra keys): GLM predictive samples/sec (last-layer
posterior) and marglik hyper-steps/sec on the fitted KFAC posterior.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_DATA = 512
BATCH = 128
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "bench_baseline.json")


def get_torch_baseline() -> float:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["torch_cpu_kfac_fit_sec"]
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "bench_torch_baseline.py"),
         str(N_DATA), str(BATCH)],
        capture_output=True, text=True, timeout=7200,
    )
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    with open(BASELINE_FILE, "w") as f:
        json.dump(data, f)
    return data["torch_cpu_kfac_fit_sec"]


def main() -> None:
    torch_sec = get_torch_baseline()

    import jax

    # persistent compilation cache: the big KFAC closure for ResNet-18 takes
    # minutes to compile on the remote TPU toolchain; cache it across runs
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp
    import numpy as np

    from laplace_jax import FullLLLaplace, KronLaplace
    from laplace_jax.models import ResNet18
    from laplace_jax.nnmodel import NNModel
    from laplace_jax.utils.data import ArrayLoader

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N_DATA, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 10, size=(N_DATA,))
    loader = ArrayLoader(X, y, batch_size=BATCH)

    model = ResNet18()
    params = model.init(jax.random.key(0), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, params)

    # ---- headline: all-weights KFAC fit ------------------------------------
    def sync(la_):
        # a host readback of an eigenvalue vector is a TRUE sync: it waits for
        # the full decompose epilogue (block_until_ready on a small leaf can
        # return before queued eigh programs finish on the axon tunnel)
        np.asarray(la_.H.eigenvalues[0][0])

    la = KronLaplace(nnm, "classification")
    la.fit(loader)  # compile warm-up (jit caches the scan + eigh programs)
    sync(la)
    t0 = time.perf_counter()
    la.fit(loader)
    sync(la)
    kfac_sec = time.perf_counter() - t0

    # ---- marglik hyper-steps/sec via the library API ------------------------
    # optimize_prior_precision runs its whole Adam loop as ONE device program
    # (lax.scan), so this measures real tuning throughput instead of python
    # dispatch latency
    n_steps = 1000
    la.optimize_prior_precision(n_steps=n_steps, lr=0.1)  # compile warm-up
    np.asarray(la.prior_precision)
    t0 = time.perf_counter()
    la.optimize_prior_precision(n_steps=n_steps, lr=0.1)
    np.asarray(la.prior_precision)
    marglik_steps_per_sec = n_steps / (time.perf_counter() - t0)

    # ---- GLM predictive samples/sec (last-layer posterior) ------------------
    la_ll = FullLLLaplace(nnm, "classification")
    la_ll.fit(loader)
    n_samples = 100
    Xj = jnp.asarray(X[:BATCH])
    s = la_ll.predictive_samples(Xj, pred_type="glm", n_samples=n_samples)
    np.asarray(s[0, 0, 0])  # compile + TRUE sync (see `sync` above)
    reps = max(1, N_DATA // BATCH)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = la_ll.predictive_samples(Xj, pred_type="glm", n_samples=n_samples)
    np.asarray(s[0, 0, 0])
    glm_samples_per_sec = reps * BATCH * n_samples / (time.perf_counter() - t0)

    # ---- phase breakdown: scan accumulation vs eigh epilogue ----------------
    from laplace_jax.baselaplace import _stack_batches

    xs, ys, _ = _stack_batches(loader, la._unpack_batch)
    t0 = time.perf_counter()
    loss_acc, H_acc = la._scan_accumulate(
        la.model.train_params, xs, ys, N_DATA, jax.random.key(0)
    )
    # loss and H come out of ONE scan program: reading the scalar loss back
    # waits for the whole program, without shipping ~200MB of factors
    np.asarray(loss_acc)
    accumulate_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    H_dec = H_acc.decompose()
    np.asarray(H_dec.eigenvalues[0][0])
    decompose_sec = time.perf_counter() - t0

    # ---- remaining BASELINE configs ----------------------------------------
    # config 4: FunctionalLaplace GP predictive, NTK kernel + subset-of-data
    # (calibration_gp_example shape: CNN on FMNIST-shaped inputs, M=200)
    from laplace_jax import FunctionalLaplace
    import flax.linen as nn

    class LeNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(6, (5, 5))(x)
            x = jax.nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(16, (5, 5))(x)
            x = jax.nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape(x.shape[0], -1)
            x = jax.nn.relu(nn.Dense(120)(x))
            x = jax.nn.relu(nn.Dense(84)(x))
            return nn.Dense(10)(x)

    Xg = rng.standard_normal((512, 28, 28, 1)).astype(np.float32)
    yg = rng.integers(0, 10, size=(512,))
    # batch 32: the im2col-conv jacobian intermediates scale with
    # batch x (batch*out) and OOM a 16GB chip at batch 128
    gp_loader = ArrayLoader(Xg, yg, batch_size=32)
    lenet = LeNet()
    lenet_params = lenet.init(jax.random.key(0), jnp.asarray(Xg[:1]))
    la_gp = FunctionalLaplace(
        NNModel.from_flax(lenet, lenet_params), "classification", n_subset=200
    )
    la_gp.fit(gp_loader)  # compile warm-up
    np.asarray(la_gp(jnp.asarray(Xg[:64]))[0])
    t0 = time.perf_counter()
    la_gp.fit(gp_loader)
    np.asarray(la_gp.Sigma_chol)  # true sync on the fit epilogue
    gp_fit_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    p_gp = la_gp(jnp.asarray(Xg[:64]))
    np.asarray(p_gp)
    gp_predict_sec = time.perf_counter() - t0

    # config 3a: marglik_training (online prior tuning) on the sinusoid MLP
    from laplace_jax import marglik_training

    class MLPr(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = jnp.tanh(nn.Dense(64)(x))
            return nn.Dense(1)(x)

    Xs = rng.uniform(0, 8, size=(150, 1)).astype(np.float32)
    ys_r = (np.sin(Xs) + 0.3 * rng.standard_normal((150, 1))).astype(np.float32)
    sin_loader = ArrayLoader(Xs, ys_r, batch_size=150)
    mt_epochs = 20
    t0 = time.perf_counter()
    marglik_training(
        MLPr(), sin_loader, likelihood="regression",
        hessian_structure="kron", n_epochs=mt_epochs, n_hypersteps=20,
        marglik_frequency=1,
    )
    marglik_training_sec = time.perf_counter() - t0
    marglik_training_epochs_per_sec = mt_epochs / marglik_training_sec

    # config 3b: SubnetLaplace full-Hessian on the largest-magnitude subnet
    from laplace_jax import Laplace
    from laplace_jax.utils.subnetmask import LargestMagnitudeSubnetMask

    mlp_s = MLPr()
    mlp_params = mlp_s.init(jax.random.key(0), jnp.asarray(Xs[:1]))
    nnm_s = NNModel.from_flax(mlp_s, mlp_params)
    mask = LargestMagnitudeSubnetMask(nnm_s, n_params_subnet=128)
    idx = mask.select(sin_loader)
    la_sub = Laplace(
        nnm_s, "regression", subset_of_weights="subnetwork",
        hessian_structure="full", subnetwork_indices=idx,
    )
    la_sub.fit(sin_loader)  # warm-up
    t0 = time.perf_counter()
    la_sub.fit(sin_loader)
    np.asarray(la_sub.H[0, 0])
    subnet_fit_sec = time.perf_counter() - t0

    # config 5: transformer last-layer Laplace (reward-modeling shape)
    class TinyReward(nn.Module):
        @nn.compact
        def __call__(self, ids):
            x = nn.Embed(512, 64)(ids)
            x = x + nn.MultiHeadDotProductAttention(
                num_heads=4, qkv_features=64, deterministic=True
            )(x)
            x = nn.LayerNorm()(x)
            return nn.Dense(2)(x.mean(axis=1))

    ids = rng.integers(0, 512, size=(256, 32))
    yr = rng.integers(0, 2, size=(256,))
    rm_loader = ArrayLoader(ids, yr, batch_size=64)
    rm = TinyReward()
    rm_params = rm.init(jax.random.key(0), jnp.asarray(ids[:1]))
    la_rm = Laplace(
        NNModel.from_flax(rm, rm_params), "reward_modeling",
        subset_of_weights="last_layer", hessian_structure="kron",
    )
    la_rm.fit(rm_loader)  # warm-up
    t0 = time.perf_counter()
    la_rm.fit(rm_loader)
    np.asarray(la_rm.H.eigenvalues[0][0])
    reward_ll_fit_sec = time.perf_counter() - t0

    # XLA's own FLOP count for the accumulation program — the AOT compile this
    # triggers goes through the remote compile helper and disturbs any timing
    # that follows, so it runs dead last
    try:
        cost = la._scan_fit_fn.lower(
            la.model.train_params, xs, ys, jnp.asarray(N_DATA),
            jax.random.key(0)
        ).compile().cost_analysis()
        acc_flops = float(cost.get("flops", 0.0))
    except Exception:
        acc_flops = float("nan")
    acc_tflops = acc_flops / accumulate_sec / 1e12

    result = {
        "metric": "kfac_fit_sec_resnet18_cifar",
        "value": round(kfac_sec, 4),
        "unit": "s",
        "vs_baseline": round(torch_sec / kfac_sec, 2),
        "torch_cpu_kfac_fit_sec": round(torch_sec, 2),
        "glm_predictive_samples_per_sec": round(glm_samples_per_sec, 1),
        "marglik_steps_per_sec": round(marglik_steps_per_sec, 1),
        "accumulate_sec": round(accumulate_sec, 4),
        "decompose_sec": round(decompose_sec, 4),
        "accumulate_achieved_tflops": round(acc_tflops, 2),
        "gp_fit_sec": round(gp_fit_sec, 4),
        "gp_predict_sec": round(gp_predict_sec, 4),
        "marglik_training_epochs_per_sec": round(
            marglik_training_epochs_per_sec, 2
        ),
        "subnet_full_fit_sec": round(subnet_fit_sec, 4),
        "reward_ll_fit_sec": round(reward_ll_fit_sec, 4),
        "n_data": N_DATA,
        "batch": BATCH,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
