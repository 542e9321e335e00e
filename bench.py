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
    la._init_H()
    t0 = time.perf_counter()
    loss_acc, H_acc = la._scan_accumulate(xs, ys, N_DATA, jax.random.key(0))
    # loss and H come out of ONE scan program: reading the scalar loss back
    # waits for the whole program, without shipping ~200MB of factors
    np.asarray(loss_acc)
    accumulate_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    H_dec = H_acc.decompose()
    np.asarray(H_dec.eigenvalues[0][0])
    decompose_sec = time.perf_counter() - t0
    # XLA's own FLOP count for the accumulation program — the AOT compile this
    # triggers goes through the remote compile helper and disturbs any timing
    # that follows, so it runs dead last
    try:
        cost = la._scan_fit_fn.lower(
            xs, ys, jnp.asarray(N_DATA), jax.random.key(0)
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
        "n_data": N_DATA,
        "batch": BATCH,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
