"""Separate tunnel-dispatch latency from device throughput for the
latency-floor-bound bench phases (round 5).

Three measurements:

1. host->device staging rate (the fit paths re-stage loader arrays every
   call; device->host was measured at ~25 MB/s, this measures the other
   direction),
2. GLM predictive samples/s at saturation: one dispatch with a large
   n_samples amortizes the ~17-25 ms per-invocation tunnel constant that
   dominates the bench's workload-parity number (4 dispatches for 51.2k
   samples),
3. subnet full fit wall decomposition: staged arrays vs the scan program.

Usage: python scripts/profile_dispatch_floor.py
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax import FullLLLaplace, Laplace
from laplace_jax.models import ResNet18
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.subnetmask import LargestMagnitudeSubnetMask

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


# ---- 1. host->device staging rate ---------------------------------------
for mb in (1, 8, 32):
    a = rng.standard_normal((mb * 262144,)).astype(np.float32)  # mb MiB
    d = jax.device_put(a)
    sync(d)  # warm path
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(a)
        sync(d)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"h2d {mb:3d} MiB: {t*1e3:7.1f} ms  ({mb / t:7.1f} MiB/s)",
          flush=True)

# ---- 2. GLM predictive saturation ----------------------------------------
N, BATCH = 512, 128
X = rng.standard_normal((N, 32, 32, 3)).astype(np.float32)
y = rng.integers(0, 10, size=(N,))
loader = ArrayLoader(X, y, batch_size=BATCH)
model = ResNet18()
params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(X[:1]))
nnm = NNModel.from_flax(model, params)
la_ll = FullLLLaplace(nnm, "classification")
la_ll.fit(loader)
Xj = jnp.asarray(X[:BATCH])
for n_samples, reps in [(100, 4), (1000, 4), (5000, 1)]:
    s = la_ll.predictive_samples(Xj, pred_type="glm", n_samples=n_samples)
    sync(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = la_ll.predictive_samples(
            Xj, pred_type="glm", n_samples=n_samples
        )
    sync(s)
    dt = time.perf_counter() - t0
    tot = reps * BATCH * n_samples
    print(f"glm n_samples={n_samples:5d} reps={reps}: {dt*1e3:7.1f} ms "
          f"-> {tot/dt/1e6:6.2f} M samples/s", flush=True)

# ---- 3. subnet full fit breakdown ----------------------------------------
import flax.linen as nn


class BenchCNN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(nn.Conv(32, (3, 3))(x))
        x = jax.nn.relu(nn.Conv(64, (3, 3), strides=(2, 2))(x))
        x = jax.nn.relu(nn.Conv(64, (3, 3))(x))
        x = jax.nn.relu(nn.Conv(128, (3, 3), strides=(2, 2))(x))
        x = x.mean(axis=(1, 2))
        return nn.Dense(10)(x)


Xc = rng.standard_normal((256, 32, 32, 3)).astype(np.float32)
yc = rng.integers(0, 10, size=(256,))
sub_loader = ArrayLoader(Xc, yc, batch_size=64)
cnn = BenchCNN()
cnn_params = jax.jit(cnn.init)(jax.random.key(0), jnp.asarray(Xc[:1]))
nnm_s = NNModel.from_flax(cnn, cnn_params)
mask = LargestMagnitudeSubnetMask(nnm_s, n_params_subnet=128)
idx = mask.select(sub_loader)
la_sub = Laplace(
    nnm_s, "classification", subset_of_weights="subnetwork",
    hessian_structure="full", subnetwork_indices=idx,
)
la_sub.fit(sub_loader)  # warm
t0 = time.perf_counter()
la_sub.fit(sub_loader)
np.asarray(la_sub.H[0, 0])
print(f"subnet fit wall: {time.perf_counter() - t0:.3f}s", flush=True)

from laplace_jax.baselaplace import _stack_batches

xs, ys, _ = _stack_batches(sub_loader, la_sub._unpack_batch)
xs_d, ys_d = jax.device_put(xs), jax.device_put(ys)
sync(xs_d)
t0 = time.perf_counter()
xs_d = jax.device_put(xs)
sync(xs_d)
print(f"  stage xs ({xs.nbytes/2**20:.1f} MiB): "
      f"{time.perf_counter() - t0:.3f}s", flush=True)
params_s = la_sub.model.train_params
la_sub._scan_accumulate(params_s, xs_d, ys_d, 256, jax.random.key(0))
t0 = time.perf_counter()
loss, H = la_sub._scan_accumulate(params_s, xs_d, ys_d, 256, jax.random.key(0))
np.asarray(loss)
print(f"  scan (device-resident args): {time.perf_counter() - t0:.3f}s",
      flush=True)
