"""Profile the KFAC decompose epilogue on the real ResNet-18 factor set:
per-shape-class eigh dispatch times + total, to localize non-eigh overhead
(dispatch round-trips on the remote tunnel vs actual eigh compute)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax import KronLaplace
from laplace_jax.models import ResNet18
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

N, B = 512, 128
rng = np.random.default_rng(0)
X = rng.standard_normal((N, 32, 32, 3)).astype(np.float32)
y = rng.integers(0, 10, size=(N,))
loader = ArrayLoader(X, y, batch_size=B)

model = ResNet18()
params = model.init(jax.random.key(0), jnp.asarray(X[:1]))
nnm = NNModel.from_flax(model, params)
la = KronLaplace(nnm, "classification")
la.fit(loader)
np.asarray(la.H.eigenvalues[0][0])
H = la.H_facs

# ---- census of factor shape classes ----
from collections import Counter

shapes = Counter()
for F in H.kfacs:
    for Hi in F:
        shapes[Hi.shape[0]] += 1
print("factor classes (size -> count):", dict(sorted(shapes.items())), flush=True)

# ---- per-class timing through the same path decompose uses ----
from laplace_jax.utils.matrix import _batched_eigh_clipped


def sync(x):
    np.asarray(jax.device_get(x[..., 0]))


by_shape = {}
for gi, F in enumerate(H.kfacs):
    for fi, Hi in enumerate(F):
        by_shape.setdefault(Hi.shape[0], []).append(Hi)

# warm-up all programs
stacks = {n: jnp.stack(v) for n, v in by_shape.items()}
for n, st in sorted(stacks.items()):
    l, Q, f = _batched_eigh_clipped(st)
    sync(l)

t_all0 = time.perf_counter()
per = {}
for n, st in sorted(stacks.items()):
    t0 = time.perf_counter()
    l, Q, f = _batched_eigh_clipped(st)
    sync(l)
    per[n] = time.perf_counter() - t0
t_sum = time.perf_counter() - t_all0
for n, t in sorted(per.items()):
    print(f"  class n={n:5d} x{len(by_shape[n]):2d}: {t*1e3:8.1f} ms", flush=True)
print(f"sum of class dispatches (serialized w/ syncs): {t_sum:.3f}s", flush=True)

# ---- async pipeline (no intermediate syncs), like decompose actually runs --
t0 = time.perf_counter()
outs = [_batched_eigh_clipped(st) for n, st in sorted(stacks.items())]
for l, Q, f in outs:
    sync(l)
t_async = time.perf_counter() - t0
print(f"all classes, async dispatch + one sync wave: {t_async:.3f}s", flush=True)

# ---- whole decompose() as the fit calls it ----
t0 = time.perf_counter()
Hd = H.decompose()
np.asarray(Hd.eigenvalues[0][0])
print(f"full Kron.decompose(): {time.perf_counter()-t0:.3f}s", flush=True)
