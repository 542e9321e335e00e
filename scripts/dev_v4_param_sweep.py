"""v4 LATRD kernel parameter sweep at the large bench classes.

The v4 strip kernel at (3, 4608) measures 0.857 s against a ~0.26 s
pure-DMA roofline (symmetric-half traffic at the in-kernel ~760 GB/s),
so it is chunk-loop-overhead-bound, not DMA-bound. Bigger strip chunks
(H) cut the iteration count linearly; a narrower panel (nb) frees the
VMEM that bounds H (the U/W panel is (2nb, K*m)). This sweeps the
(nb, T, H) triples that fit the 16 MB scoped-vmem budget.

Usage: python scripts/dev_v4_param_sweep.py [n]
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.latrd_pallas_v4 import tridiagonalize_pallas_v4

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def mk(k, n):
    A = rng.standard_normal((k, n, n)).astype(np.float32)
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


classes = [(4, 2304), (3, 4608)]
if len(sys.argv) > 1:
    classes = [(k, n) for k, n in classes if str(n) == sys.argv[1]]

# (nb, T, H); None -> kernel default
CONFIGS = [
    (64, None, None),   # production default (H=2T)
    (32, None, 4 * 384),  # halve panel, double chunk
    (64, None, 3 * 384),  # may exceed scoped vmem: failure is data
    (32, None, 6 * 384),
    (32, 512, 1024),
    (48, None, 4 * 384),
]

for k, n in classes:
    st = mk(k, n)
    ref = None
    for nb, T, H in CONFIGS:
        label = f"(k={k},n={n}) nb={nb} T={T or 'def'} H={H or 'def'}"
        try:
            t0 = time.perf_counter()
            out = tridiagonalize_pallas_v4(st, nb=nb, T=T, H=H)
            sync(out[3])
            compile_s = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 - vmem OOM reporting is the point
            msg = str(exc).replace("\n", " ")[:160]
            print(f"{label}: FAILED {type(exc).__name__}: {msg}",
                  flush=True)
            continue
        # correctness anchor: same tridiagonal diagonal sums across configs
        chk = (float(jnp.sum(out[0])), float(jnp.sum(jnp.abs(out[1]))))
        if ref is None:
            ref = chk
        dd = max(abs(chk[0] - ref[0]), abs(chk[1] - ref[1])) / max(
            abs(ref[0]), 1.0
        )
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = tridiagonalize_pallas_v4(st, nb=nb, T=T, H=H)
            sync(out[3])
            ts.append(time.perf_counter() - t0)
        print(f"{label}: {float(np.median(ts)):.3f}s  "
              f"(compile {compile_s:.0f}s, drift {dd:.1e})", flush=True)
