"""Compile-probe: which (nb, H) configs of the v4 strip kernel fit the
16 MB scoped-vmem stack limit at each bench factor class?

Run: python scripts/dev_v4_vmem_probe.py
"""

import re
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.ops.latrd_pallas_v4 import tridiagonalize_pallas_v4

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)

grid = {
    (4, 2304): [(64, 1536), (64, 768), (64, 1152), (32, 1536)],
    (3, 4608): [(64, 1536), (64, 768), (32, 1536), (32, 1152), (48, 768)],
}

for (k, n), cfgs in grid.items():
    A = jnp.zeros((k, n, n), jnp.float32)
    for nb, H in cfgs:
        try:
            tridiagonalize_pallas_v4.lower(A, nb=nb, H=H).compile()
            print(f"({k},{n}) nb={nb} H={H}: OK", flush=True)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc)
            mm = re.search(r"size ([0-9.]+)M and limit", msg)
            size = mm.group(1) + "M" if mm else msg.splitlines()[0][:80]
            print(f"({k},{n}) nb={nb} H={H}: OOM {size}", flush=True)
