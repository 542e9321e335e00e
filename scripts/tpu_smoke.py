"""Quick battery on the real TPU: fit/predict/marglik across flavors.

Run: python scripts/tpu_smoke.py   (uses the default device; enables the
persistent compilation cache so repeat runs are fast)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from laplace_jax import (
    DiagLaplace,
    FullLLLaplace,
    KronLaplace,
    KronLLLaplace,
    Laplace,
)
from laplace_jax.models import LeNet
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    X = rng.standard_normal((256, 16, 16, 3)).astype(np.float32)
    y = rng.integers(0, 4, size=(256,))
    loader = ArrayLoader(X, y, batch_size=64)
    model = LeNet(num_classes=4)
    params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(X[:1]))
    nnm = NNModel.from_flax(model, params)

    for name, la in [
        ("KronLaplace(all)", KronLaplace(nnm, "classification")),
        ("DiagLaplace(all)", DiagLaplace(nnm, "classification")),
        ("FullLLLaplace", FullLLLaplace(nnm, "classification")),
        ("KronLLLaplace", KronLLLaplace(nnm, "classification")),
        ("Functional-LL (GP)", Laplace(nnm, "classification",
                                       subset_of_weights="last_layer",
                                       hessian_structure="gp", n_subset=64)),
    ]:
        t0 = time.time()
        la.fit(loader)
        t_fit = time.time() - t0
        probs = la(jnp.asarray(X[:32]), link_approx="probit")
        ok = bool(np.isfinite(np.asarray(probs)).all()) and bool(
            np.allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)
        )
        marglik = float(la.log_marginal_likelihood())
        print(f"{name:22s} fit={t_fit:7.2f}s predictive_ok={ok} "
              f"marglik={marglik:.1f}")
    print("smoke OK")


if __name__ == "__main__":
    main()
