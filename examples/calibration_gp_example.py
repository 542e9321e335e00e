"""Calibration with FunctionalLaplace (GP predictive) at varying subset sizes.

JAX counterpart of the reference's `examples/calibration_gp_example.py`
(CNN / FMNIST, `hessian_structure="gp"`, sweep over `n_subset`). Synthetic
image task replaces the FMNIST download (zero-egress environment).

Run: PYTHONPATH=. python examples/calibration_gp_example.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

from laplace_jax import Laplace
from laplace_jax.models import LeNet
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.metrics import expected_calibration_error, get_nll

from calibration_example import evaluate, make_synthetic_images, train_map


def main():
    num_classes = 4
    X_train, y_train = make_synthetic_images(512, num_classes)
    X_test, y_test = make_synthetic_images(256, num_classes, seed=1)
    train_loader = ArrayLoader(X_train, y_train, batch_size=64, shuffle=True)

    model = LeNet(num_classes=num_classes)
    params = model.init(jax.random.key(0), jnp.asarray(X_train[:1]))
    nnm = NNModel.from_flax(model, params)
    nnm = train_map(nnm, train_loader, n_epochs=20)

    probs_map = jax.nn.softmax(nnm.apply(nnm.train_params, jnp.asarray(X_test)), -1)
    evaluate(probs_map, y_test, "MAP")

    # last-layer GP Laplace with growing subset-of-data sizes
    for n_subset in (50, 100, 200):
        la = Laplace(
            nnm, "classification", subset_of_weights="last_layer",
            hessian_structure="gp", n_subset=n_subset,
        )
        la.fit(ArrayLoader(X_train, y_train, batch_size=64))
        probs = la(jnp.asarray(X_test), pred_type="gp", link_approx="probit")
        evaluate(probs, y_test, f"GP Laplace (n_subset={n_subset})")


if __name__ == "__main__":
    main()
