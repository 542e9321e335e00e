"""Post-hoc calibration of a CNN classifier with last-layer KFAC Laplace.

JAX counterpart of the reference's `examples/calibration_example.py`
(WideResNet-16-4 / CIFAR-10, last-layer KFAC, marglik-tuned prior, probit
predictive, ECE/NLL comparison). Zero-egress environment: uses a synthetic
image classification task (class-conditional Gaussian blobs rendered into
channels) instead of CIFAR-10 downloads — the calibration mechanics are
identical.

Run: PYTHONPATH=. python examples/calibration_example.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from laplace_jax import Laplace
from laplace_jax.models import LeNet
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader
from laplace_jax.utils.metrics import expected_calibration_error, get_nll


def make_synthetic_images(n, num_classes=4, size=16, seed=0):
    """Class-conditional Gaussian-blob 'images' — learnable but noisy."""
    rng = np.random.default_rng(12)
    means = rng.standard_normal((num_classes, size, size, 3)) * 0.22
    rng = np.random.default_rng(seed)
    y = rng.integers(0, num_classes, size=(n,))
    X = means[y] + rng.standard_normal((n, size, size, 3))
    return X.astype(np.float32), y


def train_map(nnm, loader, n_epochs=30, lr=1e-3):
    theta = nnm.mean_vector
    opt = optax.adam(lr)
    state = opt.init(theta)

    @jax.jit
    def step(theta, state, x, y):
        def loss_fn(t):
            f = nnm.apply_vec(t, x)
            logp = jax.nn.log_softmax(f, -1)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

        loss, g = jax.value_and_grad(loss_fn)(theta)
        upd, state2 = opt.update(g, state)
        return optax.apply_updates(theta, upd), state2, loss

    for _ in range(n_epochs):
        for x, y in loader:
            theta, state, loss = step(theta, state, jnp.asarray(x), jnp.asarray(y))
    nnm.set_params(nnm.unflatten(theta))
    return nnm


def evaluate(probs, targets, name):
    acc = float((np.asarray(probs).argmax(-1) == np.asarray(targets)).mean())
    ece = expected_calibration_error(probs, targets)
    nll = float(get_nll(jnp.asarray(probs), jnp.asarray(targets)))
    print(f"[{name}] Acc.: {acc:.1%}; ECE: {ece:.1%}; NLL: {nll:.3f}")
    return acc, ece, nll


def main():
    # small training set + long training -> an overconfident MAP, the regime
    # where post-hoc Laplace calibration helps (the reference's CIFAR setting)
    num_classes = 4
    X_train, y_train = make_synthetic_images(256, num_classes)
    X_test, y_test = make_synthetic_images(512, num_classes, seed=1)
    train_loader = ArrayLoader(X_train, y_train, batch_size=128, shuffle=True)

    model = LeNet(num_classes=num_classes)
    params = model.init(jax.random.key(0), jnp.asarray(X_train[:1]))
    nnm = NNModel.from_flax(model, params)
    nnm = train_map(nnm, train_loader, n_epochs=150, lr=2e-3)

    # MAP predictive
    probs_map = jax.nn.softmax(
        nnm.apply(nnm.train_params, jnp.asarray(X_test)), -1
    )
    evaluate(probs_map, y_test, "MAP")

    # last-layer KFAC Laplace with marglik-tuned prior (the reference recipe)
    la = Laplace(
        nnm, "classification", subset_of_weights="last_layer",
        hessian_structure="kron",
    )
    la.fit(ArrayLoader(X_train, y_train, batch_size=128))
    la.optimize_prior_precision(method="marglik")
    probs_laplace = la(jnp.asarray(X_test), link_approx="probit")
    evaluate(probs_laplace, y_test, "Laplace (LL-KFAC, probit, marglik)")

    # alternative: gridsearch the prior on held-out NLL (reference's CV option)
    X_val, y_val = make_synthetic_images(256, num_classes, seed=2)
    la.optimize_prior_precision(
        method="gridsearch", val_loader=ArrayLoader(X_val, y_val, batch_size=128),
        grid_size=30, log_prior_prec_min=-2, log_prior_prec_max=4,
    )
    probs_grid = la(jnp.asarray(X_test), link_approx="probit")
    evaluate(probs_grid, y_test, "Laplace (LL-KFAC, probit, gridsearch)")


if __name__ == "__main__":
    main()
