"""Laplace approximation as a Bayesian-optimization surrogate.

JAX counterpart of the reference's `examples/bayesopt_example.py`: a KFAC
last-layer Laplace with `enable_backprop=True` serves as the surrogate; the
acquisition (expected improvement via Thompson-style functional samples) is
differentiated *through the predictive* w.r.t. the inputs — free in JAX since
the predictive is a pure function.

Run: PYTHONPATH=. python examples/bayesopt_example.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from laplace_jax import Laplace
from laplace_jax.models import MLP
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


def objective(x):
    """1-D test function (maximize)."""
    return np.sin(3 * x) - 0.1 * x**2


def fit_surrogate(X, y):
    model = MLP(hidden=(32, 32), out_dim=1)
    params = model.init(jax.random.key(0), jnp.ones((1, 1)))
    nnm = NNModel.from_flax(model, params)
    loader = ArrayLoader(X.astype(np.float32), y.astype(np.float32), batch_size=len(X))

    theta = nnm.mean_vector
    opt = optax.adam(1e-2)
    state = opt.init(theta)

    @jax.jit
    def step(theta, state, x, y):
        loss, g = jax.value_and_grad(
            lambda t: jnp.mean((nnm.apply_vec(t, x) - y) ** 2)
        )(theta)
        upd, state2 = opt.update(g, state)
        return optax.apply_updates(theta, upd), state2, loss

    for _ in range(500):
        for xb, yb in loader:
            theta, state, _ = step(theta, state, jnp.asarray(xb), jnp.asarray(yb))
    nnm.set_params(nnm.unflatten(theta))

    la = Laplace(
        nnm, "regression", subset_of_weights="last_layer",
        hessian_structure="kron", enable_backprop=True,
    )
    la.fit(loader)
    la.optimize_prior_precision(method="marglik", n_steps=50)
    return la


def optimize_acquisition(la, key, x0, steps=100, lr=0.05):
    """Maximize UCB = μ(x) + 2σ(x) by gradient ascent THROUGH the predictive."""

    def neg_ucb(x):
        f_mu, f_var = la(x.reshape(1, 1), pred_type="glm")
        return -(f_mu[0, 0] + 2.0 * jnp.sqrt(f_var[0, 0, 0]))

    grad_fn = jax.grad(neg_ucb)
    x = jnp.asarray(x0)
    for _ in range(steps):
        x = x - lr * grad_fn(x)
        x = jnp.clip(x, -3.0, 3.0)
    return float(x)


def main():
    rng = np.random.default_rng(0)
    X = rng.uniform(-3, 3, size=(8, 1))
    y = objective(X) + 0.05 * rng.standard_normal(X.shape)

    for it in range(5):
        la = fit_surrogate(X, y)
        x_next = optimize_acquisition(
            la, jax.random.key(it), x0=float(rng.uniform(-3, 3))
        )
        y_next = objective(np.asarray([[x_next]]))
        print(f"iter {it}: query x={x_next:+.3f}, f(x)={float(y_next):+.3f}")
        X = np.concatenate([X, [[x_next]]])
        y = np.concatenate([y, y_next])

    best = X[np.argmax(y)]
    print(f"best x found: {float(best):+.3f} (f={float(y.max()):+.3f})")


if __name__ == "__main__":
    main()
