"""Functional samples for Thompson sampling / Monte-Carlo expectations.

JAX counterpart of the reference's `examples/expectation_example.py`:
`functional_samples` draws from the function-space posterior (GLM or NN
predictive types) to estimate arbitrary expectations, e.g. MC expected
improvement.

Run: PYTHONPATH=. python examples/expectation_example.py
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


def main():
    rng = np.random.default_rng(0)
    X = rng.uniform(-2, 2, size=(64, 1)).astype(np.float32)
    y = (np.sin(2 * X) + 0.1 * rng.standard_normal(X.shape)).astype(np.float32)
    loader = ArrayLoader(X, y, batch_size=64)

    model = MLP(hidden=(32,), out_dim=1)
    params = model.init(jax.random.key(0), jnp.ones((1, 1)))
    nnm = NNModel.from_flax(model, params)
    theta = nnm.mean_vector
    opt = optax.adam(1e-2)
    state = opt.init(theta)

    @jax.jit
    def step(theta, state, x, yb):
        loss, g = jax.value_and_grad(
            lambda t: jnp.mean((nnm.apply_vec(t, x) - yb) ** 2)
        )(theta)
        upd, state2 = opt.update(g, state)
        return optax.apply_updates(theta, upd), state2, loss

    for _ in range(300):
        for xb, yb in loader:
            theta, state, _ = step(theta, state, jnp.asarray(xb), jnp.asarray(yb))
    nnm.set_params(nnm.unflatten(theta))

    la = Laplace(nnm, "regression", subset_of_weights="all",
                 hessian_structure="kron")
    la.fit(loader)
    la.optimize_prior_precision(method="marglik", n_steps=50)

    x_cand = jnp.linspace(-2, 2, 50).reshape(-1, 1)
    best_y = float(y.max())

    for pred_type in ("glm", "nn"):
        fs = la.functional_samples(
            x_cand, pred_type=pred_type, n_samples=256, key=jax.random.key(0)
        )  # (S, 50, 1)
        # Monte-Carlo expected improvement over the incumbent
        ei = jnp.clip(fs[..., 0] - best_y, min=0.0).mean(0)
        x_star = float(x_cand[int(jnp.argmax(ei)), 0])
        # Thompson sampling: argmax of one posterior function draw
        ts_draw = fs[0, :, 0]
        x_ts = float(x_cand[int(jnp.argmax(ts_draw)), 0])
        print(f"[{pred_type}] MC-EI argmax x={x_star:+.2f}; "
              f"Thompson draw argmax x={x_ts:+.2f}; max EI={float(ei.max()):.4f}")


if __name__ == "__main__":
    main()
