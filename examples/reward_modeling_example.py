"""Bayesian reward modeling with a Bradley-Terry likelihood.

JAX counterpart of the reference's `examples/reward_modeling_example.py`: fit
with `likelihood="reward_modeling"` on paired inputs `(B, 2, D)` (classification
over which of the two is preferred), then predict rewards with uncertainty as
regression on `(B, D)` (reference `laplace/baselaplace.py:59-63,1195-1197`).

Run: PYTHONPATH=. python examples/reward_modeling_example.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from laplace_jax import Laplace
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader


class RewardModel(nn.Module):
    """Scalar reward head; handles paired (B, 2, D) and single (B, D) inputs."""

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(32)(x)
        h = jnp.tanh(h)
        out = nn.Dense(1)(h)
        if x.ndim == 3:
            return out[..., 0]  # (B, 2): per-pair preference logits
        return out  # (B, 1): reward


def main():
    rng = np.random.default_rng(0)
    D, N = 8, 512
    true_w = rng.standard_normal(D)

    # preference pairs: y = 1 if the second item has higher true reward
    X_pairs = rng.standard_normal((N, 2, D)).astype(np.float32)
    rewards = X_pairs @ true_w
    y = (rewards[:, 1] > rewards[:, 0]).astype(np.int64)
    loader = ArrayLoader(X_pairs, y, batch_size=64, shuffle=True)

    model = RewardModel()
    params = model.init(jax.random.key(0), jnp.asarray(X_pairs[:1]))
    nnm = NNModel.from_flax(model, params)

    # train with Bradley-Terry (= 2-way cross entropy on the pair logits)
    theta = nnm.mean_vector
    opt = optax.adam(1e-2)
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

    for _ in range(100):
        for x, yb in loader:
            theta, state, loss = step(theta, state, jnp.asarray(x), jnp.asarray(yb))
    nnm.set_params(nnm.unflatten(theta))
    print(f"BT training loss: {float(loss):.4f}")

    # reward-modeling Laplace: classification during fit, regression at eval
    la = Laplace(
        nnm, "reward_modeling", subset_of_weights="all", hessian_structure="diag",
    )
    la.fit(loader)
    la.optimize_prior_precision(method="marglik", n_steps=50)

    X_eval = rng.standard_normal((5, D)).astype(np.float32)
    r_mu, r_var = la(jnp.asarray(X_eval), pred_type="glm")
    true_r = X_eval @ true_w
    print("reward predictions (mean ± std | true):")
    for i in range(5):
        print(
            f"  {float(r_mu[i,0]):+.2f} ± {float(jnp.sqrt(r_var[i,0,0])):.2f} "
            f"| {true_r[i]:+.2f}"
        )


if __name__ == "__main__":
    main()
