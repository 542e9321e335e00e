"""Sinusoid regression with a full Laplace posterior and post-hoc marglik tuning.

JAX counterpart of the reference's `examples/regression_example.py`: train a
1-50-1 tanh MLP MAP, fit an all-weights FullLaplace, tune (prior precision,
observation noise) by differentiating the log marginal likelihood, check
joint-vs-marginal predictive consistency, then do the same end-to-end with
`marglik_training`.

Run: PYTHONPATH=. python examples/regression_example.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from laplace_jax import Laplace
from laplace_jax.marglik_training import marglik_training
from laplace_jax.nnmodel import NNModel
from laplace_jax.utils.data import ArrayLoader

n_epochs = 500
rng = np.random.default_rng(711)

# toy sinusoid data
X_train = rng.uniform(0, 8, size=(150, 1))
y_train = np.sin(X_train) + rng.standard_normal((150, 1)) * 0.3
X_test = np.linspace(-4, 12, 200).reshape(-1, 1)
train_loader = ArrayLoader(X_train, y_train, batch_size=150)


class MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(50, param_dtype=jnp.float64)(x)
        x = jnp.tanh(x)
        return nn.Dense(1, param_dtype=jnp.float64)(x)


def train_map():
    model = MLP()
    params = model.init(jax.random.key(711), jnp.ones((1, 1)))
    nnm = NNModel.from_flax(model, params)
    theta = nnm.mean_vector
    opt = optax.adam(1e-2)
    state = opt.init(theta)

    @jax.jit
    def step(theta, state, x, y):
        loss, g = jax.value_and_grad(
            lambda t: jnp.mean((nnm.apply_vec(t, x) - y) ** 2)
        )(theta)
        updates, state = opt.update(g, state)
        return optax.apply_updates(theta, updates), state, loss

    for _ in range(n_epochs):
        for x, y in train_loader:
            theta, state, loss = step(theta, state, jnp.asarray(x), jnp.asarray(y))
    nnm.set_params(nnm.unflatten(theta))
    return nnm, float(loss)


nnm, final_loss = train_map()
print(f"MAP training loss: {final_loss:.4f}")

la = Laplace(nnm, "regression", subset_of_weights="all", hessian_structure="full")
la.fit(train_loader)

# post-hoc marglik optimization of (log prior precision, log sigma noise)
log_hyper = jnp.zeros(2)
opt = optax.adam(1e-1)
state = opt.init(log_hyper)


@jax.jit
def hyper_step(h, state):
    def neg_marglik(h):
        return -la.log_marginal_likelihood(jnp.exp(h[0:1]), jnp.exp(h[1]))

    val, g = jax.value_and_grad(neg_marglik)(h)
    updates, state = opt.update(g, state)
    return optax.apply_updates(h, updates), state, val


for _ in range(n_epochs):
    log_hyper, state, neg_marglik = hyper_step(log_hyper, state)
la.prior_precision = jnp.exp(log_hyper[0:1])
la.sigma_noise = jnp.exp(log_hyper[1])
print(
    f"sigma={float(la.sigma_noise):.2f}",
    f"prior precision={float(la.prior_precision[0]):.2f}",
    f"marglik={-float(neg_marglik):.2f}",
)

X_test_j = jnp.asarray(X_test)
f_mu, f_var = la(X_test_j)
f_mu_joint, f_cov = la(X_test_j, joint=True)
assert np.allclose(np.asarray(f_mu).ravel(), np.asarray(f_mu_joint))
assert np.allclose(np.asarray(f_var).ravel(), np.diag(np.asarray(f_cov)), atol=1e-8)
pred_std = np.sqrt(np.asarray(f_var).squeeze() + float(la.sigma_noise) ** 2)
print("predictive mean/std on 5 test points:")
for i in range(0, 200, 50):
    print(f"  x={X_test[i,0]:+.2f}  f={np.asarray(f_mu)[i,0]:+.3f} ± {pred_std[i]:.3f}")

# alternatively: online marglik training
model = MLP()
params = model.init(jax.random.key(711), jnp.ones((1, 1)))
la2, nnm2, margliks, losses = marglik_training(
    NNModel.from_flax(model, params),
    train_loader,
    likelihood="regression",
    hessian_structure="full",
    n_epochs=100,
    optimizer_kwargs={"learning_rate": 1e-2},
    prior_structure="scalar",
)
print(
    f"online: sigma={float(la2.sigma_noise):.2f}",
    f"prior precision={np.asarray(la2.prior_precision)}",
    f"final marglik={margliks[-1]:.2f}",
)
