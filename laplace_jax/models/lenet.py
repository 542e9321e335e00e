"""LeNet-style CNN (reference calibration example scale,
`examples/helper/` CNN on CIFAR/FMNIST)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LeNet(nn.Module):
    num_classes: int = 10
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        x = nn.Conv(6, (5, 5), dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (5, 5), dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(120, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.Dense(84, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
