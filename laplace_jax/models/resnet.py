"""CIFAR-style ResNet in flax, KFAC-compatible.

Used by the benchmark (BASELINE.md workload: ResNet-18 / CIFAR-10). Norm-free
residual blocks with scaled initialization (Fixup-style): every trainable leaf
belongs to a Conv/Dense layer, so all-weights KFAC factors are well-defined
(the reference's KFAC backends likewise only support Linear/Conv modules and
skip/refuse norm layers, `laplace/curvature/asdl.py:237-244`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResidualBlock(nn.Module):
    channels: int
    strides: tuple = (1, 1)
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=self.strides, use_bias=False,
                    dtype=self.dtype, kernel_init=nn.initializers.he_normal())(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        0.1, "fan_in", "truncated_normal"))(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype)(x)
        return jax.nn.relu(residual + y)


class ResNet(nn.Module):
    """ResNet-{18,34}-style CIFAR classifier (3x3 stem, 4 stages)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 10
    width: int = 64
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.width, (3, 3), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal())(x)
        x = jax.nn.relu(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = ResidualBlock(self.width * (2**i), strides, self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def ResNet18(num_classes: int = 10, width: int = 64, dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), num_classes=num_classes,
                  width=width, dtype=dtype)
