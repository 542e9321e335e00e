"""WideResNet-16-4 (norm-free variant) — the reference's calibration example
model family (`examples/helper/wideresnet.py`), adapted to be KFAC-compatible
(no norm-layer parameters; Fixup-style scaled init)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class WideBlock(nn.Module):
    channels: int
    strides: tuple = (1, 1)
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=self.strides, use_bias=True,
                    dtype=self.dtype, kernel_init=nn.initializers.he_normal())(x)
        y = jax.nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        0.1, "fan_in", "truncated_normal"))(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype)(x)
        return jax.nn.relu(residual + y)


class WideResNet16x4(nn.Module):
    num_classes: int = 10
    widen_factor: int = 4
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.widen_factor
        x = nn.Conv(16, (3, 3), use_bias=False, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        for i, ch in enumerate((16 * k, 32 * k, 64 * k)):
            for j in range(2):  # depth 16 => (16-4)/6 = 2 blocks per stage
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = WideBlock(ch, strides, self.dtype)(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
