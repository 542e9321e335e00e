"""WideResNet-16-4 — the reference's calibration example model family
(`examples/helper/wideresnet.py`).

Two variants:

- ``norm=None`` (default): norm-free, Fixup-style scaled init — every
  parameter lives under a Dense/Conv layer so all KFAC groups are Kronecker.
- ``norm='batch' | 'group' | 'layer'``: the reference's actual architecture
  shape (`wideresnet.py` uses BatchNorm); norm scale/bias parameters are
  handled by the KFAC `kron_unsupported` policy (skip → prior fallback, or
  'block' → exact dense 1-factor blocks). BatchNorm runs in inference mode
  (running statistics), matching the reference's `model.eval()` during fit
  (`laplace/baselaplace.py:931`).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _make_norm(norm: Optional[str], dtype):
    if norm is None:
        return None
    if norm == "batch":
        return lambda: nn.BatchNorm(use_running_average=True, dtype=dtype)
    if norm == "group":
        return lambda: nn.GroupNorm(num_groups=8, dtype=dtype)
    if norm == "layer":
        return lambda: nn.LayerNorm(dtype=dtype)
    raise ValueError(f"Unknown norm {norm!r}; use None, 'batch', 'group', 'layer'.")


class WideBlock(nn.Module):
    channels: int
    strides: tuple = (1, 1)
    dtype: type = jnp.float32
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        mknorm = _make_norm(self.norm, self.dtype)
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=self.strides, use_bias=True,
                    dtype=self.dtype, kernel_init=nn.initializers.he_normal())(x)
        if mknorm is not None:
            y = mknorm()(y)
        y = jax.nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), use_bias=True, dtype=self.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        0.1, "fan_in", "truncated_normal"))(y)
        if mknorm is not None:
            y = mknorm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.channels, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype)(x)
        return jax.nn.relu(residual + y)


class WideResNet16x4(nn.Module):
    num_classes: int = 10
    widen_factor: int = 4
    dtype: type = jnp.float32
    norm: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        k = self.widen_factor
        x = nn.Conv(16, (3, 3), use_bias=False, dtype=self.dtype)(x)
        mknorm = _make_norm(self.norm, self.dtype)
        if mknorm is not None:
            x = mknorm()(x)
        x = jax.nn.relu(x)
        for i, ch in enumerate((16 * k, 32 * k, 64 * k)):
            for j in range(2):  # depth 16 => (16-4)/6 = 2 blocks per stage
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = WideBlock(ch, strides, self.dtype, self.norm)(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
