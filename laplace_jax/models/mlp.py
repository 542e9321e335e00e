"""Simple MLP for examples/tests (reference `tests/utils.py:46-69` model shape)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    hidden: Sequence[int] = (50,)
    out_dim: int = 1
    activation: str = "tanh"
    dtype: type = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = {"tanh": jnp.tanh, "relu": nn.relu, "gelu": nn.gelu}[self.activation]
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.dtype, param_dtype=self.dtype)(x)
            x = act(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=self.dtype)(x)
