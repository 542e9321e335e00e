from laplace_jax.ops.im2col import im2col
from laplace_jax.ops.syrk import syrk, syrk_reference

__all__ = ["im2col", "syrk", "syrk_reference"]
