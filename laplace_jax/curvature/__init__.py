from laplace_jax.curvature.backend import (
    CurvatureBackend,
    EFBackend,
    GGNBackend,
    HessianBackend,
    cross_entropy_sum,
    mse_sum,
)
from laplace_jax.curvature.kfac import conv_patches, kfac_factors
from laplace_jax.curvature.lanczos import lanczos_eig_curvature

__all__ = [
    "CurvatureBackend",
    "EFBackend",
    "GGNBackend",
    "HessianBackend",
    "cross_entropy_sum",
    "mse_sum",
    "conv_patches",
    "kfac_factors",
    "lanczos_eig_curvature",
]
