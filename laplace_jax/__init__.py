"""laplace-jax: TPU-native Laplace approximations for Bayesian deep learning.

A from-scratch JAX/XLA re-design with the capability surface of `laplace-torch`
(see SURVEY.md): parametric Laplace posteriors (full / KFAC / diagonal / low-rank)
over all weights, the last layer, or arbitrary subnetworks; a functional GP
variant; GLM/NN/GP predictives with probit / Laplace-bridge / MC links; and
differentiable marginal likelihood for hyperparameter tuning.
"""

from laplace_jax.enums import (
    FeatureReduction,
    HessianStructure,
    Likelihood,
    LinkApprox,
    PredType,
    PriorStructure,
    SubsetOfWeights,
    TuningMethod,
)

__version__ = "0.1.0"

__all__ = [
    "FeatureReduction",
    "HessianStructure",
    "Likelihood",
    "LinkApprox",
    "PredType",
    "PriorStructure",
    "SubsetOfWeights",
    "TuningMethod",
]
