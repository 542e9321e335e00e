"""laplace-jax: TPU-native Laplace approximations for Bayesian deep learning.

A from-scratch JAX/XLA re-design with the capability surface of `laplace-torch`
(see SURVEY.md): parametric Laplace posteriors (full / KFAC / diagonal / low-rank)
over all weights, the last layer, or arbitrary subnetworks; a functional GP
variant; GLM/NN/GP predictives with probit / Laplace-bridge / MC links; and
differentiable marginal likelihood for hyperparameter tuning.
"""

from laplace_jax.baselaplace import (
    BaseLaplace,
    DiagLaplace,
    FullLaplace,
    KronLaplace,
    LowRankLaplace,
    ParametricLaplace,
)
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
from laplace_jax.functional_laplace import FunctionalLaplace, FunctionalLLLaplace
from laplace_jax.laplace import Laplace
from laplace_jax.lllaplace import (
    DiagLLLaplace,
    FullLLLaplace,
    KronLLLaplace,
    LLLaplace,
)
from laplace_jax.marglik_training import marglik_training
from laplace_jax.nnmodel import NNModel
from laplace_jax.subnetlaplace import (
    DiagSubnetLaplace,
    FullSubnetLaplace,
    SubnetLaplace,
)

__version__ = "0.1.0"

__all__ = [
    "BaseLaplace",
    "ParametricLaplace",
    "FullLaplace",
    "KronLaplace",
    "DiagLaplace",
    "LowRankLaplace",
    "LLLaplace",
    "FullLLLaplace",
    "KronLLLaplace",
    "DiagLLLaplace",
    "SubnetLaplace",
    "FullSubnetLaplace",
    "DiagSubnetLaplace",
    "FunctionalLaplace",
    "FunctionalLLLaplace",
    "Laplace",
    "marglik_training",
    "NNModel",
    "FeatureReduction",
    "HessianStructure",
    "Likelihood",
    "LinkApprox",
    "PredType",
    "PriorStructure",
    "SubsetOfWeights",
    "TuningMethod",
]
