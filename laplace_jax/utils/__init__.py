from laplace_jax.utils.data import ArrayLoader, dataset_size
from laplace_jax.utils.flatten import (
    LeafSpec,
    leaf_specs,
    make_unflatten,
    merge,
    num_params,
    params_per_leaf,
    partition,
    tree_to_vector,
)
from laplace_jax.utils.linalg import (
    block_diag,
    diagonal_add_scalar,
    invsqrt_precision,
    is_valid_scalar,
    kron,
    normal_samples,
    symeig,
)
from laplace_jax.utils.matrix import Kron, KronDecomposed
from laplace_jax.utils.metrics import RunningMSEMetric, RunningNLLMetric, get_nll
from laplace_jax.utils.prior import (
    expand_prior_precision,
    expand_prior_precision_sizes,
    fix_prior_prec_structure,
)
from laplace_jax.utils.serialization import load_state_dict, save_state_dict
from laplace_jax.utils.sod import sod_indices
from laplace_jax.utils.subnetmask import (
    LargestMagnitudeSubnetMask,
    LargestVarianceDiagLaplaceSubnetMask,
    LargestVarianceSWAGSubnetMask,
    LastLayerSubnetMask,
    ModuleNameSubnetMask,
    ParamNameSubnetMask,
    RandomSubnetMask,
    SubnetMask,
)
from laplace_jax.utils.swag import fit_diagonal_swag_var
from laplace_jax.utils.validate import validate

__all__ = [
    "ArrayLoader",
    "dataset_size",
    "LeafSpec",
    "leaf_specs",
    "make_unflatten",
    "merge",
    "num_params",
    "params_per_leaf",
    "partition",
    "tree_to_vector",
    "block_diag",
    "diagonal_add_scalar",
    "invsqrt_precision",
    "is_valid_scalar",
    "kron",
    "normal_samples",
    "symeig",
    "Kron",
    "KronDecomposed",
    "RunningMSEMetric",
    "RunningNLLMetric",
    "get_nll",
    "expand_prior_precision",
    "expand_prior_precision_sizes",
    "fix_prior_prec_structure",
    "sod_indices",
    "save_state_dict",
    "load_state_dict",
    "SubnetMask",
    "RandomSubnetMask",
    "LargestMagnitudeSubnetMask",
    "LargestVarianceDiagLaplaceSubnetMask",
    "LargestVarianceSWAGSubnetMask",
    "ParamNameSubnetMask",
    "ModuleNameSubnetMask",
    "LastLayerSubnetMask",
    "fit_diagonal_swag_var",
    "validate",
]
