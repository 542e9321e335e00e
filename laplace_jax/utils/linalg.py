"""Dense linear-algebra utilities.

TPU-native counterparts of the reference's `laplace/utils/utils.py` numeric helpers:
`symeig` (jitter-retry eigh, `utils/utils.py:193-228`), `invsqrt_precision`
(`:118-129`), `kron` (`:148-173`), `block_diag` (`:231-249`) and `normal_samples`
(`:337-377`). All functions are pure jnp and jittable; `symeig` does its NaN-retry
host-side because it is only called from un-jitted epilogue code (Kron.decompose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def symeig(M: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric eigendecomposition with non-negative clamped eigenvalues.

    Returns (eigenvalues, eigenvectors). If the decomposition produces NaNs
    (ill-conditioned input), retries once with unit jitter on the diagonal —
    the same `W (L + I) W^T` trick as the reference (`utils/utils.py:208-218`).
    """
    L, W = jnp.linalg.eigh(M, symmetrize_input=True)
    if not isinstance(L, jax.core.Tracer):  # host-side call: allow retry
        if bool(jnp.isnan(L).any()) or bool(jnp.isnan(W).any()):
            eye = jnp.eye(M.shape[-1], dtype=M.dtype)
            L, W = jnp.linalg.eigh(M + eye, symmetrize_input=True)
            L = L - 1.0
    L = jnp.nan_to_num(jnp.clip(L, min=0.0))
    W = jnp.nan_to_num(W)
    return L, W


def invsqrt_precision(M: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular scale `S` with `S S^T = M^{-1}` for precision matrix `M`.

    Same contract as torch's `_precision_to_scale_tril` used by the reference
    (`utils/utils.py:118-129`): Cholesky of the precision, invert, re-orient.
    """
    Lf = jnp.linalg.cholesky(jnp.flip(M, (-2, -1)))
    L_inv = jnp.flip(Lf, (-2, -1)).T  # lower triangular with L_inv L_inv^T = ... = M
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    scale = jax.scipy.linalg.solve_triangular(L_inv, eye, lower=True)
    return scale


def kron(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Kronecker product (reference: `utils/utils.py:148-173`)."""
    return jnp.kron(A, B)


def block_diag(blocks: list[jnp.ndarray]) -> jnp.ndarray:
    """Block-diagonal matrix from square blocks (reference: `utils/utils.py:231-249`)."""
    return jax.scipy.linalg.block_diag(*blocks)


def diagonal_add_scalar(X: jnp.ndarray, value) -> jnp.ndarray:
    """Add a scalar to the diagonal (reference: `utils/utils.py:176-190`)."""
    return X + value * jnp.eye(X.shape[0], dtype=X.dtype)


def normal_samples(
    mean: jnp.ndarray,
    var: jnp.ndarray,
    n_samples: int,
    key: jax.Array,
) -> jnp.ndarray:
    """Sample from a batch of Normals with diagonal or full covariance.

    mean: (batch, dim); var: (batch, dim) diagonal or (batch, dim, dim) full.
    Returns samples of shape (n_samples, batch, dim).
    Parity: `laplace/utils/utils.py:337-377`.
    """
    if mean.ndim != 2:
        raise ValueError("Invalid input shape of mean, should be 2-dimensional.")
    _, output_dim = mean.shape
    randn = jax.random.normal(key, (output_dim, n_samples), dtype=mean.dtype)

    if mean.shape == var.shape:  # diagonal covariance
        scaled = jnp.sqrt(var)[..., None] * randn[None, ...]
        return jnp.transpose(mean[..., None] + scaled, (2, 0, 1))
    elif var.ndim == 3 and var.shape[:2] == mean.shape and var.shape[-1] == mean.shape[1]:
        scale = jnp.linalg.cholesky(var)
        scaled = scale @ randn[None, ...]
        return jnp.transpose(mean[..., None] + scaled, (2, 0, 1))
    else:
        raise ValueError("Invalid input shapes.")


def is_valid_scalar(scalar) -> bool:
    """True for python scalars or 0/1-dim single-element arrays.

    Parity: `laplace/utils/utils.py:136-145`.
    """
    import numpy as np

    if isinstance(scalar, (int, float)) or (
        isinstance(scalar, np.generic) and np.isreal(scalar)
    ):
        return True
    if isinstance(scalar, (jnp.ndarray, jax.core.Tracer, np.ndarray)):
        if scalar.ndim == 0:
            return True
        if scalar.ndim == 1 and scalar.shape[0] == 1:
            return True
    return False
