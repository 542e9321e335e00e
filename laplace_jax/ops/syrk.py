"""Pallas TPU kernel: symmetric rank-k update `H = Aᵀ A`.

The FullLaplace fit contracts per-batch (rows, P) "square-root curvature"
matrices into a P×P GGN/EF block (`H += (Λ^{1/2}J)ᵀ(Λ^{1/2}J)`,
reference `curvature/curvature.py:375-411`). XLA computes the full product; this
kernel exploits symmetry and computes only the lower-triangular tiles on the
MXU — ~2× fewer FLOPs at large P — then mirrors.

Grid: one program per lower-triangular (i, j) tile pair, j ≤ i, scanning the
row dimension in VMEM-sized chunks. Falls back to a plain einsum off-TPU or for
unaligned shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["syrk", "syrk_reference"]

TILE = 128


def syrk_reference(A: jnp.ndarray) -> jnp.ndarray:
    """Plain XLA fallback."""
    return jnp.einsum("rp,rq->pq", A, A)


def _tri_pairs(n_tiles: int):
    pairs = []
    for i in range(n_tiles):
        for j in range(i + 1):
            pairs.append((i, j))
    return pairs


def syrk(A: jnp.ndarray) -> jnp.ndarray:
    """Symmetric rank-k update with a lower-triangular Pallas grid.

    A: (R, P). Returns AᵀA (P, P). Requires P % 128 == 0 and R % 8 == 0 and a
    TPU backend; otherwise falls back to the einsum.
    """
    R, P = A.shape
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu or P % TILE != 0 or R % 8 != 0 or A.dtype not in (
        jnp.float32,
        jnp.bfloat16,
    ):
        return syrk_reference(A)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_tiles = P // TILE
    pairs = _tri_pairs(n_tiles)
    i_map = jnp.asarray([p[0] for p in pairs], dtype=jnp.int32)
    j_map = jnp.asarray([p[1] for p in pairs], dtype=jnp.int32)

    def kernel(i_ref, j_ref, a_i_ref, a_j_ref, out_ref):
        out_ref[:, :] = jnp.dot(
            a_i_ref[:, :].T, a_j_ref[:, :], preferred_element_type=jnp.float32
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(pairs),),
        in_specs=[
            pl.BlockSpec((R, TILE), lambda p, i_map, j_map: (0, i_map[p]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, TILE), lambda p, i_map, j_map: (0, j_map[p]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda p, i_map, j_map: (i_map[p], j_map[p]),
            memory_space=pltpu.VMEM,
        ),
    )

    tri = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, P), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * R * TILE * TILE * len(pairs),
            bytes_accessed=(2 * R * TILE * 4 + TILE * TILE * 4) * len(pairs),
            transcendentals=0,
        ),
    )(i_map, j_map, A, A)

    # mirror the strict lower-triangular tiles to the upper half
    lower = jnp.tril(tri)
    return (lower + lower.T - jnp.diag(jnp.diagonal(tri))).astype(A.dtype)
