"""Data-parallel curvature accumulation over a device mesh.

The reference is strictly single-process/single-device (SURVEY.md §2.6: no
`torch.distributed` anywhere). This module *introduces* distribution the
TPU-native way: the fit loop's per-batch curvature (`H += H_batch`,
reference `baselaplace.py:969-985`) is a sum over data points for every Hessian
structure (GGN/EF/KFAC/diag are all batch-additive), so each batch is sharded
over the mesh's data axis and XLA inserts the `psum` over ICI when the jitted
closure's output is required replicated.

Two modes:
- `shard_batch` (default): `jit` with `NamedSharding` annotations — the
  compiler chooses the collectives ("annotate shardings, let XLA insert
  collectives"). Handles uneven batch remainders.
- `explicit_shard_map`: `shard_map` + `jax.lax.psum` — deterministic collective
  placement, used by the equivalence tests.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["data_mesh", "DataParallel", "shard_closure", "shard_map_closure"]


def data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def _batch_spec(mesh: Mesh, axis_name: str):
    """NamedSharding that splits the leading (batch) axis."""
    return NamedSharding(mesh, P(axis_name))


def _replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_closure(
    closure: Callable,
    mesh: Mesh,
    axis_name: str = "data",
) -> Callable:
    """Jit a per-batch curvature closure `(x, y, N, key) -> (loss, H)` with the
    batch sharded over the mesh; outputs are replicated, so XLA emits the
    cross-device reduction (psum) for every batch contraction."""
    batch_sharding = _batch_spec(mesh, axis_name)
    repl = _replicated(mesh)

    def put_spec(x):
        if isinstance(x, Mapping):
            return {k: batch_sharding for k in x}
        return batch_sharding

    def wrapped(x, y, N, key):
        return closure(x, y, N, key)

    n_dev = mesh.shape[axis_name]
    cache: dict = {}
    plain = jax.jit(wrapped)

    def _take(x, sl):
        if isinstance(x, Mapping):
            return {k: v[sl] for k, v in x.items()}
        return x[sl]

    def call(x, y, N, key):
        bsz = _leading_dim(x)
        main = (bsz // n_dev) * n_dev
        if main == 0:  # batch smaller than the mesh: run unsharded
            return plain(x, y, jnp.asarray(N), key)
        kind = "dict" if isinstance(x, Mapping) else "array"
        if kind not in cache:
            in_shardings = (put_spec(x), batch_sharding, repl, repl)
            cache[kind] = jax.jit(
                wrapped, in_shardings=in_shardings, out_shardings=repl
            )
        res = cache[kind](
            _take(x, slice(0, main)), y[:main], jnp.asarray(N), key
        )
        if main < bsz:  # curvature is batch-additive: add the remainder
            rest = plain(
                _take(x, slice(main, bsz)), y[main:], jnp.asarray(N),
                jax.random.fold_in(key, 1),
            )
            res = jax.tree_util.tree_map(lambda a, b: a + b, res, rest)
        return res

    return call


def _pvary(tree, axis_name: str):
    """Mark arrays as device-varying over `axis_name` (new shard_map "varying
    manual axes" semantics). Without this, autodiff w.r.t. replicated values
    inside the shard auto-inserts a psum on their cotangents — which corrupts
    per-shard Jacobians/per-sample gradients."""
    if hasattr(jax.lax, "pcast"):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.pcast(a, axis_name, to="varying"), tree
        )
    return jax.tree_util.tree_map(lambda a: jax.lax.pvary(a, axis_name), tree)


def shard_map_closure(
    closure: Callable,
    mesh: Mesh,
    axis_name: str = "data",
    model=None,
) -> Callable:
    """Explicit-collective variant: shard_map over the batch axis + psum.

    Requires the batch size to be divisible by the mesh size; per-shard PRNG
    keys are decorrelated by folding in the device index (matters for
    MC-Fisher curvature). If `model` (an NNModel whose parameters the closure
    differentiates against) is given, its parameters are marked device-varying
    inside the shard so jacrev/vjp stay shard-local."""

    n_dev = mesh.shape[axis_name]

    def sharded(x, y, N, key):
        def per_shard(xs, ys, Ns, keys):
            shard_key = jax.random.fold_in(keys, jax.lax.axis_index(axis_name))
            if model is not None:
                orig = model.train_params
                model.train_params = _pvary(orig, axis_name)
                try:
                    loss, H = closure(xs, ys, Ns, shard_key)
                finally:
                    model.train_params = orig
            else:
                loss, H = closure(xs, ys, Ns, shard_key)
            return jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t, axis_name), (loss, H)
            )

        shard_map = jax.shard_map

        x_specs = (
            {k: P(axis_name) for k in x} if isinstance(x, Mapping) else P(axis_name)
        )
        fn = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(x_specs, P(axis_name), P(), P()),
            out_specs=P(),
        )
        return fn(x, y, jnp.asarray(N), key)

    jitted = jax.jit(sharded)

    def call(x, y, N, key):
        bsz = _leading_dim(x)
        if bsz % n_dev != 0:
            raise ValueError(
                f"Batch size {bsz} not divisible by mesh size {n_dev}; use "
                "shard_closure (XLA-annotated) for uneven batches."
            )
        return jitted(x, y, N, key)

    return call


def _leading_dim(x) -> int:
    if isinstance(x, Mapping):
        return next(iter(x.values())).shape[0]
    return x.shape[0]


class DataParallel:
    """Configuration object: attach to a Laplace instance (`la.parallel = dp`)
    or pass `parallel=dp` to constructors via `Laplace(...)` kwargs."""

    def __init__(self, mesh: Optional[Mesh] = None, axis_name: str = "data",
                 explicit: bool = False):
        self.mesh = mesh if mesh is not None else data_mesh(axis_name=axis_name)
        self.axis_name = axis_name
        self.explicit = explicit

    def wrap(self, closure: Callable, model=None) -> Callable:
        if self.explicit:
            return shard_map_closure(closure, self.mesh, self.axis_name, model=model)
        return shard_closure(closure, self.mesh, self.axis_name)

    def shard_batch(self, x):
        """Place a test batch sharded over the data axis so downstream jitted
        predictives (Jacobians, GLM variance einsums) run data-parallel; batch
        sizes not divisible by the mesh are left as-is."""
        sharding = _batch_spec(self.mesh, self.axis_name)
        n_dev = self.mesh.shape[self.axis_name]

        def put(v):
            if v.shape[0] % n_dev != 0:
                return v
            return jax.device_put(v, sharding)

        if isinstance(x, Mapping):
            return {k: put(jnp.asarray(v)) for k, v in x.items()}
        return put(jnp.asarray(x))
