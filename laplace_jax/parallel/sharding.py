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

__all__ = [
    "data_mesh",
    "multihost_mesh",
    "DataParallel",
    "shard_closure",
    "shard_map_closure",
]


def data_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis_name,))


def multihost_mesh(
    dcn_axis: str = "replica",
    ici_axis: str = "data",
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Multi-host 2-axis mesh: one slow (DCN, across hosts/slices) axis × one
    fast (ICI, within a slice) axis.

    Calls `jax.distributed.initialize()` when not yet initialized (explicit
    coordinator arguments, or auto-detection on managed TPU pods), then lays
    the mesh out so that same-host devices are contiguous on the ICI axis —
    curvature `psum`s reduce over ICI first and cross DCN once. The reference
    has no distribution at all (SURVEY.md §2.6); this is the TPU-native
    equivalent of a multi-node data-parallel runtime.

    Single-process fallback: with one process this returns a
    (1, n_devices) mesh, so code written against (dcn, ici) axes runs
    unchanged on one host.
    """
    # NB: the already-initialized check must not touch the backend itself
    # (jax.process_count() would initialize it, making a subsequent
    # jax.distributed.initialize() always fail)
    def _distributed_uninitialized() -> bool:
        try:
            from jax._src import distributed

            return distributed.global_state.client is None
        except Exception:
            return True

    if (
        num_processes is not None and num_processes > 1
    ) or coordinator_address is not None:
        if _distributed_uninitialized():
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )

    n_hosts = jax.process_count()
    devices = jax.devices()
    if len(devices) % n_hosts != 0:
        raise ValueError(
            f"Non-uniform hosts: {len(devices)} devices across {n_hosts} "
            "processes; a (DCN, ICI) mesh needs the same device count per "
            "host."
        )
    per_host = len(devices) // n_hosts
    grid = np.asarray(devices).reshape(n_hosts, per_host)
    # same-host devices must be contiguous on the ICI axis (the default
    # jax.devices() order groups by process, but verify — the psum layout
    # and `_local_rows` batch blocks both rely on it)
    for row in grid:
        if len({d.process_index for d in row}) != 1:
            raise ValueError(
                "jax.devices() is not process-contiguous; cannot build a "
                "host-aligned (DCN, ICI) mesh."
            )
    return Mesh(grid, (dcn_axis, ici_axis))


def _axis_tuple(axis_name) -> tuple:
    return tuple(axis_name) if isinstance(axis_name, (tuple, list)) else (axis_name,)


def _is_multiprocess(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _local_rows(bsz: int) -> slice:
    """This process's contiguous row block of a globally-batched array.

    Contract for multi-process fits: every process's loader yields the SAME
    global batch; each process contributes the rows owned by its devices.
    `multihost_mesh` lays devices out process-contiguous in row-major order,
    so the batch-axis blocks are process-contiguous too."""
    n, i = jax.process_count(), jax.process_index()
    per = bsz // n
    return slice(i * per, (i + 1) * per)


def _make_global(x, sharding, n_dev: int):
    """Build a global batch-sharded array from the (identical) per-process
    view of the global batch: slice the local rows, assemble via
    `make_array_from_process_local_data` — the only legal way to construct a
    cross-process array (device_put to non-addressable devices is not)."""

    def one(v):
        v = np.asarray(v)
        return jax.make_array_from_process_local_data(
            sharding, v[_local_rows(v.shape[0])], v.shape
        )

    if isinstance(x, Mapping):
        return {k: one(v) for k, v in x.items()}
    return one(x)


def _batch_spec(mesh: Mesh, axis_name):
    """NamedSharding that splits the leading (batch) axis — over one mesh axis
    or jointly over several (DCN × ICI)."""
    return NamedSharding(mesh, P(_axis_tuple(axis_name)))


def _replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_closure(
    closure: Callable,
    mesh: Mesh,
    axis_name="data",
) -> Callable:
    """Jit a per-batch curvature closure `(params, x, y, N, key) -> (loss, H)`
    with the batch sharded over the mesh; the parameters are replicated and
    outputs are replicated, so XLA emits the cross-device reduction (psum) for
    every batch contraction. `axis_name` may be a tuple (e.g.
    ('replica', 'data') on a DCN × ICI mesh) — the batch then shards jointly
    over both axes."""
    batch_sharding = _batch_spec(mesh, axis_name)
    repl = _replicated(mesh)

    def put_spec(x):
        if isinstance(x, Mapping):
            return {k: batch_sharding for k in x}
        return batch_sharding

    def wrapped(params, x, y, N, key):
        return closure(params, x, y, N, key)

    n_dev = int(np.prod([mesh.shape[a] for a in _axis_tuple(axis_name)]))
    cache: dict = {}
    plain = jax.jit(wrapped)

    def _take(x, sl):
        if isinstance(x, Mapping):
            return {k: v[sl] for k, v in x.items()}
        return x[sl]

    multiprocess = _is_multiprocess(mesh)

    def call(params, x, y, N, key):
        bsz = _leading_dim(x)
        if multiprocess:
            # every process sees the same global batch and contributes its
            # contiguous row block; remainders can't run unsharded (a plain
            # per-process jit and a global program can't be mixed), so
            # require divisibility
            if bsz % n_dev != 0:
                raise ValueError(
                    f"Multi-process fit requires the batch size ({bsz}) to "
                    f"be divisible by the global device count ({n_dev})."
                )
            if "mp" not in cache:
                cache["mp"] = jax.jit(wrapped, out_shardings=repl)
            xg = _make_global(x, batch_sharding, n_dev)
            yg = _make_global(y, batch_sharding, n_dev)
            return cache["mp"](params, xg, yg, jnp.asarray(N), key)
        main = (bsz // n_dev) * n_dev
        if main == 0:  # batch smaller than the mesh: run unsharded
            return plain(params, x, y, jnp.asarray(N), key)
        kind = "dict" if isinstance(x, Mapping) else "array"
        if kind not in cache:
            param_spec = jax.tree_util.tree_map(lambda _: repl, params)
            in_shardings = (param_spec, put_spec(x), batch_sharding, repl, repl)
            cache[kind] = jax.jit(
                wrapped, in_shardings=in_shardings, out_shardings=repl
            )
        res = cache[kind](
            params, _take(x, slice(0, main)), y[:main], jnp.asarray(N), key
        )
        if main < bsz:  # curvature is batch-additive: add the remainder
            rest = plain(
                params, _take(x, slice(main, bsz)), y[main:], jnp.asarray(N),
                jax.random.fold_in(key, 1),
            )
            res = jax.tree_util.tree_map(lambda a, b: a + b, res, rest)
        return res

    return call


def _pvary(tree, axis_name):
    """Mark arrays as device-varying over `axis_name` (new shard_map "varying
    manual axes" semantics). Without this, autodiff w.r.t. replicated values
    inside the shard auto-inserts a psum on their cotangents — which corrupts
    per-shard Jacobians/per-sample gradients."""

    def mark(a):
        for ax in _axis_tuple(axis_name):
            if hasattr(jax.lax, "pcast"):
                a = jax.lax.pcast(a, ax, to="varying")
            else:
                a = jax.lax.pvary(a, ax)
        return a

    return jax.tree_util.tree_map(mark, tree)


def shard_map_closure(
    closure: Callable,
    mesh: Mesh,
    axis_name="data",
    model=None,
) -> Callable:
    """Explicit-collective variant: shard_map over the batch axis + psum.

    Requires the batch size to be divisible by the mesh size; per-shard PRNG
    keys are decorrelated by folding in the device index (matters for
    MC-Fisher curvature). The replicated parameter argument is marked
    device-varying inside the shard so jacrev/vjp stay shard-local (without
    this, autodiff w.r.t. an unvarying value auto-inserts a psum on its
    cotangent, double-reducing per-shard Jacobians)."""

    axes = _axis_tuple(axis_name)
    n_dev = int(np.prod([mesh.shape[a] for a in axes]))

    def sharded(params, x, y, N, key):
        def per_shard(ps, xs, ys, Ns, keys):
            shard_key = keys
            for ax in axes:
                shard_key = jax.random.fold_in(shard_key, jax.lax.axis_index(ax))
            loss, H = closure(_pvary(ps, axis_name), xs, ys, Ns, shard_key)
            return jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t, axes), (loss, H)
            )

        shard_map = jax.shard_map

        bspec = P(axes)
        x_specs = {k: bspec for k in x} if isinstance(x, Mapping) else bspec
        p_specs = jax.tree_util.tree_map(lambda _: P(), params)
        fn = shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(p_specs, x_specs, bspec, P(), P()),
            out_specs=P(),
        )
        return fn(params, x, y, jnp.asarray(N), key)

    jitted = jax.jit(sharded)
    multiprocess = _is_multiprocess(mesh)
    bspec_global = _batch_spec(mesh, axis_name)

    def call(params, x, y, N, key):
        bsz = _leading_dim(x)
        if bsz % n_dev != 0:
            raise ValueError(
                f"Batch size {bsz} not divisible by mesh size {n_dev}; use "
                "shard_closure (XLA-annotated) for uneven batches."
            )
        if multiprocess:
            x = _make_global(x, bspec_global, n_dev)
            y = _make_global(y, bspec_global, n_dev)
        return jitted(params, x, y, N, key)

    return call


def _leading_dim(x) -> int:
    if isinstance(x, Mapping):
        return next(iter(x.values())).shape[0]
    return x.shape[0]


class DataParallel:
    """Configuration object: attach to a Laplace instance (`la.parallel = dp`)
    or pass `parallel=dp` to constructors via `Laplace(...)` kwargs.

    `axis_name` may be a tuple for multi-axis batch sharding on a 2-D mesh,
    e.g. `DataParallel(multihost_mesh(), axis_name=("replica", "data"))` for
    DCN × ICI data parallelism across hosts."""

    def __init__(self, mesh: Optional[Mesh] = None, axis_name="data",
                 explicit: bool = False):
        if mesh is None:
            if isinstance(axis_name, (tuple, list)):
                raise ValueError(
                    "Multi-axis DataParallel needs an explicit mesh (e.g. "
                    "multihost_mesh())."
                )
            mesh = data_mesh(axis_name=axis_name)
        self.mesh = mesh
        self.axis_name = axis_name
        self.explicit = explicit

    def wrap(self, closure: Callable, model=None) -> Callable:
        if self.explicit:
            return shard_map_closure(closure, self.mesh, self.axis_name, model=model)
        return shard_closure(closure, self.mesh, self.axis_name)

    def shard_batch(self, x):
        """Place a test batch sharded over the data axis so downstream jitted
        predictives (Jacobians, GLM variance einsums) run data-parallel; batch
        sizes not divisible by the mesh are left as-is (with a debug log, so
        silently-slower predictives are diagnosable). In a multi-process
        runtime the batch is left process-local: predictive outputs must stay
        host-addressable for the eager link functions."""
        import logging

        if _is_multiprocess(self.mesh):
            if isinstance(x, Mapping):
                return {k: jnp.asarray(v) for k, v in x.items()}
            return jnp.asarray(x)
        sharding = _batch_spec(self.mesh, self.axis_name)
        n_dev = int(
            np.prod([self.mesh.shape[a] for a in _axis_tuple(self.axis_name)])
        )

        def put(v):
            if v.shape[0] % n_dev != 0:
                logging.debug(
                    "DataParallel.shard_batch: batch size %d not divisible by "
                    "mesh size %d; running this batch unsharded.",
                    v.shape[0], n_dev,
                )
                return v
            return jax.device_put(v, sharding)

        if isinstance(x, Mapping):
            return {k: put(jnp.asarray(v)) for k, v in x.items()}
        return put(jnp.asarray(x))
