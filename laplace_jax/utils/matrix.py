"""Kronecker-factored curvature containers as JAX pytrees.

TPU-native re-design of the reference's `laplace/utils/matrix.py` (`Kron`
`:16-279`, `KronDecomposed` `:282-561`). The math is identical; the layout
convention differs because JAX kernels are stored input-major:

- A parameter leaf of shape ``(..., out)`` (flax Dense ``(in, out)``, Conv
  ``(kh, kw, in, out)``) maps to a 2-factor group ``[A, B]`` with
  ``A: (prod(lead), prod(lead))`` (input/activation factor) and ``B: (out, out)``
  (output-gradient factor). Under the canonical row-major flatten the dense
  block is ``A ⊗ B`` (the reference stores ``[B, A]`` because torch weights are
  ``(out, in)``; `matrix.py:62-73`).
- A 1-dim leaf (bias, norm scale) maps to a 1-factor group ``[F]`` with a dense
  ``(P, P)`` block (`matrix.py:59-61`).

Both classes are registered pytrees, so they can be produced inside `jit`,
accumulated with `+` across sharded batches, and differentiated through
(`logdet`/`bmm` are used in the marginal likelihood).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

import numpy as np

from laplace_jax.utils.linalg import block_diag, kron, symeig

__all__ = ["Kron", "KronDecomposed"]

# Eigensolver override for Kron.decompose on TPU/GPU: "ts" (two-stage
# classical path: blocked Householder tridiagonalization + batched secular
# D&C + WY back-transform, `laplace_jax.ops.tridiag_eig` — ~3n^3 FLOPs vs
# QDWH-eig's ~60-100n^3), "dc" (host-driven level-batched spectral
# divide-and-conquer, `laplace_jax.ops.eigh_dc`), "qdwh" (XLA's
# serial-agenda spectral D&C), "jacobi", or None for the platform default.
# The platform default on TPU/GPU is "ts" for f32/f64 factors of size
# >= _TS_MIN_SIZE (measured on v5e at the ResNet-18 KFAC factor set
# (3x4608, 4x2304, 4x1152, ...): ts 2.35s vs QDWH 3.78s vs dc 5.6-9.6s vs
# Jacobi 4-50x slower than QDWH; see docs/performance.md), with a
# per-factor NaN fallback to the jitter-retry `symeig` path. CPU always
# uses LAPACK via the platform default.
EIGH_IMPLEMENTATION: str | None = None

# Below this factor size the serial XLA path is fine (Jacobi base case
# directly); the DC driver's host round-trips would not pay for themselves.
_DC_MIN_SIZE = 512


import functools


@functools.partial(jax.jit, static_argnames=("impl",))
def _batched_eigh_jit(stack: jnp.ndarray, impl: str | None = None):
    """Batched eigendecomposition of a (k, n, n) stack with the decompose
    post-processing fused in: per-factor NaN flags on the raw output, then
    eigenvalue clipping at 0 and nan_to_num (reference `matrix.py:123-150`
    semantics)."""
    if impl is None:
        l, Q = jnp.linalg.eigh(stack, symmetrize_input=True)
    else:
        implementation = {
            "jacobi": jax.lax.linalg.EighImplementation.JACOBI,
            "qdwh": jax.lax.linalg.EighImplementation.QDWH,
        }[impl]
        Q, l = jax.lax.linalg.eigh(
            stack, symmetrize_input=True, implementation=implementation
        )
    flags = jnp.isnan(l).any(axis=1) | jnp.isnan(Q).any(axis=(1, 2))
    return jnp.nan_to_num(jnp.clip(l, min=0.0)), jnp.nan_to_num(Q), flags


@jax.jit
def _clip_flags(l: jnp.ndarray, Q: jnp.ndarray):
    flags = jnp.isnan(l).any(axis=1) | jnp.isnan(Q).any(axis=(1, 2))
    return jnp.nan_to_num(jnp.clip(l, min=0.0)), jnp.nan_to_num(Q), flags


def _use_dc(n: int) -> bool:
    if jax.default_backend() not in ("tpu", "gpu"):
        return False
    return EIGH_IMPLEMENTATION == "dc" and n >= _DC_MIN_SIZE


# Below this size the two-stage path's fixed per-level overheads do not pay
# for themselves against a plain batched eigh dispatch. Measured on v5e
# (scripts/bench_ts_min_size.py, warm, K=4 stacks): TS loses below n=512
# (n=128: 0.9x, n=256: ~1x) and wins clearly from n=512 up (1.4-1.6x at
# 512-1024, growing with n); see docs/performance.md.
_TS_MIN_SIZE = 512

# Wall-clock budget (seconds) for compiling the two-stage eigensolver
# program for a new (shape, dtype, device) signature. Cold XLA compiles of
# the TS program can take minutes on remote-compile toolchains; rather than
# stalling the caller's decompose unboundedly, the TS dispatch runs in a
# background thread and, if it has not come back within the budget, this
# decompose falls back to the stock batched eigh (QDWH on TPU) with a
# warning while the compile keeps running — the NEXT decompose of the same
# signature gets the two-stage path warm. Override via the
# LAPLACE_TS_COMPILE_BUDGET_SEC env var; non-positive disables the budget
# (always wait for TS).
TS_COMPILE_BUDGET_SEC: float = 120.0

_ts_ready: set = set()  # (shape, dtype, device) signatures known warm
_ts_pool = None  # lazy ThreadPoolExecutor for background TS compiles
_ts_pending: dict = {}  # signature -> Future of a running background compile


def _use_ts(n: int, dtype=None) -> bool:
    if jax.default_backend() not in ("tpu", "gpu"):
        return False
    if n < _TS_MIN_SIZE:
        return False
    if EIGH_IMPLEMENTATION == "ts":
        return True
    # default-on: the two-stage path beats QDWH across measured factor
    # sets; restricted to real float dtypes it is built and tested for
    return EIGH_IMPLEMENTATION is None and (
        dtype is None or jnp.dtype(dtype) in (jnp.float32, jnp.float64)
    )


def _ts_budget_sec() -> float:
    import os

    v = os.environ.get("LAPLACE_TS_COMPILE_BUDGET_SEC")
    return float(v) if v is not None else TS_COMPILE_BUDGET_SEC


def _ts_signature(stack) -> tuple:
    devs = getattr(stack, "devices", None)
    dev = tuple(sorted(map(str, devs()))) if callable(devs) else None
    return (stack.shape, str(stack.dtype), dev)


def _ts_dispatch_budgeted(stack):
    """Dispatch `eigh_stack_ts(stack)`, bounding COMPILE time (not run time).

    Returns `(l, Q)` or None if the program is cold and its compile exceeded
    the budget (caller falls back to the stock eigh). jit dispatch is
    asynchronous — it returns right after trace+compile, before the device
    finishes — so waiting on the dispatch in a worker thread times exactly
    the compile. A timed-out compile keeps running in the worker and marks
    the signature ready when done, so only the first decompose pays."""
    from laplace_jax.ops.tridiag_eig import eigh_stack_ts

    sig = _ts_signature(stack)
    budget = _ts_budget_sec()
    if sig in _ts_ready or budget <= 0:
        return eigh_stack_ts(stack)

    global _ts_pool
    if _ts_pool is None:
        import concurrent.futures

        _ts_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="laplace-ts-compile"
        )
    fut = _ts_pending.get(sig)
    if fut is None:
        fut = _ts_pool.submit(eigh_stack_ts, stack)
        fut.add_done_callback(
            lambda f, sig=sig: (
                _ts_ready.add(sig) if f.exception() is None else None,
                _ts_pending.pop(sig, None),
            )
        )
        _ts_pending[sig] = fut
    import concurrent.futures as _cf

    try:
        out = fut.result(timeout=budget)
        _ts_ready.add(sig)
        return out
    except _cf.TimeoutError:
        import warnings

        warnings.warn(
            f"Two-stage eigensolver compile for {sig[0]} {sig[1]} exceeded "
            f"the {budget:.0f}s budget (LAPLACE_TS_COMPILE_BUDGET_SEC); "
            "falling back to the stock batched eigh for this decompose. The "
            "compile continues in the background and later decomposes of "
            "this shape will use the two-stage path.",
            RuntimeWarning,
        )
        return None


def _batched_eigh_clipped(stack: jnp.ndarray):
    if _use_ts(stack.shape[-1], stack.dtype):
        out = _ts_dispatch_budgeted(stack)
        if out is not None:
            return _clip_flags(*out)
    if _use_dc(stack.shape[-1]):
        from laplace_jax.ops.eigh_dc import eigh_stack_dc

        l, Q = eigh_stack_dc(stack)
        return _clip_flags(l, Q)
    impl = (
        EIGH_IMPLEMENTATION
        if jax.default_backend() in ("tpu", "gpu")
        and EIGH_IMPLEMENTATION not in ("dc", "ts")
        else None
    )
    return _batched_eigh_jit(stack, impl=impl)


def _device_list(devices):
    """Normalize a devices argument: None, a Mesh, or a device sequence.
    Restricted to THIS process's addressable devices — explicit
    `device_put` to another host's device is illegal, and each host of a
    multihost mesh decomposing its addressable shard-mates' factors locally
    is exactly the right division of labor anyway."""
    if devices is None:
        return None
    if hasattr(devices, "devices"):  # jax.sharding.Mesh
        devices = list(np.asarray(devices.devices).ravel())
    else:
        devices = list(devices)
    pid = jax.process_index()
    local = [d for d in devices if d.process_index == pid]
    return local if local else devices[:1]


def _local_view(x):
    """A process-local view of a (fully replicated) global array — global
    arrays cannot be device_put to a single local device directly. Factors
    reaching decompose under a multi-process mesh are replicated, so one
    addressable shard is the whole value."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x.addressable_data(0)
    return x


def _group_sizes(kfacs) -> list[int]:
    """Flattened parameter count of each factor group."""
    sizes = []
    for F in kfacs:
        if len(F) == 1:
            sizes.append(F[0].shape[0])
        else:
            sizes.append(F[0].shape[0] * F[1].shape[0])
    return sizes


@jax.tree_util.register_pytree_node_class
class Kron:
    """Sum-accumulable Kronecker-factored curvature (reference `matrix.py:16`).

    `kfacs` is a tuple of factor groups; each group is a tuple of one dense
    block ``(F,)`` or two Kronecker factors ``(A, B)``.
    """

    def __init__(self, kfacs: Sequence[Sequence[jnp.ndarray]]):
        self.kfacs = tuple(tuple(F) for F in kfacs)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = tuple(H for F in self.kfacs for H in F)
        aux = tuple(len(F) for F in self.kfacs)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        kfacs, i = [], 0
        for n in aux:
            kfacs.append(tuple(children[i : i + n]))
            i += n
        obj = cls.__new__(cls)
        obj.kfacs = tuple(kfacs)
        return obj

    # -- construction ------------------------------------------------------
    @classmethod
    def init_from_params(cls, params, dtype=None) -> "Kron":
        """Zero-initialized factors shaped from a parameter pytree.

        Mirrors `Kron.init_from_model` (`matrix.py:33-77`) with the input-major
        convention: leaves iterate in canonical flatten order.
        """
        kfacs = []
        for p in jax.tree_util.tree_leaves(params):
            dt = dtype or p.dtype
            if p.ndim <= 1:  # bias / scale / scalar
                P = max(int(p.size), 1)
                kfacs.append((jnp.zeros((P, P), dtype=dt),))
            else:
                # any leading-dims x last-dim split (Dense (in, out), Conv
                # (kh, kw, in, out), einsum kernels of any rank)
                p_in = int(jnp.prod(jnp.asarray(p.shape[:-1])))
                p_out = int(p.shape[-1])
                kfacs.append(
                    (
                        jnp.zeros((p_in, p_in), dtype=dt),
                        jnp.zeros((p_out, p_out), dtype=dt),
                    )
                )
        return cls(kfacs)

    # -- algebra -------------------------------------------------------------
    def __add__(self, other: "Kron") -> "Kron":
        if not isinstance(other, Kron):
            raise ValueError("Can only add Kron to Kron.")
        kfacs = [
            tuple(Hi + Hj for Hi, Hj in zip(Fi, Fj))
            for Fi, Fj in zip(self.kfacs, other.kfacs)
        ]
        return Kron(kfacs)

    def __mul__(self, scalar) -> "Kron":
        """Scalar multiply, distributed as `scalar**(1/len(F))` per factor
        (reference `matrix.py:100-118`)."""
        kfacs = [
            tuple((scalar ** (1.0 / len(F))) * Hi for Hi in F) for F in self.kfacs
        ]
        return Kron(kfacs)

    __radd__ = __add__
    __rmul__ = __mul__

    def __len__(self) -> int:
        return len(self.kfacs)

    @property
    def group_sizes(self) -> list[int]:
        return _group_sizes(self.kfacs)

    def decompose(self, damping: bool = False,
                  devices=None) -> "KronDecomposed":
        """Eigendecompose each factor (reference `matrix.py:123-150`).

        Factors are grouped by shape; on TPU all classes at or above
        `_DC_MIN_SIZE` can be decomposed TOGETHER by the level-batched
        spectral divide-and-conquer driver (`laplace_jax.ops.eigh_dc`, opt-in
        via `EIGH_IMPLEMENTATION`), which pools same-level subproblems across
        the whole factor set into shared vmapped dispatches — XLA's own eigh
        would run one serial agenda per factor. Remaining classes go through
        one batched `eigh` dispatch per shape. Everything is NaN-checked with
        a single host sync at the end; only offending factors take the
        jitter-retry path (`symeig`).

        `devices`: optional sequence of jax devices (or a `Mesh`) to spread
        the factor eigendecompositions over. Per-factor eigh problems are
        INDEPENDENT, so the decompose epilogue — the wall-clock wall of a
        KFAC fit on one chip (~5 s for ResNet-18 factors on a v5e; see
        ROADMAP) — scales linearly with chips: factors are greedily assigned
        to devices by n^3 cost (largest first) and dispatched asynchronously
        via explicit placement; results are gathered back to the default
        device. No SPMD program is involved, so heterogeneous factor shapes
        cost nothing. With one device (or None) behavior is unchanged."""
        dev_list = _device_list(devices)
        if dev_list is not None and len(dev_list) > 1:
            mesh = devices if hasattr(devices, "devices") else None
            return self._decompose_multi_device(dev_list, damping, mesh)

        by_shape: dict = {}
        for gi, F in enumerate(self.kfacs):
            for fi, Hi in enumerate(F):
                by_shape.setdefault(
                    (Hi.shape, jnp.dtype(Hi.dtype)), []
                ).append((gi, fi, Hi))

        results = {}
        flag_parts, flag_keys = [], []
        dc_by_dtype: dict = {}
        for (shape, dt), items in by_shape.items():
            stack = jnp.stack([Hi for _, _, Hi in items])
            if _use_dc(shape[-1]):
                dc_by_dtype.setdefault(dt, ([], []))
                dc_by_dtype[dt][0].append(stack)
                dc_by_dtype[dt][1].append(items)
                continue
            ls, Qs, flags = _batched_eigh_clipped(stack)
            flag_parts.append(flags)
            for j, (gi, fi, _) in enumerate(items):
                results[(gi, fi)] = (ls[j], Qs[j])
                flag_keys.append((gi, fi))

        if dc_by_dtype:
            from laplace_jax.ops.eigh_dc import eigh_pooled_dc

            for dc_stacks, dc_items in dc_by_dtype.values():
                for (ls_raw, Qs_raw), items in zip(
                    eigh_pooled_dc(dc_stacks), dc_items
                ):
                    ls, Qs, flags = _clip_flags(ls_raw, Qs_raw)
                    flag_parts.append(flags)
                    for j, (gi, fi, _) in enumerate(items):
                        results[(gi, fi)] = (ls[j], Qs[j])
                        flag_keys.append((gi, fi))

        flags = np.asarray(jnp.concatenate(flag_parts))  # ONE host sync
        for (gi, fi), bad in zip(flag_keys, flags):
            if bad:
                results[(gi, fi)] = symeig(self.kfacs[gi][fi])  # jitter retry

        eigvecs, eigvals = [], []
        for gi, F in enumerate(self.kfacs):
            Qs = tuple(results[(gi, fi)][1] for fi in range(len(F)))
            ls = tuple(results[(gi, fi)][0] for fi in range(len(F)))
            eigvecs.append(Qs)
            eigvals.append(ls)
        return KronDecomposed(tuple(eigvecs), tuple(eigvals), damping=damping)

    def _decompose_multi_device(self, dev_list, damping,
                                mesh=None) -> "KronDecomposed":
        """Spread per-factor eigh problems over `dev_list` (see `decompose`)."""
        # greedy longest-processing-time assignment by n^3 cost
        items = [
            (gi, fi, Hi)
            for gi, F in enumerate(self.kfacs)
            for fi, Hi in enumerate(F)
        ]
        items.sort(key=lambda t: -t[2].shape[0] ** 3)
        loads = [0.0] * len(dev_list)
        per_dev: list = [[] for _ in dev_list]
        for gi, fi, Hi in items:
            d = int(np.argmin(loads))
            loads[d] += float(Hi.shape[0]) ** 3
            per_dev[d].append((gi, fi, Hi))

        # gather target: replicate over the mesh when one is given so the
        # results compose with mesh-replicated fit state (mixing arrays
        # committed to one device with replicated ones is a placement error).
        # On a multi-process mesh, device_put of a committed local array to a
        # global sharding would be a cross-host transfer (unsupported without
        # DCN transfer sockets); every process computed identical results, so
        # replicating identical host values is both legal and transfer-free.
        multiproc = False
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            default = NamedSharding(mesh, PartitionSpec())
            multiproc = len({d.process_index for d in mesh.devices.flat}) > 1
        else:
            default = jax.devices()[0]

        def _gather(v):
            if multiproc:
                v = np.asarray(v)
            return jax.device_put(v, default)
        results = {}
        flag_parts, flag_keys = [], []
        pending = []
        for d, dev_items in enumerate(per_dev):
            by_shape: dict = {}
            for gi, fi, Hi in dev_items:
                by_shape.setdefault(
                    (Hi.shape, jnp.dtype(Hi.dtype)), []
                ).append((gi, fi, Hi))
            for (_, _dt), its in by_shape.items():
                stack = jnp.stack(
                    [
                        jax.device_put(_local_view(Hi), dev_list[d])
                        for _, _, Hi in its
                    ]
                )
                # committed input: the jitted eigh runs on that device; all
                # dispatches are asynchronous, so devices work concurrently
                ls, Qs, flags = _batched_eigh_clipped(stack)
                pending.append((its, ls, Qs, flags))
        for its, ls, Qs, flags in pending:
            ls = _gather(ls)
            Qs = _gather(Qs)
            flag_parts.append(_gather(flags))
            for j, (gi, fi, _) in enumerate(its):
                results[(gi, fi)] = (ls[j], Qs[j])
                flag_keys.append((gi, fi))

        flags = np.asarray(jnp.concatenate(flag_parts))  # ONE host sync
        for (gi, fi), bad in zip(flag_keys, flags):
            if bad:
                results[(gi, fi)] = symeig(self.kfacs[gi][fi])

        eigvecs, eigvals = [], []
        for gi, F in enumerate(self.kfacs):
            Qs = tuple(results[(gi, fi)][1] for fi in range(len(F)))
            ls = tuple(results[(gi, fi)][0] for fi in range(len(F)))
            eigvecs.append(Qs)
            eigvals.append(ls)
        return KronDecomposed(tuple(eigvecs), tuple(eigvals), damping=damping)

    # -- products ------------------------------------------------------------
    def _bmm(self, W: jnp.ndarray) -> jnp.ndarray:
        """`H @ W` for W of shape (batch, classes, params) (reference `matrix.py:152-190`)."""
        B, K, P = W.shape
        W = W.reshape(B * K, P)
        cur, out = 0, []
        for F in self.kfacs:
            if len(F) == 1:
                (Q,) = F
                p = Q.shape[0]
                W_p = W[:, cur : cur + p]
                out.append(W_p @ Q.T)  # Q symmetric; (BK,p)
                cur += p
            else:
                A, Bf = F
                p_in, p_out = A.shape[0], Bf.shape[0]
                p = p_in * p_out
                W_p = W[:, cur : cur + p].reshape(B * K, p_in, p_out)
                # (A ⊗ B) vec(W) = vec(A W B^T)
                out.append(
                    jnp.einsum("ij,bjo,po->bip", A, W_p, Bf).reshape(B * K, p)
                )
                cur += p
        return jnp.concatenate(out, axis=1).reshape(B, K, P)

    def bmm(self, W: jnp.ndarray, exponent: float = 1) -> jnp.ndarray:
        """Batched product `H @ W` (exponent must be 1; reference `matrix.py:192-220`)."""
        if exponent != 1:
            raise ValueError("Only supported after decomposition.")
        if W.ndim == 1:
            return self._bmm(W[None, None, :]).squeeze((0, 1))
        elif W.ndim == 2:
            return self._bmm(W[:, None, :]).squeeze(1)
        elif W.ndim == 3:
            return self._bmm(W)
        raise ValueError("Invalid shape for W")

    def logdet(self) -> jnp.ndarray:
        """Log determinant of the full block-diagonal matrix (reference `matrix.py:222-239`)."""
        ld = jnp.asarray(0.0)
        for F in self.kfacs:
            if len(F) == 1:
                _, logabsdet = jnp.linalg.slogdet(F[0])
                ld = ld + logabsdet
            else:
                A, B = F
                p_in, p_out = A.shape[0], B.shape[0]
                ld = ld + p_out * jnp.linalg.slogdet(A)[1]
                ld = ld + p_in * jnp.linalg.slogdet(B)[1]
        return ld

    def diag(self) -> jnp.ndarray:
        """Diagonal of the full matrix (reference `matrix.py:241-256`)."""
        diags = []
        for F in self.kfacs:
            if len(F) == 1:
                diags.append(jnp.diagonal(F[0]))
            else:
                A, B = F
                diags.append(jnp.outer(jnp.diagonal(A), jnp.diagonal(B)).ravel())
        return jnp.concatenate(diags)

    def to_matrix(self) -> jnp.ndarray:
        """Dense block-diagonal materialization — tests only (reference `matrix.py:258-275`)."""
        blocks = []
        for F in self.kfacs:
            if len(F) == 1:
                blocks.append(F[0])
            else:
                blocks.append(kron(F[0], F[1]))
        return block_diag(blocks)


@jax.tree_util.register_pytree_node_class
class KronDecomposed:
    """Eigendecomposed Kron + per-group prior scalars `deltas`.

    Enables exact `(A ⊗ B + δI)^e @ v` products in the Kronecker eigenbasis and
    the damped variant `((λ_A+√δ) ⊗ (λ_B+√δ))^e` (reference `matrix.py:282-561`).
    """

    def __init__(self, eigenvectors, eigenvalues, deltas=None, damping: bool = False):
        self.eigenvectors = tuple(tuple(Q for Q in Qs) for Qs in eigenvectors)
        self.eigenvalues = tuple(tuple(l for l in ls) for ls in eigenvalues)
        if deltas is None:
            dtype = self.eigenvalues[0][0].dtype
            self.deltas = jnp.zeros(len(self.eigenvalues), dtype=dtype)
        else:
            self.deltas = self._check_deltas(deltas)
        self.damping = damping

    def _check_deltas(self, deltas) -> jnp.ndarray:
        deltas = jnp.asarray(deltas)
        if deltas.ndim == 0:
            return jnp.broadcast_to(deltas, (len(self.eigenvalues),))
        if deltas.ndim == 1 and deltas.shape[0] in (1, len(self.eigenvalues)):
            return jnp.broadcast_to(deltas, (len(self.eigenvalues),))
        raise ValueError("Invalid shape of delta added to KronDecomposed.")

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = (
            tuple(Q for Qs in self.eigenvectors for Q in Qs),
            tuple(l for ls in self.eigenvalues for l in ls),
            self.deltas,
        )
        aux = (tuple(len(ls) for ls in self.eigenvalues), self.damping)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        lens, damping = aux
        Qflat, lflat, deltas = children
        eigenvectors, eigenvalues, i = [], [], 0
        for n in lens:
            eigenvectors.append(tuple(Qflat[i : i + n]))
            eigenvalues.append(tuple(lflat[i : i + n]))
            i += n
        obj = cls.__new__(cls)
        obj.eigenvectors = tuple(eigenvectors)
        obj.eigenvalues = tuple(eigenvalues)
        obj.deltas = deltas
        obj.damping = damping
        return obj

    def __len__(self) -> int:
        return len(self.eigenvalues)

    @property
    def group_sizes(self) -> list[int]:
        sizes = []
        for ls in self.eigenvalues:
            if len(ls) == 1:
                sizes.append(ls[0].shape[0])
            else:
                sizes.append(ls[0].shape[0] * ls[1].shape[0])
        return sizes

    # -- algebra -------------------------------------------------------------
    def __add__(self, deltas) -> "KronDecomposed":
        """Add a scalar or per-group vector to the deltas (reference `matrix.py:342-355`)."""
        deltas = jnp.asarray(deltas)
        return KronDecomposed(
            self.eigenvectors, self.eigenvalues, self.deltas + self._check_deltas(deltas),
            damping=self.damping,
        )

    def __mul__(self, scalar) -> "KronDecomposed":
        """Scale by distributing `scalar**(1/len)` over eigenvalues (reference `matrix.py:357-376`)."""
        eigenvalues = [
            tuple((scalar ** (1.0 / len(ls))) * l for l in ls)
            for ls in self.eigenvalues
        ]
        return KronDecomposed(self.eigenvectors, tuple(eigenvalues), self.deltas,
                              damping=self.damping)

    __radd__ = __add__
    __rmul__ = __mul__

    def _group_eig(self, ls, delta, exponent):
        """Eigenvalue grid `(λ_A ⊗ λ_B + δ)^e` (or damped) for a 2-factor group."""
        lA, lB = ls
        if self.damping:
            return jnp.power(jnp.outer(lA + jnp.sqrt(delta), lB + jnp.sqrt(delta)), exponent)
        return jnp.power(jnp.outer(lA, lB) + delta, exponent)

    @property
    def _flat_eigs(self):
        """Concatenated per-group Kronecker eigenvalues (P,), cached on the
        instance. Safe under jit: pytree reconstruction goes through
        `tree_unflatten` (fresh object per trace), so cached tracers never
        cross traces."""
        cached = getattr(self, "_flat_eigs_cache", None)
        if cached is not None:
            return cached
        parts = [
            ls[0] if len(ls) == 1 else jnp.outer(ls[0], ls[1]).ravel()
            for ls in self.eigenvalues
        ]
        out = jnp.concatenate(parts)
        # ops executed DURING a jit trace yield tracers even on concrete
        # inputs; caching one on this persistent object would leak it into
        # other traces. Uncached traced recomputation is free anyway: the
        # inputs are trace constants, so XLA constant-folds/hoists it.
        if not isinstance(out, jax.core.Tracer):
            self._flat_eigs_cache = out
        return out

    def _flat_deltas(self) -> jnp.ndarray:
        """Per-parameter deltas as static-size broadcasts + one concat (a
        (P,)-gather by group index crashed the remote TPU worker inside
        scanned marglik loops; broadcasts lower to plain copies)."""
        sizes = self.group_sizes
        return jnp.concatenate(
            [
                jnp.broadcast_to(self.deltas[gi], (sizes[gi],))
                for gi in range(len(sizes))
            ]
        )

    def logdet(self) -> jnp.ndarray:
        """Log determinant including deltas (reference `matrix.py:381-404`).

        The damped variant is separable (log((a+s)(b+s)) sums factor-wise);
        the plain variant evaluates as ONE fused op over the cached flat
        eigenvalue vector instead of ~n_groups small dependent op chains —
        this sits inside every marglik gradient step, where the ragged
        per-group loop dominated the step's device time."""
        if self.damping:
            ld = jnp.asarray(0.0)
            for ls, delta in zip(self.eigenvalues, self.deltas):
                if len(ls) == 1:
                    ld = ld + jnp.sum(jnp.log(ls[0] + delta))
                else:
                    s = jnp.sqrt(delta)
                    lA, lB = ls
                    ld = ld + lB.shape[0] * jnp.sum(jnp.log(lA + s))
                    ld = ld + lA.shape[0] * jnp.sum(jnp.log(lB + s))
            return ld
        return jnp.sum(jnp.log(self._flat_eigs + self._flat_deltas()))

    def _bmm(self, W: jnp.ndarray, exponent: float = -1) -> jnp.ndarray:
        """`H^e @ W` for W (batch, classes, params) (reference `matrix.py:406-456`)."""
        B, K, P = W.shape
        W = W.reshape(B * K, P)
        cur, out = 0, []
        for ls, Qs, delta in zip(self.eigenvalues, self.eigenvectors, self.deltas):
            if len(ls) == 1:
                Q, l = Qs[0], ls[0]
                p = l.shape[0]
                ldelta_exp = jnp.power(l + delta, exponent)
                W_p = W[:, cur : cur + p]
                out.append((W_p @ Q) * ldelta_exp[None, :] @ Q.T)
                cur += p
            else:
                QA, QB = Qs
                p_in, p_out = ls[0].shape[0], ls[1].shape[0]
                p = p_in * p_out
                ldelta_exp = self._group_eig(ls, delta, exponent)
                W_p = W[:, cur : cur + p].reshape(B * K, p_in, p_out)
                # rotate into eigenbasis, scale, rotate back:
                # (A⊗B)^e vec(W) = vec(QA ((QA^T W QB) ∘ Λ^e) QB^T)
                W_p = jnp.einsum("ji,bjp,pq->biq", QA, W_p, QB) * ldelta_exp[None]
                W_p = jnp.einsum("ij,bjp,qp->biq", QA, W_p, QB)
                out.append(W_p.reshape(B * K, p))
                cur += p
        return jnp.concatenate(out, axis=1).reshape(B, K, P)

    def bmm(self, W: jnp.ndarray, exponent: float = -1) -> jnp.ndarray:
        """Batched `H^e @ W` (reference `matrix.py:463-488`)."""
        if W.ndim == 1:
            return self._bmm(W[None, None, :], exponent).squeeze((0, 1))
        elif W.ndim == 2:
            return self._bmm(W[:, None, :], exponent).squeeze(1)
        elif W.ndim == 3:
            return self._bmm(W, exponent)
        raise ValueError("Invalid shape for W")

    def inv_square_form(self, W: jnp.ndarray) -> jnp.ndarray:
        """`W H^{-1} W^T` batched over the leading axis (reference `matrix.py:458-461`)."""
        SW = self._bmm(W, exponent=-1)
        return jnp.einsum("bkp,blp->bkl", W, SW)

    def diag(self, exponent: float = 1) -> jnp.ndarray:
        """Diagonal of `H^e` (reference `matrix.py:490-522`)."""
        diags = []
        for Qs, ls, delta in zip(self.eigenvectors, self.eigenvalues, self.deltas):
            if len(ls) == 1:
                Q, l = Qs[0], ls[0]
                d = jnp.einsum("mp,p,mp->m", Q, jnp.power(l + delta, exponent), Q)
                diags.append(d)
            else:
                QA, QB = Qs
                eig = self._group_eig(ls, delta, exponent)
                d = jnp.einsum("mp,nq,pq,mp,nq->mn", QA, QB, eig, QA, QB).ravel()
                diags.append(d)
        return jnp.concatenate(diags)

    def to_matrix(self, exponent: float = 1) -> jnp.ndarray:
        """Dense materialization of `H^e` — tests only (reference `matrix.py:524-556`)."""
        blocks = []
        for Qs, ls, delta in zip(self.eigenvectors, self.eigenvalues, self.deltas):
            if len(ls) == 1:
                Q, l = Qs[0], ls[0]
                blocks.append(Q @ jnp.diag(jnp.power(l + delta, exponent)) @ Q.T)
            else:
                Q = kron(Qs[0], Qs[1])
                eig = self._group_eig(ls, delta, exponent)
                blocks.append(Q @ jnp.diag(eig.ravel()) @ Q.T)
        return block_diag(blocks)
