"""Ablation profile of the KFAC accumulate phase (VERDICT item 4).

Times jitted sub-programs of the per-batch KFAC computation on the bench
workload (ResNet-18, CIFAR-shaped, N=512) to localize where the 0.88s goes:
forward, vjp cotangent sweeps (x10 exact-Fisher), A-factor Grams, B-factor
Grams, and the full path — plus a batch-size sweep of the full scan.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.curvature.kfac import (
    _sqrt_hessian_cotangents,
    conv_patches,
    kfac_factors,
)
from laplace_jax.models import ResNet18
from laplace_jax.nnmodel import NNModel

N = 512
rng = np.random.default_rng(0)
X_all = rng.standard_normal((N, 32, 32, 3)).astype(np.float32)
y_all = rng.integers(0, 10, size=(N,))

model = ResNet18()
params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(X_all[:1]))
nnm = NNModel.from_flax(model, params)
tp = nnm.train_params


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def timeit(label, f, *args, reps=5):
    out = f(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1e3:8.1f} ms (min of {reps})", flush=True)
    return min(ts)


def make_parts(B):
    x = jnp.asarray(X_all[:B])
    nb = N // B

    def tap_setup(xb):
        _, tap_shapes = jax.eval_shape(
            lambda p, xx: nnm.apply_with_taps(p, xx), tp, xb
        )
        tap_shapes = [t for t in tap_shapes if t.kind != "norm"]
        offsets = {
            t.path: jnp.zeros(t.outputs.shape, t.outputs.dtype)
            for t in tap_shapes
        }
        keep = {t.path for t in tap_shapes}
        return offsets, keep

    offsets, keep = tap_setup(x)

    def fwd(xb):
        f, taps = nnm.apply_with_taps(tp, xb, offsets)
        return f.sum() + sum(
            t.patches.sum() if t.patches is not None else t.inputs.sum()
            for t in taps if t.path in keep
        )

    def vjp_sweeps(xb, n_sweeps):
        def f_of_offsets(offs):
            f2, taps2 = nnm.apply_with_taps(tp, xb, offs)
            return f2, [t for t in taps2 if t.path in keep]

        f, vjp_fn, taps = jax.vjp(f_of_offsets, offsets, has_aux=True)
        cts = _sqrt_hessian_cotangents(f, "classification", f.dtype)
        cts = cts[:n_sweeps]
        g = jax.vmap(lambda ct: vjp_fn(ct)[0])(cts)
        return sum(jnp.vdot(v, v) for v in jax.tree_util.tree_leaves(g))

    def a_factors(xb):
        f, taps = nnm.apply_with_taps(tp, xb, offsets)
        tot = f.sum() * 0
        for t in taps:
            if t.path not in keep:
                continue
            if t.kind == "dense":
                a = t.inputs.reshape(-1, t.inputs.shape[-1])
                A = jnp.einsum("bi,bj->ij", a, a)
            elif t.kind == "conv":
                p = (
                    t.patches.reshape(t.patches.shape[0], -1,
                                      t.patches.shape[-1])
                    if t.patches is not None
                    else conv_patches(t.inputs, t.conv_spec)
                )
                A = jnp.einsum("btk,btl->kl", p, p)
            else:
                continue
            tot = tot + A.sum()
        return tot

    def b_factors(xb):
        def f_of_offsets(offs):
            f2, taps2 = nnm.apply_with_taps(tp, xb, offs)
            return f2, [t for t in taps2 if t.path in keep]

        f, vjp_fn, taps = jax.vjp(f_of_offsets, offsets, has_aux=True)
        cts = _sqrt_hessian_cotangents(f, "classification", f.dtype)
        g = jax.vmap(lambda ct: vjp_fn(ct)[0])(cts)
        tot = f.sum() * 0
        for p_, gl in g.items():
            g2 = gl.reshape(-1, gl.shape[-1])
            tot = tot + jnp.einsum("bo,bp->op", g2, g2).sum()
        return tot

    def full(xb, yb):
        loss, K = kfac_factors(
            nnm, xb, yb, N, "classification",
            lambda f, y: 0.5 * jnp.sum(
                jax.nn.log_softmax(f) * 0
            ) + loss_ce(f, y),
        )
        return loss + sum(
            v.sum() for F in K.kfacs for v in F
        )

    def loss_ce(f, y):
        return -jnp.sum(
            jax.nn.log_softmax(f)[jnp.arange(f.shape[0]), y]
        )

    return fwd, vjp_sweeps, a_factors, b_factors


def scan_full(B):
    """The real library path at batch B: _scan_accumulate end to end."""
    from laplace_jax import KronLaplace
    from laplace_jax.utils.data import ArrayLoader

    loader = ArrayLoader(X_all, y_all, batch_size=B)
    la = KronLaplace(nnm, "classification")
    la.fit(loader)
    from laplace_jax.baselaplace import _stack_batches

    xs, ys, _ = _stack_batches(loader, la._unpack_batch)

    def run():
        loss, H = la._scan_accumulate(tp, xs, ys, N, jax.random.key(0))
        return loss

    return timeit(f"  scan_accumulate full loader (batch={B})", run)


B = 128
x = jnp.asarray(X_all[:B])
y = jnp.asarray(y_all[:B])
fwd, vjp_sweeps, a_factors, b_factors = make_parts(B)

print(f"-- per-batch ablations at batch={B} (x{N//B} batches/fit) --",
      flush=True)
timeit("  forward + taps           ", jax.jit(fwd), x)
timeit("  fwd + 1 vjp sweep        ", jax.jit(lambda xb: vjp_sweeps(xb, 1)), x)
timeit("  fwd + 10 vjp sweeps      ", jax.jit(lambda xb: vjp_sweeps(xb, 10)), x)
timeit("  fwd + A-factor grams     ", jax.jit(a_factors), x)
timeit("  fwd + sweeps + B grams   ", jax.jit(b_factors), x)

print("-- full library scan over the loader --", flush=True)
for B_ in (128, 256, 512):
    scan_full(B_)
