"""Accumulate-ceiling re-test (round-4 VERDICT weak item 2): batch 256 was
rejected only because the un-chunked 10-cotangent vjp OOMs the 16 GB chip.
Chunking the cotangent sweeps (lax.map batch_size) makes batch 256 fit;
this measures whether the larger batch actually lifts the phase throughput,
plus a bf16-Gram variant (bf16 inputs to the factor matmuls, f32
accumulation) on the same workload.

Times are per-batch jitted programs on the bench workload (ResNet-18,
CIFAR-shaped), normalized to ms per 128 samples for cross-batch comparison.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from laplace_jax.curvature.kfac import _sqrt_hessian_cotangents
from laplace_jax.models import ResNet18
from laplace_jax.nnmodel import NNModel

N = 512
rng = np.random.default_rng(0)
X_all = rng.standard_normal((N, 32, 32, 3)).astype(np.float32)

model = ResNet18()
params = jax.jit(model.init)(jax.random.key(0), jnp.asarray(X_all[:1]))
nnm = NNModel.from_flax(model, params)
tp = nnm.train_params

print("backend:", jax.default_backend(), flush=True)


def sync(x):
    np.asarray(jax.device_get(jnp.ravel(x)[0]))


def timeit(label, f, *args, reps=5, norm=1.0):
    try:
        out = f(*args)
        sync(out)
    except Exception as exc:  # noqa: BLE001 - OOM reporting is the point
        print(f"{label}: FAILED ({type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:120]})", flush=True)
        return None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{label}: {t*1e3:8.1f} ms  ({t*norm*1e3:7.1f} ms/128 samples)",
          flush=True)
    return t


def make_sweeps(B, chunk, bf16_grams=False):
    x = jnp.asarray(X_all[:B])

    _, tap_shapes = jax.eval_shape(
        lambda p, xx: nnm.apply_with_taps(p, xx), tp, x
    )
    tap_shapes = [t for t in tap_shapes if t.kind != "norm"]
    offsets = {
        t.path: jnp.zeros(t.outputs.shape, t.outputs.dtype)
        for t in tap_shapes
    }
    keep = {t.path for t in tap_shapes}

    def sweeps_and_grams(xb):
        def f_of_offsets(offs):
            f2, taps2 = nnm.apply_with_taps(tp, xb, offs)
            return f2, [t for t in taps2 if t.path in keep]

        f, vjp_fn, taps = jax.vjp(f_of_offsets, offsets, has_aux=True)
        cts = _sqrt_hessian_cotangents(f, "classification", f.dtype)

        def b_gram_of(gd, acc):
            for i, (p_, gl) in enumerate(sorted(gd.items())):
                g2 = gl.reshape(-1, gl.shape[-1])
                if bf16_grams:
                    g2 = g2.astype(jnp.bfloat16)
                acc[i] = acc[i] + jnp.einsum(
                    "bo,bp->op", g2, g2,
                    preferred_element_type=jnp.float32,
                )
            return acc

        shapes = jax.eval_shape(lambda c: vjp_fn(c)[0], cts[0])
        acc0 = [
            jnp.zeros((v.shape[-1], v.shape[-1]), jnp.float32)
            for _, v in sorted(shapes.items())
        ]
        if chunk >= cts.shape[0]:
            g = jax.vmap(lambda ct: vjp_fn(ct)[0])(cts)
            acc = b_gram_of(g, acc0)
        else:
            def one_chunk(acc, ct_chunk):
                g = jax.vmap(lambda ct: vjp_fn(ct)[0])(ct_chunk)
                return b_gram_of(g, acc), 0.0

            cts_c = cts.reshape(-1, chunk, *cts.shape[1:])
            acc, _ = jax.lax.scan(one_chunk, acc0, cts_c)

        # A-factor grams on the forward taps (same op mix as the library)
        tot = jnp.zeros((), jnp.float32)
        for t in taps:
            a = (t.patches if t.patches is not None else t.inputs)
            a2 = a.reshape(-1, a.shape[-1])
            if bf16_grams:
                a2 = a2.astype(jnp.bfloat16)
            tot = tot + jnp.einsum(
                "bi,bj->ij", a2, a2, preferred_element_type=jnp.float32
            ).sum()
        return tot + sum(a.sum() for a in acc)

    return jax.jit(sweeps_and_grams), x


print("-- full sweep+gram program, per batch --", flush=True)
results = {}
for B, chunk in [(128, 10), (128, 5), (256, 5), (256, 2), (512, 2),
                 (512, 1)]:
    f, x = make_sweeps(B, chunk)
    t = timeit(f"  B={B:3d} chunk={chunk:2d} f32 ", f, x, norm=128 / B)
    results[(B, chunk, "f32")] = t

print("-- bf16 grams (f32 accumulate) --", flush=True)
for B, chunk in [(128, 10), (256, 5)]:
    f, x = make_sweeps(B, chunk, bf16_grams=True)
    t = timeit(f"  B={B:3d} chunk={chunk:2d} bf16", f, x, norm=128 / B)
    results[(B, chunk, "bf16")] = t
