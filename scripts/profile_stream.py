"""What HBM streaming rate can this chip actually sustain, per access shape?

Controls for the stage-1 matvec question: big-GEMM streaming, pure VPU
reduction streaming, matvec in f32 vs bf16, and per-iteration loop overhead.
All loops run ≥128 dependent iterations inside ONE jitted program so the
axon dispatch/sync cost is amortized to <2%.
"""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
print("backend:", jax.default_backend(), flush=True)

K, m = 3, 4608
ITERS = 128
rng = np.random.default_rng(0)
A32 = jnp.asarray(rng.standard_normal((K, m, m)).astype(np.float32))
A16 = A32.astype(jnp.bfloat16)
v0 = jnp.asarray(rng.standard_normal((K, m)).astype(np.float32))
B512 = jnp.asarray(rng.standard_normal((m, 512)).astype(np.float32))


def bench(label, make_run, bytes_per_iter, iters=ITERS):
    run = jax.jit(make_run(iters))
    out = run(v0)
    np.asarray(jax.device_get(jnp.ravel(out)[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(v0)
        np.asarray(jax.device_get(jnp.ravel(out)[0]))
        ts.append(time.perf_counter() - t0)
    per = min(ts) / iters * 1e3
    bw = bytes_per_iter / (per / 1e3) / 1e9
    print(f"{label}: {per:.3f} ms/iter  ({bw:.0f} GB/s)", flush=True)


f32_bytes = K * m * m * 4
bf16_bytes = K * m * m * 2


def mk_matvec(A):
    def make(iters):
        def run(v):
            def body(_, v):
                w = (A.reshape(K * m, m).astype(jnp.float32)
                     @ v.T).reshape(K, m, K)
                w = jnp.take_along_axis(
                    w, jnp.arange(K)[:, None, None], axis=2)[..., 0]
                return w / (1.0 + jnp.max(jnp.abs(w)))
            return jax.lax.fori_loop(0, iters, body, v)
        return run
    return make


def mk_matvec_bf16_out(A):
    # pure bf16 pipeline: v stays bf16
    def make(iters):
        def run(v):
            v = v.astype(jnp.bfloat16)
            def body(_, v):
                w = (A.reshape(K * m, m) @ v.T).reshape(K, m, K)
                w = jnp.take_along_axis(
                    w, jnp.arange(K)[:, None, None], axis=2)[..., 0]
                return w / (1.0 + jnp.max(jnp.abs(w))).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, iters, body, v)
        return run
    return make


def mk_vpu_reduce(A):
    def make(iters):
        def run(v):
            def body(_, v):
                w = jnp.sum(A * v[:, None, :], axis=2)
                return w / (1.0 + jnp.max(jnp.abs(w)))
            return jax.lax.fori_loop(0, iters, body, v)
        return run
    return make


def mk_gemm(A):
    # (K*m, m) @ (m, 512) — MXU-dense; LHS re-streamed every iter
    def make(iters):
        def run(v):
            def body(_, s):
                w = A.reshape(K * m, m) @ (B512 + s)
                return jnp.max(jnp.abs(w)) * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        return run
    return make


def mk_noop():
    # loop-overhead control: tiny op per iteration
    def make(iters):
        def run(v):
            def body(_, v):
                return v / (1.0 + jnp.max(jnp.abs(v)))
            return jax.lax.fori_loop(0, iters, body, v)
        return run
    return make


bench("loop overhead (tiny op)  ", mk_noop(), 0 or 1)
bench("matvec f32 folded        ", mk_matvec(A32), f32_bytes)
bench("matvec bf16 A, f32 acc   ", mk_matvec(A16), bf16_bytes)
bench("matvec bf16 end-to-end   ", mk_matvec_bf16_out(A16), bf16_bytes)
bench("VPU mult+reduce f32      ", mk_vpu_reduce(A32), f32_bytes)
bench("GEMM (K*m,m)@(m,512) f32 ", mk_gemm(A32), f32_bytes, iters=32)
