"""Cost model of a TPU fori_loop iteration at stage-1 shapes: what makes an
iteration cost 0.25ms — scalar reductions, op count, in-loop
dynamic_update_slice on big carries, or the matvec itself?"""
import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
print("backend:", jax.default_backend(), flush=True)

K, m = 3, 4608
ITERS = 128
rng = np.random.default_rng(0)
A = jnp.asarray(rng.standard_normal((K, m, m)).astype(np.float32))
v0 = jnp.asarray(rng.standard_normal((K, m)).astype(np.float32) * 1e-3)
BIG0 = jnp.zeros((K, m, m), jnp.float32)  # 255MB carry target


def bench(label, body, carry, iters=ITERS):
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, iters, body, carry)
    out = run(carry)
    np.asarray(jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(carry)
        np.asarray(jax.device_get(
            jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)/iters*1e3:.3f} ms/iter", flush=True)


# 1. pure elementwise, no reduction
bench("elementwise only          ",
      lambda i, v: v * 0.999 + 1e-6, v0)

# 2. one scalar reduction
bench("1 scalar reduce           ",
      lambda i, v: v / (1.0 + jnp.max(jnp.abs(v))), v0)

# 3. four scalar reductions chained
def body4(i, v):
    for _ in range(4):
        v = v / (1.0 + jnp.max(jnp.abs(v)))
    return v
bench("4 scalar reduces chained  ", body4, v0)

# 4. column dynamic_update_slice into a 255MB carry (+ tiny op)
def body_dus_col(i, carry):
    big, v = carry
    v = v * 0.999 + 1e-6
    big = jax.lax.dynamic_update_slice(big, v[:, :, None], (0, 0, i))
    return big, v
bench("dus COLUMN into 255MB     ", body_dus_col, (BIG0, v0))

# 5. row dynamic_update_slice into a 255MB carry (+ tiny op)
def body_dus_row(i, carry):
    big, v = carry
    v = v * 0.999 + 1e-6
    big = jax.lax.dynamic_update_slice(big, v[:, None, :], (0, i, 0))
    return big, v
bench("dus ROW into 255MB        ", body_dus_row, (BIG0, v0))

# 6. dynamic_slice COLUMN read from 255MB constant (+ tiny op)
def body_ds_col(i, v):
    col = jax.lax.dynamic_slice(A, (0, 0, i), (K, m, 1))[..., 0]
    return v * 0.999 + col * 1e-9
bench("ds COLUMN from 255MB      ", body_ds_col, v0)

# 7. dynamic_slice ROW read from 255MB constant (+ tiny op)
def body_ds_row(i, v):
    row = jax.lax.dynamic_slice(A, (0, i, 0), (K, 1, m))[:, 0, :]
    return v * 0.999 + row * 1e-9
bench("ds ROW from 255MB         ", body_ds_row, v0)

# 8. matvec, elementwise-normalized (no scalar reduce)
def body_mv(i, v):
    w = (A.reshape(K * m, m) @ v.T).reshape(K, m, K)
    w = jnp.take_along_axis(w, jnp.arange(K)[:, None, None], axis=2)[..., 0]
    return jnp.tanh(w * 1e-4)
bench("matvec + tanh (no reduce) ", body_mv, v0)

# 9. matvec on the HALF window (m/2) — window-size scaling check
half = m // 2
Ah = A[:, :half, :half]
def body_mv_half(i, v):
    vh = v[:, :half]
    w = (Ah.reshape(K * half, half) @ vh.T).reshape(K, half, K)
    w = jnp.take_along_axis(w, jnp.arange(K)[:, None, None], axis=2)[..., 0]
    return v.at[:, :half].set(jnp.tanh(w * 1e-4))
bench("matvec half-window        ", body_mv_half, v0)
