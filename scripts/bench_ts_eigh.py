import sys; sys.path.insert(0, "/root/repo")
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from laplace_jax.ops.tridiag_eig import eigh_stack_ts
print("backend:", jax.default_backend(), jax.devices())

rng = np.random.default_rng(0)
def mk(k, n):
    A = rng.standard_normal((k, n, n)).astype(np.float32)
    B = np.einsum("kij,klj->kil", A, A) / n
    return jnp.asarray(B)

classes = [(3, 4608), (4, 2304), (4, 1152)]
stacks = [mk(k, n) for k, n in classes]

# NOTE: a host readback (np.asarray) is the only TRUE sync on the axon
# tunnel — block_until_ready can return before queued programs execute.
def sync(x):
    np.asarray(jax.device_get(x[..., 0, 0]))

# --- two-stage ---
for st, (k, n) in zip(stacks, classes):
    t0 = time.perf_counter()
    l, Q = eigh_stack_ts(st)
    sync(Q)
    print(f"ts   ({k},{n}) compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    outs = [eigh_stack_ts(st) for st in stacks]
    for l, Q in outs: sync(Q)
    print(f"ts   all-classes warm: {time.perf_counter()-t0:.3f}s", flush=True)
for st, (k, n) in zip(stacks, classes):
    t0 = time.perf_counter()
    l, Q = eigh_stack_ts(st)
    sync(Q)
    print(f"ts   ({k},{n}) warm: {time.perf_counter()-t0:.3f}s", flush=True)

# --- QDWH reference ---
@jax.jit
def qdwh_eigh(st):
    Q, l = jax.lax.linalg.eigh(st, symmetrize_input=True,
        implementation=jax.lax.linalg.EighImplementation.QDWH)
    return l, Q
for st, (k, n) in zip(stacks, classes):
    t0 = time.perf_counter()
    l, Q = qdwh_eigh(st)
    sync(Q)
    print(f"qdwh ({k},{n}) compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    outs = [qdwh_eigh(st) for st in stacks]
    for l, Q in outs: sync(Q)
    print(f"qdwh all-classes warm: {time.perf_counter()-t0:.3f}s", flush=True)

# accuracy spot check on the big class
l, Q = eigh_stack_ts(stacks[0])
lq, Qq = qdwh_eigh(stacks[0])
ln, Qn = np.asarray(l, np.float64), np.asarray(Q, np.float64)
A64 = np.asarray(stacks[0], np.float64)
nrm = np.abs(ln).max()
print("ts  orth:", max(np.abs(Qn[k].T@Qn[k]-np.eye(4608)).max() for k in range(3)),
      "rec/|A|:", max(np.abs(Qn[k]@np.diag(ln[k])@Qn[k].T - A64[k]).max() for k in range(3))/nrm,
      "val vs qdwh:", np.abs(ln - np.asarray(lq, np.float64)).max()/nrm, flush=True)
