"""Dev script: numpy reference for band->tridiagonal bulge chasing
(sb2st-style single-column sweeps) with invariant asserts. Validates the
task geometry before the XLA/pallas port:

- task 0 of sweep v: reflector rows J=[v+1, v+1+b), eliminates A[v+2:, v]
- task t>=1: c = v+1+(t-1)b, rows J=[c+b, c+2b), eliminates A[c+b+1:, c]
- invariants: col v clean below v+b at sweep v start; fill distance <= b+1
  after each sweep; final matrix tridiagonal; similarity preserved.
Also records, per task, the exact read/write window extents to size the
XLA windows.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def householder(x):
    """(tau, v, beta): (I - tau v v^T) x = beta e_1, v[0] = 1."""
    alpha = x[0]
    xnorm2 = float(x[1:] @ x[1:])
    if xnorm2 == 0.0:
        return 0.0, np.zeros_like(x), alpha
    anorm = np.sqrt(alpha * alpha + xnorm2)
    beta = -np.sign(alpha) * anorm if alpha != 0 else -anorm
    v = x / (alpha - beta)
    v[0] = 1.0
    tau = (beta - alpha) / beta
    return tau, v, beta


def apply_two_sided(A, J, tau, v):
    """A <- H A H with H = I - tau v v^T acting on index set J (full rows)."""
    if tau == 0.0:
        return
    w = tau * (A[J, :].T @ v)  # (n,)
    A[J, :] -= np.outer(v, w)
    w2 = tau * (A[:, J] @ v)
    A[:, J] -= np.outer(w2, v)


def band_to_tridiag_ref(A, b, record=None):
    A = A.copy()
    n = A.shape[0]
    max_ext = [0, 0]  # max cols-left, rows-below extents seen
    V_sweeps = []
    for v in range(n - 2):
        # invariant: column v clean below row v+b
        if v + b + 1 < n:
            assert np.abs(A[v + b + 1:, v]).max() < 1e-10, (v, "col-dirty")
        sweep_refl = []
        # task 0
        r, L = v + 1, min(b, n - (v + 1))
        if L > 1:
            x = A[r:r + L, v].copy()
            tau, u, beta = householder(x)
            A[r:r + L, v] = 0.0
            A[v, r:r + L] = 0.0
            A[r, v] = A[v, r] = beta
            apply_two_sided(A, slice(r, r + L), tau, u)
            sweep_refl.append((r, L, tau, u))
        # chase tasks
        t = 1
        while True:
            c = v + 1 + (t - 1) * b
            r = c + b
            L = min(b, n - r)
            if r >= n or L <= 1:
                break
            x = A[r:r + L, c].copy()
            tau, u, beta = householder(x)
            A[r:r + L, c] = 0.0
            A[c, r:r + L] = 0.0
            A[r, c] = A[c, r] = beta
            apply_two_sided(A, slice(r, r + L), tau, u)
            sweep_refl.append((r, L, tau, u))
            t += 1
        V_sweeps.append(sweep_refl)
        # measure max fill distance after the sweep
        i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        dist = np.abs(i - j)
        nz = np.abs(A) > 1e-10
        max_ext[0] = max(max_ext[0], int(dist[nz].max()))
    return A, V_sweeps, max_ext


def main():
    rng = np.random.default_rng(0)
    for n, b in [(12, 3), (16, 2), (24, 4), (33, 5), (48, 8), (40, 7)]:
        M = rng.standard_normal((n, n))
        A0 = (M @ M.T) / n
        # start from a banded matrix (as stage A would produce)
        i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        # reduce A0 to banded via numpy for a realistic banded input:
        # just zero outside band of a similarity-reduced A0 is wrong; use
        # scipy-free approach: run full Householder band reduction quickly
        import sys
        sys.path.insert(0, "/root/repo")
        import jax.numpy as jnp
        from laplace_jax.ops.band import band_reduce

        Bb, _, _ = band_reduce(jnp.asarray(A0[None]), b=b)
        Ab = np.array(Bb[0])
        T, V_sweeps, max_ext = band_to_tridiag_ref(Ab, b)
        print(f"  n={n} b={b}: max fill distance seen = {max_ext[0]}")
        off = np.abs(T)[np.abs(i - j) > 1].max()
        assert off < 1e-9, (n, b, "not tridiagonal", off)
        ev0 = np.linalg.eigvalsh(Ab)
        ev1 = np.linalg.eigvalsh(T)
        assert np.abs(ev0 - ev1).max() < 1e-8, (n, b, "spectrum")
        # reconstruct Q2 from sweeps (order: Q = Q_0 Q_1 ... Q_last, each
        # Q_v = H_{v,0} H_{v,1} ...) and check Q2 T Q2^T == Ab
        Q = np.eye(n)
        for refl in reversed(V_sweeps):
            for r, L, tau, u in reversed(refl):
                # left-multiply Q by H (build Q = H_{first} ... H_{last} I)
                Q[r:r + L, :] -= tau * np.outer(u, u @ Q[r:r + L, :])
        err = np.abs(Q @ T @ Q.T - Ab).max()
        assert err < 1e-8, (n, b, "similarity", err)
        # within-sweep reflector rows must be disjoint (batched Q2 apply)
        for refl in V_sweeps:
            spans = [(r, r + L) for r, L, _, _ in refl]
            for (a1, b1), (a2, b2) in zip(spans, spans[1:]):
                assert b1 <= a2, (spans, "overlap")
        print(f"n={n} b={b}: OK  (sweeps={len(V_sweeps)}, "
              f"max tasks={max(len(s) for s in V_sweeps)})")


if __name__ == "__main__":
    main()
