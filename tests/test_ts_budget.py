"""Cold-start compile budget for the two-stage eigensolver default.

The TS path is the TPU default for large factors, but its XLA program can
take minutes to compile cold on remote-compile toolchains. `Kron.decompose`
must never stall unboundedly on that compile: a budgeted dispatch falls back
to the stock batched eigh (QDWH on TPU, LAPACK here) with a RuntimeWarning,
while the background compile marks the signature warm for later calls.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import laplace_jax.utils.matrix as matrix_mod


@pytest.fixture(autouse=True)
def _fresh_ts_state(monkeypatch):
    monkeypatch.setattr(matrix_mod, "_ts_ready", set())
    monkeypatch.setattr(matrix_mod, "_ts_pending", {})
    # force the TS gate on (CPU backend would normally turn it off)
    monkeypatch.setattr(matrix_mod, "_use_ts", lambda n, dtype=None: True)
    yield


def _spd_stack(k=2, n=16, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((k, n, n))
    return jnp.asarray(np.einsum("kij,klj->kil", A, A) / n, jnp.float64)


def _drain_pending():
    for fut in list(matrix_mod._ts_pending.values()):
        try:
            fut.result(timeout=60)
        except Exception:
            pass


def test_budget_exceeded_falls_back_and_warms(monkeypatch):
    stack = _spd_stack()
    monkeypatch.setenv("LAPLACE_TS_COMPILE_BUDGET_SEC", "1e-9")
    with pytest.warns(RuntimeWarning, match="exceeded"):
        l, Q, flags = matrix_mod._batched_eigh_clipped(stack)
    # the fallback result is a correct eigendecomposition
    rec = np.einsum("kip,kp,kjp->kij", np.asarray(Q), np.asarray(l),
                    np.asarray(Q))
    np.testing.assert_allclose(rec, np.asarray(stack), atol=1e-8)
    assert not np.asarray(flags).any()
    # the background compile completes and marks the signature warm
    _drain_pending()
    sig = matrix_mod._ts_signature(stack)
    assert sig in matrix_mod._ts_ready


def test_warm_signature_skips_budget(monkeypatch):
    stack = _spd_stack(seed=1)
    sig = matrix_mod._ts_signature(stack)
    matrix_mod._ts_ready.add(sig)
    monkeypatch.setenv("LAPLACE_TS_COMPILE_BUDGET_SEC", "1e-9")
    calls = []
    import laplace_jax.ops.tridiag_eig as te

    real = te.eigh_stack_ts
    monkeypatch.setattr(
        te, "eigh_stack_ts", lambda s, **kw: calls.append(1) or real(s, **kw)
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no fallback warning allowed
        l, Q, flags = matrix_mod._batched_eigh_clipped(stack)
    assert calls, "warm signature must go straight to the TS path"
    rec = np.einsum("kip,kp,kjp->kij", np.asarray(Q), np.asarray(l),
                    np.asarray(Q))
    np.testing.assert_allclose(rec, np.asarray(stack), atol=1e-8)


def test_budget_disabled_always_waits(monkeypatch):
    stack = _spd_stack(seed=2)
    monkeypatch.setenv("LAPLACE_TS_COMPILE_BUDGET_SEC", "0")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        l, Q, flags = matrix_mod._batched_eigh_clipped(stack)
    rec = np.einsum("kip,kp,kjp->kij", np.asarray(Q), np.asarray(l),
                    np.asarray(Q))
    np.testing.assert_allclose(rec, np.asarray(stack), atol=1e-8)


def test_generous_budget_uses_ts_first_call(monkeypatch):
    stack = _spd_stack(seed=3)
    monkeypatch.setenv("LAPLACE_TS_COMPILE_BUDGET_SEC", "600")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        l, Q, flags = matrix_mod._batched_eigh_clipped(stack)
    assert matrix_mod._ts_signature(stack) in matrix_mod._ts_ready
