"""Unit tests for the two-stage eigensolver's stage-1 dispatcher
(`laplace_jax.ops.tridiag_eig._stage1_impl`): env override, explicit
argument, and the auto rule (Pallas kernels are TPU-only; CPU tests see
the XLA fallback)."""

import os

import pytest

from laplace_jax.ops.tridiag_eig import _stage1_impl


@pytest.fixture
def clean_env(monkeypatch):
    monkeypatch.delenv("LAPLACE_TS_STAGE1", raising=False)


@pytest.mark.parametrize("impl", ["pallas", "pallas_v4", "xla"])
def test_env_override_wins(monkeypatch, impl):
    monkeypatch.setenv("LAPLACE_TS_STAGE1", impl)
    assert _stage1_impl(4608, "auto") == impl
    assert _stage1_impl(64, "xla") == impl  # env beats explicit arg


def test_unknown_env_value_ignored(monkeypatch):
    monkeypatch.setenv("LAPLACE_TS_STAGE1", "cuda")
    assert _stage1_impl(64, "xla") == "xla"


@pytest.mark.parametrize("impl", ["pallas", "pallas_v4", "xla"])
def test_explicit_argument(clean_env, impl):
    assert _stage1_impl(4608, impl) == impl


def test_auto_on_cpu_is_xla(clean_env):
    # the suite runs on the CPU backend: auto must resolve to XLA for
    # every size (Pallas LATRD kernels are TPU-only)
    import jax

    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend-specific expectation")
    for n in (64, 512, 4608):
        assert _stage1_impl(n, "auto") == "xla"


def test_auto_on_tpu_table(clean_env, monkeypatch):
    # pin the measured auto table (docs/performance.md): XLA below 512,
    # v1 at 512-2303, v4 (symmetric-half strips) from 2304
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _stage1_impl(256, "auto") == "xla"
    assert _stage1_impl(512, "auto") == "pallas"
    assert _stage1_impl(1152, "auto") == "pallas"
    assert _stage1_impl(2304, "auto") == "pallas_v4"
    assert _stage1_impl(4608, "auto") == "pallas_v4"
