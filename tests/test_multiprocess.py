"""Execute the REAL multi-process (multi-host) data-parallel path.

Spawns two subprocesses that `jax.distributed.initialize` against a local
coordinator (4 virtual CPU devices each), build the (2, 4) DCN x ICI
`multihost_mesh`, run `DataParallel` Kron/Diag fits with cross-process psums
over gloo, and assert equality with the single-process fit (VERDICT r2 item
2 / SURVEY.md §2.6 "multi-process runtime"). The in-process tests cover only
the (1, n) single-process fallback; this is the one place the
`num_processes=2` branch actually runs.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(mode: str, n_procs: int = 2, timeout: int = 420):
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, port, str(i), mode, str(n_procs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(n_procs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{out[-4000:]}"
        )
        assert f"MP_WORKER_OK pid={i}" in out, out[-4000:]


@pytest.mark.parametrize("mode", ["annotated", "explicit"])
def test_two_process_data_parallel_fit(mode):
    _run_workers(mode)


def test_three_process_data_parallel_fit():
    """DCN axis > 2 with real cross-process gloo psums (a replica=3 mesh) —
    the branch virtual single-process meshes never execute."""
    _run_workers("annotated", n_procs=3)
