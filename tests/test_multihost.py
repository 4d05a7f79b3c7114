"""Multi-host (DCN) initialization: 2 real processes over localhost.

VERDICT r1 item 8: ``parallel.mesh.multihost_init`` was a never-executed
env-var hook. This test launches two OS processes, each owning one
virtual CPU device, lets the hook assemble them into one jax.distributed
cluster, and runs a psum whose value proves both hosts contributed
(tests/_multihost_worker.py). This is the same wiring a real multi-host
TPU pod uses — only the transport (loopback vs DCN) differs.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_assembles():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        }
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        assert "MULTIHOST_OK" in out
