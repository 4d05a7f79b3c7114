"""Negative control for the tile-axis work-replication gate.

`benchmarks/scaling_probe.py` gates per-device HLO flops on an
(n_tiles, 1) mesh scaling ~1/n_tiles — the only detector that sees a
"replicated traversal behind a correct-looking output sharding"
regression (results stay bitwise).  An untested gate can rot into a
false pass, so this test BREAKS the sharding on purpose (PROBE_BREAK=1
flips parallel/render._PROBE_FULL_BLOCK, making every device render the
full image) and asserts the probe fails loudly (VERDICT r3 weak #3).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "benchmarks", "scaling_probe.py")


def run_probe(extra_env):
    env = {
        **os.environ,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        # 1-spp timing leg keeps the subprocess cheap; the tile-axis
        # flops gate under test is compile-time-only either way.
        "PROBE_SPP": "1",
        **extra_env,
    }
    return subprocess.run(
        [sys.executable, PROBE], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
def test_probe_break_fails_the_gate():
    r = run_probe({"PROBE_BREAK": "1"})
    assert r.returncode != 0, (
        "gate passed with replication forced on:\n" + r.stdout + r.stderr
    )
    assert "replicated across the tile axis" in r.stderr, r.stderr


@pytest.mark.slow
def test_probe_passes_at_head():
    r = run_probe({})
    assert r.returncode == 0, r.stdout + r.stderr
