"""bench.py deadline-aware harness contract (PERF.md round-end bench
protocol, after the BENCH_r04 rc=124 capture failure).

Subprocess tests of the PARENT logic — the part that failed in r4:
the cheap tunnel probe must fail FAST (not consume the driver's whole
window) when the backend is unusable, and the happy path must print
one JSON line with a value within the deadline.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def run_bench(env_extra, timeout=420):
    env = {
        **os.environ,
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        **env_extra,
    }
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, BENCH], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=timeout,
    )
    return proc, time.monotonic() - t0


def test_happy_path_emits_json_within_deadline():
    # Generous deadline: each child pays a fresh jax import + compile
    # (~2 min each on the contended 1-core CI box); the deadline under
    # test is the BUDGETING logic, not wall-clock performance.
    proc, dt = run_bench({
        "BENCH_WIDTH": "32", "BENCH_HEIGHT": "32", "BENCH_STEPS": "1",
        "BENCH_DEPTH": "2", "BENCH_DEADLINE_S": "780",
        "BENCH_COOLDOWN": "1",
    }, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    parsed = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(parsed)


def test_unusable_backend_fails_fast():
    """A backend that cannot initialize (the busy-tunnel analogue) must
    fail the probe and exit nonzero well inside the deadline instead of
    wedging for the driver's whole window (the r4 failure mode)."""
    proc, dt = run_bench({
        # An unknown platform makes every child exit nonzero quickly.
        "JAX_PLATFORMS": "no_such_platform",
        "BENCH_DEADLINE_S": "240", "BENCH_COOLDOWN": "1",
    }, timeout=300)
    assert proc.returncode == 1
    assert "probe" in proc.stderr
    assert dt < 240, dt
