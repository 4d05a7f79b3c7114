"""Engine feature matrix contract (VERDICT r4 item 6).

The wavefront engine covers only the plain progressive path;
scheduling-layer features (--orbit / --tiles / --adaptive) drive
megakernel waves by design. The README's feature × engine table
documents this; these tests lock it: every unsupported combination
must LOG THE DOCUMENTED WARNING (not silently switch engines), and the
supported combinations must not warn. Subprocess CLI tests, the
reference's `Program.cs` analogue (tests/test_cli.py style).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
}

BASE = ["--scene", "cornell_sphere", "--width", "16", "--height", "16",
        "--spp", "2", "--max-depth", "2", "--engine", "wavefront"]


def run_cli(*args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "pathtracing_tpu.render", *args],
        cwd=REPO, env=ENV, capture_output=True, text=True,
        timeout=timeout,
    )


def test_orbit_warns_and_falls_back(tmp_path):
    r = run_cli(*BASE, "--orbit", "2",
                "--out", str(tmp_path / "f.png"))
    assert r.returncode == 0, r.stderr
    assert "--orbit always renders frames via the megakernel" in r.stderr
    assert (tmp_path / "f_000.png").exists() or any(
        p.name.startswith("f") for p in tmp_path.iterdir()
    )


def test_tiles_warns_and_falls_back(tmp_path):
    r = run_cli(*BASE, "--tiles", "2", "--out", str(tmp_path / "t.png"))
    assert r.returncode == 0, r.stderr
    assert "--tiles always renders via the megakernel" in r.stderr
    assert (tmp_path / "t.png").exists()


def test_adaptive_warns_and_falls_back(tmp_path):
    r = run_cli(*BASE, "--adaptive", "--out", str(tmp_path / "a.png"))
    assert r.returncode == 0, r.stderr
    assert "--adaptive renders band waves via the megakernel" in r.stderr
    assert (tmp_path / "a.png").exists()


def test_plain_progressive_wavefront_no_warning(tmp_path):
    """The supported combination: wavefront progressive render runs
    without any engine warning."""
    r = run_cli(*BASE, "--out", str(tmp_path / "p.png"))
    assert r.returncode == 0, r.stderr
    assert "ignored" not in r.stderr
    assert "megakernel engine" not in r.stderr
    assert (tmp_path / "p.png").exists()
