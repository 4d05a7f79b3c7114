"""End-to-end CLI smoke tests (subprocess — exercises the real entry
point the way a user runs it, the reference's `Program.cs` analogue)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
}


def run_cli(*args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "pathtracing_tpu.render", *args],
        cwd=REPO, env=ENV, capture_output=True, text=True,
        timeout=timeout,
    )


def test_render_and_resume(tmp_path):
    out = str(tmp_path / "r.png")
    ck = str(tmp_path / "ck.npz")
    base = ["--scene", "cornell_sphere", "--width", "16", "--height", "16",
            "--spp", "4", "--spp-per-step", "2", "--max-depth", "3",
            "--checkpoint", ck, "--out", out]
    r = run_cli(*base)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out) and os.path.exists(ck)

    # Resume with a different seed must refuse cleanly (exit 2, no
    # traceback — SURVEY.md §5.3 fail-fast with a friendly message).
    r2 = run_cli(*base, "--seed", "7")
    assert r2.returncode == 2
    assert "refusing to resume" in r2.stderr + r2.stdout
    assert "Traceback" not in r2.stderr


def test_target_rmse_requires_adaptive_in_every_branch(tmp_path):
    """--target-rmse without --adaptive exits 2 even on the early-
    returning --tiles/--aov/--orbit branches (ADVICE r4: the guard used
    to sit after them, so '--tiles --target-rmse' silently ignored the
    flag and rendered the full budget)."""
    for extra in ([], ["--tiles", "2"], ["--aov", "normal"],
                  ["--orbit", "2"]):
        r = run_cli(
            "--scene", "cornell_sphere", "--width", "16", "--height",
            "16", "--spp", "2", "--target-rmse", "0.5",
            "--out", str(tmp_path / "x.png"), *extra,
        )
        assert r.returncode == 2, (extra, r.stderr)
        assert "--target-rmse" in r.stderr, (extra, r.stderr)


def test_unknown_scene_exit_code():
    r = run_cli("--scene", "nope", "--width", "8", "--height", "8",
                "--spp", "1")
    assert r.returncode == 2
    assert "unknown scene" in (r.stderr + r.stdout)


def test_aov_flag(tmp_path):
    out = str(tmp_path / "n.png")
    r = run_cli("--scene", "cornell_sphere", "--width", "16",
                "--height", "16", "--aov", "normal", "--out", out)
    assert r.returncode == 0, r.stderr
    from pathtracing_tpu.utils import image

    img = image.decode_png(open(out, "rb").read())
    assert img.shape == (16, 16, 3)


@pytest.mark.parametrize("extra", [[], ["--engine", "wavefront"]])
def test_json_scene_render(tmp_path, extra):
    out = str(tmp_path / "j.png")
    r = run_cli("--scene", "examples/cornell.json", "--width", "12",
                "--height", "12", "--spp", "2", "--spp-per-step", "2",
                "--max-depth", "2", "--out", out, *extra)
    assert r.returncode == 0, r.stderr
    assert os.path.getsize(out) > 100


def test_orbit_frames(tmp_path):
    """--orbit N writes N distinct turntable frames (the reference's
    windowed frame loop mapped to a batch camera path, App.cs:39-42)."""
    out = str(tmp_path / "seq" / "f.png")
    r = run_cli("--scene", "cornell_sphere", "--width", "12",
                "--height", "12", "--spp", "2", "--max-depth", "2",
                "--orbit", "3", "--out", out)
    assert r.returncode == 0, r.stderr
    from pathtracing_tpu.utils import image

    frames = [
        image.decode_png(
            open(str(tmp_path / "seq" / f"f_{i:04d}.png"), "rb").read()
        )
        for i in range(3)
    ]
    assert all(f.shape == (12, 12, 3) for f in frames)
    # The camera moves, so consecutive frames must differ.
    assert not np.array_equal(frames[0], frames[1])


def test_preview_flag_headless(tmp_path):
    """--preview with the Agg backend: the preview object must update
    per step without a display (VERDICT r1 item 9 — the last untested
    CLI flag). MPLBACKEND=Agg makes plt.ion() a no-op-safe headless
    canvas."""
    out = str(tmp_path / "p.png")
    r = subprocess.run(
        [sys.executable, "-m", "pathtracing_tpu.render",
         "--scene", "cornell_sphere", "--width", "24", "--height", "24",
         "--spp", "4", "--spp-per-step", "2", "--max-depth", "2",
         "--preview", "--out", out],
        cwd=REPO, env={**ENV, "MPLBACKEND": "Agg"},
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)
    assert "preview disabled" not in r.stderr + r.stdout


def test_preview_object_updates():
    """Unit-level: _Preview.update draws every frame (Agg backend)."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    from pathtracing_tpu.render import _Preview

    p = _Preview()
    assert p._plt is not None
    img = np.random.rand(8, 8, 3).astype(np.float32)
    p.update(img, 1)
    first = p._im
    assert first is not None
    p.update(img * 0.5, 2)
    assert p._im is first  # reuses the image artist
    assert p._ax.get_title() == "2 spp"


def test_denoise_flag(tmp_path):
    out = str(tmp_path / "d.png")
    r = run_cli("--scene", "cornell_sphere", "--width", "32",
                "--height", "32", "--spp", "2", "--spp-per-step", "2",
                "--max-depth", "3", "--denoise", "--out", out)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)
    assert "denoised" in (r.stderr + r.stdout)


def test_auto_background(tmp_path):
    """--background auto (the default) picks the emitter-free demo
    scenes' gradient sky — a sky-lit render must not come out black
    (the pre-auto footgun: frosted/glass demos rendered all-black
    under the old hard 'black' default). JSON scenes take a top-level
    "background" key."""
    import json

    from PIL import Image

    out = str(tmp_path / "a.png")
    r = run_cli("--scene", "frosted_demo", "--width", "24", "--height",
                "16", "--spp", "2", "--spp-per-step", "2",
                "--max-depth", "4", "--out", out)
    assert r.returncode == 0, r.stderr
    assert np.asarray(Image.open(out)).mean() > 20.0

    # Explicit value still overrides auto.
    r = run_cli("--scene", "frosted_demo", "--background", "black",
                "--width", "24", "--height", "16", "--spp", "2",
                "--spp-per-step", "2", "--max-depth", "4", "--out", out)
    assert r.returncode == 0, r.stderr
    assert np.asarray(Image.open(out)).mean() < 2.0

    spec = {
        "background": "gradient",
        "camera": {"position": [0, 0, 3], "look_at": [0, 0, 0]},
        "materials": {"m": {"type": "lambertian", "albedo": [1, 1, 1]}},
        "objects": [{"type": "sphere", "center": [0, 0, 0],
                     "radius": 0.5, "material": "m"}],
    }
    p = tmp_path / "sky.json"
    p.write_text(json.dumps(spec))
    r = run_cli("--scene", str(p), "--width", "24", "--height", "16",
                "--spp", "2", "--spp-per-step", "2", "--max-depth", "4",
                "--out", out)
    assert r.returncode == 0, r.stderr
    assert np.asarray(Image.open(out)).mean() > 20.0


def test_hdr_output(tmp_path):
    """--out with a .hdr extension writes LINEAR Radiance RGBE that
    round-trips through the repo's own loader and matches the npz
    radiance to RGBE quantization (~1% shared-exponent mantissa)."""
    out = str(tmp_path / "r.hdr")
    npz = str(tmp_path / "r.npz")
    r = run_cli("--scene", "cornell_sphere", "--width", "24",
                "--height", "16", "--spp", "4", "--spp-per-step", "4",
                "--max-depth", "3", "--out", out, "--out-hdr", npz)
    assert r.returncode == 0, r.stderr
    import sys as _sys
    _sys.path.insert(0, REPO)
    from pathtracing_tpu.ops.envmap import load_hdr

    img = load_hdr(out)
    ref = np.load(npz)["radiance"]
    assert img.shape == ref.shape
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img, ref, rtol=0.01, atol=5e-3)
