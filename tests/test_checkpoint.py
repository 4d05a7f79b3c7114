"""Checkpoint/resume determinism + CLI smoke tests (SURVEY.md §5.3-5.4)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils import checkpoint as ckpt
from pathtracing_tpu.utils import image
from pathtracing_tpu.utils.config import RenderConfig


class TestCheckpoint:
    def test_resume_bit_identical(self, tmp_path):
        """Interrupt + resume == uninterrupted run, bit for bit."""
        scene, cam_cfg = scenes.cornell_sphere()
        cam = build_camera(cam_cfg, 1.0)
        cfg = RenderConfig(width=12, height=12, samples_per_pixel=8,
                           max_depth=3, seed=9, samples_per_step=2)
        path = str(tmp_path / "render.ckpt.npz")

        # Uninterrupted: 4 steps.
        state = progressive.init_state(cfg)
        for _ in range(4):
            state = progressive.render_step(state, scene, cam, cfg)
        full = np.asarray(state.accum)

        # Interrupted: 2 steps, save, reload, 2 more.
        state = progressive.init_state(cfg)
        for _ in range(2):
            state = progressive.render_step(state, scene, cam, cfg)
        ckpt.save(path, state, cfg)
        resumed = ckpt.load(path, cfg)
        assert int(resumed.spp) == 4
        for _ in range(2):
            resumed = progressive.render_step(resumed, scene, cam, cfg)

        np.testing.assert_array_equal(full, np.asarray(resumed.accum))

    def test_config_mismatch_refused(self, tmp_path):
        cfg = RenderConfig(width=8, height=8, samples_per_pixel=4)
        path = str(tmp_path / "c.npz")
        ckpt.save(path, progressive.init_state(cfg), cfg)
        other = RenderConfig(width=8, height=8, samples_per_pixel=4, seed=1)
        with pytest.raises(ValueError, match="different config"):
            ckpt.load(path, other)


class TestCLI:
    def _run(self, tmp_path, *extra):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""  # skip the TPU claim (container
        #                                   sitecustomize) for subprocesses
        out = str(tmp_path / "out.png")
        res = subprocess.run(
            [sys.executable, "-m", "pathtracing_tpu.render",
             "--out", out, *extra],
            capture_output=True, text=True, timeout=560, env=env,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        return out, res

    def test_reference_scene(self, tmp_path):
        out, _ = self._run(tmp_path, "--scene", "reference",
                           "--width", "64", "--height", "48")
        img = image.decode_png(open(out, "rb").read())
        assert img.shape == (48, 64, 3)

    def test_small_render(self, tmp_path):
        out, res = self._run(
            tmp_path, "--scene", "cornell_sphere", "--width", "16",
            "--height", "16", "--spp", "4", "--spp-per-step", "2",
            "--max-depth", "3",
        )
        img = image.decode_png(open(out, "rb").read())
        assert img.shape == (16, 16, 3)
        assert "Mrays/s" in res.stderr

    def test_checkpoint_cli(self, tmp_path):
        c = str(tmp_path / "ck.npz")
        self._run(tmp_path, "--scene", "cornell_sphere", "--width", "8",
                  "--height", "8", "--spp", "4", "--spp-per-step", "2",
                  "--max-depth", "2", "--checkpoint", c)
        assert os.path.exists(c)
        # Resume (already complete — should exit immediately, still OK).
        _, res = self._run(tmp_path, "--scene", "cornell_sphere",
                           "--width", "8", "--height", "8", "--spp", "4",
                           "--spp-per-step", "2", "--max-depth", "2",
                           "--checkpoint", c)
        assert "resumed" in res.stderr
