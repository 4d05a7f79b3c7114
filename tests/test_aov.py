"""AOV passes: reference-kernel normal shading generalized + diagnostics."""

import numpy as np
import pytest

from pathtracing_tpu.models import aov, scenes
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import RenderConfig

CFG = RenderConfig(width=32, height=32, samples_per_pixel=1, max_depth=1,
                   seed=0, background="gradient")


@pytest.fixture(scope="module")
def setup():
    scene, cam_cfg = scenes.cornell_bsdf()
    return scene, build_camera(cam_cfg, 1.0)


@pytest.mark.parametrize("kind", list(aov.AOV_KINDS))
def test_aov_shapes_and_range(setup, kind):
    scene, camera = setup
    img = np.asarray(aov.render_aov(scene, camera, CFG, kind))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.5


def test_normal_aov_matches_reference_shading(setup):
    """normal AOV == n*0.5+0.5 (`Test.hlsl:32`): values center at 0.5 and
    the back wall (normal +z toward camera) shades (0.5, 0.5, 1.0)."""
    scene, camera = setup
    img = np.asarray(aov.render_aov(scene, camera, CFG, "normal"))
    center = img[16, 16]  # back wall behind the spheres? row 16 is mid —
    # mid-left pixel definitely on the back wall:
    back = img[8, 16]
    np.testing.assert_allclose(back, [0.5, 0.5, 1.0], atol=0.02)


def test_depth_monotone(setup):
    """Nearer surfaces are brighter; floor in front > back wall."""
    scene, camera = setup
    img = np.asarray(aov.render_aov(scene, camera, CFG, "depth"))
    assert img[31, 16, 0] > img[8, 16, 0]  # bottom (near floor) vs back


def test_albedo_shows_wall_colors(setup):
    scene, camera = setup
    img = np.asarray(aov.render_aov(scene, camera, CFG, "albedo"))
    left = img[16, 1]    # red wall
    right = img[16, 30]  # green wall
    assert left[0] > 0.4 and left[1] < 0.2
    assert right[1] > 0.3 and right[0] < 0.2


def test_unknown_kind_rejected(setup):
    scene, camera = setup
    with pytest.raises(ValueError, match="unknown AOV"):
        aov.render_aov(scene, camera, CFG, "zdepth")
