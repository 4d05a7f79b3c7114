"""Spectral dispersion: channel-sampled dielectric IOR.

The estimator is the textbook single-wavelength split: a dispersive
dielectric hit samples one RGB channel ∝ throughput and runs the whole
interaction (Fresnel, TIR, refract) at that channel's IOR, weighting by
onehot(c)/p_c. Ground truth per channel is therefore a PLAIN dielectric
render whose IOR is that channel's — the tests pin the dispersive
render against three such single-IOR renders, plus feature gating.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _glass_scene(ior=1.62, dispersion=0.0):
    b = SceneBuilder()
    white = b.lambertian((0.85, 0.85, 0.85))
    glass = b.dielectric(ior=ior, dispersion=dispersion)
    b.add_quad((-3, 0, -3), (6, 0, 0), (0, 0, 6), white)
    b.add_sphere((0.0, 0.8, 0.0), 0.7, glass)
    b.add_quad((-1.2, 3.2, -0.2), (2.4, 0, 0), (0, 0, 0.4),
               b.emissive((40.0, 40.0, 40.0)))
    cam = CameraConfig(position=(0.0, 2.0, 3.4), look_at=(0.0, 0.4, 0.0),
                       vfov_degrees=45.0)
    return b.build(), build_camera(cam, 1.0)


def _render(scene, camera, spp, seed=0, size=40):
    config = RenderConfig(
        width=size, height=size, samples_per_pixel=spp, max_depth=6,
        samples_per_step=min(spp, 256), seed=seed, nee=True,
    )
    state = progressive.init_state(config)
    done = 0
    while done < spp:
        state = progressive.render_step(state, scene, camera, config)
        done += config.samples_per_step
    return np.asarray(state.accum / state.spp)


def test_gate_closed_without_dispersion():
    scene, _ = _glass_scene(dispersion=0.0)
    assert scene.mat_disp is None
    scene2, _ = _glass_scene(dispersion=0.1)
    assert scene2.mat_disp is not None


def test_zero_dispersion_material_matches_plain():
    """A scene CARRYING a dispersion column but whose hit material has
    dispersion 0 renders bit-identically to the plain-dielectric path
    (the disp_on mask keeps non-dispersive lanes on the original
    values)."""
    scene_plain, cam = _glass_scene(dispersion=0.0)
    # Same geometry; an extra never-hit dispersive material forces the
    # column to exist.
    b = SceneBuilder()
    white = b.lambertian((0.85, 0.85, 0.85))
    glass = b.dielectric(ior=1.62, dispersion=0.0)
    b.dielectric(ior=1.5, dispersion=0.2)   # unused, forces mat_disp
    b.add_quad((-3, 0, -3), (6, 0, 0), (0, 0, 6), white)
    b.add_sphere((0.0, 0.8, 0.0), 0.7, glass)
    b.add_quad((-1.2, 3.2, -0.2), (2.4, 0, 0), (0, 0, 0.4),
               b.emissive((40.0, 40.0, 40.0)))
    scene_col = b.build()
    assert scene_col.mat_disp is not None
    img_plain = _render(scene_plain, cam, 16)
    img_col = _render(scene_col, cam, 16)
    assert (img_plain == img_col).all()


def test_dispersive_channels_match_single_ior_renders():
    """Each channel of the dispersive render converges to the same
    channel of a plain render at that channel's IOR: red at ior−d/2,
    green at ior, blue at ior+d/2."""
    d = 0.12
    scene_disp, cam = _glass_scene(ior=1.62, dispersion=d)
    img = _render(scene_disp, cam, 1024, seed=0)
    for c, ior_c in [(0, 1.62 - d / 2), (1, 1.62), (2, 1.62 + d / 2)]:
        ref, _ = _glass_scene(ior=ior_c, dispersion=0.0)
        img_ref = _render(ref, cam, 1024, seed=1)
        a, b = img[..., c], img_ref[..., c]
        rel = abs(a.mean() - b.mean()) / b.mean()
        assert rel < 0.04, f"channel {c}: mean mismatch {rel:.3f}"


def test_prism_demo_shows_fringes():
    """The dispersive sphere's caustic separates channels: somewhere in
    the image the per-pixel channel spread is large relative to a plain
    glass render of the same geometry."""
    scene, cam_cfg = scenes.prism_demo()
    camera = build_camera(cam_cfg, 1.0)
    img = _render(scene, camera, 256, size=64)
    # Channel spread normalized by brightness, on lit pixels.
    lum = img.mean(-1)
    lit = lum > 0.05
    spread = (img.max(-1) - img.min(-1))[lit] / np.maximum(lum[lit], 1e-6)
    assert (spread > 0.5).sum() > 10, "no strong color fringes found"
