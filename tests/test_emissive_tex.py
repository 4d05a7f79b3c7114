"""Textured emission (TV screens / stained glass): emissive materials
with a texture modulate the emitted radiance at the hit/sampled uv,
while light SELECTION and both MIS pdf arms stay on the base power
(ops/lights.LightTable uv columns; models/shading emit_pdf).

Strongest pin: a uniform-texel emitter must render EQUAL to a plain
emitter with the pre-multiplied radiance — that exercises every
estimator path (hit-arm emission, NEE contribution, MIS weights, pick
CDF) at once, deterministically.
"""

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.models import progressive, wavefront
from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _scene(emit_base, texture=None):
    b = scene_mod.SceneBuilder()
    floor = b.lambertian((0.65, 0.65, 0.65))
    b.add_quad((-4.0, 0.0, -4.0), (8.0, 0.0, 0.0), (0.0, 0.0, 8.0),
               floor)
    lamp = b.emissive(emit_base, texture=texture)
    # Downward-facing panel light with unit-square uvs.
    b.add_quad((-1.0, 2.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0),
               lamp, uv=True)
    return b.build()


def _cfg(spp=4, depth=3, seed=3):
    return RenderConfig(width=24, height=18, samples_per_pixel=spp,
                        max_depth=depth, seed=seed, samples_per_step=spp,
                        background="black")


def _render(scene, cfg, engine=progressive):
    cam = build_camera(
        CameraConfig(position=(0.0, 1.0, 4.5), look_at=(0.0, 0.5, 0.0),
                     vfov_degrees=50.0), cfg.width / cfg.height,
    )
    state = engine.render_step(progressive.init_state(cfg), scene,
                               cam, cfg)
    return np.asarray(progressive.resolve(state))


def test_uniform_texel_equals_premultiplied_plain():
    # 8.0 × 0.5 and 4.0 are exact binary scalings: the textured render
    # must match the plain pre-multiplied one to fp noise (the pick CDF
    # and every MIS pdf are scale-invariant by construction).
    tex = np.full((2, 2, 3), 0.5, np.float32)
    img_tex = _render(_scene((8.0, 8.0, 8.0), texture=tex), _cfg())
    img_plain = _render(_scene((4.0, 4.0, 4.0)), _cfg())
    np.testing.assert_allclose(img_tex, img_plain, atol=1e-5)
    assert img_plain.max() > 0.01


def test_table_gating():
    s_plain = _scene((4.0, 4.0, 4.0))
    assert s_plain.lights.uv0 is None and s_plain.lights.tex is None
    tex = np.full((1, 1, 3), 1.0, np.float32)
    s_tex = _scene((4.0, 4.0, 4.0), texture=tex)
    assert s_tex.lights.uv0 is not None
    assert int(np.asarray(s_tex.lights.tex).max()) >= 0


def test_half_dark_panel_shifts_light():
    # Left half of the panel black, right half 2x: floor pixels toward
    # the bright half must receive clearly more light. The panel is an
    # AREA light well above the floor, so the contrast is soft (and a
    # 1-D texture bilinearly blends between texel centers) — the gate
    # checks the gradient's direction and a calibrated magnitude, not a
    # hard shadow. (The quad's u axis runs +x; texel columns left→right.)
    tex = np.zeros((1, 8, 3), np.float32)
    tex[0, 4:] = 2.0
    scene = _scene((6.0, 6.0, 6.0), texture=tex)
    cfg = _cfg(spp=16, depth=2, seed=9)
    img = _render(scene, cfg)
    h, w, _ = img.shape
    left = img[h // 2:, : w // 3].mean()
    right = img[h // 2:, 2 * w // 3:].mean()
    assert right > 1.25 * left, (left, right)


def test_camera_sees_the_pattern():
    # Direct camera hits on the emitter show base × texel: the hit-arm
    # modulation (bilinear-sampled, but constant within a texel's
    # clamped interior).
    from pathtracing_tpu.models import shading
    from pathtracing_tpu.ops import rng

    tex = np.zeros((1, 2, 3), np.float32)
    tex[0, 0] = (1.0, 0.0, 0.0)   # left half red
    tex[0, 1] = (0.0, 1.0, 0.0)   # right half green
    scene = _scene((8.0, 8.0, 8.0), texture=tex)

    # Rays straight down at the panel's left and right quarters.
    o = np.array([[-0.5, 3.0, 0.0], [0.5, 3.0, 0.0]], np.float32)
    d = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (2, 1))
    keys = jnp.stack([
        rng.pixel_sample_key(jnp.uint32(1), jnp.uint32(i), jnp.uint32(0))
        for i in range(2)
    ])
    out = shading.bounce_batch(
        scene, jnp.asarray(o), jnp.asarray(d), keys,
        jnp.zeros(2, jnp.int32), jnp.zeros((2, 3), jnp.float32),
        jnp.ones((2, 3), jnp.float32), jnp.ones(2, bool),
        rr_start_depth=8, background="black",
        traversal="cluster_jax", nee=True,
    )
    radiance = np.asarray(out[0])
    np.testing.assert_allclose(radiance[0], [8.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(radiance[1], [0.0, 8.0, 0.0], atol=1e-5)


def test_engines_match():
    tex = np.zeros((1, 2, 3), np.float32)
    tex[0, 1] = 1.5
    scene = _scene((6.0, 6.0, 6.0), texture=tex)
    cfg = _cfg(spp=2, depth=3, seed=4)
    img_m = _render(scene, cfg, progressive)
    img_w = _render(scene, cfg, wavefront)
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)
