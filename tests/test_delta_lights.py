"""Delta lights: point / spot / directional (ops/lights.DeltaLights).

No reference analogue (`Test.hlsl` has no lights at all); these pin the
framework's zero-extent emitters: the pure-NEE estimator is DETERMINISTIC
given the light pick, so single-sample renders admit exact analytic
oracles — the strongest test shape in the suite.
"""

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.models import shading
from pathtracing_tpu.ops import lights as lights_ops
from pathtracing_tpu.ops import rng

INV_PI = 1.0 / np.pi


def _floor_builder(albedo=0.6):
    b = scene_mod.SceneBuilder()
    white = b.lambertian((albedo, albedo, albedo))
    b.add_quad((-50.0, 0.0, -50.0), (100.0, 0.0, 0.0), (0.0, 0.0, 100.0),
               white)
    return b


def _bounce(scene, o, d):
    r = o.shape[0]
    keys = jnp.stack([
        rng.pixel_sample_key(jnp.uint32(7), jnp.uint32(i), jnp.uint32(0))
        for i in range(r)
    ])
    out = shading.bounce_batch(
        scene, jnp.asarray(o), jnp.asarray(d), keys,
        jnp.zeros(r, jnp.int32),
        jnp.zeros((r, 3), jnp.float32), jnp.ones((r, 3), jnp.float32),
        jnp.ones(r, bool), rr_start_depth=8, background="black",
        traversal="cluster_jax", nee=True,
    )
    return np.asarray(out[0])


def test_point_light_analytic():
    alb = 0.6
    b = _floor_builder(alb)
    lp = np.array([0.0, 2.0, 0.0])
    inten = np.array([10.0, 6.0, 2.0])
    b.point_light(lp, inten)
    scene = b.build()

    # Straight-down rays hitting the floor at (x, 0, z).
    hits = np.array([[0.0, 0.0, 0.0], [0.8, 0.0, -0.4], [2.0, 0.0, 1.0]])
    o = (hits + np.array([0.0, 1.0, 0.0])).astype(np.float32)
    d = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (3, 1))
    radiance = _bounce(scene, o, d)

    to_l = lp[None] - hits
    d2 = np.sum(to_l * to_l, axis=1)
    cos_s = to_l[:, 1] / np.sqrt(d2)
    want = (alb * INV_PI) * cos_s[:, None] / d2[:, None] * inten[None]
    np.testing.assert_allclose(radiance, want, rtol=2e-3)


def test_spot_cone_falloff():
    alb = 0.5
    b = _floor_builder(alb)
    b.spot_light((0.0, 2.0, 0.0), (0.0, -1.0, 0.0), (20.0, 20.0, 20.0),
                 inner_degrees=10.0, outer_degrees=20.0)
    scene = b.build()

    # Floor points: on-axis (inside inner cone), far off-axis (outside
    # outer cone), and between the cones (partial).
    r_in = 2.0 * np.tan(np.radians(5.0))
    r_mid = 2.0 * np.tan(np.radians(15.0))
    r_out = 2.0 * np.tan(np.radians(40.0))
    hits = np.array([[r_in, 0.0, 0.0], [r_mid, 0.0, 0.0],
                     [r_out, 0.0, 0.0]])
    o = (hits + np.array([0.0, 0.5, 0.0])).astype(np.float32)
    d = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (3, 1))
    radiance = _bounce(scene, o, d).sum(axis=1)

    assert radiance[0] > 1e-3          # fully lit
    assert radiance[2] == 0.0          # hard zero past the outer cone
    assert 0.0 < radiance[1] < radiance[0]  # smoothstep band

    # The band value matches the analytic smoothstep estimator.
    lp = np.array([0.0, 2.0, 0.0])
    to_l = lp - hits[1]
    d2 = float(np.dot(to_l, to_l))
    wi = to_l / np.sqrt(d2)
    cosang = -wi[1] * -1.0  # axis (0,-1,0) · (-wi)
    ci, co = np.cos(np.radians(10.0)), np.cos(np.radians(20.0))
    t = np.clip((cosang - co) / (ci - co), 0.0, 1.0)
    fall = t * t * (3.0 - 2.0 * t)
    want = (alb * INV_PI) * wi[1] / d2 * 20.0 * fall * 3.0
    np.testing.assert_allclose(radiance[1], want, rtol=2e-3)


def test_directional_hard_shadow():
    alb = 0.7
    b = _floor_builder(alb)
    blocker = b.lambertian((0.1, 0.1, 0.1))
    # Opaque card floating over x in [-1, 0], z in [-1, 1].
    b.add_quad((-1.0, 1.0, -1.0), (1.0, 0.0, 0.0), (0.0, 0.0, 2.0),
               blocker)
    irr = np.array([3.0, 3.0, 3.0])
    b.directional_light((0.0, -1.0, 0.0), irr)
    scene = b.build()

    hits = np.array([[-0.5, 0.0, 0.0],   # under the card: shadowed
                     [1.5, 0.0, 0.0]])   # open floor: lit
    o = (hits + np.array([0.0, 0.25, 0.0])).astype(np.float32)
    d = np.tile(np.array([0.0, -1.0, 0.0], np.float32), (2, 1))
    radiance = _bounce(scene, o, d)

    np.testing.assert_allclose(radiance[0], 0.0, atol=1e-7)
    want = (alb * INV_PI) * irr  # cosθ = 1 for a straight-down sun
    np.testing.assert_allclose(radiance[1], want, rtol=2e-3)


def test_two_light_pick_is_unbiased():
    dl = lights_ops.build_delta_lights([
        {"type": "point", "position": (0.0, 2.0, 0.0),
         "intensity": (9.0, 9.0, 9.0)},
        {"type": "point", "position": (3.0, 1.0, 0.0),
         "intensity": (1.0, 2.0, 3.0)},
    ])
    origin = np.array([[0.5, 0.0, 0.2]], np.float32)
    # Stratified pick uniforms: the estimator is piecewise-constant in
    # u, so the stratified mean equals Σ_i contrib_i exactly up to the
    # two cell-boundary samples.
    n = 4096
    us = (np.arange(n, dtype=np.float32) + 0.5) / n
    total = np.zeros(3)
    wi, t_sh, rad = lights_ops.sample_delta(
        dl, jnp.asarray(us), jnp.asarray(np.tile(origin, (n, 1)))
    )
    total = np.asarray(rad).mean(axis=0)

    want = np.zeros(3)
    for p, e in (((0.0, 2.0, 0.0), (9.0, 9.0, 9.0)),
                 ((3.0, 1.0, 0.0), (1.0, 2.0, 3.0))):
        to_l = np.asarray(p) - origin[0]
        want += np.asarray(e) / np.dot(to_l, to_l)
    np.testing.assert_allclose(total, want, rtol=1e-3)


def test_scene_io_delta_lights(tmp_path):
    import json

    from pathtracing_tpu.models import scene_io

    spec = {
        "camera": {"position": [0, 1, 3], "look_at": [0, 0, 0],
                   "vfov_degrees": 40},
        "materials": {"w": {"type": "lambertian",
                            "albedo": [0.5, 0.5, 0.5]}},
        "objects": [{"type": "sphere", "center": [0, 0, 0],
                     "radius": 0.5, "material": "w"}],
        "delta_lights": [
            {"type": "point", "position": [0, 2, 0],
             "intensity": [5, 5, 5]},
            {"type": "spot", "position": [1, 2, 0],
             "direction": [0, -1, 0], "intensity": [9, 9, 9],
             "inner_degrees": 15, "outer_degrees": 25},
            {"type": "directional", "direction": [0, -1, 0],
             "irradiance": [1, 1, 1]},
        ],
    }
    path = tmp_path / "dl.json"
    path.write_text(json.dumps(spec))
    scene, _cam = scene_io.load_scene(str(path))
    assert scene.delta is not None
    kinds = np.asarray(scene.delta.kind)
    assert list(kinds) == [lights_ops.DELTA_POSITIONAL,
                           lights_ops.DELTA_POSITIONAL,
                           lights_ops.DELTA_DIRECTIONAL]
    assert float(np.sum(np.asarray(scene.delta.prob))) > 0.999


def test_feature_gating_default_none():
    from pathtracing_tpu.models import scenes

    scene, _ = scenes.get_scene("cornell_sphere")
    assert scene.delta is None


def test_engines_match_on_delta_scene():
    from pathtracing_tpu.models import progressive, wavefront
    from pathtracing_tpu.utils.config import RenderConfig

    b = _floor_builder(0.6)
    shiny = b.metal((0.9, 0.9, 0.9), fuzz=0.1)
    b.add_sphere((0.0, 0.5, 0.0), 0.5, shiny)
    b.spot_light((1.5, 3.0, 1.0), (-0.45, -0.85, -0.3),
                 (30.0, 25.0, 20.0), inner_degrees=15.0,
                 outer_degrees=30.0)
    b.point_light((-2.0, 1.0, 2.0), (2.0, 2.0, 4.0))
    scene = b.build()
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_depth=3, seed=11, samples_per_step=2,
                       background="black")

    cam = _camera(cfg)
    s_m = progressive.render_step(progressive.init_state(cfg), scene,
                                  cam, cfg)
    img_m = np.asarray(progressive.resolve(s_m))
    s_w = wavefront.render_step(progressive.init_state(cfg), scene,
                                cam, cfg)
    img_w = np.asarray(progressive.resolve(s_w))
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)
    assert img_m.max() > 1e-3  # the lights actually light something


def _camera(cfg):
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import CameraConfig

    cc = CameraConfig(position=(0.0, 1.5, 4.0), look_at=(0.0, 0.5, 0.0),
                      vfov_degrees=45.0)
    return build_camera(cc, cfg.width / cfg.height)
