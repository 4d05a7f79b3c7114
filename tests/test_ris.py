"""RIS light sampling (``RenderConfig.nee_candidates``): contracts.

Talbot resampled importance sampling for the NEE light pick
(models/shading.py bounce_batch, ``nee_candidates`` docstring): M
power-CDF candidates scored by an unshadowed solid-angle target,
resampled to ONE shadow ray, estimator divided by the effective
density M·p̂/Σw. These tests lock:

- M = 1 is the bit-identical legacy estimator (zero-cost gating — the
  flagship graph hash is additionally pinned by benchmarks/graph_hash.py
  and the fixed-seed suite caches);
- M > 1 is unbiased: equal-spp renders agree with M = 1 in the mean
  within MC tolerance on a closed scene;
- M > 1 reduces per-pixel variance on the many-light stress scene
  (the whole point of paying M cheap candidates);
- the fog (medium-vertex) and textured-emission (with_uv) arms stay
  finite and lit under RIS.

No reference analogue (the reference has no light sampling at all,
/root/reference/RayTracing/Shader/Test.hlsl:26-32).
"""

import dataclasses

import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops.camera import build_camera, CameraConfig
from pathtracing_tpu.utils.config import RenderConfig


def _render_scene(scene, camcfg, cfg, seed=0):
    cfg = dataclasses.replace(cfg, seed=seed)
    cam = build_camera(camcfg, cfg.width / cfg.height)
    state = progressive.init_state(cfg)
    steps = cfg.samples_per_pixel // cfg.samples_per_step
    for _ in range(steps):
        state = progressive.render_step(state, scene, cam, cfg)
    return np.asarray(progressive.resolve(state))


def _render(scene_name, cfg, seed=0):
    scene, camcfg = scenes.get_scene(scene_name)
    return _render_scene(scene, camcfg, cfg, seed)


def _corridor(n=64):
    """RIS stress geometry: a long hall with ``n`` EQUAL-power ceiling
    panels down its length. The power-CDF source is uniform over lights
    while the true contribution at any floor point is dominated by the
    nearest few (the geometry term varies ~1000x) — exactly the
    source/target mismatch RIS corrects. Measured on the floor crop
    (rows below the visible panels): var ratio 0.26 at M=4, 0.13 at
    M=8 vs M=1 (near-ideal 1/M)."""
    b = SceneBuilder()
    floor = b.lambertian((0.65, 0.63, 0.6))
    L = 80.0
    b.add_quad((-2.0, 0.0, 0.0), (4.0, 0.0, 0.0), (0.0, 0.0, -L), floor)
    wall = b.lambertian((0.4, 0.4, 0.42))
    b.add_quad((-2.0, 0.0, 0.0), (0.0, 3.0, 0.0), (0.0, 0.0, -L), wall)
    b.add_quad((2.0, 0.0, 0.0), (0.0, 3.0, 0.0), (0.0, 0.0, -L), wall)
    step = L / n
    for i in range(n):
        z = -(i + 0.5) * step
        mat = b.emissive((6.0, 5.7, 5.2))
        b.add_quad((-0.4, 2.999, z - 0.25), (0.8, 0.0, 0.0),
                   (0.0, 0.0, 0.5), mat)
    b.add_sphere((0.6, 0.5, -3.0), 0.5, b.lambertian((0.7, 0.68, 0.66)))
    cam = CameraConfig(position=(0.0, 1.4, 1.0), look_at=(0.0, 1.0, -8.0),
                       vfov_degrees=55.0)
    return b.build(), cam


def test_m1_is_default_graph():
    """nee_candidates=1 must be the dataclass default (the legacy
    estimator); the bit-identity of that graph is pinned by the
    fixed-seed suite caches + benchmarks/graph_hash.py."""
    assert RenderConfig().nee_candidates == 1


def test_ris_unbiased_against_m1():
    """Equal-budget M=1 vs M=8 means agree on cornell_sphere — RIS is
    an estimator change, not a transport change."""
    cfg = RenderConfig(width=48, height=48, samples_per_pixel=64,
                       samples_per_step=16, max_depth=4)
    a = _render("cornell_sphere", cfg)
    b = _render("cornell_sphere",
                dataclasses.replace(cfg, nee_candidates=8))
    # Scene mean ~0.2; per-image MC noise at 64 spp is well under 1%.
    assert abs(a.mean() - b.mean()) < 0.01 * max(a.mean(), 1e-6)
    # Pixel-level agreement (both near-converged on a diffuse scene).
    assert np.abs(a - b).mean() < 0.02


def test_ris_corridor_near_ideal_reduction():
    """The equal-power corridor is where RIS earns its keep: on the
    floor crop (NEE-driven pixels, no directly-visible panels) M=4
    measured a 3.9x variance reduction and M=8 7.5x — assert half the
    measured margins to stay robust across backends/seeds."""
    sc, cc = _corridor()
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=1,
                       samples_per_step=1, max_depth=1)
    seeds = range(12)

    def crop_var(m):
        c = dataclasses.replace(cfg, nee_candidates=m)
        imgs = np.stack([_render_scene(sc, cc, c, s) for s in seeds])
        crop = imgs[:, 20:, :, :]
        return crop.mean(), crop.var(axis=0).mean()

    m1, v1 = crop_var(1)
    m4, v4 = crop_var(4)
    m8, v8 = crop_var(8)
    assert abs(m4 - m1) < 0.1 * m1 and abs(m8 - m1) < 0.1 * m1
    assert v4 < 0.55 * v1, (v1, v4)
    assert v8 < 0.35 * v1, (v1, v8)
    assert v8 < v4  # monotone in M on this scene


@pytest.mark.parametrize("m", [4])
def test_ris_reduces_variance_on_many_lights(m):
    """On many_lights_demo (Pareto powers + GLOSSY floor) the per-pixel
    variance across independent seeds must drop with RIS at equal spp.
    The glossy floor is the regression canary: a target without the
    BSDF term resamples glossy lanes toward lights their lobe can't
    see, which measured as a variance INCREASE (ratio 1.23 at M=4);
    the f·Le·cos target measured 0.77."""
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=2,
                       samples_per_step=2, max_depth=2)
    seeds = range(6)
    imgs1 = np.stack([_render("many_lights_demo", cfg, s)
                      for s in seeds])
    imgsM = np.stack([
        _render("many_lights_demo",
                dataclasses.replace(cfg, nee_candidates=m), s)
        for s in seeds
    ])
    v1 = imgs1.var(axis=0).mean()
    vM = imgsM.var(axis=0).mean()
    # Means must agree (unbiasedness) while variance drops.
    assert abs(imgs1.mean() - imgsM.mean()) < 0.05 * imgs1.mean()
    assert vM < 0.9 * v1, (v1, vM)


def test_ris_fog_and_textured_emission_finite():
    """Medium vertices (fog arm) and with_uv emitters under RIS."""
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=4,
                       samples_per_step=4, max_depth=4,
                       nee_candidates=4)
    for name in ("fog_demo", "screenlight_demo"):
        img = _render(name, cfg)
        assert np.isfinite(img).all(), name
        assert img.mean() > 1e-3, name
