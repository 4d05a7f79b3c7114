"""Absorbing interior media (Beer–Lambert colored glass).

Pins: the exact exponential attenuation against the analytic law (using
an IOR-1 dielectric slab — no refraction bending, Schlick reflectance 0,
so the render IS the Beer–Lambert integral), enter/exit medium handoff,
the feature gate (absorption-free scenes build mat_absorb None and the
unmodified state shapes), and engine agreement on a media scene.
"""

import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import progressive, scenes, wavefront
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _slab_scene(sigma, thickness=0.5, emit=4.0):
    """An IOR-1 absorbing slab in front of an emissive back wall, viewed
    head-on: radiance = emit * exp(-sigma * thickness) exactly (IOR 1 →
    no bending, Schlick r0 = 0 → always transmit, NEE off)."""
    b = SceneBuilder()
    glass = b.dielectric(1.0, absorption=sigma)
    wall = b.emissive((emit, emit, emit))
    # Slab with OUTWARD normals (front +z, back −z): the enter/exit
    # handoff keys off the geometric front flag, so winding matters for
    # open geometry like quads (closed spheres are always consistent).
    b.add_quad((-2.0, -2.0, 0.0), (4.0, 0.0, 0.0), (0.0, 4.0, 0.0), glass)
    b.add_quad((-2.0, -2.0, -thickness), (0.0, 4.0, 0.0), (4.0, 0.0, 0.0),
               glass)
    b.add_quad((-2.0, -2.0, -3.0), (4.0, 0.0, 0.0), (0.0, 4.0, 0.0), wall)
    cam = CameraConfig(position=(0.0, 0.0, 2.0), look_at=(0.0, 0.0, 0.0),
                       vfov_degrees=20.0)
    return b.build(), cam


def _render(sc, cam_cfg, engine="megakernel", size=24, spp=4, depth=8):
    cfg = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                       max_depth=depth, samples_per_step=spp, seed=3,
                       engine=engine, traversal="cluster_jax", nee=False,
                       background="black")
    cam = build_camera(cam_cfg, 1.0)
    st = progressive.init_state(cfg)
    step = (progressive.render_step if engine == "megakernel"
            else wavefront.render_step)
    st = step(st, sc, cam, cfg)
    return np.asarray(st.accum) / float(st.spp)


def test_beer_lambert_analytic():
    sigma = (0.8, 1.6, 3.2)
    thickness = 0.5
    sc, cam = _slab_scene(sigma, thickness)
    img = _render(sc, cam)
    # Head-on rays traverse exactly `thickness` of medium; every pixel
    # of this 20°-fov crop sees the slab (cos tilt ≤ 1.5% at the corner,
    # covered by the tolerance).
    want = 4.0 * np.exp(-np.asarray(sigma) * thickness)
    center = img[8:16, 8:16].mean(axis=(0, 1))
    np.testing.assert_allclose(center, want, rtol=2e-2)


def test_no_absorption_behind_slab_exit():
    """After EXITING the slab the medium resets to vacuum: halving the
    gap between slab and wall must not change the image (absorption
    depends only on in-slab distance)."""
    sigma = (2.0, 2.0, 2.0)
    a, _ = _slab_scene(sigma, thickness=0.4)
    b = SceneBuilder()
    glass = b.dielectric(1.0, absorption=sigma)
    wall = b.emissive((4.0, 4.0, 4.0))
    b.add_quad((-2.0, -2.0, 0.0), (4.0, 0.0, 0.0), (0.0, 4.0, 0.0), glass)
    b.add_quad((-2.0, -2.0, -0.4), (0.0, 4.0, 0.0), (4.0, 0.0, 0.0), glass)
    b.add_quad((-2.0, -2.0, -0.9), (4.0, 0.0, 0.0), (0.0, 4.0, 0.0), wall)
    cam = CameraConfig(position=(0.0, 0.0, 2.0), look_at=(0.0, 0.0, 0.0),
                       vfov_degrees=20.0)
    ia = _render(a, cam)[8:16, 8:16].mean(axis=(0, 1))
    ib = _render(b.build(), cam)[8:16, 8:16].mean(axis=(0, 1))
    np.testing.assert_allclose(ia, ib, rtol=1e-2)


def test_absorption_free_scene_gates_off():
    b = SceneBuilder()
    b.dielectric(1.5)                      # explicit zeros
    b.add_sphere((0, 0, 0), 0.5, 0)
    assert b.build().mat_absorb is None
    sc, _ = scenes.cornell_bsdf()
    assert sc.mat_absorb is None
    sc2, _ = scenes.glass_demo()
    assert sc2.mat_absorb is not None


def test_engines_agree_on_media_scene():
    sigma = (0.5, 1.0, 2.0)
    sc, cam = _slab_scene(sigma)
    a = _render(sc, cam, engine="megakernel")
    b = _render(sc, cam, engine="wavefront")
    np.testing.assert_allclose(a, b, atol=3e-4)


def test_absorption_only_removes_energy():
    sc0, cam = _slab_scene((0.0, 0.0, 0.0))
    # zero absorption still builds mat_absorb? No — gate kicks in; force
    # a comparison against a tiny-sigma scene instead.
    sc1, _ = _slab_scene((0.7, 0.7, 0.7))
    i0 = _render(sc0, cam)
    i1 = _render(sc1, cam)
    assert sc0.mat_absorb is None and sc1.mat_absorb is not None
    assert (i1 <= i0 + 1e-5).all()
    assert i1.mean() < i0.mean()


def test_glass_demo_renders():
    sc, cam = scenes.glass_demo()
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=2,
                       max_depth=8, samples_per_step=2, seed=0,
                       engine="megakernel", traversal="cluster_jax",
                       background="gradient")
    cam_b = build_camera(cam, 48 / 32)
    st = progressive.init_state(cfg)
    st = progressive.render_step(st, sc, cam_b, cfg)
    img = np.asarray(st.accum)
    assert np.isfinite(img).all() and img.max() > 0.0
