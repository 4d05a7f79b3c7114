"""Principled (metallic-roughness) material — TYPE_PRINCIPLED.

Pins: the metallic=1 limit against the TYPE_GGX conductor (same
half-vector draws → identical directions, algebraically equal weights),
the mixture pdf's normalization (the MIS denominator must be a real
density), NEE-on vs NEE-off estimator consistency (the lobe's eval and
sample arms agree), the mat_metallic feature gate, and scene_io
routing.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import progressive, scene_io, scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import linalg, materials
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _rand_dirs(key, n):
    v = jax.random.normal(key, (n, 3))
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def test_metallic_one_matches_ggx():
    """metallic=1, roughness=sqrt(alpha) reproduces the TYPE_GGX
    conductor: p_spec clamps to 1, the same (u0, u1) drive the same
    half-vector, so directions are bit-identical and the weights
    (computed via f·cos/pdf vs Walter eq. 41) agree numerically."""
    n = 4096
    key = jax.random.PRNGKey(1)
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    d_in = jnp.tile(
        linalg.normalize(jnp.array([[0.4, 0.1, -1.0]])), (n, 1)
    )
    u = jax.random.uniform(key, (n, 5))
    alpha = 0.09
    base = jnp.tile(jnp.array([[0.9, 0.6, 0.3]]), (n, 1))
    front = jnp.ones(n, jnp.bool_)

    t_ggx = jnp.full(n, materials.TYPE_GGX, jnp.int32)
    d_g, w_g, ok_g, pdf_g = materials.scatter(
        t_ggx, base, jnp.full(n, alpha), jnp.zeros((n, 3)),
        normal, d_in, front, u,
    )
    t_pr = jnp.full(n, materials.TYPE_PRINCIPLED, jnp.int32)
    d_p, w_p, ok_p, pdf_p = materials.scatter(
        t_pr, base, jnp.full(n, np.sqrt(alpha)), jnp.zeros((n, 3)),
        normal, d_in, front, u, metallic=jnp.ones(n),
    )
    np.testing.assert_array_equal(np.asarray(d_g), np.asarray(d_p))
    np.testing.assert_array_equal(np.asarray(ok_g), np.asarray(ok_p))
    m = np.asarray(ok_g)
    np.testing.assert_allclose(
        np.asarray(w_g)[m], np.asarray(w_p)[m], rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(pdf_g)[m], np.asarray(pdf_p)[m], rtol=2e-4
    )


def test_mixture_pdf_normalizes():
    """principled_eval's pdf must integrate to ~1 over the hemisphere
    (it is the density scatter samples from; MIS weights divide by it).
    MC estimate with uniform-hemisphere samples."""
    n = 200_000
    key = jax.random.PRNGKey(2)
    d = _rand_dirs(key, n)
    d = d * jnp.where(d[:, 2:3] < 0, -1.0, 1.0)      # upper hemisphere
    normal = jnp.array([0.0, 0.0, 1.0])
    view = linalg.normalize(jnp.array([0.5, 0.0, 0.8]))
    for metallic, rough in ((0.0, 0.6), (0.5, 0.3), (1.0, 0.15)):
        _, pdf = materials.principled_eval(
            jnp.tile(jnp.array([[0.7, 0.5, 0.3]]), (n, 1)),
            jnp.full(n, metallic), jnp.full(n, rough),
            jnp.tile(normal[None], (n, 1)), jnp.tile(view[None], (n, 1)),
            d,
        )
        total = float(jnp.mean(pdf) * 2.0 * jnp.pi)
        assert abs(total - 1.0) < 0.03, (metallic, rough, total)


def _box_scene(metallic, roughness):
    b = SceneBuilder()
    white = b.lambertian((0.73, 0.73, 0.73))
    lamp = b.emissive((18.0, 18.0, 18.0))
    ball = b.principled((0.7, 0.3, 0.25), metallic=metallic,
                        roughness=roughness)
    b.add_quad((-1, 0, -1), (2, 0, 0), (0, 0, 2), white)      # floor
    b.add_quad((-0.4, 1.6, -0.4), (0.8, 0, 0), (0, 0, 0.8), lamp)
    b.add_sphere((0.0, 0.45, 0.0), 0.45, ball)
    cam = CameraConfig(position=(0.0, 0.9, 2.2), look_at=(0.0, 0.4, 0.0),
                       vfov_degrees=42.0)
    return b.build(), cam


def _render(sc, cam_cfg, nee, spp=256, size=40, seed=11):
    cfg = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                       max_depth=5, samples_per_step=spp, seed=seed,
                       traversal="cluster_jax", nee=nee,
                       background="black")
    cam = build_camera(cam_cfg, 1.0)
    st = progressive.init_state(cfg)
    st = progressive.render_step(st, sc, cam, cfg)
    return np.asarray(st.accum) / float(st.spp)


def test_nee_consistency():
    """NEE-on and NEE-off converge to the same image: the principled
    eval (f, mixture pdf) used by light sampling/MIS agrees with the
    sampling arm. A mismatched pdf would bias one estimator."""
    sc, cam = _box_scene(metallic=0.4, roughness=0.35)
    img_nee = _render(sc, cam, nee=True)
    img_brute = _render(sc, cam, nee=False, spp=1024)
    m_nee, m_brute = float(img_nee.mean()), float(img_brute.mean())
    assert abs(m_nee - m_brute) / m_brute < 0.05, (m_nee, m_brute)


def test_feature_gate_and_registry():
    sc, _ = scenes.cornell_bsdf()
    assert sc.mat_metallic is None
    sc2, _ = scenes.principled_demo(rows=2, cols=2)
    assert sc2.mat_metallic is not None
    assert int(np.asarray(sc2.mat_type).max()) == materials.TYPE_PRINCIPLED


def test_scene_io_principled(tmp_path):
    spec = {
        "camera": {"position": [0, 1, 3], "look_at": [0, 0, 0],
                   "vfov_degrees": 40},
        "materials": {
            "paint": {"type": "principled", "base_color": [0.6, 0.2, 0.2],
                      "metallic": 0.7, "roughness": 0.25},
        },
        "objects": [
            {"type": "sphere", "center": [0, 0, 0], "radius": 0.5,
             "material": "paint"},
        ],
    }
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(spec))
    sc, cam = scene_io.load_scene(str(p))
    assert sc.mat_metallic is not None
    k = int(np.asarray(sc.sph_mat)[0])
    assert int(np.asarray(sc.mat_type)[k]) == materials.TYPE_PRINCIPLED
    assert abs(float(np.asarray(sc.mat_metallic)[k]) - 0.7) < 1e-6
    assert abs(float(np.asarray(sc.mat_param)[k]) - 0.25) < 1e-6


def _mr_box(mr_tex=None, metallic=1.0, roughness=1.0):
    b = SceneBuilder()
    white = b.lambertian((0.73, 0.73, 0.73))
    lamp = b.emissive((18.0, 18.0, 18.0))
    ball = b.principled((0.7, 0.3, 0.25), metallic=metallic,
                        roughness=roughness, mr_texture=mr_tex)
    b.add_quad((-1, 0, -1), (2, 0, 0), (0, 0, 2), white)
    b.add_quad((-0.4, 1.6, -0.4), (0.8, 0, 0), (0, 0, 0.8), lamp)
    b.add_sphere((0.0, 0.45, 0.0), 0.45, ball)
    cam = CameraConfig(position=(0.0, 0.9, 2.2), look_at=(0.0, 0.4, 0.0),
                       vfov_degrees=42.0)
    return b.build(), cam


def test_mr_map_constant_equals_factors():
    """A constant metallic-roughness map (G=g, B=b) on factor-1 material
    equals the unmapped material with roughness=g, metallic=b (glTF
    factor*texture semantics). Bilinear interpolation of a constant is
    the constant to fp tolerance."""
    g, bl = 0.3, 0.6
    tex = np.tile(np.array([0.0, g, bl], np.float32), (8, 8, 1))
    sc_map, cam = _mr_box(mr_tex=tex, metallic=1.0, roughness=1.0)
    sc_ref, _ = _mr_box(mr_tex=None, metallic=bl, roughness=g)
    assert sc_map.mat_mrtex is not None and sc_ref.mat_mrtex is None
    img_map = _render(sc_map, cam, nee=True, spp=8, size=32)
    img_ref = _render(sc_ref, cam, nee=True, spp=8, size=32)
    np.testing.assert_allclose(img_map, img_ref, atol=1e-4)


def test_mr_map_varies_roughness():
    """A map whose roughness channel differs left/right renders the two
    sphere halves differently (the map actually drives the lobe)."""
    tex = np.zeros((8, 4, 3), np.float32)
    tex[:4, :, 1] = 0.05   # sharp lower hemisphere (v < 0.5)
    tex[4:, :, 1] = 1.0    # rough upper hemisphere
    tex[..., 2] = 1.0      # fully metallic everywhere
    sc, cam = _mr_box(mr_tex=tex, metallic=1.0, roughness=1.0)
    img = _render(sc, cam, nee=True, spp=32, size=48)
    sc_u, _ = _mr_box(mr_tex=None, metallic=1.0, roughness=1.0)
    img_u = _render(sc_u, cam, nee=True, spp=32, size=48)
    # The mapped render must differ from the uniform-rough one (the map
    # drives the lobe), and the sharp/rough hemispheres must differ
    # from each other.
    assert float(np.abs(img - img_u).mean()) > 1e-3
    top = img[8:20, 12:36].mean(axis=(0, 1))
    bottom = img[28:40, 12:36].mean(axis=(0, 1))
    assert not np.allclose(top, bottom, atol=5e-3)


def test_clearcoat_zero_is_bit_exact():
    """A clearcoat column with strength-0 rows selects the plain
    two-lobe principled results bit-for-bit (w_cc = 0 drops out of the
    weights; f_cc scaled by 0; atten = 1)."""
    n = 2048
    key = jax.random.PRNGKey(5)
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    d_in = jnp.tile(
        linalg.normalize(jnp.array([[0.3, -0.2, -1.0]])), (n, 1)
    )
    u = jax.random.uniform(key, (n, 5))
    base = jnp.tile(jnp.array([[0.6, 0.4, 0.3]]), (n, 1))
    front = jnp.ones(n, jnp.bool_)
    t_pr = jnp.full(n, materials.TYPE_PRINCIPLED, jnp.int32)
    args = (t_pr, base, jnp.full(n, 0.4), jnp.zeros((n, 3)),
            normal, d_in, front, u)
    cc0 = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.full((n, 1), 0.1)], axis=1
    )
    a = materials.scatter(*args, metallic=jnp.full(n, 0.3))
    b_ = materials.scatter(*args, metallic=jnp.full(n, 0.3),
                           clearcoat=cc0)
    for x, y in zip(a, b_):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_clearcoat_pdf_normalizes():
    """The three-lobe mixture pdf still integrates to ~1."""
    n = 200_000
    key = jax.random.PRNGKey(6)
    d = _rand_dirs(key, n)
    d = d * jnp.where(d[:, 2:3] < 0, -1.0, 1.0)
    normal = jnp.array([0.0, 0.0, 1.0])
    view = linalg.normalize(jnp.array([0.4, 0.1, 0.9]))
    cc = jnp.tile(jnp.array([[0.8, 0.15]]), (n, 1))
    _, pdf = materials.principled_eval(
        jnp.tile(jnp.array([[0.7, 0.5, 0.3]]), (n, 1)),
        jnp.full(n, 0.2), jnp.full(n, 0.5),
        jnp.tile(normal[None], (n, 1)), jnp.tile(view[None], (n, 1)),
        d, clearcoat=cc,
    )
    total = float(jnp.mean(pdf) * 2.0 * jnp.pi)
    assert abs(total - 1.0) < 0.03, total


def test_clearcoat_nee_consistency():
    """NEE-on vs NEE-off agreement with the coat active — the layered
    eval and the three-lobe sampler describe the same estimator."""
    b = SceneBuilder()
    white = b.lambertian((0.73, 0.73, 0.73))
    lamp = b.emissive((18.0, 18.0, 18.0))
    ball = b.principled((0.6, 0.25, 0.2), metallic=0.0, roughness=0.8,
                        clearcoat=1.0, clearcoat_roughness=0.08)
    b.add_quad((-1, 0, -1), (2, 0, 0), (0, 0, 2), white)
    b.add_quad((-0.4, 1.6, -0.4), (0.8, 0, 0), (0, 0, 0.8), lamp)
    b.add_sphere((0.0, 0.45, 0.0), 0.45, ball)
    sc = b.build()
    assert sc.mat_clearcoat is not None
    cam = CameraConfig(position=(0.0, 0.9, 2.2), look_at=(0.0, 0.4, 0.0),
                       vfov_degrees=42.0)
    img_nee = _render(sc, cam, nee=True)
    img_brute = _render(sc, cam, nee=False, spp=1024)
    m_nee, m_brute = float(img_nee.mean()), float(img_brute.mean())
    assert abs(m_nee - m_brute) / m_brute < 0.05, (m_nee, m_brute)


def test_clearcoat_adds_gloss():
    """A coat over a rough diffuse base adds visible specular energy
    near the mirror direction (the render changes)."""
    def ball_scene(cc):
        b = SceneBuilder()
        white = b.lambertian((0.73, 0.73, 0.73))
        lamp = b.emissive((18.0, 18.0, 18.0))
        m = b.principled((0.6, 0.25, 0.2), metallic=0.0, roughness=0.9,
                         clearcoat=cc, clearcoat_roughness=0.05)
        b.add_quad((-1, 0, -1), (2, 0, 0), (0, 0, 2), white)
        b.add_quad((-0.4, 1.6, -0.4), (0.8, 0, 0), (0, 0, 0.8), lamp)
        b.add_sphere((0.0, 0.45, 0.0), 0.45, m)
        cam = CameraConfig(position=(0.0, 0.9, 2.2),
                           look_at=(0.0, 0.4, 0.0), vfov_degrees=42.0)
        return b.build(), cam

    sc_c, cam = ball_scene(1.0)
    sc_p, _ = ball_scene(0.0)
    img_c = _render(sc_c, cam, nee=True, spp=64, size=32)
    img_p = _render(sc_p, cam, nee=True, spp=64, size=32)
    assert float(np.abs(img_c - img_p).mean()) > 1e-3
