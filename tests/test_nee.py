"""Next-event estimation: unbiasedness, variance reduction, MIS sanity.

SURVEY.md §4(f) statistical-test strategy applied to the direct-light
estimator: NEE must converge to the same image as brute-force path
tracing (it is the same integral, importance-sampled differently), with
materially lower variance at equal sample counts.
"""

import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes, wavefront
from pathtracing_tpu.ops import lights as lights_ops
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def cornell():
    scene, cam_cfg = scenes.cornell_sphere()
    return scene, build_camera(cam_cfg, 1.0)


def render(scene, camera, nee, spp, seed, size=32, depth=5):
    config = RenderConfig(
        width=size, height=size, samples_per_pixel=spp, max_depth=depth,
        samples_per_step=spp, seed=seed, nee=nee,
    )
    s = progressive.render_step(
        progressive.init_state(config), scene, camera, config
    )
    return np.asarray(progressive.resolve(s))


def test_light_table_contents(cornell):
    scene, _ = cornell
    lt = scene.lights
    # The Cornell ceiling light is a 0.9x0.9 quad = two triangles.
    assert lt.v0.shape[0] == 2
    np.testing.assert_allclose(float(lt.total_area), 0.81, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lt.emit), 15.0)
    # Unit normals, ±y.
    n = np.asarray(lt.normal)
    np.testing.assert_allclose(np.abs(n[:, 1]), 1.0, atol=1e-6)


def test_light_sampling_uniform(cornell):
    """Sampled points lie on the light plane, inside its extent."""
    scene, _ = cornell
    import jax.numpy as jnp

    u = np.random.RandomState(0).rand(4096, 3).astype(np.float32)
    p, n, emit = lights_ops.sample(scene.lights, jnp.asarray(u))
    p = np.asarray(p)
    np.testing.assert_allclose(p[:, 1], 0.995, atol=1e-5)
    assert p[:, 0].min() > -0.451 and p[:, 0].max() < 0.451
    assert p[:, 2].min() > -0.451 and p[:, 2].max() < 0.451
    # Roughly uniform: quadrant counts within 4 sigma.
    q = (p[:, 0] > 0).astype(int) * 2 + (p[:, 2] > 0).astype(int)
    counts = np.bincount(q, minlength=4)
    assert counts.min() > 4096 / 4 - 4 * np.sqrt(4096 * 3 / 16)


def test_nee_unbiased(cornell):
    """NEE and brute force estimate the same integral."""
    scene, camera = cornell
    img_nee = render(scene, camera, True, 128, seed=0)
    img_ref = render(scene, camera, False, 1024, seed=1)
    rel = abs(img_nee.mean() - img_ref.mean()) / img_ref.mean()
    assert rel < 0.03, f"mean mismatch {rel:.3f}"


def test_nee_reduces_variance(cornell):
    scene, camera = cornell
    oracle = render(scene, camera, True, 512, seed=9)
    rmse_nee = np.sqrt(((render(scene, camera, True, 8, 3) - oracle) ** 2)
                       .mean())
    rmse_brute = np.sqrt(
        ((render(scene, camera, False, 8, 3) - oracle) ** 2).mean()
    )
    assert rmse_nee < 0.75 * rmse_brute, (
        f"NEE {rmse_nee:.4f} not clearly below brute {rmse_brute:.4f}"
    )


def test_engines_agree_with_nee(cornell):
    scene, camera = cornell
    config = RenderConfig(
        width=24, height=24, samples_per_pixel=4, max_depth=4,
        samples_per_step=4, seed=3, nee=True,
    )
    m = progressive.render_step(
        progressive.init_state(config), scene, camera, config
    )
    w = wavefront.render_step(
        progressive.init_state(config), scene, camera, config
    )
    np.testing.assert_allclose(
        np.asarray(m.accum), np.asarray(w.accum), atol=3e-4
    )


def test_no_lights_scene_noop():
    """NEE on a lightless scene must not change the estimator."""
    scene, cam_cfg = scenes.sphere_demo()
    camera = build_camera(cam_cfg, 1.0)
    base = dict(width=16, height=16, samples_per_pixel=4, max_depth=3,
                samples_per_step=4, seed=0, background="gradient")
    a = progressive.render_step(
        progressive.init_state(RenderConfig(nee=True, **base)),
        scene, camera, RenderConfig(nee=True, **base),
    )
    b = progressive.render_step(
        progressive.init_state(RenderConfig(nee=False, **base)),
        scene, camera, RenderConfig(nee=False, **base),
    )
    np.testing.assert_allclose(
        np.asarray(a.accum), np.asarray(b.accum), atol=1e-6
    )


def test_checker_material_not_a_light():
    """The checker material reuses the emit columns as its second color;
    it must not register in the light table nor emit radiance."""
    from pathtracing_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    ch = b.checker((1.0, 0.0, 0.0), (0.0, 0.0, 1.0), frequency=1.0)
    b.add_quad((-1, 0, -1), (2, 0, 0), (0, 0, 2), ch)
    scene = b.build()
    assert float(scene.lights.total_area) == 0.0


def test_checker_two_tones():
    """Adjacent cells alternate between the two colors (albedo AOV)."""
    import numpy as np

    from pathtracing_tpu.models import aov
    from pathtracing_tpu.models.scene import SceneBuilder
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import CameraConfig, RenderConfig

    b = SceneBuilder()
    ch = b.checker((1.0, 0.0, 0.0), (0.0, 0.0, 1.0), frequency=1.0)
    b.add_quad((-4, 0, -4), (8, 0, 0), (0, 0, 8), ch)
    scene = b.build()
    cam = build_camera(
        CameraConfig(position=(0, 6, 0.01), look_at=(0, 0, 0),
                     vfov_degrees=60.0), 1.0,
    )
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=1,
                       max_depth=1, seed=0)
    img = np.asarray(aov.render_aov(scene, cam, cfg, "albedo"))
    # Pure tones: red cells have no blue and vice versa.
    red_cells = (img[..., 0] > 0.5) & (img[..., 2] < 0.1)
    blue_cells = (img[..., 2] > 0.5) & (img[..., 0] < 0.1)
    assert red_cells.sum() > 100 and blue_cells.sum() > 100


def _two_light_scene(lamp_rad=400.0, lamp_size=0.1):
    """A large dim panel (2x2, radiance 1) and a small bright lamp
    (lamp_size^2, radiance lamp_rad) over a diffuse floor."""
    from pathtracing_tpu.models.scene import SceneBuilder
    from pathtracing_tpu.utils.config import CameraConfig

    b = SceneBuilder()
    floor = b.lambertian((0.7, 0.7, 0.7))
    b.add_quad((-3.0, 0.0, -3.0), (6.0, 0.0, 0.0), (0.0, 0.0, 6.0), floor)
    dim = b.emissive((1.0, 1.0, 1.0))
    b.add_quad((-1.0, 3.0, -1.0), (2.0, 0.0, 0.0), (0.0, 0.0, 2.0), dim)
    bright = b.emissive((lamp_rad,) * 3)
    s = lamp_size
    b.add_quad((1.5, 2.0, -s / 2), (s, 0.0, 0.0), (0.0, 0.0, s), bright)
    cam = CameraConfig(position=(0.0, 1.8, 4.0), look_at=(0.0, 0.5, 0.0),
                       vfov_degrees=50.0)
    return b.build(), cam


def test_power_weighted_selection():
    """Selection probability follows emitted power, not area: a 400x
    area ratio with equal power must sample each light ~half the time
    (area-uniform would pick the small lamp 1-in-401 draws)."""
    import jax.numpy as jnp

    # panel power = 4 * 1; lamp power = 0.01 * 400 = 4 — equal.
    scene, _ = _two_light_scene(lamp_rad=400.0, lamp_size=0.1)
    lt = scene.lights
    np.testing.assert_allclose(float(lt.total_power), 8.0, rtol=1e-5)
    n = 8192
    u = np.random.RandomState(1).rand(n, 3).astype(np.float32)
    p, _, emit = lights_ops.sample(lt, jnp.asarray(u))
    bright = np.asarray(emit)[:, 0] > 100.0
    frac = bright.mean()
    sigma = np.sqrt(0.25 / n)
    assert abs(frac - 0.5) < 4 * sigma, f"bright pick frac {frac:.4f}"


def test_nee_unbiased_unequal_lights():
    """The power-weighted pdf must keep the estimator unbiased — NEE and
    brute force agree on a scene where the pick distribution is far from
    area-uniform (9x area ratio, 60x radiance ratio)."""
    scene, cam_cfg = _two_light_scene(lamp_rad=60.0, lamp_size=0.66)
    camera = build_camera(cam_cfg, 1.0)
    img_nee = render(scene, camera, True, 64, seed=0, depth=3)
    img_ref = render(scene, camera, False, 2048, seed=1, depth=3)
    rel = abs(img_nee.mean() - img_ref.mean()) / img_ref.mean()
    assert rel < 0.04, f"mean mismatch {rel:.3f}"


def test_power_sampling_beats_area_on_unequal_lights():
    """Variance, at the estimator level: the one-sample NEE direct-light
    contribution at a fixed shading point, power-law pick vs the old
    area-uniform law (both unbiased — pdfs matched to their pick laws).
    With equal-power 400x-area-ratio lights, area-uniform picks the lamp
    1-in-401 draws with pdf 1/total_area, so each rare lamp pick lands a
    huge emit/pdf spike; the power law splits picks ~50/50 and its
    per-area pdf scales with the picked emit, flattening the weights."""
    import jax.numpy as jnp

    scene, _ = _two_light_scene(lamp_rad=400.0, lamp_size=0.1)
    lt = scene.lights
    x = np.array([0.5, 0.0, 0.0], np.float32)  # floor point, normal +y

    rng = np.random.RandomState(7)
    n = 20000
    u = rng.rand(n, 3).astype(np.float32)

    def estimate(points, emits, pdf_area):
        wi = np.asarray(points) - x
        dist2 = (wi * wi).sum(-1)
        wi = wi / np.sqrt(dist2)[:, None]
        cos_s = np.maximum(wi[:, 1], 0.0)           # floor normal +y
        cos_l = np.abs(-wi[:, 1])                    # lights face -y
        g = cos_s * cos_l / dist2
        return np.asarray(emits)[:, 0] * g / pdf_area

    # Power-weighted law (the production sampler + its pdf).
    p, _, emit = lights_ops.sample(lt, jnp.asarray(u))
    lum = np.asarray(emit) @ np.array([0.2126, 0.7152, 0.0722])
    est_power = estimate(p, emit, lum / float(lt.total_power))

    # Area-uniform law (the retired design), sampled by hand from the
    # same table geometry: pick ∝ area, pdf 1/total_area.
    areas = 0.5 * np.linalg.norm(
        np.cross(np.asarray(lt.e1), np.asarray(lt.e2)), axis=-1
    )
    cum_area = np.cumsum(areas) / areas.sum()
    idx = np.searchsorted(cum_area, u[:, 0])
    r1, r2 = u[:, 1], u[:, 2]
    flip = r1 + r2 > 1.0
    b1 = np.where(flip, 1.0 - r1, r1)
    b2 = np.where(flip, 1.0 - r2, r2)
    pa = (np.asarray(lt.v0)[idx] + b1[:, None] * np.asarray(lt.e1)[idx]
          + b2[:, None] * np.asarray(lt.e2)[idx])
    est_area = estimate(pa, np.asarray(lt.emit)[idx],
                        np.full(n, 1.0 / float(lt.total_area)))

    # Same integral (sanity), far lower spread for the power law.
    assert abs(est_power.mean() - est_area.mean()) < 0.25 * est_area.mean()
    assert est_power.std() < 0.25 * est_area.std(), (
        est_power.std(), est_area.std()
    )


def _sphere_lamp_table(radius=0.4, center=(0.0, 2.0, 0.0), rad=12.0):
    from pathtracing_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    white = b.lambertian((0.7, 0.7, 0.7))
    b.add_quad((-3, 0, -3), (6, 0, 0), (0, 0, 6), white)
    b.add_sphere(center, radius, b.emissive((rad, rad, rad)))
    return b.build().lights


def test_cone_sampling_visible_cap():
    """sample_solid_angle puts every sphere-light sample on the cap
    VISIBLE from the origin (never the far hemisphere), on the surface,
    with a positive pdf."""
    import jax.numpy as jnp

    c = np.array([0.0, 2.0, 0.0], np.float32)
    r = 0.4
    lt = _sphere_lamp_table(radius=r, center=tuple(c))
    n = 4096
    u = np.random.RandomState(3).rand(n, 3).astype(np.float32)
    origin = jnp.broadcast_to(
        jnp.asarray([1.2, 0.3, 0.8], jnp.float32), (n, 3)
    )
    p, nrm, emit, pdf = lights_ops.sample_solid_angle(
        lt, jnp.asarray(u), origin
    )
    p, nrm, pdf = np.asarray(p), np.asarray(nrm), np.asarray(pdf)
    # On the surface, normal = outward unit.
    np.testing.assert_allclose(np.linalg.norm(p - c, axis=1), r, atol=2e-5)
    np.testing.assert_allclose(
        nrm, (p - c) / r, atol=3e-5
    )
    # Visible: the normal faces the shading point.
    to_origin = np.asarray(origin) - p
    facing = (nrm * to_origin).sum(-1)
    assert (facing > 0.0).all(), f"{(facing <= 0).sum()} far-side samples"
    assert (pdf > 0.0).all()


def test_cone_pdf_matches_area_integral():
    """Both samplers estimate the same direct-light integral (MC means
    agree), and the cone sampler's one-sample std is far lower — the
    area sampler wastes half its draws on the far hemisphere and pays
    the cos/dist² spread on the rest."""
    import jax.numpy as jnp

    c = np.array([0.0, 2.0, 0.0], np.float32)
    r, rad = 0.4, 12.0
    lt = _sphere_lamp_table(radius=r, center=tuple(c), rad=rad)
    x = np.array([0.8, 0.0, 0.5], np.float32)   # floor point, normal +y
    n = 40000
    u = np.random.RandomState(11).rand(n, 3).astype(np.float32)
    origin = jnp.broadcast_to(jnp.asarray(x), (n, 3))

    # Cone sampler: estimate = L · cos_s / pdf_sa  (solid-angle measure;
    # geometry is unoccluded by construction of the test scene).
    p, nrm, emit, pdf = lights_ops.sample_solid_angle(
        lt, jnp.asarray(u), origin
    )
    wi = np.asarray(p) - x
    dist = np.linalg.norm(wi, axis=1)
    wi = wi / dist[:, None]
    cos_s = np.maximum(wi[:, 1], 0.0)
    est_cone = rad * cos_s / np.asarray(pdf)

    # Legacy area-uniform sampler: estimate = L·cos_s·cos_l·front /
    # (dist² · per-area pdf), far-side draws contribute zero.
    pa, na, ea = lights_ops.sample(lt, jnp.asarray(u))
    wia = np.asarray(pa) - x
    d2a = (wia * wia).sum(-1)
    wia = wia / np.sqrt(d2a)[:, None]
    cos_sa = np.maximum(wia[:, 1], 0.0)
    facing = (np.asarray(na) * wia).sum(-1) < 0.0   # normal toward x
    cos_la = np.abs((np.asarray(na) * wia).sum(-1))
    per_area = rad / float(lt.total_power)
    est_area = np.where(
        facing, rad * cos_sa * cos_la / (d2a * per_area), 0.0
    )

    assert abs(est_cone.mean() - est_area.mean()) < 0.05 * est_area.mean()
    assert est_cone.std() < 0.5 * est_area.std(), (
        est_cone.std(), est_area.std()
    )


def test_solid_angle_tri_lanes_bitwise():
    """On a triangle-only table, sample_solid_angle returns the exact
    bits of the legacy sampler plus the area-law pdf — the contract that
    keeps every quad-lit fixed-seed cache unchanged."""
    import jax.numpy as jnp

    scene, _ = _two_light_scene(lamp_rad=60.0, lamp_size=0.66)
    lt = scene.lights
    n = 4096
    u = jnp.asarray(np.random.RandomState(5).rand(n, 3), jnp.float32)
    origin = jnp.broadcast_to(
        jnp.asarray([0.3, 0.1, -0.2], jnp.float32), (n, 3)
    )
    p0, n0, e0 = lights_ops.sample(lt, u)
    p1, n1, e1, pdf = lights_ops.sample_solid_angle(lt, u, origin)
    assert (np.asarray(p0) == np.asarray(p1)).all()
    assert (np.asarray(n0) == np.asarray(n1)).all()
    assert (np.asarray(e0) == np.asarray(e1)).all()
    wi = np.asarray(p0) - np.asarray(origin)
    dist2 = (wi * wi).sum(-1)
    dist = np.sqrt(np.maximum(dist2, 1e-12))
    cos_l = np.abs((np.asarray(n0) * wi).sum(-1) / dist)
    lum = np.asarray(e0) @ np.array([0.2126, 0.7152, 0.0722],
                                    np.float32)
    want = dist2 * lum / (cos_l * float(lt.total_power) + 1e-20)
    np.testing.assert_allclose(np.asarray(pdf), want, rtol=2e-5)
