"""Heterogeneous voxel-grid media: delta tracking, ratio tracking, MIS.

Pins: the trilinear lookup against a numpy oracle; ratio-tracked
transmittance against analytic Beer–Lambert on a constant grid AND on a
linear-gradient grid (trilinear interpolation of a linear field is
exact, so the optical depth integral is analytic); the delta-tracking
event fraction against 1 - exp(-optical depth); a render-level
Beer–Lambert oracle (pure-absorption grid slab in front of an emissive
wall); NEE-vs-BSDF-only agreement on a scattering grid (the MIS /
transmittance-factor unbiasedness cross-check); engine agreement on
smoke_demo; and the feature gates (grid-free scenes keep ``vol=None``;
fog and grid are mutually exclusive in the builder).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes, wavefront
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import rng, volume
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _keys(n, seed=0):
    return jax.vmap(
        lambda i: rng.pixel_sample_key(seed, i, jnp.uint32(0))
    )(jnp.arange(n, dtype=jnp.uint32))


def test_trilinear_matches_numpy_oracle():
    rs = np.random.default_rng(3)
    dens = rs.random((5, 6, 7)).astype(np.float32)
    vol = volume.build_grid(dens, (-1.0, 0.0, 2.0), (1.0, 3.0, 5.0),
                            sigma_s=1.0)
    pts = rs.uniform(-0.2, 1.2, (400, 3)).astype(np.float32)
    pts = np.asarray([-1.0, 0.0, 2.0], np.float32) + pts * np.asarray(
        [2.0, 3.0, 3.0], np.float32
    )
    got = np.asarray(volume.density_at(vol, jnp.asarray(pts)))

    nz, ny, nx = dens.shape
    res = np.asarray([nx, ny, nz], np.float32)
    u = (pts - np.asarray([-1.0, 0.0, 2.0])) / np.asarray(
        [2.0, 3.0, 3.0]
    ) * res - 0.5
    i0 = np.clip(np.floor(u).astype(np.int64), 0,
                 np.asarray([nx - 1, ny - 1, nz - 1]))
    i1 = np.clip(i0 + 1, 0, np.asarray([nx - 1, ny - 1, nz - 1]))
    f = np.clip(u - np.floor(u), 0.0, 1.0)
    # Replicate the kernel's clamp semantics (f keeps its fractional
    # value even at the clamped border, matching density_at).
    f = u - np.floor(u)
    want = np.empty(len(pts), np.float32)
    for k, (p0, p1, fr) in enumerate(zip(i0, i1, f)):
        c = dens[[p0[2], p1[2]], :, :][:, [p0[1], p1[1]], :][
            :, :, [p0[0], p1[0]]
        ]
        cx = c[:, :, 0] * (1 - fr[0]) + c[:, :, 1] * fr[0]
        cy = cx[:, 0] * (1 - fr[1]) + cx[:, 1] * fr[1]
        want[k] = cy[0] * (1 - fr[2]) + cy[1] * fr[2]
    np.testing.assert_allclose(got, want, atol=2e-5)


def _z_rays(n):
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    return o, d


def test_constant_grid_transmittance_is_beer_lambert():
    sigma, thick, n = 0.8, 1.5, 8192
    vol = volume.build_grid(np.ones((4, 4, 4), np.float32),
                            (-1, -1, -1), (1, 1, -1 + thick),
                            sigma_s=sigma)
    o, d = _z_rays(n)
    t = volume.transmittance(vol, _keys(n), jnp.zeros(n, jnp.int32),
                             o, d, jnp.full(n, 100.0), volume.SALT_NEE)
    got = float(jnp.mean(t))
    want = float(np.exp(-sigma * thick))
    # Ratio tracking at a tight majorant has near-binary samples:
    # sd ≈ sqrt(p(1-p)/n) ≈ 0.005 — gate at 4 sd.
    assert abs(got - want) < 0.02, (got, want)


def test_gradient_grid_transmittance_matches_analytic_integral():
    # density(z) linear 0 → 1 across a 2-long slab: optical depth is
    # sigma * integral = sigma * thick / 2 (trilinear is exact on a
    # linear field, so the only error is Monte Carlo).
    sigma, thick, n = 1.1, 2.0, 8192
    nz = 16
    dens = np.broadcast_to(
        ((np.arange(nz, dtype=np.float32) + 0.5) / nz)[:, None, None],
        (nz, 4, 4),
    ).copy()
    vol = volume.build_grid(dens, (-1, -1, 0.0), (1, 1, thick),
                            sigma_s=sigma)
    o, d = _z_rays(n)
    t = volume.transmittance(vol, _keys(n, seed=5),
                             jnp.zeros(n, jnp.int32), o, d,
                             jnp.full(n, 100.0), volume.SALT_ENV)
    got = float(jnp.mean(t))
    # Cell-centered lookups clamp past the first/last half-voxel, which
    # perturbs the exact linear integral by O(1/nz); keep a 3% gate.
    want = float(np.exp(-sigma * thick / 2.0))
    assert abs(got - want) / want < 0.03, (got, want)


def test_delta_tracking_event_fraction():
    sigma, thick, n = 0.6, 2.0, 8192
    vol = volume.build_grid(np.ones((4, 4, 4), np.float32),
                            (-1, -1, -1), (1, 1, 1), sigma_s=sigma)
    o, d = _z_rays(n)
    event, t_ev, _ = volume.sample_distance(
        vol, _keys(n, seed=9), jnp.zeros(n, jnp.int32), o, d,
        jnp.full(n, 100.0), jnp.ones(n, bool),
    )
    frac = float(jnp.mean(event.astype(jnp.float32)))
    want = 1.0 - float(np.exp(-sigma * thick))
    assert abs(frac - want) < 0.02, (frac, want)
    # Event distances live inside the slab ([2, 4] along the ray).
    ev = np.asarray(t_ev)[np.asarray(event)]
    assert ev.min() >= 2.0 and ev.max() <= 4.0


def _wall_scene(emit=4.0, vol_kwargs=None):
    b = SceneBuilder()
    wall = b.emissive((emit, emit, emit))
    b.add_quad((-4.0, -4.0, -2.0), (8.0, 0.0, 0.0), (0.0, 8.0, 0.0), wall)
    if vol_kwargs is not None:
        b.set_volume(**vol_kwargs)
    cam = CameraConfig(position=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0),
                       vfov_degrees=20.0)
    return b.build(), cam


def _render(sc, cam_cfg, engine="megakernel", size=24, spp=8, depth=8,
            nee=True, seed=0):
    cfg = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                       max_depth=depth, samples_per_step=spp, seed=seed,
                       engine=engine, traversal="cluster_jax", nee=nee,
                       background="black")
    cam = build_camera(cam_cfg, 1.0)
    st = progressive.init_state(cfg)
    step = (progressive.render_step if engine == "megakernel"
            else wavefront.render_step)
    st = step(st, sc, cam, cfg)
    return np.asarray(st.accum) / float(st.spp)


def test_pure_absorption_grid_render_is_beer_lambert():
    """sigma_s = 0: every grid event kills the path, so radiance from
    the emissive wall behind a 1-thick constant slab is
    emit * exp(-sigma_a) in expectation (the render-level analogue of
    the fog module's Beer–Lambert pin, through the full bounce path)."""
    sigma_a = 0.9
    sc, cam = _wall_scene(vol_kwargs=dict(
        density=np.ones((4, 4, 4), np.float32),
        bbox_min=(-4.0, -4.0, -1.8), bbox_max=(4.0, 4.0, -0.8),
        sigma_s=0.0, sigma_a=sigma_a,
    ))
    img = _render(sc, cam, spp=512, size=12, depth=3, nee=False)
    want = 4.0 * np.exp(-sigma_a * 1.0)
    got = img[3:9, 3:9].mean()
    np.testing.assert_allclose(got, want, rtol=0.05)


def test_vol_nee_matches_bsdf_only():
    """NEE+MIS and phase-only sampling estimate the same integral on a
    heterogeneous scattering slab — a broken MIS weight, in-medium NEE
    arm, or ratio-tracked transmittance factor breaks the agreement."""
    nz = 8
    dens = np.broadcast_to(
        (0.3 + 0.7 * (np.arange(nz, dtype=np.float32) + 0.5)
         / nz)[:, None, None], (nz, 4, 4),
    ).copy()
    sc, cam = _wall_scene(emit=3.0, vol_kwargs=dict(
        density=dens, bbox_min=(-4.0, -4.0, -1.9),
        bbox_max=(4.0, 4.0, -0.3), sigma_s=0.5, sigma_a=0.05, g=0.3,
    ))
    a = np.stack([
        _render(sc, cam, spp=96, size=10, depth=10, nee=True, seed=s).mean()
        for s in range(3)
    ]).mean()
    b = np.stack([
        _render(sc, cam, spp=96, size=10, depth=10, nee=False,
                seed=s + 7).mean()
        for s in range(3)
    ]).mean()
    np.testing.assert_allclose(a, b, rtol=0.05)


def test_engines_agree_on_smoke_scene():
    sc, cam = scenes.smoke_demo()
    a = _render(sc, cam, engine="megakernel", size=16, spp=4)
    b = _render(sc, cam, engine="wavefront", size=16, spp=4)
    np.testing.assert_allclose(a, b, atol=3e-4)


def test_smoke_demo_renders():
    sc, cam = scenes.smoke_demo()
    assert sc.vol is not None and sc.fog is None
    img = _render(sc, cam, size=32, spp=2)
    assert np.isfinite(img).all() and img.max() > 0.0
    # The plume in-scatters: the image is lit almost everywhere.
    assert (img.sum(axis=-1) > 0).mean() > 0.9


def test_vol_free_scene_gates_off():
    sc, _ = scenes.cornell_sphere()
    assert sc.vol is None


def test_fog_and_volume_mutually_exclusive():
    b = SceneBuilder()
    b.set_fog(0.1)
    with pytest.raises(ValueError):
        b.set_volume(np.ones((2, 2, 2), np.float32), (-1, -1, -1),
                     (1, 1, 1), sigma_s=1.0)
    b2 = SceneBuilder()
    b2.set_volume(np.ones((2, 2, 2), np.float32), (-1, -1, -1),
                  (1, 1, 1), sigma_s=1.0)
    with pytest.raises(ValueError):
        b2.set_fog(0.1)


def test_volume_grid_is_jit_stable_pytree():
    vol = volume.build_grid(np.ones((3, 3, 3), np.float32),
                            (-1, -1, -1), (1, 1, 1), sigma_s=2.0,
                            sigma_a=1.0)
    leaves, treedef = jax.tree_util.tree_flatten(vol)
    vol2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert vol2.n_steps == vol.n_steps
    np.testing.assert_allclose(float(vol.albedo), 2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(float(vol.majorant), 3.0, rtol=1e-6)


def test_emissive_slab_oracle():
    """Constant emissive pure-absorbing slab against black: the looked-
    through radiance is Le * (1 - exp(-sigma_a L)) — the collision-
    sampled emission estimator integrates ∫ T sigma_a Le exactly in
    expectation (sigma_s = 0 so every collision emits then dies)."""
    sigma_a, thick, le = 1.1, 1.0, (2.0, 1.0, 0.5)
    b = SceneBuilder()
    b.lambertian((0.5, 0.5, 0.5))       # scene needs one material
    dens = np.ones((4, 4, 4), np.float32)
    b.set_volume(dens, bbox_min=(-4.0, -4.0, -1.8),
                 bbox_max=(4.0, 4.0, -0.8), sigma_s=0.0, sigma_a=sigma_a,
                 emission=dens, emit_color=le)
    cam = CameraConfig(position=(0.0, 0.0, 0.0), look_at=(0.0, 0.0, -1.0),
                       vfov_degrees=20.0)
    img = _render(b.build(), cam, spp=512, size=12, depth=3, nee=False)
    got = img[3:9, 3:9].mean(axis=(0, 1))
    want = np.asarray(le) * (1.0 - np.exp(-sigma_a * thick))
    np.testing.assert_allclose(got, want, rtol=0.06)


def test_fire_demo_renders_and_emits():
    sc, cam = scenes.fire_demo()
    assert sc.vol is not None and sc.vol.emission is not None
    img = _render(sc, cam, size=32, spp=4)
    assert np.isfinite(img).all()
    # The flame core out-glows the floor, and the emission is orange
    # (R dominates B overall).
    assert img.max() > 0.5
    assert img[..., 0].sum() > 2.0 * img[..., 2].sum()


def test_cold_volume_has_no_emission_leaves():
    sc, _ = scenes.smoke_demo()
    assert sc.vol.emission is None and sc.vol.emit_color is None
