"""Interior scattering (subsurface random walk): free-flight sampling,
HG phase, boundary handoff, absorption composition, engine agreement.

Pins: the Exp(sigma_s) free-flight law (event fraction inside a unit
sphere = 1 - e^{-sigma_s}), the HG mean-cosine identity on interior
events, chromatic Beer–Lambert absorption over the segment ACTUALLY
traveled (per-lane exact, not statistical), the dielectric boundary
handoff (exit returns the row to vacuum), the feature gate
(``mat_interior is None`` unless some material scatters — scatter-free
scenes keep their RNG streams bit-identical, implicitly pinned by the
fixed-seed suite caches), and megakernel/wavefront agreement on the
sss_demo scene.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes, shading, wavefront
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import rng
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _inside_bounce(sigma, g, absorption=(0.0, 0.0, 0.0), n=4096):
    """One bounce_batch call for n rays starting at the center of a unit
    scattering sphere, aimed +x. Returns (scene, out tuple, has_media)."""
    b = SceneBuilder()
    m = b.dielectric(1.5, scattering=sigma, scatter_g=g,
                     absorption=absorption)
    b.add_sphere((0.0, 0.0, 0.0), 1.0, m)
    sc = b.build()
    assert sc.mat_interior is not None

    o = jnp.zeros((n, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    keys = jax.vmap(
        lambda p: rng.pixel_sample_key(3, p, 0)
    )(jnp.arange(n, dtype=jnp.int32))
    rows = jnp.tile(jnp.asarray([[sigma, g]], jnp.float32), (n, 1))
    medium = (jnp.tile(jnp.asarray([absorption], jnp.float32), (n, 1))
              if sc.mat_absorb is not None else None)
    out = shading.bounce_batch(
        sc, o, d, keys, jnp.zeros(n, jnp.int32),
        jnp.zeros((n, 3), jnp.float32), jnp.ones((n, 3), jnp.float32),
        jnp.ones(n, jnp.bool_), 64, "black", "cluster_jax",
        nee=False, medium=medium, sss=rows,
    )
    return sc, out, medium is not None


def test_event_fraction_matches_exponential_law():
    sigma = 1.0
    _, out, _ = _inside_bounce(sigma, 0.0)
    o_out = np.asarray(out[2])
    event = np.linalg.norm(o_out, axis=1) < 0.999
    frac = event.mean()
    expect = 1.0 - np.exp(-sigma * 1.0)      # boundary at t = 1
    assert abs(frac - expect) < 0.03, (frac, expect)
    # Interior events lie on the +x segment the rays traveled.
    ev = o_out[event]
    assert (np.abs(ev[:, 1]) < 1e-6).all() and (np.abs(ev[:, 2]) < 1e-6).all()
    assert (ev[:, 0] > 0).all() and (ev[:, 0] < 1.0).all()


@pytest.mark.parametrize("g", [0.0, 0.6, -0.4])
def test_phase_mean_cosine(g):
    _, out, _ = _inside_bounce(4.0, g, n=8192)
    o_out = np.asarray(out[2])
    d_out = np.asarray(out[3])
    event = np.linalg.norm(o_out, axis=1) < 0.999
    assert event.mean() > 0.9                 # sigma 4 -> ~98% events
    mean_cos = d_out[event, 0].mean()         # incident direction was +x
    assert abs(mean_cos - g) < 0.03, (mean_cos, g)


def test_absorption_over_traveled_segment_exact():
    """throughput = exp(-sigma_a * t) per lane, t = the distance to the
    interior event (or boundary), composed with the boundary Fresnel
    only on surface lanes — checked exactly on event lanes."""
    absorption = (0.4, 1.1, 2.3)
    _, out, has_media = _inside_bounce(2.0, 0.0, absorption=absorption)
    assert has_media
    o_out = np.asarray(out[2])
    tp = np.asarray(out[1])
    event = np.linalg.norm(o_out, axis=1) < 0.999
    t = o_out[event, 0]
    expect = np.exp(-np.asarray(absorption)[None, :] * t[:, None])
    np.testing.assert_allclose(tp[event], expect, rtol=1e-4)


def test_boundary_exit_returns_to_vacuum():
    sigma = 0.3                               # most rays reach the wall
    _, out, _ = _inside_bounce(sigma, 0.0)
    o_out = np.asarray(out[2])
    sss_out = np.asarray(out[7])              # after prev_nee (no media)
    boundary = np.linalg.norm(o_out, axis=1) >= 0.999
    event = ~boundary
    assert boundary.mean() > 0.6
    # Interior events keep the row (still inside the medium).
    np.testing.assert_allclose(sss_out[event, 0], sigma, rtol=1e-6)
    # Boundary lanes mostly refract straight out (normal incidence, no
    # TIR; ~4-8% Fresnel-reflect back inside and keep the row).
    exited = sss_out[boundary, 0] == 0.0
    assert exited.mean() > 0.8
    # Lanes that reflected back inside keep scattering.
    kept = sss_out[boundary, 0] != 0.0
    if kept.any():
        np.testing.assert_allclose(
            sss_out[boundary][kept, 0], sigma, rtol=1e-6
        )


def test_feature_gate_column():
    """mat_interior materializes only when some material scatters."""
    sc, _ = scenes.glass_demo()
    assert sc.mat_interior is None
    sc, _ = scenes.sss_demo()
    assert sc.mat_interior is not None
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, b.dielectric(1.5, scattering=0.0))
    assert b.build().mat_interior is None


def test_fog_and_sss_mutually_exclusive():
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, b.dielectric(1.5, scattering=1.0))
    b.set_fog(sigma_s=0.1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        b.build()


def test_dispersion_plus_scattering_rejected():
    b = SceneBuilder()
    with pytest.raises(ValueError, match="dispersion"):
        b.dielectric(1.5, dispersion=0.04, scattering=1.0)


def _render(sc, cam_cfg, engine, size=32, spp=8, depth=12, seed=0):
    cfg = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                       max_depth=depth, samples_per_step=spp, seed=seed,
                       engine=engine, traversal="cluster_jax", nee=True,
                       background="gradient")
    cam = build_camera(cam_cfg, 1.0)
    st = progressive.init_state(cfg)
    step = (progressive.render_step if engine == "megakernel"
            else wavefront.render_step)
    st = step(st, sc, cam, cfg)
    return np.asarray(st.accum) / float(st.spp)


def test_engines_agree_on_sss_demo():
    sc, cam_cfg = scenes.sss_demo()
    a = _render(sc, cam_cfg, "megakernel")
    b = _render(sc, cam_cfg, "wavefront")
    np.testing.assert_allclose(a, b, atol=3e-4)
    assert np.isfinite(a).all() and a.max() > 0.0


def test_jade_is_green():
    """The jade sphere's chromatic absorption (red/blue absorbed) must
    tint its region green — an end-to-end color check on the demo."""
    sc, cam_cfg = scenes.sss_demo()
    img = _render(sc, cam_cfg, "megakernel", size=64, spp=16)
    # Jade sphere is second from the left: columns ~ [18, 30).
    crop = img[28:44, 18:30]
    assert crop[..., 1].mean() > 1.15 * crop[..., 0].mean()
    assert crop[..., 1].mean() > 1.15 * crop[..., 2].mean()
