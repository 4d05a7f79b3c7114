"""Homogeneous scattering fog: distance sampling, HG phase, MIS.

Pins: the HG sampler's mean-cosine identity (E[cosθ] = g) and pdf
normalization; pure-absorption fog against the analytic Beer–Lambert
law (sigma_s = 0 makes every fog event a path kill, so the estimator
collapses to exp(-sigma_a L) exactly); NEE-vs-BSDF-only agreement on a
scattering scene (the MIS/unbiasedness check — the two estimators share
no sampling paths through the fog code); engine agreement; and the
feature gate (fog-free scenes never draw STREAM_FOG, keeping their RNG
streams bit-identical — implicitly pinned by the fixed-seed suite
caches, explicitly by the pytree check here).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import progressive, scenes, wavefront
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import sampling
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def test_hg_sampler_mean_cosine_and_pdf():
    n = 20000
    key = jax.random.key(0)
    u = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    for g in (0.0, 0.4, -0.6, 0.85):
        out, cos_t = sampling.hg_sample(d, jnp.float32(g), u[:, 0], u[:, 1])
        # Sampled direction really makes angle cos_t with d.
        np.testing.assert_allclose(
            np.asarray(jnp.sum(out * d, axis=-1)), np.asarray(cos_t),
            atol=1e-4,
        )
        # HG identity: E[cos θ] = g (MC error ~ 1/sqrt(n)).
        assert abs(float(jnp.mean(cos_t)) - g) < 0.02, g
        # pdf at the sampled directions is the phase value (>0).
        assert float(jnp.min(sampling.hg_phase(jnp.float32(g), cos_t))) > 0


def test_hg_phase_normalization():
    # ∫ p(cosθ) dω = 2π ∫ p dcosθ = 1, checked by quadrature.
    c = jnp.linspace(-1.0, 1.0, 20001)
    for g in (0.0, 0.3, -0.7):
        p = sampling.hg_phase(jnp.float32(g), c)
        integral = float(jnp.trapezoid(p, c)) * 2.0 * np.pi
        assert abs(integral - 1.0) < 1e-3, (g, integral)


def _wall_scene(fog=None, emit=4.0):
    b = SceneBuilder()
    wall = b.emissive((emit, emit, emit))
    b.add_quad((-4.0, -4.0, -2.0), (8.0, 0.0, 0.0), (0.0, 8.0, 0.0), wall)
    if fog is not None:
        b.set_fog(*fog)
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


def test_pure_absorption_fog_is_beer_lambert():
    """sigma_s = 0: every fog event kills the path, so radiance from an
    emissive wall at distance L is exactly emit·exp(-sigma_a·L) in
    expectation (the camera ray either survives — prob e^{-σL} — and
    collects emit, or dies)."""
    sigma_a, dist = 0.9, 2.0
    sc, cam = _wall_scene(fog=(0.0, sigma_a, 0.0))
    img = _render(sc, cam, spp=512, size=12, depth=3, nee=False)
    want = 4.0 * np.exp(-sigma_a * dist)
    got = img[3:9, 3:9].mean()
    # Binomial MC noise at 512 spp: σ ≈ emit·sqrt(p(1-p)/512) ≈ 0.066;
    # 6×6-pixel averaging cuts it far below the 5% gate.
    np.testing.assert_allclose(got, want, rtol=0.05)


def test_fog_scattering_conserves_more_than_absorbing():
    sc_s, cam = _wall_scene(fog=(0.9, 0.0, 0.0))    # scattering
    sc_a, _ = _wall_scene(fog=(0.0, 0.9, 0.0))      # absorbing
    i_s = _render(sc_s, cam, spp=64, size=12, depth=12, nee=False).mean()
    i_a = _render(sc_a, cam, spp=64, size=12, depth=12, nee=False).mean()
    assert i_s > 2.0 * i_a


def test_fog_nee_matches_bsdf_only():
    """NEE+MIS and BSDF/phase-only sampling estimate the same integral
    on a fog scene with a big light (the unbiasedness cross-check —
    disagreement means a broken MIS weight or transmittance factor)."""
    sc, cam = _wall_scene(fog=(0.35, 0.05, 0.3), emit=3.0)
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


def test_engines_agree_on_fog_scene():
    sc, cam = scenes.fog_demo()
    a = _render(sc, cam, engine="megakernel", size=16, spp=4)
    b = _render(sc, cam, engine="wavefront", size=16, spp=4)
    np.testing.assert_allclose(a, b, atol=3e-4)


def test_fog_free_scene_gates_off():
    sc, _ = scenes.cornell_sphere()
    assert sc.fog is None
    sc2, _ = scenes.fog_demo()
    assert sc2.fog is not None


def test_fog_demo_renders():
    sc, cam = scenes.fog_demo()
    img = _render(sc, cam, size=32, spp=2)
    assert np.isfinite(img).all() and img.max() > 0.0
    # The fog glow: pixels OUTSIDE the direct light's mirror image
    # still collect in-scattered light — the image is nowhere pitch
    # black inside the box.
    assert (img.sum(axis=-1) > 0).mean() > 0.9
