"""Anisotropic GGX (ops/materials.ggx_eval_aniso / ggx_sample_aniso).

Estimator-level pins: exact isotropic reduction at aniso=0, NDF
normalization by Monte Carlo, sampler/pdf agreement, lobe-stretch
direction, and energy conservation. No reference analogue (the
reference has no materials at all, `Test.hlsl:26-32`).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pathtracing_tpu.ops import linalg, materials


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_reduces_to_isotropic_at_zero():
    rng = np.random.default_rng(0)
    n = jnp.asarray(np.tile(_unit((0.0, 1.0, 0.0)), (64, 1)))
    view = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)
    view = jnp.where(linalg.dot(view, n)[:, None] < 0, -view, view)
    light = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    light = light / jnp.linalg.norm(light, axis=-1, keepdims=True)
    light = jnp.where(linalg.dot(light, n)[:, None] < 0, -light, light)
    f0 = jnp.full((64, 3), 0.9, jnp.float32)
    alpha = jnp.full((64,), 0.35, jnp.float32)

    f_i, p_i = materials.ggx_eval(f0, alpha, n, view, light)
    f_a, p_a = materials.ggx_eval_aniso(
        f0, alpha, jnp.zeros(64, jnp.float32), n, view, light
    )
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_i),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_i),
                               rtol=2e-4, atol=1e-6)


def test_ndf_normalization_mc():
    # ∫ D(h) (n·h) dω = 1. With view == light == h the eval pdf is
    # D(h)(n·h)/4, so 4·pdf integrates to 1 over the hemisphere.
    m = 200_000
    rng = np.random.default_rng(1)
    z = rng.uniform(0.0, 1.0, m).astype(np.float32)
    phi = rng.uniform(0.0, 2 * np.pi, m).astype(np.float32)
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    w = np.stack([r * np.cos(phi), r * np.sin(phi), z], 1)
    n = jnp.asarray(np.tile((0.0, 0.0, 1.0), (m, 1)).astype(np.float32))
    w = jnp.asarray(w)
    f0 = jnp.ones((m, 3), jnp.float32)
    for aniso in (0.0, 0.5, 0.9):
        _, pdf = materials.ggx_eval_aniso(
            f0, jnp.full((m,), 0.45, jnp.float32),
            jnp.full((m,), aniso, jnp.float32), n, w, w,
        )
        integral = float(jnp.mean(4.0 * pdf)) * 2.0 * np.pi
        assert abs(integral - 1.0) < 0.03, (aniso, integral)


def test_sampler_density_matches_pdf():
    # E_sampled[g(wi)] must equal ∫ g·pdf dω for any test function g —
    # the non-circular check that the sampler draws FROM the pdf.
    m = 200_000
    alpha, aniso = 0.4, 0.7
    n = jnp.asarray(np.tile((0.0, 0.0, 1.0), (m, 1)).astype(np.float32))
    view = _unit((0.5, 0.2, 0.85))
    d_in = jnp.asarray(np.tile(-view, (m, 1)))
    rng = np.random.default_rng(2)
    u1 = jnp.asarray(rng.uniform(size=m).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=m).astype(np.float32))
    d_out, _, _ = materials.ggx_sample_aniso(
        jnp.full((m,), alpha, jnp.float32),
        jnp.full((m,), aniso, jnp.float32), n, d_in, u1, u2,
    )
    valid = np.asarray(linalg.dot(d_out, n)) > 1e-6
    g_sampled = np.asarray(jnp.abs(d_out[:, 0]))[valid]

    # Uniform-hemisphere MC of ∫ g(w)·pdf(w) dω.
    z = rng.uniform(0.0, 1.0, m).astype(np.float32)
    phi = rng.uniform(0.0, 2 * np.pi, m).astype(np.float32)
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    w = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], 1))
    _, pdf = materials.ggx_eval_aniso(
        jnp.ones((m, 3), jnp.float32),
        jnp.full((m,), alpha, jnp.float32),
        jnp.full((m,), aniso, jnp.float32), n,
        jnp.asarray(np.tile(view, (m, 1))), w,
    )
    want = float(jnp.mean(jnp.abs(w[:, 0]) * pdf)) * 2.0 * np.pi
    got = g_sampled.sum() / m  # below-horizon samples contribute 0
    np.testing.assert_allclose(got, want, rtol=0.03)


def test_lobe_stretches_along_tangent():
    # alpha_x > alpha_y: the highlight is WIDER along the tangent axis.
    # orthonormal_basis((0,0,1)) puts the tangent in the xy plane; probe
    # symmetric light offsets along both frame axes.
    n1 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, b = linalg.orthonormal_basis(n1)
    t = np.asarray(t)[0]
    b = np.asarray(b)[0]
    nz = np.array([0.0, 0.0, 1.0], np.float32)
    view = jnp.asarray(nz[None])
    ang = np.radians(25.0)
    l_t = jnp.asarray(_unit(np.cos(ang) * nz + np.sin(ang) * t)[None])
    l_b = jnp.asarray(_unit(np.cos(ang) * nz + np.sin(ang) * b)[None])
    f0 = jnp.ones((1, 3), jnp.float32)
    alpha = jnp.asarray([0.2], jnp.float32)
    an = jnp.asarray([0.8], jnp.float32)
    f_t, _ = materials.ggx_eval_aniso(f0, alpha, an, view, view, l_t)
    f_b, _ = materials.ggx_eval_aniso(f0, alpha, an, view, view, l_b)
    assert float(f_t[0, 0]) > 2.0 * float(f_b[0, 0]), (f_t, f_b)


def test_scatter_energy_conserving():
    # White-furnace bound on the DIRECTIONAL ALBEDO: with f0=1 the mean
    # importance weight estimates ∫f·cosθ dω ≤ 1 (single-scattering GGX
    # loses energy to masking, never gains). Individual Walter weights
    # legitimately exceed 1 at grazing half-vectors — only the mean is
    # bounded.
    m = 50_000
    n = jnp.asarray(np.tile((0.0, 0.0, 1.0), (m, 1)).astype(np.float32))
    d_in = jnp.asarray(np.tile(-_unit((0.8, 0.3, 0.52)), (m, 1)))
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.uniform(size=(m, 5)).astype(np.float32))
    mtype = jnp.full((m,), materials.TYPE_GGX, jnp.int32)
    for aniso in (0.3, 0.85):
        d_out, atten, scattered, pdf = materials.scatter(
            mtype, jnp.ones((m, 3), jnp.float32),
            jnp.full((m,), 0.3, jnp.float32),
            jnp.zeros((m, 3), jnp.float32), n, d_in,
            jnp.ones(m, bool), u,
            aniso=jnp.full((m,), aniso, jnp.float32),
        )
        ok = np.asarray(scattered)
        w = np.asarray(atten)[ok]
        albedo_est = w[:, 0].sum() / m  # rejected samples count as 0
        assert albedo_est <= 1.0 + 0.01, albedo_est
        # And the lobe reflects a healthy fraction (G2 loss only).
        assert albedo_est > 0.5, albedo_est


def test_render_engines_match_and_gating():
    from pathtracing_tpu.models import progressive, wavefront
    from pathtracing_tpu.models import scene as scene_mod
    from pathtracing_tpu.models import scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import CameraConfig, RenderConfig

    b = scene_mod.SceneBuilder()
    brushed = b.ggx((0.95, 0.93, 0.88), roughness=0.25, anisotropy=0.8)
    b.add_quad((-3.0, 0.0, -3.0), (6.0, 0.0, 0.0), (0.0, 0.0, 6.0),
               brushed)
    lamp = b.emissive((30.0, 30.0, 30.0))
    b.add_sphere((0.0, 2.0, 0.0), 0.3, lamp)
    scene = b.build()
    assert scene.mat_aniso is not None

    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_depth=3, seed=5, samples_per_step=2,
                       background="black")
    cam = build_camera(
        CameraConfig(position=(0.0, 1.2, 3.0), look_at=(0.0, 0.0, 0.0),
                     vfov_degrees=50.0), cfg.width / cfg.height,
    )
    s_m = progressive.render_step(progressive.init_state(cfg), scene,
                                  cam, cfg)
    img_m = np.asarray(progressive.resolve(s_m))
    s_w = wavefront.render_step(progressive.init_state(cfg), scene,
                                cam, cfg)
    img_w = np.asarray(progressive.resolve(s_w))
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)
    assert np.isfinite(img_m).all() and img_m.max() > 1e-3

    # Gating: the stock scenes carry no aniso column.
    stock, _ = scenes.get_scene("cornell_bsdf")
    assert stock.mat_aniso is None
