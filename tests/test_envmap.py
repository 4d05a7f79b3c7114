"""Image-based environment lighting: sampling math, IO, integrator.

The reference's only environment is the miss-shading UV gradient
(`Test.hlsl:33-37`); `ops/envmap.py` is the production IBL superset.
These tests gate the three layers independently: the sampling tables
(histogram + MC-integral identities), the Radiance-HDR IO, and the
integrator coupling (furnace test, NEE-vs-brute-force agreement,
engine parity).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes, wavefront
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import envmap as E
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _random_env(seed=0, shape=(8, 16)):
    rng = np.random.default_rng(seed)
    return (rng.random(shape + (3,)).astype(np.float32) ** 2) * 3.0


def test_sample_matches_table_probabilities():
    tx = _random_env()
    env = E.build_envmap(tx)
    rng = np.random.default_rng(1)
    u = rng.random((200000, 2)).astype(np.float32)
    d, p = E.sample(env, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    d = np.asarray(d)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)

    iy, ix = map(np.asarray, E._texel_index(env, jnp.asarray(d)))
    counts = np.zeros((8, 16))
    np.add.at(counts, (iy, ix), 1)
    prob = np.asarray(env.marg_pdf)[:, None] * np.asarray(env.cond_pdf)
    rel = np.abs(counts / u.shape[0] - prob) / np.maximum(prob, 1e-6)
    # Texels holding >=1% probability get >=2000 samples: ~2% MC noise.
    assert rel[prob > 1e-2].max() < 0.1


def test_mc_integral_identity():
    # E[L(d)/p(d)] over env samples must equal the exact map integral —
    # the identity every NEE estimate rests on (pdf/sampling
    # consistency, including the pole rows).
    tx = _random_env(seed=2)
    env = E.build_envmap(tx)
    rng = np.random.default_rng(3)
    u = rng.random((400000, 2)).astype(np.float32)
    d, p = E.sample(env, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    L = np.asarray(E.radiance(env, d))
    est = (L / np.asarray(p)[:, None]).mean(0)

    eh, ew = 8, 16
    edges = np.arange(eh + 1) / eh * np.pi
    d_om = (2 * np.pi / ew) * (np.cos(edges[:-1]) - np.cos(edges[1:]))
    exact = (tx * d_om[:, None, None]).sum((0, 1))
    np.testing.assert_allclose(est, exact, rtol=0.02)


def test_pdf_lookup_matches_sample_pdf():
    env = E.build_envmap(_random_env(seed=4))
    rng = np.random.default_rng(5)
    u = rng.random((50000, 2)).astype(np.float32)
    d, p = E.sample(env, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    p2 = E.pdf(env, d)
    rel = np.abs(np.asarray(p) / np.asarray(p2) - 1.0)
    # Disagreement only from float round-trips across texel boundaries.
    assert (rel > 1e-3).mean() < 1e-2


def test_radiance_lookup_roundtrip():
    tx = _random_env(seed=6)
    env = E.build_envmap(tx)
    # Texel-center directions must return exactly that texel's value.
    eh, ew = 8, 16
    iy, ix = 3, 11
    theta = (iy + 0.5) / eh * np.pi
    phi = ((ix + 0.5) / ew - 0.5) * 2 * np.pi
    d = jnp.asarray(
        [[np.sin(theta) * np.cos(phi), np.cos(theta),
          np.sin(theta) * np.sin(phi)]], jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(E.radiance(env, d))[0], tx[iy, ix], rtol=1e-6
    )


def test_black_map_uniform_fallback():
    env = E.build_envmap(np.zeros((4, 8, 3), np.float32))
    u = np.random.default_rng(7).random((1000, 2)).astype(np.float32)
    d, p = E.sample(env, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    np.testing.assert_allclose(np.asarray(p), 1 / (4 * np.pi), rtol=1e-5)
    assert np.allclose(np.linalg.norm(np.asarray(d), axis=1), 1, atol=1e-5)
    assert float(jnp.max(E.radiance(env, d))) == 0.0


def test_hdr_roundtrip(tmp_path):
    tx = _random_env(seed=8, shape=(12, 24)) * 100.0
    path = str(tmp_path / "probe.hdr")
    E.write_hdr(path, tx)
    back = E.load_hdr(path)
    assert back.shape == tx.shape
    # RGBE shares one 8-bit exponent across channels: the error bound
    # is ~1/256 of the pixel's MAX channel, not of each channel.
    pix_max = tx.max(axis=-1, keepdims=True)
    assert (np.abs(back - tx) <= pix_max / 256.0 + 1e-4).all()


def test_hdr_rle_scanlines(tmp_path):
    # Hand-encode an adaptive-RLE file (runs + literals) and check the
    # reader decodes it to the same image as the flat encoding.
    h, w = 2, 16
    img = np.zeros((h, w, 3), np.float32)
    img[0] = 0.5          # constant row -> pure runs
    img[1, ::2] = 1.0     # alternating row -> literals
    rgbe = E._rgbe_encode(img)
    path = str(tmp_path / "rle.hdr")
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        for row in range(h):
            f.write(bytes([2, 2, w >> 8, w & 0xFF]))
            for c in range(4):
                col = rgbe[row, :, c]
                if np.all(col == col[0]):
                    f.write(bytes([128 + w, int(col[0])]))
                else:
                    f.write(bytes([w]) + col.tobytes())
    back = E.load_hdr(path)
    np.testing.assert_allclose(back, E._rgbe_decode(rgbe), rtol=1e-6)


def _furnace_scene(albedo):
    b = SceneBuilder()
    m = b.lambertian((albedo,) * 3)
    b.add_sphere((0.0, 0.0, 0.0), 0.5, m)
    b.environment(np.ones((16, 32, 3), np.float32))
    cam = CameraConfig(position=(0.0, 0.0, 1.6), look_at=(0, 0, 0),
                       vfov_degrees=45.0)
    return b.build(), cam


def test_furnace_white_sphere_vanishes():
    """Canonical furnace test: an albedo-1 sphere in a uniform unit
    environment must be indistinguishable from the background — this
    pins the env-NEE + BSDF-MIS weights summing to exactly 1."""
    scene, cam_cfg = _furnace_scene(1.0)
    camera = build_camera(cam_cfg, 1.0)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=128,
                       samples_per_step=32, max_depth=4, seed=3)
    img = np.asarray(progressive.render_once(scene, camera, cfg))
    center = img[12:20, 12:20]
    assert abs(center.mean() - 1.0) < 0.01, center.mean()
    assert center.std() < 0.05


def test_furnace_energy_scales_with_albedo():
    # Convex body: no interreflection, so radiance == albedo exactly.
    scene, cam_cfg = _furnace_scene(0.5)
    camera = build_camera(cam_cfg, 1.0)
    cfg = RenderConfig(width=32, height=32, samples_per_pixel=128,
                       samples_per_step=32, max_depth=4, seed=3)
    img = np.asarray(progressive.render_once(scene, camera, cfg))
    assert abs(img[12:20, 12:20].mean() - 0.5) < 0.01


def test_env_nee_unbiased_vs_brute_force():
    """envmap_demo (sun-sky, env is the ONLY light): the env-NEE
    estimator must agree with brute-force path tracing in the mean."""
    scene, cam_cfg = scenes.envmap_demo()
    w, h = 64, 40
    camera = build_camera(cam_cfg, w / h)
    nee = np.asarray(progressive.render_once(
        scene, camera,
        RenderConfig(width=w, height=h, samples_per_pixel=16,
                     samples_per_step=8, max_depth=5, seed=0),
    ))
    brute = np.asarray(progressive.render_once(
        scene, camera,
        RenderConfig(width=w, height=h, samples_per_pixel=128,
                     samples_per_step=32, max_depth=5, seed=1,
                     nee=False),
    ))
    assert abs(nee.mean() / brute.mean() - 1.0) < 0.03


def test_wavefront_matches_megakernel_with_env():
    """Engine parity with an environment light.

    The engines draw identical RNG streams per (pixel, sample, depth),
    but they are DIFFERENT XLA programs: the wavefront's while-loop body
    compiles the same scatter math with different fusion/reassociation,
    so scattered directions can differ in the last ulp. envmap_demo's
    checkered ground turns that ulp into a discrete checker-cell flip
    (throughput jumps 2.25x) on the rare path that lands exactly on a
    cell boundary — measured: 1 path of 1536 at this config, both
    estimates valid unbiased samples (debugged bit-level in round 3; the
    eager/op-by-op wavefront body reproduces the megakernel exactly).
    The gate therefore allows isolated discontinuity outliers while
    still failing on any SYSTEMATIC divergence (a broken env escape
    weight or missing env-NEE term shifts every diffuse pixel)."""
    scene, cam_cfg = scenes.envmap_demo()
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=4,
                       samples_per_step=4, max_depth=5, seed=7)
    camera = build_camera(cam_cfg, cfg.width / cfg.height)
    mega = np.asarray(progressive.render_step(
        progressive.init_state(cfg), scene, camera, cfg
    ).accum)
    wave = np.asarray(wavefront.render_step(
        progressive.init_state(cfg), scene, camera, cfg
    ).accum)
    rel = np.abs(mega - wave).max(-1) / (np.abs(mega).max(-1) + 1e-6)
    n_outliers = int((rel > 1e-3).sum())
    assert n_outliers <= 3, f"{n_outliers} pixels diverge: not isolated"
    # Everything that didn't hit a discontinuity agrees to fp noise.
    np.testing.assert_allclose(
        np.where((rel <= 1e-3)[..., None], mega, 0.0),
        np.where((rel <= 1e-3)[..., None], wave, 0.0),
        rtol=5e-5, atol=3e-4,
    )
    # And the means agree to well under one flipped path's weight.
    assert abs(mega.mean() / wave.mean() - 1.0) < 5e-3


def test_scene_io_environment(tmp_path):
    import json

    from pathtracing_tpu.models import scene_io

    probe = _random_env(seed=9)
    E.write_hdr(str(tmp_path / "probe.hdr"), probe)
    spec = {
        "camera": {"position": [0, 0, 2]},
        "materials": {"w": {"type": "lambertian", "albedo": [0.6] * 3}},
        "objects": [
            {"type": "sphere", "center": [0, 0, 0], "radius": 0.5,
             "material": "w"},
        ],
        "environment": {"image": "probe.hdr", "scale": 2.0},
    }
    path = str(tmp_path / "scene.json")
    with open(path, "w") as f:
        json.dump(spec, f)
    scene, _ = scene_io.load_scene(path)
    assert scene.env is not None
    # scale folds into the texels (RGBE quantizes vs the pixel max).
    got = np.asarray(scene.env.texels)
    want = probe * 2.0
    pix_max = want.max(axis=-1, keepdims=True)
    assert (np.abs(got - want) <= pix_max / 256.0 + 1e-4).all()

    for env_spec, check in [
        ({"uniform": [1, 2, 3]}, lambda e: np.allclose(
            np.asarray(e.texels)[0, 0], [1, 2, 3])),
        ({"sky": {"width": 32, "height": 16}}, lambda e:
            np.asarray(e.texels).shape == (16, 32, 3)),
    ]:
        spec["environment"] = env_spec
        with open(path, "w") as f:
            json.dump(spec, f)
        scene, _ = scene_io.load_scene(path)
        assert check(scene.env)


def test_environment_rotation(tmp_path):
    tx = _random_env(seed=10)  # (8, 16)
    path = str(tmp_path / "p.hdr")
    E.write_hdr(path, tx)
    base = E.load_environment({"image": "p.hdr"}, str(tmp_path))
    rot = E.load_environment(
        {"image": "p.hdr", "rotate_degrees": 90.0}, str(tmp_path)
    )
    np.testing.assert_allclose(
        np.asarray(rot.texels), np.roll(np.asarray(base.texels), 4, axis=1)
    )
