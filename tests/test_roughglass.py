"""Rough (microfacet, Walter 2007) dielectric — TYPE_ROUGH_DIELECTRIC.

Pins: the smooth limit (alpha -> 0 reproduces the smooth dielectric
image — same RNG draws, h -> n, weight -> 1), energy conservation in a
white furnace (loss bounded by the known microfacet single-scattering
deficit), the roughness -> scatter-spread monotonicity on raw scatter()
calls, Beer-Lambert absorption composing with the rough lobe, the
mat_param2 feature gate (plain scenes build None and keep the
unmodified scatter graph), scene_io routing, and engine agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import progressive, scenes, wavefront
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import materials
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _sphere_scene(roughness, absorption=(0.0, 0.0, 0.0), ior=1.5):
    b = SceneBuilder()
    glass = b.dielectric(ior, roughness=roughness, absorption=absorption)
    b.add_sphere((0.0, 0.0, 0.0), 0.7, glass)
    cam = CameraConfig(position=(0.0, 0.0, 2.4), look_at=(0.0, 0.0, 0.0),
                       vfov_degrees=40.0)
    return b.build(), cam


def _render(sc, cam_cfg, engine="megakernel", size=32, spp=16, depth=12,
            background="gradient", seed=7):
    cfg = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                       max_depth=depth, samples_per_step=spp, seed=seed,
                       engine=engine, traversal="cluster_jax", nee=False,
                       background=background)
    cam = build_camera(cam_cfg, 1.0)
    st = progressive.init_state(cfg)
    step = (progressive.render_step if engine == "megakernel"
            else wavefront.render_step)
    st = step(st, sc, cam, cfg)
    return np.asarray(st.accum) / float(st.spp)


def test_smooth_limit_matches_dielectric():
    """At alpha ~ 0 the rough lobe degenerates to the smooth one: h ~ n
    (same Fresnel cosine, same reflect/refract directions to O(alpha)),
    weight G2*vh/(cos_v*cos_h) -> 1, and the SAME uniforms drive both —
    so the images agree to transport-noise level."""
    rough, cam = _sphere_scene(1e-4)
    smooth, _ = _sphere_scene(0.0)
    assert rough.mat_param2 is not None and smooth.mat_param2 is None
    img_r = _render(rough, cam)
    img_s = _render(smooth, cam)
    assert np.mean(np.abs(img_r - img_s)) < 0.01
    assert np.max(np.abs(img_r - img_s)) < 0.25   # isolated edge pixels


def test_furnace_energy():
    """White furnace: a rough-glass sphere in a uniform unit environment.
    The smooth sphere is EXACTLY 1.0 here (measured — transport adds or
    loses nothing); the rough lobe loses only the documented Walter
    single-scattering deficit (backfacing-h kills + G2 < 1, worst at
    grazing incidence: per-event E[w] 0.91 at cos_i 0.3, alpha 0.3), so
    the sphere's many grazing events land the mean near 0.85 at alpha
    0.3 — bounded below by that physics and above by 1."""
    smooth, cam = _sphere_scene(0.0)
    img_s = _render(smooth, cam, background="white", depth=24, spp=32)
    assert abs(float(img_s.mean()) - 1.0) < 1e-4
    sc, _ = _sphere_scene(0.3)
    img = _render(sc, cam, background="white", depth=24, spp=32)
    assert 0.82 < float(img.mean()) < 1.01


def test_roughness_spreads_transmission():
    """Raw scatter(): for one head-on incident ray the transmitted
    direction spread grows monotonically with alpha."""
    n = 4096
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (n, 5))
    normal = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))
    d_in = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (n, 1))
    spreads = []
    for alpha in (0.02, 0.1, 0.3):
        d_out, atten, scattered, pdf = materials.scatter(
            jnp.full(n, materials.TYPE_ROUGH_DIELECTRIC, jnp.int32),
            jnp.ones((n, 3)), jnp.full(n, 1.5),
            jnp.zeros((n, 3)), normal, d_in,
            jnp.ones(n, bool), u, param2=jnp.full(n, alpha),
        )
        assert np.allclose(
            np.linalg.norm(np.asarray(d_out), axis=-1), 1.0, atol=1e-5
        )
        a = np.asarray(atten)
        assert np.isfinite(a).all() and (a >= 0.0).all()
        assert np.asarray(pdf).max() == 0.0   # BSDF-sampling-only lobe
        trans = np.asarray(scattered) & (np.asarray(d_out)[:, 2] < 0.0)
        assert trans.mean() > 0.5   # head-on: mostly transmits
        spreads.append(np.asarray(d_out)[trans, :2].std())
    assert spreads[0] < spreads[1] < spreads[2]


def test_absorption_composes():
    """Frosted amber (roughness + Beer-Lambert sigma_a (0.05,0.7,2.5)):
    light through the sphere keeps red, loses blue — the medium handoff
    must recognize rough-dielectric transmissions."""
    sc, cam = _sphere_scene(0.2, absorption=(0.05, 0.7, 2.5))
    img = _render(sc, cam, background="white", depth=16, spp=16)
    center = img[12:20, 12:20]        # through the thick middle
    assert float(center[..., 0].mean()) > 2.5 * float(
        center[..., 2].mean()
    )


def test_feature_gate_and_registry():
    """Plain scenes build mat_param2 None (identical scatter graph);
    the frosted_demo registry scene builds the column."""
    sc, _ = scenes.get_scene("cornell_bsdf")
    assert sc.mat_param2 is None
    fr, _ = scenes.get_scene("frosted_demo")
    assert fr.mat_param2 is not None
    assert np.isclose(float(jnp.max(fr.mat_param2)), 0.4)


def test_scene_io_roughness(tmp_path):
    import json

    from pathtracing_tpu.models import scene_io

    spec = {
        "camera": {"position": [0, 0, 3], "look_at": [0, 0, 0]},
        "materials": {
            "frost": {"type": "dielectric", "ior": 1.5,
                      "roughness": 0.15},
        },
        "objects": [
            {"type": "sphere", "center": [0, 0, 0], "radius": 0.5,
             "material": "frost"},
        ],
    }
    p = tmp_path / "frost.json"
    p.write_text(json.dumps(spec))
    sc, cam = scene_io.load_scene(str(p))
    assert sc.mat_param2 is not None
    assert np.isclose(float(sc.mat_param2[0]), 0.15)
    assert int(sc.mat_type[0]) == materials.TYPE_ROUGH_DIELECTRIC


def test_engine_agreement():
    sc, cam = scenes.get_scene("frosted_demo")
    a = _render(sc, cam, engine="megakernel", size=24, spp=4, depth=6)
    b = _render(sc, cam, engine="wavefront", size=24, spp=4, depth=6)
    # Engines share per-path math/RNG; only the accumulation order
    # differs (float add reassociation) — agreement to 1e-4.
    np.testing.assert_allclose(a, b, atol=1e-4)
