"""Tangent-space normal mapping: frame construction, perturbation
direction, feature gating.

SURVEY.md §4 strategy: property tests on the attribute resolver
(`models/scene.surface_attributes`) plus end-to-end renders — a flat
map must be a no-op, a rippled map must move shading normals exactly
where the map says, and unmapped scenes must keep the zero-gather path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtracing_tpu.models import progressive, scene as scene_mod, scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


FLAT = np.full((8, 8, 3), 0.5, np.float32)  # decodes to (0, 0, 1)


def _floor_scene(normal_map):
    b = SceneBuilder()
    mat = b.lambertian((0.7, 0.7, 0.7), normal_map=normal_map)
    b.add_quad((-2, 0, -2), (4, 0, 0), (0, 0, 4), mat, uv=True)
    b.add_quad((-0.5, 2.5, -0.5), (1, 0, 0), (0, 0, 1),
               b.emissive((12.0, 12.0, 12.0)))
    cam = CameraConfig(position=(0.0, 1.5, 3.0), look_at=(0.0, 0.2, 0.0),
                       vfov_degrees=45.0)
    return b.build(), build_camera(cam, 1.0)


def _render(scene, camera, spp=16, size=32, seed=0):
    config = RenderConfig(
        width=size, height=size, samples_per_pixel=spp, max_depth=3,
        samples_per_step=spp, seed=seed, nee=True,
    )
    s = progressive.render_step(
        progressive.init_state(config), scene, camera, config
    )
    return np.asarray(s.accum / s.spp)


def _hits_down_y(scene, n=64):
    """Intersect a batch of straight-down rays against the scene floor
    and resolve surface attributes."""
    rng = np.random.RandomState(2)
    xz = rng.uniform(-1.4, 1.4, size=(n, 2)).astype(np.float32)
    o = jnp.asarray(
        np.stack([xz[:, 0], np.full(n, 2.0, np.float32), xz[:, 1]], -1)
    )
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], jnp.float32),
                         (n, 3))
    hit = scene_mod.intersect_batch(scene, o, d, "bvh")
    normal, uv = scene_mod.surface_attributes(scene, hit)
    return hit, np.asarray(normal), np.asarray(uv)


def test_flat_map_is_identity():
    """A (0.5, 0.5, 1→0.5) texel decodes to (0,0,1): the shading normal
    must equal the geometric normal to fp rounding."""
    scene, _ = _floor_scene(FLAT)
    hit, normal, _ = _hits_down_y(scene)
    keep = np.asarray(hit.valid) & (np.asarray(hit.mat_id) == 0)
    assert keep.sum() > 30
    np.testing.assert_allclose(
        normal[keep], np.asarray(hit.normal)[keep], atol=1e-6
    )


def test_tangent_frame_follows_uv():
    """A map tilted purely toward +t must tilt world normals toward the
    quad's +u edge (+x here); +b toward +v (+z). Locks the TBN solve
    AND the handedness convention."""
    tilt_t = np.zeros((8, 8, 3), np.float32)
    tilt_t[..., 0] = 0.5 + 0.5 * 0.6   # t component +0.6
    tilt_t[..., 1] = 0.5
    tilt_t[..., 2] = 0.5 + 0.5 * 0.8   # n component 0.8
    scene, _ = _floor_scene(tilt_t)
    hit, normal, _ = _hits_down_y(scene)
    keep = np.asarray(hit.valid)
    # Floor normal is +y; +u edge is +x: expect x ≈ 0.6, y ≈ 0.8.
    np.testing.assert_allclose(normal[keep, 0], 0.6, atol=1e-4)
    np.testing.assert_allclose(normal[keep, 1], 0.8, atol=1e-4)
    np.testing.assert_allclose(normal[keep, 2], 0.0, atol=1e-4)

    tilt_b = np.zeros((8, 8, 3), np.float32)
    tilt_b[..., 0] = 0.5
    tilt_b[..., 1] = 0.5 + 0.5 * 0.6   # b component +0.6
    tilt_b[..., 2] = 0.5 + 0.5 * 0.8
    scene2, _ = _floor_scene(tilt_b)
    hit2, normal2, _ = _hits_down_y(scene2)
    keep2 = np.asarray(hit2.valid)
    np.testing.assert_allclose(normal2[keep2, 2], 0.6, atol=1e-4)
    np.testing.assert_allclose(normal2[keep2, 1], 0.8, atol=1e-4)


def test_normals_stay_unit_and_ray_facing():
    scene, cam = _floor_scene(
        scenes.ripple_normal_map(res=64, rings=5.0, strength=0.9)
    )
    hit, normal, _ = _hits_down_y(scene, n=256)
    keep = np.asarray(hit.valid)
    np.testing.assert_allclose(
        np.linalg.norm(normal[keep], axis=1), 1.0, atol=1e-5
    )
    # Ray-facing: against straight-down rays the mapped normal keeps a
    # positive y (geometric hemisphere clamp).
    facing = (normal[keep] * np.asarray(hit.normal)[keep]).sum(-1)
    assert (facing > 0.0).all()


def test_ripple_changes_render_flat_does_not():
    scene_none, cam = _floor_scene(None)
    scene_flat, _ = _floor_scene(FLAT)
    scene_rip, _ = _floor_scene(scenes.ripple_normal_map(res=64))
    img_none = _render(scene_none, cam)
    img_flat = _render(scene_flat, cam)
    img_rip = _render(scene_rip, cam)
    # Flat map == no map (same RNG streams; the only delta is the
    # normalize() of an already-unit normal).
    np.testing.assert_allclose(img_flat, img_none, atol=1e-4)
    # Ripples actually shade.
    assert np.abs(img_rip - img_none).max() > 0.02


def test_unmapped_scene_keeps_gate_closed():
    scene, _ = scenes.textured_demo()
    assert scene.mat_ntex is None
    scene2, _ = scenes.bump_demo()
    assert scene2.mat_ntex is not None
    assert scene2.textures is not None


def test_sphere_latlong_frame():
    """Normal-mapped sphere: a flat map keeps the analytic normal; the
    pole lanes (degenerate tangent) also keep it rather than NaN."""
    b = SceneBuilder()
    mat = b.lambertian((0.6, 0.6, 0.6), normal_map=FLAT)
    b.add_sphere((0.0, 0.0, 0.0), 1.0, mat)
    b.add_quad((-0.5, 2.5, -0.5), (1, 0, 0), (0, 0, 1),
               b.emissive((10.0, 10.0, 10.0)))
    scene = b.build()
    n = 128
    rng = np.random.RandomState(4)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs[0] = (0.0, 1.0, 0.0)   # exact pole ray
    dirs[1] = (0.0, -1.0, 0.0)
    o = jnp.asarray(2.5 * dirs)
    d = jnp.asarray(-dirs)
    hit = scene_mod.intersect_batch(scene, o, d, "bvh")
    normal, uv = scene_mod.surface_attributes(scene, hit)
    normal = np.asarray(normal)
    keep = np.asarray(hit.valid)
    assert keep.sum() > 100
    assert np.isfinite(normal[keep]).all()
    np.testing.assert_allclose(
        normal[keep], np.asarray(hit.normal)[keep], atol=1e-5
    )


def test_scene_io_normal_map(tmp_path):
    """JSON scenes accept "normal_map" on lambertian/metal/ggx."""
    import json
    from pathtracing_tpu.models import scene_io

    nm = scenes.ripple_normal_map(res=32)
    np.save(tmp_path / "ripple.npy", nm)
    spec = {
        "camera": {"position": [0, 1.5, 3], "look_at": [0, 0, 0],
                   "vfov_degrees": 45},
        "materials": {
            "floor": {"type": "lambertian", "albedo": [0.7, 0.7, 0.7],
                      "normal_map": "ripple.npy"},
            "lamp": {"type": "emissive", "radiance": [10, 10, 10]},
        },
        "objects": [
            {"type": "quad", "corner": [-2, 0, -2], "edge_u": [4, 0, 0],
             "edge_v": [0, 0, 4], "material": "floor", "uv": True},
            {"type": "quad", "corner": [-0.5, 2.5, -0.5],
             "edge_u": [1, 0, 0], "edge_v": [0, 0, 1],
             "material": "lamp"},
        ],
    }
    path = tmp_path / "scene.json"
    path.write_text(json.dumps(spec))
    scene, cam = scene_io.load_scene(str(path))
    assert scene.mat_ntex is not None
    assert int(np.asarray(scene.mat_ntex)[0]) == 0
