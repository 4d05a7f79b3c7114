"""Camera projection models (ops/camera.py).

The reference has exactly one camera — the hard-coded pinhole in
`Test.hlsl:6-10`. The framework generalizes ray-gen to a projection
family dispatched statically from the Camera pytree's aux data:
pinhole/thin-lens, orthographic, equidistant fisheye, and equirect
panorama. The panorama's promise is exact compatibility with the
`ops/envmap.py` lat-long convention — a rendered panorama re-lights
scenes as an environment map, gated here by a bitwise round-trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import camera as cam_ops
from pathtracing_tpu.ops import envmap as E
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _rays(cam, st_pairs):
    s = jnp.asarray([p[0] for p in st_pairs], jnp.float32)
    t = jnp.asarray([p[1] for p in st_pairs], jnp.float32)
    z = jnp.zeros_like(s)
    o, d = cam_ops.generate_ray(cam, s, t, z, z)
    return np.asarray(o), np.asarray(d)


class TestOrtho:
    def test_rays_parallel_and_film_sized(self):
        cfg = CameraConfig(position=(0, 0, 3), look_at=(0, 0, 0),
                           vfov_degrees=90.0, focus_distance=2.0,
                           projection="ortho")
        cam = cam_ops.build_camera(cfg, 1.0)
        o, d = _rays(cam, [(0.5, 0.5), (0.0, 0.5), (1.0, 0.5),
                           (0.5, 0.0), (0.5, 1.0)])
        # All directions identical: straight down -z.
        np.testing.assert_allclose(d, np.tile([0, 0, -1], (5, 1)),
                                   atol=1e-6)
        # Footprint = pinhole frustum cross-section at focus distance:
        # half-height = tan(45°)·2 = 2 world units.
        np.testing.assert_allclose(o[0], [0, 0, 3], atol=1e-6)
        np.testing.assert_allclose(o[1], [-2, 0, 3], atol=1e-5)
        np.testing.assert_allclose(o[2], [2, 0, 3], atol=1e-5)
        np.testing.assert_allclose(o[3], [0, -2, 3], atol=1e-5)
        np.testing.assert_allclose(o[4], [0, 2, 3], atol=1e-5)

    def test_no_perspective_shrink(self):
        """Two equal spheres at different depths must cover the same
        pixel area — the defining orthographic property, checked
        through the real render path."""
        b = SceneBuilder()
        lamp = b.emissive((8.0, 8.0, 8.0))
        b.add_sphere((-0.7, 0.0, 0.0), 0.5, lamp)
        b.add_sphere((0.7, 0.0, -6.0), 0.5, lamp)
        scene = b.build()
        cfg = CameraConfig(position=(0, 0, 4), look_at=(0, 0, 0),
                           vfov_degrees=60.0, focus_distance=4.0,
                           projection="ortho")
        cam = cam_ops.build_camera(cfg, 1.0)
        rcfg = RenderConfig(width=64, height=64, samples_per_pixel=4,
                            samples_per_step=4, max_depth=1, seed=0)
        img = np.asarray(progressive.render_once(scene, cam, rcfg))
        lit = img.sum(-1) > 0.5
        near = lit[:, :32].sum()
        far = lit[:, 32:].sum()
        assert near > 20
        assert abs(near - far) <= 0.1 * near, (near, far)


class TestFisheye:
    def test_center_and_edge_angles(self):
        cfg = CameraConfig(position=(0, 0, 0), look_at=(0, 0, -1),
                           vfov_degrees=180.0, projection="fisheye")
        cam = cam_ops.build_camera(cfg, 1.0)
        o, d = _rays(cam, [(0.5, 0.5), (0.5, 1.0), (1.0, 0.5),
                           (0.5, 0.0)])
        np.testing.assert_allclose(o, np.zeros((4, 3)), atol=1e-6)
        # Center ray: the view axis.
        np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-6)
        # Top edge at 180° fov: 90° from the axis => straight up.
        np.testing.assert_allclose(d[1], [0, 1, 0], atol=1e-5)
        np.testing.assert_allclose(d[2], [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(d[3], [0, -1, 0], atol=1e-5)

    def test_equidistant_linearity(self):
        """Equidistant model: angle from the axis grows LINEARLY with
        NDC radius (the property that distinguishes it from pinhole)."""
        cfg = CameraConfig(position=(0, 0, 0), look_at=(0, 0, -1),
                           vfov_degrees=120.0, projection="fisheye")
        cam = cam_ops.build_camera(cfg, 1.0)
        _, d = _rays(cam, [(0.5, 0.75), (0.5, 1.0)])
        half = np.radians(60.0)
        ang = np.arccos(np.clip(-d[:, 2], -1, 1))
        np.testing.assert_allclose(ang, [0.5 * half, half], atol=1e-5)


class TestEquirect:
    def test_compass_coverage(self):
        cfg = CameraConfig(position=(0, 0, 0), look_at=(0, 0, -1),
                           projection="equirect")
        cam = cam_ops.build_camera(cfg, 2.0)
        _, d = _rays(cam, [(0.5, 0.5),    # forward
                           (0.75, 0.5),   # right quarter-turn
                           (0.25, 0.5),   # left quarter-turn
                           (0.0, 0.5),    # behind
                           (0.5, 1.0),    # up pole
                           (0.5, 0.0)])   # down pole
        np.testing.assert_allclose(d[0], [0, 0, -1], atol=1e-5)
        np.testing.assert_allclose(d[1], [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(d[2], [-1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(d[3], [0, 0, 1], atol=1e-5)
        np.testing.assert_allclose(d[4], [0, 1, 0], atol=1e-5)
        np.testing.assert_allclose(d[5], [0, -1, 0], atol=1e-5)

    def test_envmap_roundtrip_exact(self):
        """Render a 360 panorama inside an env-lit empty-ish scene with
        the documented orientation (look +X, up +Y) at panorama
        resolution == map resolution: every escaped camera ray must
        fetch its own texel, so the HDR panorama equals the map
        EXACTLY (nearest-texel radiance; jitter stays inside the
        pixel/texel cell)."""
        eh, ew = 12, 24
        rng = np.random.default_rng(7)
        tx = (rng.random((eh, ew, 3)).astype(np.float32) * 2.0 + 0.1)
        b = SceneBuilder()
        # Geometry is required by the builder; park a speck far down
        # the -Y pole and exclude the bottom row it occupies.
        dark = b.lambertian((0.0, 0.0, 0.0))
        b.add_sphere((0.0, -500.0, 0.0), 0.01, dark)
        b.environment(tx)
        scene = b.build()
        cfg = CameraConfig(position=(0, 0, 0), look_at=(1, 0, 0),
                           up=(0, 1, 0), projection="equirect")
        cam = cam_ops.build_camera(cfg, ew / eh)
        rcfg = RenderConfig(width=ew, height=eh, samples_per_pixel=1,
                            samples_per_step=1, max_depth=2, seed=0,
                            background="black")
        img = np.asarray(progressive.render_once(scene, cam, rcfg))
        np.testing.assert_array_equal(img[:-1], tx[:-1])

    def test_roundtrip_relights(self):
        """The full loop: panorama rendered from scene A feeds
        SceneBuilder.environment for scene B and must light it the
        same as scene A's own map (same env tables bit-for-bit)."""
        eh, ew = 8, 16
        tx = np.full((eh, ew, 3), 0.6, np.float32)
        tx[2:4, 3:7] = (9.0, 7.0, 2.0)  # a bright "window"
        b = SceneBuilder()
        dark = b.lambertian((0.0, 0.0, 0.0))
        b.add_sphere((0.0, -500.0, 0.0), 0.01, dark)
        b.environment(tx)
        scene = b.build()
        cfg = CameraConfig(position=(0, 0, 0), look_at=(1, 0, 0),
                           projection="equirect")
        cam = cam_ops.build_camera(cfg, ew / eh)
        rcfg = RenderConfig(width=ew, height=eh, samples_per_pixel=1,
                            samples_per_step=1, max_depth=2, seed=0)
        pano = np.array(progressive.render_once(scene, cam, rcfg))
        pano[-1] = tx[-1]  # the speck's row (excluded above)
        env_a = E.build_envmap(tx)
        env_b = E.build_envmap(pano)
        for f in ("texels", "marg_cdf", "cond_cdf", "prob_map"):
            np.testing.assert_array_equal(
                np.asarray(getattr(env_a, f)), np.asarray(getattr(env_b, f))
            )


class TestPinholeUnchanged:
    def test_projection_field_default(self):
        cam = cam_ops.build_camera(CameraConfig(), 1.0)
        assert cam.projection == "pinhole"

    def test_pytree_aux_is_static(self):
        cam = cam_ops.build_camera(
            CameraConfig(projection="fisheye"), 1.0
        )
        leaves, treedef = jax.tree_util.tree_flatten(cam)
        cam2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert cam2.projection == "fisheye"
        # Different projections are different treedefs => a jit cache
        # miss, i.e. the deliberate-recompile contract.
        cam3 = cam_ops.build_camera(CameraConfig(), 1.0)
        assert jax.tree_util.tree_structure(cam3) != treedef

    def test_unknown_projection_rejected(self):
        with pytest.raises(ValueError):
            cam_ops.build_camera(
                CameraConfig(projection="panini"), 1.0
            )

    def test_ortho_render_matches_oracle_direction(self):
        """cornell_sphere through the ortho camera still renders (the
        whole engine stack accepts the new pytree)."""
        scene, cam_cfg = scenes.cornell_sphere()
        cam_cfg = dataclasses.replace(cam_cfg, projection="ortho",
                                      focus_distance=3.0)
        cam = cam_ops.build_camera(cam_cfg, 1.0)
        rcfg = RenderConfig(width=32, height=32, samples_per_pixel=2,
                            samples_per_step=2, max_depth=2, seed=0)
        img = np.asarray(progressive.render_once(scene, cam, rcfg))
        assert np.isfinite(img).all()
        assert img.max() > 0.0
