"""Unit tests for the math layer: linalg, sampling, intersection, camera.

Analytic-case unit tests per SURVEY.md §4(a). Everything runs on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.ops import camera as cam_ops
from pathtracing_tpu.ops import intersect, linalg, rng, sampling
from pathtracing_tpu.utils.config import CameraConfig


class TestLinalg:
    def test_normalize(self):
        v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
        n = linalg.normalize(v)
        np.testing.assert_allclose(linalg.length(n), [1.0, 1.0], rtol=1e-6)

    def test_reflect(self):
        d = linalg.normalize(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        r = linalg.reflect(d, n)
        np.testing.assert_allclose(
            r, linalg.normalize(jnp.array([1.0, 1.0, 0.0])), atol=1e-6
        )

    def test_refract_straight_through(self):
        d = jnp.array([0.0, -1.0, 0.0])
        n = jnp.array([0.0, 1.0, 0.0])
        out = linalg.refract(d, n, jnp.float32(1.0))
        np.testing.assert_allclose(out, d, atol=1e-6)

    def test_refract_snell(self):
        # 45° incidence, eta = 1/1.5: sin_t = sin(45°)/1.5.
        d = linalg.normalize(jnp.array([1.0, -1.0, 0.0]))
        n = jnp.array([0.0, 1.0, 0.0])
        out = linalg.refract(d, n, jnp.float32(1.0 / 1.5))
        sin_t = float(jnp.abs(out[0]) / linalg.length(out))
        assert sin_t == pytest.approx(np.sin(np.pi / 4) / 1.5, abs=1e-5)

    def test_orthonormal_basis(self):
        keys = jax.random.split(jax.random.key(0), 64)
        normals = linalg.normalize(
            jax.vmap(lambda k: jax.random.normal(k, (3,)))(keys)
        )
        t, b = linalg.orthonormal_basis(normals)
        np.testing.assert_allclose(linalg.dot(t, normals), 0.0, atol=1e-5)
        np.testing.assert_allclose(linalg.dot(b, normals), 0.0, atol=1e-5)
        np.testing.assert_allclose(linalg.dot(t, b), 0.0, atol=1e-5)
        np.testing.assert_allclose(linalg.length(t), 1.0, atol=1e-5)
        # Right-handed: t × b = n.
        np.testing.assert_allclose(
            linalg.cross(t, b), normals, atol=1e-5
        )


class TestSampling:
    def test_cosine_hemisphere_distribution(self):
        """Mean cos θ of a cosine-weighted sample is 2/3."""
        k = jax.random.key(1)
        u = jax.random.uniform(k, (20000, 2))
        d = sampling.square_to_cosine_hemisphere(u[:, 0], u[:, 1])
        np.testing.assert_allclose(linalg.length(d), 1.0, atol=1e-5)
        assert float(d[:, 2].mean()) == pytest.approx(2.0 / 3.0, abs=0.01)
        assert float(d[:, 2].min()) >= 0.0

    def test_uniform_sphere(self):
        k = jax.random.key(2)
        u = jax.random.uniform(k, (20000, 2))
        d = sampling.uniform_sphere(u[:, 0], u[:, 1])
        np.testing.assert_allclose(linalg.length(d), 1.0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(d).mean(axis=0), 0.0, atol=0.02
        )

    def test_uniform_in_disk(self):
        k = jax.random.key(3)
        u = jax.random.uniform(k, (20000, 2))
        p = sampling.uniform_in_disk(u[:, 0], u[:, 1])
        r2 = p[:, 0] ** 2 + p[:, 1] ** 2
        assert float(r2.max()) <= 1.0
        # E[r²] for uniform disk = 1/2.
        assert float(r2.mean()) == pytest.approx(0.5, abs=0.01)

    def test_schlick_limits(self):
        # Normal incidence, ior 1.5 → r0 = 0.04; grazing → 1.
        assert float(
            sampling.schlick_fresnel(jnp.float32(1.0), jnp.float32(1 / 1.5))
        ) == pytest.approx(0.04, abs=1e-3)
        assert float(
            sampling.schlick_fresnel(jnp.float32(0.0), jnp.float32(1 / 1.5))
        ) == pytest.approx(1.0, abs=1e-6)


class TestIntersect:
    def test_ray_sphere_head_on(self):
        # Reference setup (`Test.hlsl:8-13`): eye (0,0,1), sphere r=.5 at 0.
        t = intersect.ray_sphere(
            jnp.array([0.0, 0.0, 1.0]), jnp.array([0.0, 0.0, -1.0]),
            jnp.zeros(3), jnp.float32(0.5),
        )
        assert float(t) == pytest.approx(0.5, abs=1e-6)

    def test_ray_sphere_miss(self):
        t = intersect.ray_sphere(
            jnp.array([0.0, 0.0, 1.0]), jnp.array([0.0, 1.0, 0.0]),
            jnp.zeros(3), jnp.float32(0.5),
        )
        assert not np.isfinite(float(t))

    def test_ray_sphere_inside(self):
        """Origin inside → far root (dielectric internal rays)."""
        t = intersect.ray_sphere(
            jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]),
            jnp.zeros(3), jnp.float32(0.5),
        )
        assert float(t) == pytest.approx(0.5, abs=1e-6)

    def test_ray_triangle(self):
        v0 = jnp.array([0.0, 0.0, 0.0])
        e1 = jnp.array([1.0, 0.0, 0.0])
        e2 = jnp.array([0.0, 1.0, 0.0])
        t = intersect.ray_triangle(
            jnp.array([0.2, 0.2, 1.0]), jnp.array([0.0, 0.0, -1.0]),
            v0, e1, e2,
        )
        assert float(t) == pytest.approx(1.0, abs=1e-6)
        # Outside the triangle (u+v > 1).
        t = intersect.ray_triangle(
            jnp.array([0.9, 0.9, 1.0]), jnp.array([0.0, 0.0, -1.0]),
            v0, e1, e2,
        )
        assert not np.isfinite(float(t))

    def test_ray_triangle_backface(self):
        """Two-sided: hits from behind too."""
        v0 = jnp.array([0.0, 0.0, 0.0])
        e1 = jnp.array([1.0, 0.0, 0.0])
        e2 = jnp.array([0.0, 1.0, 0.0])
        t = intersect.ray_triangle(
            jnp.array([0.2, 0.2, -1.0]), jnp.array([0.0, 0.0, 1.0]),
            v0, e1, e2,
        )
        assert float(t) == pytest.approx(1.0, abs=1e-6)

    def test_ray_aabb(self):
        o = jnp.array([0.0, 0.0, 5.0])
        inv_d = 1.0 / jnp.array([1e-12, 1e-12, -1.0])
        hit, t_near = intersect.ray_aabb(
            o, inv_d, jnp.array([-1.0, -1.0, -1.0]),
            jnp.array([1.0, 1.0, 1.0]), jnp.float32(jnp.inf),
        )
        assert bool(hit)
        assert float(t_near) == pytest.approx(4.0, abs=1e-4)
        hit, _ = intersect.ray_aabb(
            jnp.array([5.0, 0.0, 5.0]), inv_d,
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
            jnp.float32(jnp.inf),
        )
        assert not bool(hit)


class TestCamera:
    def test_center_ray_points_at_target(self):
        cam = cam_ops.build_camera(
            CameraConfig(position=(0, 0, 3), look_at=(0, 0, 0)), 1.0
        )
        o, d = cam_ops.generate_ray(
            cam, jnp.float32(0.5), jnp.float32(0.5),
            jnp.float32(0.0), jnp.float32(0.0),
        )
        np.testing.assert_allclose(o, [0, 0, 3], atol=1e-6)
        np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)

    def test_fov(self):
        cam = cam_ops.build_camera(
            CameraConfig(position=(0, 0, 1), look_at=(0, 0, 0),
                         vfov_degrees=90.0), 1.0
        )
        # Top edge of the film at 90°: direction 45° up.
        _, d = cam_ops.generate_ray(
            cam, jnp.float32(0.5), jnp.float32(1.0),
            jnp.float32(0.0), jnp.float32(0.0),
        )
        assert float(d[1]) == pytest.approx(np.sin(np.pi / 4), abs=1e-5)

    def test_reference_ray_mapping(self):
        """`Test.hlsl:6-10` semantics: pixel (0,0) → uv (-1,-1)."""
        o, d, uv = cam_ops.reference_ray(
            jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(64.0), jnp.float32(64.0),
        )
        np.testing.assert_allclose(uv, [-1.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(o, [0.0, 0.0, 1.0], atol=1e-6)
        expected = np.array([-1.0, -1.0, -1.0]) / np.sqrt(3.0)
        np.testing.assert_allclose(d, expected, atol=1e-6)


class TestRng:
    def test_keys_distinct(self):
        k1 = rng.pixel_sample_key(0, 0, 0)
        k2 = rng.pixel_sample_key(0, 1, 0)
        k3 = rng.pixel_sample_key(0, 0, 1)
        vals = [
            float(jax.random.uniform(k)) for k in (k1, k2, k3)
        ]
        assert len(set(vals)) == 3

    def test_deterministic(self):
        a = jax.random.uniform(rng.pixel_sample_key(7, 123, 45))
        b = jax.random.uniform(rng.pixel_sample_key(7, 123, 45))
        assert float(a) == float(b)
