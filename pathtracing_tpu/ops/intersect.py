"""Analytic intersection kernels: ray–sphere, ray–triangle, ray–AABB.

The ray–sphere quadratic reproduces the math of the reference compute kernel
(`Test.hlsl:16-28`: a = d·d, b = 2 oc·d, c = oc·oc − r², nearest root
(−b−√disc)/2a) but in branchless SoA form over whole ray batches, plus the
proper t-interval and both-roots handling the reference lacks (it takes the
near root even when negative). Triangles use Möller–Trumbore; AABBs the slab
test. All functions are vmap/Pallas friendly: pure, static shapes, no bool
branching.
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracing_tpu.ops import linalg

INF = jnp.inf
T_MIN = 1e-3  # self-intersection bias (the reference has no secondary rays
              # and so never needed one)


def ray_sphere(origin, direction, center, radius, t_min=T_MIN, t_max=INF):
    """Nearest hit distance of ray vs sphere, +inf on miss.

    Broadcasts over leading dims of all args. Reference math:
    `Test.hlsl:16-28`, extended to pick the far root when the near root is
    behind ``t_min`` (so rays starting inside a sphere — dielectrics — work).
    """
    oc = origin - center
    # a == 1 for unit directions but keep the general quadratic: the
    # reference normalizes too (`Test.hlsl:10`) yet we don't rely on it.
    a = linalg.dot(direction, direction)
    half_b = linalg.dot(oc, direction)
    c = linalg.dot(oc, oc) - radius * radius
    disc = half_b * half_b - a * c
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv_a = 1.0 / a
    t_near = (-half_b - sqrt_d) * inv_a
    t_far = (-half_b + sqrt_d) * inv_a
    t = jnp.where(t_near > t_min, t_near, t_far)
    valid = (disc > 0.0) & (t > t_min) & (t < t_max)
    return jnp.where(valid, t, INF)


def ray_triangle(origin, direction, v0, e1, e2, t_min=T_MIN, t_max=INF):
    """Möller–Trumbore ray–triangle distance, +inf on miss.

    ``e1 = v1 - v0``, ``e2 = v2 - v0`` precomputed at scene build (SoA).
    Returns t only; the shading normal is cross(e1, e2) recomputed at the
    hit point (see ``scene.triangle_normal``).
    """
    pvec = linalg.cross(direction, e2)
    det = linalg.dot(e1, pvec)
    # Two-sided test; guard near-parallel with a tiny det floor.
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tvec = origin - v0
    u = linalg.dot(tvec, pvec) * inv_det
    qvec = linalg.cross(tvec, e1)
    v = linalg.dot(direction, qvec) * inv_det
    t = linalg.dot(e2, qvec) * inv_det
    valid = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(valid, t, INF)


def ray_aabb(origin, inv_direction, box_min, box_max, t_max):
    """Slab-test: does the ray hit the AABB before ``t_max``?

    Takes precomputed ``1/direction`` (shared across all nodes a ray
    visits). Returns (hit: bool, t_near: float32). Robust to inf*0 via
    min/max ordering.
    """
    t0 = (box_min - origin) * inv_direction
    t1 = (box_max - origin) * inv_direction
    t_small = jnp.minimum(t0, t1)
    t_big = jnp.maximum(t0, t1)
    t_near = jnp.max(t_small, axis=-1)
    t_far = jnp.min(t_big, axis=-1)
    hit = (t_near <= t_far) & (t_far > T_MIN) & (t_near < t_max)
    return hit, t_near
