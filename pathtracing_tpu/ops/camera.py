"""Camera models: pinhole + thin-lens, and the reference-parity ray-gen.

The reference hard-codes its camera inside the compute kernel
(`Test.hlsl:6-10`): uv = (pixel/res)*2-1, eye (0,0,1), dir normalize(uv,-1).
Here cameras are data (a small pytree built from ``CameraConfig``) and
ray-gen is a pure function over pixel-index arrays, so it shards trivially
across chips.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.ops import linalg, sampling
from pathtracing_tpu.utils.config import CameraConfig


class Camera(NamedTuple):
    """Precomputed world-space camera frame (all float32 arrays, shape (3,))."""

    origin: jnp.ndarray
    lower_left: jnp.ndarray   # world-space corner of the film at focus dist
    horizontal: jnp.ndarray   # full film width vector
    vertical: jnp.ndarray     # full film height vector
    u: jnp.ndarray            # right
    v: jnp.ndarray            # up
    lens_radius: jnp.ndarray  # scalar; 0 => pinhole


def build_camera(cfg: CameraConfig, aspect: float) -> Camera:
    """Host-side camera setup (numpy; runs once per scene/config)."""
    position = np.asarray(cfg.position, np.float32)
    look_at = np.asarray(cfg.look_at, np.float32)
    up = np.asarray(cfg.up, np.float32)

    theta = math.radians(cfg.vfov_degrees)
    half_h = math.tan(theta / 2.0)
    half_w = aspect * half_h

    w = position - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)

    focus = cfg.focus_distance
    lower_left = position - half_w * focus * u - half_h * focus * v - focus * w
    horizontal = 2.0 * half_w * focus * u
    vertical = 2.0 * half_h * focus * v

    return Camera(
        origin=jnp.asarray(position),
        lower_left=jnp.asarray(lower_left),
        horizontal=jnp.asarray(horizontal),
        vertical=jnp.asarray(vertical),
        u=jnp.asarray(u),
        v=jnp.asarray(v),
        lens_radius=jnp.float32(cfg.aperture / 2.0),
    )


def generate_ray(camera: Camera, s, t, lens_u1, lens_u2):
    """Ray through film coords (s, t) in [0,1]² with thin-lens defocus.

    s runs left→right, t bottom→top. Broadcasts over leading dims.
    """
    disk = sampling.uniform_in_disk(lens_u1, lens_u2) * camera.lens_radius
    offset = disk[..., 0:1] * camera.u + disk[..., 1:2] * camera.v
    origin = camera.origin + offset
    target = (
        camera.lower_left
        + s[..., None] * camera.horizontal
        + t[..., None] * camera.vertical
    )
    return origin, linalg.normalize(target - origin)


def reference_ray(pixel_x, pixel_y, resolution_x, resolution_y):
    """Exact reference ray-gen (`Test.hlsl:6-10`) for the parity model.

    uv = (pixel / resolution) * 2 - 1 with y DOWN (HLSL dispatch-thread id
    convention), eye at (0,0,1), direction normalize((uv, -1)). Note the
    reference hard-codes resolution 1080×1080 while dispatching 1920×1080
    (SURVEY.md §0.1.5) — callers pass the *actual* resolution; a regression
    test documents the quirk we deliberately do not copy.
    """
    uv_x = (pixel_x / resolution_x) * 2.0 - 1.0
    uv_y = (pixel_y / resolution_y) * 2.0 - 1.0
    origin = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    direction = linalg.normalize(
        jnp.stack([uv_x, uv_y, -jnp.ones_like(uv_x)], axis=-1)
    )
    origin = jnp.broadcast_to(origin, direction.shape)
    return origin, direction, jnp.stack([uv_x, uv_y], axis=-1)
