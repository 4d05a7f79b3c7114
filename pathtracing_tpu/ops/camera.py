"""Camera models: pinhole/thin-lens, ortho, fisheye, equirect panorama.

The reference hard-codes its camera inside the compute kernel
(`Test.hlsl:6-10`): uv = (pixel/res)*2-1, eye (0,0,1), dir normalize(uv,-1).
Here cameras are data (a small pytree built from ``CameraConfig``) and
ray-gen is a pure function over pixel-index arrays, so it shards trivially
across chips. The projection name is static pytree *aux data*: switching
projection is a deliberate recompile (same contract as every other static
config knob), while camera poses stay traced so orbit sequences reuse one
executable.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.ops import linalg, sampling
from pathtracing_tpu.utils.config import CameraConfig

PROJECTIONS = ("pinhole", "ortho", "fisheye", "equirect")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Camera:
    """Precomputed world-space camera frame.

    Vector fields are float32 (3,) arrays; ``half_fov``/``aspect`` are
    scalar leaves consumed by the non-pinhole projections. ``projection``
    is static (pytree aux), so ``generate_ray`` dispatches on it in Python.
    """

    origin: jnp.ndarray
    lower_left: jnp.ndarray   # world-space corner of the film at focus dist
    horizontal: jnp.ndarray   # full film width vector
    vertical: jnp.ndarray     # full film height vector
    u: jnp.ndarray            # right
    v: jnp.ndarray            # up
    w: jnp.ndarray            # backward (forward is -w)
    lens_radius: jnp.ndarray  # scalar; 0 => pinhole
    half_fov: jnp.ndarray     # scalar radians (fisheye angular radius)
    aspect: jnp.ndarray       # scalar width/height
    projection: str = "pinhole"

    def tree_flatten(self):
        leaves = (self.origin, self.lower_left, self.horizontal,
                  self.vertical, self.u, self.v, self.w,
                  self.lens_radius, self.half_fov, self.aspect)
        return leaves, self.projection

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, projection=aux)


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

    projection = getattr(cfg, "projection", "pinhole")
    if projection not in PROJECTIONS:
        raise ValueError(
            f"unknown camera projection {projection!r}; "
            f"expected one of {PROJECTIONS}"
        )

    return Camera(
        origin=jnp.asarray(position),
        lower_left=jnp.asarray(lower_left),
        horizontal=jnp.asarray(horizontal),
        vertical=jnp.asarray(vertical),
        u=jnp.asarray(u),
        v=jnp.asarray(v),
        w=jnp.asarray(w.astype(np.float32)),
        lens_radius=jnp.float32(cfg.aperture / 2.0),
        half_fov=jnp.float32(theta / 2.0),
        aspect=jnp.float32(aspect),
        projection=projection,
    )


def lerp(cam0: Camera, cam1: Camera, time) -> Camera:
    """Shutter-interval pose blend for motion blur: leaves interpolate
    linearly, the unit frame axes are renormalized (the standard
    small-shutter-angle approximation — exact for pure translation).
    Both endpoints must share a projection (static aux)."""
    if cam0.projection != cam1.projection:
        raise ValueError(
            f"motion endpoints disagree on projection: "
            f"{cam0.projection!r} vs {cam1.projection!r}"
        )
    mixed = jax.tree_util.tree_map(
        lambda a, b: a + (b - a) * time, cam0, cam1
    )
    return dataclasses.replace(
        mixed,
        u=linalg.normalize(mixed.u),
        v=linalg.normalize(mixed.v),
        w=linalg.normalize(mixed.w),
    )


def resolve(camera, time=0.5):
    """Collapse a motion pair ``(open, close)`` to the pose at ``time``;
    plain cameras pass through. Single-pose consumers (denoiser guide
    AOVs, orbit pivots) use this so they accept either form."""
    if isinstance(camera, tuple):
        cam0, cam1 = camera
        return lerp(cam0, cam1, jnp.float32(time))
    return camera


def generate_ray(camera: Camera, s, t, lens_u1, lens_u2):
    """Ray through film coords (s, t) in [0,1]² for the camera's projection.

    s runs left→right, t bottom→top. Broadcasts over leading dims.

    * ``pinhole`` — perspective with thin-lens defocus (``lens_radius``).
    * ``ortho`` — parallel rays along -w; the film footprint equals the
      pinhole frustum's cross-section at ``focus_distance`` (so vfov +
      focus pick the view size; the lens is ignored).
    * ``fisheye`` — equidistant projection: angle from the view axis is
      proportional to NDC radius, reaching ``vfov/2`` at the top/bottom
      edge (x scaled by aspect; corners see proportionally farther).
    * ``equirect`` — full 360°×180° panorama. Columns are azimuth about
      the up axis ``v`` (image center = look direction), rows are polar
      angle from ``v`` (top row = up). A panorama rendered with
      up=(0,1,0) and look_at toward +X matches ``ops.envmap``'s
      lat-long texel convention row-for-row (round-trip tested).
    """
    proj = camera.projection
    if proj == "pinhole":
        disk = sampling.uniform_in_disk(lens_u1, lens_u2) * camera.lens_radius
        offset = disk[..., 0:1] * camera.u + disk[..., 1:2] * camera.v
        origin = camera.origin + offset
        target = (
            camera.lower_left
            + s[..., None] * camera.horizontal
            + t[..., None] * camera.vertical
        )
        return origin, linalg.normalize(target - origin)
    if proj == "ortho":
        offset = (
            (s - 0.5)[..., None] * camera.horizontal
            + (t - 0.5)[..., None] * camera.vertical
        )
        origin = camera.origin + offset
        direction = jnp.broadcast_to(-camera.w, origin.shape)
        return origin, direction
    if proj == "fisheye":
        x = (2.0 * s - 1.0) * camera.aspect
        y = 2.0 * t - 1.0
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.minimum(r * camera.half_fov, np.float32(np.pi))
        # atan2(0, 0) = 0: the exact center ray degrades to the view axis.
        phi = jnp.arctan2(y, jnp.where(r > 0.0, x, 1.0))
        sin_t = jnp.sin(theta)
        direction = (
            (sin_t * jnp.cos(phi))[..., None] * camera.u
            + (sin_t * jnp.sin(phi))[..., None] * camera.v
            - jnp.cos(theta)[..., None] * camera.w
        )
        origin = jnp.broadcast_to(camera.origin, direction.shape)
        return origin, linalg.normalize(direction)
    if proj == "equirect":
        theta = (1.0 - t) * np.float32(np.pi)        # polar from up (v)
        lam = (s - 0.5) * np.float32(2.0 * np.pi)    # azimuth from -w
        sin_t = jnp.sin(theta)
        direction = (
            (sin_t * jnp.sin(lam))[..., None] * camera.u
            + jnp.cos(theta)[..., None] * camera.v
            - (sin_t * jnp.cos(lam))[..., None] * camera.w
        )
        origin = jnp.broadcast_to(camera.origin, direction.shape)
        return origin, linalg.normalize(direction)
    raise ValueError(f"unknown camera projection {proj!r}")


def cam_depth(camera: Camera, p):
    """Scalar occlusion-compare depth of world points ``p`` (..., 3) for
    this camera: z-depth along the view axis for the planar projections
    (pinhole/ortho — what their reprojection parallax preserves),
    radial distance for the angular ones (fisheye/equirect)."""
    rel = p - camera.origin
    if camera.projection in ("pinhole", "ortho"):
        return linalg.dot(rel, -camera.w)
    return jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 1e-20))


def project(camera: Camera, p):
    """Inverse of ``generate_ray`` for the lens-center ray: world points
    ``p`` (..., 3) -> film coords (s, t) in [0,1]² plus a validity mask
    (in front of the camera / inside the angular range). The temporal
    reprojection primitive: where the PREVIOUS frame saw a world point.
    Thin-lens defocus is ignored (reprojection wants the sharp pinhole
    mapping); round-trip with ``generate_ray`` is test-pinned for every
    projection.
    """
    rel = p - camera.origin
    x = linalg.dot(rel, camera.u)
    y = linalg.dot(rel, camera.v)
    z = linalg.dot(rel, -camera.w)
    proj = camera.projection
    if proj == "pinhole":
        focus = linalg.dot(camera.origin - camera.lower_left, camera.w)
        hw = jnp.sqrt(jnp.sum(camera.horizontal ** 2))
        hv = jnp.sqrt(jnp.sum(camera.vertical ** 2))
        valid = z > 1e-6
        zs = jnp.where(valid, z, 1.0)
        s = 0.5 + focus * x / (zs * hw)
        t = 0.5 + focus * y / (zs * hv)
        return s, t, valid
    if proj == "ortho":
        hw = jnp.sqrt(jnp.sum(camera.horizontal ** 2))
        hv = jnp.sqrt(jnp.sum(camera.vertical ** 2))
        return 0.5 + x / hw, 0.5 + y / hv, z > 1e-6
    if proj == "fisheye":
        rn = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 1e-20))
        theta = jnp.arccos(jnp.clip(z / rn, -1.0, 1.0))
        r_ndc = theta / camera.half_fov
        phi = jnp.arctan2(y, jnp.where(jnp.abs(x) + jnp.abs(y) > 0.0,
                                       x, 1.0))
        s = 0.5 * (r_ndc * jnp.cos(phi) / camera.aspect + 1.0)
        t = 0.5 * (r_ndc * jnp.sin(phi) + 1.0)
        # On-film is the caller's (s, t) in [0,1] test; only the exact
        # backward pole (phi undefined, r saturated) is invalid here.
        return s, t, theta < np.float32(np.pi * 0.999)
    if proj == "equirect":
        rn = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1), 1e-20))
        theta = jnp.arccos(jnp.clip(y / rn, -1.0, 1.0))
        # Full atan2 over (x, z): azimuth about v measured from -w.
        lam = jnp.arctan2(x, z)
        s = lam / np.float32(2.0 * np.pi) + 0.5
        t = 1.0 - theta / np.float32(np.pi)
        return s, t, rn > 1e-6
    raise ValueError(f"unknown camera projection {proj!r}")


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
