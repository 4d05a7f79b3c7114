"""Reference-parity model: the exact image the reference kernel computes.

Reproduces `RayTracing/Assets/Shaders/Source/Ray/Test.hlsl:1-40` as one
vectorized jnp expression: per pixel, uv = (xy/res)*2-1 (y down), pinhole at
(0,0,1) toward -z, ray–sphere quadratic against c=(0,0,0) r=0.5, hit →
normal*0.5+0.5, miss → (uv, 0). This is the golden-image anchor for parity
tests and the seed the full path tracer grew from.

Deliberate non-copies (documented divergences):
  * The reference hard-codes resolution (1080, 1080) while dispatching
    1920×1080 (`Test.hlsl:6` vs `Renderer.cs:1020`, SURVEY.md §0.1.5),
    stretching the image. We take the actual resolution; a test covers the
    quirk by passing mismatched values explicitly.
  * The reference takes the near quadratic root even when negative
    (`Test.hlsl:26`); irrelevant here (camera outside the sphere) and
    reproduced exactly for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def render_reference(height: int, width: int,
                     resolution=None) -> jnp.ndarray:
    """Render the reference test image, shape (height, width, 4) float32.

    ``resolution`` optionally overrides the (res_x, res_y) used for the uv
    mapping (to reproduce the reference's hard-coded-1080 quirk).
    """
    res_x, res_y = resolution if resolution is not None else (width, height)

    ys, xs = jnp.mgrid[0:height, 0:width]
    # HLSL SV_DispatchThreadID: x right, y down — same as array indexing.
    uv_x = (xs.astype(jnp.float32) / res_x) * 2.0 - 1.0
    uv_y = (ys.astype(jnp.float32) / res_y) * 2.0 - 1.0

    # Camera & sphere (`Test.hlsl:8-13`).
    cam = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    d = jnp.stack([uv_x, uv_y, -jnp.ones_like(uv_x)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    radius = 0.5

    # Quadratic (`Test.hlsl:16-21`): oc = cam - center = cam.
    oc = cam
    a = jnp.sum(d * d, axis=-1)
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc) - radius * radius
    disc = b * b - 4.0 * a * c

    # Hit branch (`Test.hlsl:24-32`): near root, even if negative.
    t = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a)
    p = cam + t[..., None] * d
    n = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    hit_rgb = n * 0.5 + 0.5

    miss_rgb = jnp.stack([uv_x, uv_y, jnp.zeros_like(uv_x)], axis=-1)

    rgb = jnp.where((disc > 0.0)[..., None], hit_rgb, miss_rgb)
    alpha = jnp.ones(rgb.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([rgb, alpha], axis=-1)


render_reference_jit = jax.jit(render_reference, static_argnums=(0, 1, 2))
