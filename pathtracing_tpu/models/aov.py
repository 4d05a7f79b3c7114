"""AOV (arbitrary output variable) passes: normal / depth / albedo / id.

The reference's entire shading capability is "color the first hit by its
surface normal" (`Test.hlsl:26-32`). That becomes one of several
single-bounce diagnostic passes here — the production analogues of a
renderer's feature buffers (used for denoisers, compositing, and debug),
generalized to every scene/traversal backend the framework supports.

Each pass is one batched closest-hit query + elementwise shading; misses
show the configured background.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.models import shading
from pathtracing_tpu.ops import materials
from pathtracing_tpu.utils.config import RenderConfig

AOV_KINDS = ("normal", "depth", "albedo", "mat_id", "uv")


@functools.partial(jax.jit, static_argnames=("config", "kind"))
def render_aov(scene, camera, config: RenderConfig, kind: str):
    """One AOV image (H, W, 3) f32 in [0, 1] (depth normalized by its
    in-frame max; mat_id as a categorical color ramp)."""
    if kind not in AOV_KINDS:
        raise ValueError(f"unknown AOV {kind!r}; have {AOV_KINDS}")
    h, w = config.height, config.width
    pix = jnp.arange(h * w, dtype=jnp.int32)
    _, origin, direction = jax.vmap(
        lambda p: shading.camera_sample(
            camera, config, jnp.uint32(config.seed), p, jnp.int32(0)
        )
    )(pix)

    hit = scene_mod.intersect_batch(
        scene, origin, direction, config.resolve_traversal(scene)
    )
    bg = shading.background_radiance(direction, config.background)

    # Surface attributes (smooth shading normals / UV textures) feed the
    # feature buffers exactly as they feed the integrator, so the guided
    # denoiser sees the same normals the shading used.
    uv = None
    if scene.attr_shn is not None or scene.textures is not None:
        s_normal, uv = scene_mod.surface_attributes(scene, hit)
        if scene.attr_shn is not None:
            hit = hit._replace(normal=s_normal)

    if kind == "normal":
        # The reference's shade: color = n * 0.5 + 0.5 (`Test.hlsl:32`).
        img = jnp.where(
            hit.valid[:, None], hit.normal * 0.5 + 0.5, bg
        )
    elif kind == "uv":
        if uv is None:
            uv = jnp.zeros((h * w, 2), jnp.float32)
        img = jnp.where(
            hit.valid[:, None],
            jnp.stack(
                [uv[:, 0] % 1.0, uv[:, 1] % 1.0, jnp.zeros(h * w)], axis=-1
            ),
            bg,
        )
    elif kind == "depth":
        t = jnp.where(hit.valid, hit.t, 0.0)
        t_max = jnp.maximum(jnp.max(t), 1e-6)
        img = jnp.where(
            hit.valid[:, None], (1.0 - t / t_max)[:, None]
            * jnp.ones((1, 3), jnp.float32), bg,
        )
    elif kind == "albedo":
        mtype, alb, par, emit = materials.gather(
            scene.material_table, hit.mat_id
        )
        alb = materials.effective_albedo(
            mtype, alb, par, emit, hit.position
        )
        emit = materials.effective_emission(mtype, emit)
        if scene.textures is not None and uv is not None:
            from pathtracing_tpu.ops import texture as texture_ops

            tex_id = scene.mat_tex[
                jnp.clip(hit.mat_id, 0, scene.mat_tex.shape[0] - 1)
            ]
            tex_rgb = texture_ops.sample_bilinear(scene.textures, tex_id, uv)
            alb = jnp.where(
                ((tex_id >= 0) & hit.valid)[:, None], alb * tex_rgb, alb
            )
        # Emitters display as (clipped) white in the albedo pass.
        img = jnp.where(hit.valid[:, None], jnp.clip(alb + emit, 0.0, 1.0),
                        bg)
    else:  # mat_id — categorical ramp via golden-ratio hue stepping
        k = hit.mat_id.astype(jnp.float32)
        hue = (k * 0.61803398875) % 1.0
        # Cheap HSV(h, 0.65, 0.95) -> RGB.
        i = jnp.floor(hue * 6.0)
        f = hue * 6.0 - i
        v, s = 0.95, 0.65
        p, q, tt = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
        i = i.astype(jnp.int32) % 6
        r = jnp.select(
            [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
            [v, q, p, p, tt, v],
        )
        g = jnp.select(
            [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
            [tt, v, v, q, p, p],
        )
        b = jnp.select(
            [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
            [p, p, tt, v, v, q],
        )
        img = jnp.where(
            hit.valid[:, None], jnp.stack([r, g, b], axis=-1), bg
        )

    return img.reshape(h, w, 3)
