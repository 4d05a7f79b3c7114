"""Image textures: a padded atlas + bilinear UV sampling.

The reference has no texturing of any kind (its one material is
"shade by normal", `Test.hlsl:26-32`); this is north-star framework
capability. TPU-native shape: all textures live in ONE padded
(N, H, W, 3) device array so the per-ray lookup is a single dynamic
gather — no per-texture branching, no ragged shapes, and the gather is
feature-gated at trace time (scenes without textures never pay it;
PERF.md round-1 fact #1: XLA gathers are fine, only scatter-add and
sort are pathological).

Conventions:
  * UV origin is BOTTOM-left (OBJ ``vt`` convention); image row 0 is the
    top, so the sampler flips v.
  * Wrap mode is repeat on both axes.
  * Texels are linear radiance/reflectance. ``load_texture`` converts
    8-bit sRGB PNGs/JPEGs to linear; ``.hdr``/``.npy`` pass through.
  * Texture colors MODULATE the material's albedo (set albedo to white
    for the texture alone), so one map can tint diffuse and glossy lobes
    alike.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class TextureAtlas(NamedTuple):
    """Device arrays for every texture in a scene.

    texels: (N, H, W, 3) f32 — padded to the largest texture; padding
            texels are 0 and never sampled (per-texture wrap uses the
            true size below).
    size:   (N, 2) i32 — (height, width) actually used per texture.
    """

    texels: jnp.ndarray
    size: jnp.ndarray


def build_atlas(images: Sequence[np.ndarray]) -> TextureAtlas:
    """Pack host images ((H, W, 3) float arrays, any sizes) into one
    padded atlas. Call once per scene (host-side, NumPy)."""
    if not images:
        raise ValueError("build_atlas needs at least one image")
    imgs: List[np.ndarray] = []
    for im in images:
        a = np.asarray(im, np.float32)
        if a.ndim == 2:
            a = np.repeat(a[:, :, None], 3, axis=2)
        if a.ndim != 3 or a.shape[2] < 3:
            raise ValueError(f"texture must be (H, W, 3); got {a.shape}")
        imgs.append(np.ascontiguousarray(a[:, :, :3]))
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)
    texels = np.zeros((len(imgs), h, w, 3), np.float32)
    size = np.zeros((len(imgs), 2), np.int32)
    for i, im in enumerate(imgs):
        texels[i, : im.shape[0], : im.shape[1]] = im
        size[i] = (im.shape[0], im.shape[1])
    return TextureAtlas(texels=jnp.asarray(texels), size=jnp.asarray(size))


def sample_bilinear(atlas: TextureAtlas, tex_id, uv) -> jnp.ndarray:
    """Bilinear lookup: tex_id (R,) i32 (clamped in-bounds; callers mask
    rows with tex_id < 0), uv (R, 2) f32. Returns (R, 3) linear color.

    Repeat wrap; the v axis flips so uv (0,0) is the image's bottom-left.
    Four gathers into the atlas — pure XLA, no kernel needed.
    """
    n = atlas.texels.shape[0]
    tid = jnp.clip(tex_id, 0, n - 1)
    th = atlas.size[tid, 0].astype(jnp.float32)
    tw = atlas.size[tid, 1].astype(jnp.float32)

    u = uv[:, 0] - jnp.floor(uv[:, 0])      # repeat wrap to [0, 1)
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    # Texel-center sampling: uv 0.5/w hits texel 0's center exactly.
    x = u * tw - 0.5
    y = (1.0 - v) * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def texel(yi, xi):
        yw = jnp.mod(yi.astype(jnp.int32), jnp.maximum(th, 1.0).astype(jnp.int32))
        xw = jnp.mod(xi.astype(jnp.int32), jnp.maximum(tw, 1.0).astype(jnp.int32))
        return atlas.texels[tid, yw, xw]

    c00 = texel(y0, x0)
    c01 = texel(y0, x0 + 1.0)
    c10 = texel(y0 + 1.0, x0)
    c11 = texel(y0 + 1.0, x0 + 1.0)
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def srgb_to_linear(img: np.ndarray) -> np.ndarray:
    """Exact sRGB EOTF (host-side, for 8-bit image ingestion)."""
    img = np.asarray(img, np.float32)
    lo = img / 12.92
    hi = np.power((img + 0.055) / 1.055, 2.4, dtype=np.float32)
    return np.where(img <= 0.04045, lo, hi).astype(np.float32)


def load_texture(path: str, srgb: bool = True) -> np.ndarray:
    """Load an image file as a linear (H, W, 3) f32 texture.

    ``.hdr`` (Radiance RGBE) and ``.npy`` are already linear; 8-bit
    formats (PNG/JPEG via Pillow) are converted from sRGB unless
    ``srgb=False`` (normal maps store unit-vector components scaled to
    [0, 1] — DATA, not color; the EOTF would bend every direction).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".hdr":
        from pathtracing_tpu.ops import envmap

        return envmap.load_hdr(path)
    if ext == ".npy":
        return np.asarray(np.load(path), np.float32)
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    return srgb_to_linear(arr) if srgb else arr
