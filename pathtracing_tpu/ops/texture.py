"""Image textures: a padded atlas + bilinear/trilinear UV sampling.

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

    texels: (N, H, Wp, 3) f32 — padded to the largest texture; padding
            texels are 0 and never sampled (per-texture wrap uses the
            true size below). With mips, level 0 occupies [:, :h, :w]
            and levels >= 1 stack top-down in a right-hand column
            (x >= W), addressed through ``mip_table``.
    size:   (N, 2) i32 — (height, width) actually used per texture
            (level 0).
    mip_table: (N, L, 4) i32 — per (texture, level) placement rows
            (y0, x0, h, w), or None for a bilinear-only atlas (the
            feature gate: mip-free scenes keep the old array shapes and
            jit graphs bit-for-bit). Textures whose pyramid is shorter
            than L repeat their 1x1 tail row, so any clamped LOD is
            valid for every texture.
    """

    texels: jnp.ndarray
    size: jnp.ndarray
    mip_table: jnp.ndarray = None


def _downsample2(im: np.ndarray) -> np.ndarray:
    """One box-filtered mip halving (host-side). Odd trailing rows/cols
    are dropped — the standard floor-halving pyramid."""
    h, w = im.shape[:2]
    nh, nw = max(1, h // 2), max(1, w // 2)
    a = im[0:2 * nh:2, 0:2 * nw:2]
    b = im[1:2 * nh:2, 0:2 * nw:2] if h > 1 else a
    c = im[0:2 * nh:2, 1:2 * nw:2] if w > 1 else a
    d = (im[1:2 * nh:2, 1:2 * nw:2] if (h > 1 and w > 1)
         else (b if h > 1 else c))
    return ((a + b + c + d) * 0.25).astype(np.float32)


def build_atlas(images: Sequence[np.ndarray],
                mips: bool = False) -> TextureAtlas:
    """Pack host images ((H, W, 3) float arrays, any sizes) into one
    padded atlas. Call once per scene (host-side, NumPy).

    With ``mips``, each texture also gets a box-filtered pyramid down to
    1x1, packed into a right-hand column (+<=50% width — the stacked
    level heights sum to < h, so no extra rows), and the atlas carries a
    ``mip_table`` for ``sample_trilinear``. Without it the arrays are
    bit-identical to the pre-mip layout (the feature gate).
    """
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
    size = np.zeros((len(imgs), 2), np.int32)
    for i, im in enumerate(imgs):
        size[i] = (im.shape[0], im.shape[1])
    if not mips:
        texels = np.zeros((len(imgs), h, w, 3), np.float32)
        for i, im in enumerate(imgs):
            texels[i, : im.shape[0], : im.shape[1]] = im
        return TextureAtlas(texels=jnp.asarray(texels),
                            size=jnp.asarray(size))

    pyramids: List[List[np.ndarray]] = []
    for im in imgs:
        levels = [im]
        while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
            levels.append(_downsample2(levels[-1]))
        pyramids.append(levels)
    n_levels = max(len(p) for p in pyramids)
    pad_w = max(max(1, im.shape[1] // 2) for im in imgs)
    texels = np.zeros((len(imgs), h, w + pad_w, 3), np.float32)
    table = np.zeros((len(imgs), n_levels, 4), np.int32)
    for i, levels in enumerate(pyramids):
        texels[i, : levels[0].shape[0], : levels[0].shape[1]] = levels[0]
        table[i, 0] = (0, 0, levels[0].shape[0], levels[0].shape[1])
        y = 0
        for li, lv in enumerate(levels[1:], start=1):
            texels[i, y: y + lv.shape[0], w: w + lv.shape[1]] = lv
            table[i, li] = (y, w, lv.shape[0], lv.shape[1])
            y += lv.shape[0]
        # Short pyramids repeat their 1x1 tail for the clamp range.
        for li in range(len(levels), n_levels):
            table[i, li] = table[i, len(levels) - 1]
    return TextureAtlas(texels=jnp.asarray(texels),
                        size=jnp.asarray(size),
                        mip_table=jnp.asarray(table))


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


def add_mips(atlas: TextureAtlas) -> TextureAtlas:
    """Rebuild an existing bilinear-only atlas with a mip pyramid — the
    CLI's ``--mips`` retrofit for scenes whose builder didn't opt in.
    The padded atlas stores exact originals at [:h, :w] (padding is
    zeros, never sampled), so cropping recovers every source image
    bit-for-bit. Host-side, once per scene."""
    if atlas.mip_table is not None:
        return atlas
    tex = np.asarray(atlas.texels)
    size = np.asarray(atlas.size)
    imgs = [tex[i, : size[i, 0], : size[i, 1]]
            for i in range(tex.shape[0])]
    return build_atlas(imgs, mips=True)


def _sample_level(atlas: TextureAtlas, tid, uv, level) -> jnp.ndarray:
    """Bilinear lookup at a per-ray mip level: tid (R,) i32 (already
    clamped), uv (R, 2) f32, level (R,) i32 in [0, L). One extra (R, 4)
    gather into ``mip_table`` resolves the level's placement; the texel
    math is ``sample_bilinear``'s with offset/size taken from the row
    (level 0 rows are (0, 0, h, w), so this reproduces
    ``sample_bilinear`` bit-for-bit at lod 0)."""
    row = atlas.mip_table[tid, level]
    y_off = row[:, 0]
    x_off = row[:, 1]
    th = row[:, 2].astype(jnp.float32)
    tw = row[:, 3].astype(jnp.float32)

    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * tw - 0.5
    y = (1.0 - v) * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    hi = jnp.maximum(th, 1.0).astype(jnp.int32)
    wi = jnp.maximum(tw, 1.0).astype(jnp.int32)

    def texel(yi, xi):
        yw = y_off + jnp.mod(yi.astype(jnp.int32), hi)
        xw = x_off + jnp.mod(xi.astype(jnp.int32), wi)
        return atlas.texels[tid, yw, xw]

    c00 = texel(y0, x0)
    c01 = texel(y0, x0 + 1.0)
    c10 = texel(y0 + 1.0, x0)
    c11 = texel(y0 + 1.0, x0 + 1.0)
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sample_trilinear(atlas: TextureAtlas, tex_id, uv,
                     lod_base) -> jnp.ndarray:
    """Trilinear (mip-interpolated) lookup. ``lod_base`` (R,) f32 is
    log2 of the ray's footprint in UV units (world footprint x the
    hit triangle's UV-per-world density, ``scene.surface_attributes``);
    the per-texture resolution term (0.5*log2(h*w), isotropic) is added
    here, where the texture's true size is already gathered. Atlases
    without mips fall back to plain bilinear (lod is meaningless there).
    """
    if atlas.mip_table is None:
        return sample_bilinear(atlas, tex_id, uv)
    n = atlas.texels.shape[0]
    n_levels = atlas.mip_table.shape[1]
    tid = jnp.clip(tex_id, 0, n - 1)
    th = atlas.size[tid, 0].astype(jnp.float32)
    tw = atlas.size[tid, 1].astype(jnp.float32)
    lod = lod_base + 0.5 * jnp.log2(jnp.maximum(th * tw, 1.0))
    lod = jnp.clip(lod, 0.0, jnp.float32(n_levels - 1))
    l0 = jnp.floor(lod)
    f = (lod - l0)[:, None]
    l0i = l0.astype(jnp.int32)
    l1i = jnp.minimum(l0i + 1, n_levels - 1)
    c0 = _sample_level(atlas, tid, uv, l0i)
    c1 = _sample_level(atlas, tid, uv, l1i)
    return c0 * (1.0 - f) + c1 * f


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
