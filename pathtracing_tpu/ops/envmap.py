"""Image-based environment lighting (lat-long HDR maps) + sun-sky baker.

The reference's only "environment" is the miss-shading UV gradient
(`Test.hlsl:33-37`), mapped here as the static ``background`` modes in
``models/shading.background_radiance``. This module is the production
superset: an equirectangular (lat-long) HDR radiance map attached to the
scene, with luminance-proportional importance sampling and solid-angle
pdfs so next-event estimation and MIS treat the environment as a real
light source (the standard IBL formulation, e.g. PBRT §12.6).

TPU design notes:

- **Lookups are row gathers, not scatters.** ``radiance``/``pdf`` are a
  single ``take`` of (R,) rows from the flattened texel/pdf grids —
  the same op class as the binning permutation take that measures fine
  on TPU (PERF.md round-1 fact 1: *scatter-add* and XLA sort are the
  pathological ops, a straight ``take`` is ~11 ms at 262k rows).
- **CDF inversion is compare-and-sum, not searchsorted.** The sampled
  row/column index is ``sum(cdf < u)`` over a (R, Eh)/(R, Ew) broadcast
  — pure vectorized compares, no binary-search gather chains. Default
  grids (≤128×256) keep that matrix small.
- **The map is scene data** (``Scene.env``), so it shards/replicates
  with the rest of the scene pytree and traces through ``jit`` —
  engines need no new plumbing beyond ``models/shading.bounce_batch``.
- Sampling is **continuous** within a texel (the leftover CDF fraction
  re-parameterizes intra-texel position), so directions don't quantize
  to texel centers even though radiance lookups are nearest-texel.

Direction convention: +Y is up. ``v ∈ [0,1]`` maps to polar angle
``θ = vπ`` from +Y; ``u ∈ [0,1)`` maps to azimuth ``φ = (u-0.5)·2π``
with ``d = (sinθ·cosφ, cosθ, sinθ·sinφ)``.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * np.pi
_INV_4PI = 1.0 / (4.0 * np.pi)


class EnvMap(NamedTuple):
    """Device-side environment map (all f32)."""

    texels: jnp.ndarray     # (Eh, Ew, 3) radiance
    marg_cdf: jnp.ndarray   # (Eh,)   inclusive CDF over rows
    cond_cdf: jnp.ndarray   # (Eh, Ew) inclusive CDF within each row
    marg_pdf: jnp.ndarray   # (Eh,)   per-row selection probability
    cond_pdf: jnp.ndarray   # (Eh, Ew) per-texel in-row probability
    prob_map: jnp.ndarray   # (Eh, Ew) per-texel selection probability
    uniform: jnp.ndarray    # () f32: 1.0 when the map is black →
    #                         sampling falls back to uniform-sphere


def build_envmap(texels) -> EnvMap:
    """Host-side (NumPy) table build from a (Eh, Ew, 3) radiance grid.

    Selection weight per texel = luminance × sin θ (the sin θ folds the
    lat-long area distortion into the tables, so sampling is uniform
    per solid angle for a constant map).
    """
    tx = np.asarray(texels, np.float32)
    if tx.ndim != 3 or tx.shape[2] != 3:
        raise ValueError(f"envmap texels must be (H, W, 3); got {tx.shape}")
    eh, ew, _ = tx.shape
    lum = tx @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    theta = (np.arange(eh, dtype=np.float32) + 0.5) / eh * np.pi
    w = lum * np.sin(theta)[:, None]

    total = float(w.sum())
    uniform = total <= 0.0
    if uniform:
        w = np.ones_like(w) * np.sin(theta)[:, None]
        total = float(w.sum())

    row_w = w.sum(axis=1)
    marg_pdf = row_w / total
    marg_cdf = np.cumsum(marg_pdf)
    marg_cdf[-1] = 1.0

    safe_row = np.maximum(row_w, 1e-20)[:, None]
    cond_pdf = w / safe_row
    # Degenerate (all-zero) rows sample uniformly in azimuth.
    zero_rows = row_w <= 0.0
    cond_pdf[zero_rows] = 1.0 / ew
    cond_cdf = np.cumsum(cond_pdf, axis=1)
    cond_cdf[:, -1] = 1.0

    prob = (marg_pdf[:, None] * cond_pdf).astype(np.float32)

    return EnvMap(
        texels=jnp.asarray(tx),
        marg_cdf=jnp.asarray(marg_cdf.astype(np.float32)),
        cond_cdf=jnp.asarray(cond_cdf.astype(np.float32)),
        marg_pdf=jnp.asarray(marg_pdf.astype(np.float32)),
        cond_pdf=jnp.asarray(cond_pdf.astype(np.float32)),
        prob_map=jnp.asarray(prob),
        uniform=jnp.float32(1.0 if uniform else 0.0),
    )


def _texel_index(env: EnvMap, d):
    """Nearest texel (iy, ix) for unit directions d (..., 3)."""
    eh, ew = env.prob_map.shape
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    u = jnp.arctan2(d[..., 2], d[..., 0]) / _TWO_PI + 0.5
    iy = jnp.clip((v * eh).astype(jnp.int32), 0, eh - 1)
    ix = jnp.clip((u * ew).astype(jnp.int32), 0, ew - 1) % ew
    return iy, ix


def radiance(env: EnvMap, d):
    """Nearest-texel radiance lookup for directions d (..., 3)."""
    eh, ew = env.prob_map.shape
    iy, ix = _texel_index(env, d)
    flat = env.texels.reshape(eh * ew, 3)
    return jnp.take(flat, iy * ew + ix, axis=0)


def _pdf_from_prob(env: EnvMap, prob, sin_theta):
    """Exact solid-angle pdf: sampling is uniform in (u, v) within a
    texel and dω = 2π² sinθ du dv, so p(ω) = prob·EhEw/(2π² sinθ)
    evaluated at the actual direction (the PBRT formulation — no
    midpoint-rule dΩ approximation)."""
    eh, ew = env.prob_map.shape
    p = prob * (eh * ew) / (
        2.0 * jnp.pi * jnp.pi * jnp.maximum(sin_theta, 1e-4)
    )
    return jnp.where(env.uniform > 0.5, jnp.float32(_INV_4PI), p)


def pdf(env: EnvMap, d):
    """Solid-angle sampling pdf of :func:`sample` at directions d."""
    eh, ew = env.prob_map.shape
    iy, ix = _texel_index(env, d)
    prob = jnp.take(env.prob_map.reshape(-1), iy * ew + ix)
    sin_theta = jnp.sqrt(
        jnp.maximum(1.0 - d[..., 1] * d[..., 1], 0.0)
    )
    return _pdf_from_prob(env, prob, sin_theta)


def sample(env: EnvMap, u1, u2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Importance-sample directions ∝ luminance·sinθ.

    ``u1``/``u2``: (R,) uniforms. Returns (directions (R, 3), solid-angle
    pdf (R,)). Continuous inversion: the CDF leftovers re-parameterize
    the intra-texel offsets, so the returned direction varies smoothly
    with the input uniforms.
    """
    eh, ew = env.prob_map.shape
    u1 = jnp.asarray(u1, jnp.float32)
    u2 = jnp.asarray(u2, jnp.float32)

    iy = jnp.minimum(
        jnp.sum((env.marg_cdf[None, :] < u1[:, None]).astype(jnp.int32),
                axis=1),
        eh - 1,
    )
    cdf_lo_y = jnp.take(
        jnp.concatenate([jnp.zeros(1, jnp.float32), env.marg_cdf[:-1]]), iy
    )
    p_y = jnp.maximum(jnp.take(env.marg_pdf, iy), 1e-20)
    fy = jnp.clip((u1 - cdf_lo_y) / p_y, 0.0, 1.0 - 1e-6)

    row_cdf = jnp.take(env.cond_cdf, iy, axis=0)        # (R, Ew)
    ix = jnp.minimum(
        jnp.sum((row_cdf < u2[:, None]).astype(jnp.int32), axis=1),
        ew - 1,
    )
    row_cdf_pad = jnp.concatenate(
        [jnp.zeros((row_cdf.shape[0], 1), jnp.float32), row_cdf[:, :-1]],
        axis=1,
    )
    cdf_lo_x = jnp.take_along_axis(row_cdf_pad, ix[:, None], axis=1)[:, 0]
    p_x = jnp.maximum(
        jnp.take_along_axis(
            jnp.take(env.cond_pdf, iy, axis=0), ix[:, None], axis=1
        )[:, 0],
        1e-20,
    )
    fx = jnp.clip((u2 - cdf_lo_x) / p_x, 0.0, 1.0 - 1e-6)

    theta = (iy.astype(jnp.float32) + fy) / eh * jnp.pi
    phi = ((ix.astype(jnp.float32) + fx) / ew - 0.5) * _TWO_PI
    st, ct = jnp.sin(theta), jnp.cos(theta)
    d = jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], axis=-1)

    prob = jnp.take(env.prob_map.reshape(-1), iy * ew + ix)
    p = _pdf_from_prob(env, prob, st)

    # Black map: uniform sphere via the same two uniforms.
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi_u = _TWO_PI * u2
    d_uni = jnp.stack([r * jnp.cos(phi_u), z, r * jnp.sin(phi_u)], axis=-1)
    is_uni = env.uniform > 0.5
    d = jnp.where(is_uni[None], d_uni, d)
    return d, p


# --- Procedural sun-sky baker (host-side) -------------------------------


def sky_texels(width: int = 256, height: int = 128,
               sun_direction=(0.35, 0.65, 0.2),
               sun_radiance=(2500.0, 2300.0, 2000.0),
               sun_angular_radius: float = 0.00935,
               zenith=(0.20, 0.45, 1.0), horizon=(0.85, 0.90, 1.0),
               ground=(0.25, 0.22, 0.20), sky_scale: float = 1.0):
    """Bake a simple analytic sun-sky into a lat-long grid (NumPy).

    One code path serves both procedural skies and file-loaded HDRs: the
    baked grid goes through the same :func:`build_envmap` tables, so the
    sun disc is importance-sampled like any bright texel. The model is a
    zenith→horizon gradient + a smooth-edged sun disc (~0.27° half-angle
    by default, like the real sun) + a constant ground hemisphere — not
    a spectral Preetham/Hosek fit, but the structure (HDR disc 4-5
    orders brighter than the sky) is what exercises the sampler.
    """
    sd = np.asarray(sun_direction, np.float64)
    sd = sd / np.linalg.norm(sd)
    v = (np.arange(height, dtype=np.float64) + 0.5) / height
    u = (np.arange(width, dtype=np.float64) + 0.5) / width
    theta = v * np.pi
    phi = (u - 0.5) * _TWO_PI
    st = np.sin(theta)[:, None]
    dirs = np.stack(
        [st * np.cos(phi)[None, :],
         np.broadcast_to(np.cos(theta)[:, None], (height, width)),
         st * np.sin(phi)[None, :]],
        axis=-1,
    )

    y = dirs[..., 1]
    t = np.clip(y, 0.0, 1.0) ** 0.45
    sky = ((1.0 - t[..., None]) * np.asarray(horizon)
           + t[..., None] * np.asarray(zenith)) * sky_scale
    grd = np.broadcast_to(np.asarray(ground), sky.shape) * sky_scale
    img = np.where(y[..., None] >= 0.0, sky, grd)

    cos_sun = np.clip((dirs * sd).sum(-1), -1.0, 1.0)
    ang = np.arccos(cos_sun)
    disc = np.clip(
        (sun_angular_radius - ang) / (0.25 * sun_angular_radius) + 1.0,
        0.0, 1.0,
    )
    img = img + disc[..., None] * np.asarray(sun_radiance)
    return img.astype(np.float32)


# --- Radiance .hdr (RGBE) IO -------------------------------------------
#
# Minimal self-contained reader/writer for the Radiance picture format
# (Ward's RGBE encoding): enough to load standard equirect HDR probes
# (both flat and adaptive-RLE scanlines) and to round-trip our own.


def _rgbe_encode(img: np.ndarray) -> np.ndarray:
    maxc = img.max(axis=-1)
    valid = maxc >= 1e-32
    m, e = np.frexp(np.maximum(maxc, 1e-32))
    exp = np.where(valid, e, 0)
    mant = np.where(valid, m, 0.0)
    scale = mant * 256.0 / np.maximum(maxc, 1e-32)
    rgbe = np.zeros(img.shape[:-1] + (4,), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, exp + 128, 0).astype(np.uint8)
    return rgbe


def _rgbe_decode(rgbe: np.ndarray) -> np.ndarray:
    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(
        exp > 0, np.ldexp(1.0, exp - 136).astype(np.float32), 0.0
    )
    # +0.5 mantissa centering (Ward's convention): halves the
    # truncation error of the 8-bit mantissa.
    return (rgbe[..., :3].astype(np.float32) + 0.5) * scale[..., None]


def write_hdr(path: str, img) -> None:
    """Write (H, W, 3) linear radiance as a flat-scanline .hdr file."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(_rgbe_encode(img).tobytes())


def load_hdr(path: str) -> np.ndarray:
    """Read a Radiance .hdr file → (H, W, 3) f32 linear radiance."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance HDR file")
    pos = data.index(b"\n\n") + 2
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].split()
    if len(dims) != 4 or dims[0] != b"-Y" or dims[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {dims}")
    h, w = int(dims[1]), int(dims[3])
    body = np.frombuffer(data, np.uint8, offset=eol + 1)

    # Flat scanlines?
    if body.size == h * w * 4:
        first = body[:4]
        if not (first[0] == 2 and first[1] == 2 and
                (int(first[2]) << 8 | int(first[3])) == w):
            return _rgbe_decode(body.reshape(h, w, 4))
    # Adaptive RLE scanlines (each starts 0x02 0x02 w_hi w_lo).
    out = np.empty((h, w, 4), np.uint8)
    p = 0
    for row in range(h):
        if p + 4 > body.size:
            raise ValueError(f"{path}: truncated at scanline {row}")
        hdr4 = body[p:p + 4]
        if not (hdr4[0] == 2 and hdr4[1] == 2):
            # Old-style flat remainder.
            rest = body[p:]
            need = (h - row) * w * 4
            if rest.size < need:
                raise ValueError(f"{path}: truncated flat data")
            out[row:] = rest[:need].reshape(h - row, w, 4)
            return _rgbe_decode(out)
        if (int(hdr4[2]) << 8 | int(hdr4[3])) != w:
            raise ValueError(f"{path}: scanline width mismatch")
        p += 4
        for c in range(4):
            col = 0
            while col < w:
                n = int(body[p])
                if n > 128:  # run
                    out[row, col:col + n - 128, c] = body[p + 1]
                    col += n - 128
                    p += 2
                else:        # literal
                    out[row, col:col + n, c] = body[p + 1:p + 1 + n]
                    col += n
                    p += 1 + n
    return _rgbe_decode(out)


def load_environment(spec, base_dir: str = ".") -> Optional[EnvMap]:
    """Build an EnvMap from a scene-JSON ``environment`` spec.

    Accepted forms (see models/scene_io.py docstring):
      {"image": "probe.hdr", "scale": 1.0, "rotate_degrees": 0}
      {"sky": {...sky_texels kwargs...}}
      {"uniform": [r, g, b], "resolution": [h, w]}
    """
    if spec is None:
        return None
    scale = float(spec.get("scale", 1.0))
    if "image" in spec:
        path = spec["image"]
        if not os.path.isabs(path):
            path = os.path.join(base_dir, path)
        tx = load_hdr(path) * scale
    elif "sky" in spec:
        tx = sky_texels(**spec["sky"]) * scale
    elif "uniform" in spec:
        h, w = spec.get("resolution", (16, 32))
        tx = np.broadcast_to(
            np.asarray(spec["uniform"], np.float32), (int(h), int(w), 3)
        ).copy() * scale
    else:
        raise ValueError(f"unknown environment spec: {spec}")
    rot = float(spec.get("rotate_degrees", 0.0))
    if rot:
        shift = int(round(rot / 360.0 * tx.shape[1])) % tx.shape[1]
        tx = np.roll(tx, shift, axis=1)
    return build_envmap(tx)
