"""Tonemapping and image output — the TPU-native "present" path.

The reference presents via a fullscreen-quad blit to a swapchain
(`Renderer.cs:1042-1121`, `PixelShader.hlsl:8-19`); TPUs have no display
engine, so presenting is: tonemap on device (fused into the render step) →
one HBM→host transfer → PNG/PPM bytes. The PNG encoder is pure stdlib
(zlib + struct) so the framework has zero imaging dependencies.
"""

from __future__ import annotations

import functools
import struct
import zlib

import jax
import jax.numpy as jnp
import numpy as np


def linear_to_srgb(rgb):
    """IEC 61966-2-1 opto-electronic transfer (proper sRGB, not gamma-2)."""
    rgb = jnp.clip(rgb, 0.0, 1.0)
    lo = rgb * 12.92
    hi = 1.055 * jnp.power(jnp.maximum(rgb, 1e-7), 1.0 / 2.4) - 0.055
    return jnp.where(rgb <= 0.0031308, lo, hi)


def aces_film(rgb):
    """ACES filmic curve (Narkowicz 2015 RRT+ODT fit): the standard
    highlight-rolloff tone curve — bright areas compress smoothly into
    white instead of clipping, mids get a gentle S-curve. Input linear
    scene radiance, output linear display [0, 1] (sRGB OETF applied
    afterwards by the caller)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    rgb = jnp.maximum(rgb, 0.0)
    return jnp.clip(
        (rgb * (a * rgb + b)) / (rgb * (c * rgb + d) + e), 0.0, 1.0
    )


def reinhard(rgb):
    """Extended Reinhard, luminance-based: L/(1+L) applied as a ratio so
    hues stay fixed while highlights roll off — the classic soft
    operator (Reinhard et al. 2002)."""
    rgb = jnp.maximum(rgb, 0.0)
    lum = (0.2126 * rgb[..., 0:1] + 0.7152 * rgb[..., 1:2]
           + 0.0722 * rgb[..., 2:3])
    return jnp.clip(rgb / (1.0 + lum), 0.0, 1.0)


def filmic_hable(rgb):
    """Hable "Uncharted 2" filmic curve with white-point normalization
    (W = 11.2): deeper toe (crunchier blacks) than ACES, popular for
    stylized output. Input linear radiance, output linear display."""
    A, B, C, D, E, F = 0.15, 0.50, 0.20, 0.20, 0.02, 0.30

    def curve(x):
        return ((x * (A * x + C * B) + D * E)
                / (x * (A * x + B) + D * F)) - E / F

    rgb = jnp.maximum(rgb, 0.0)
    white = curve(jnp.float32(11.2))
    return jnp.clip(curve(2.0 * rgb) / white, 0.0, 1.0)


_CURVES = {"aces": aces_film, "reinhard": reinhard, "filmic": filmic_hable}


@functools.partial(jax.jit, static_argnames=("curve",))
def tonemap(linear_rgb, exposure=1.0, curve: str = "clip"):
    """Linear HDR radiance → uint8 sRGB (device-side; one op before host
    transfer, replacing the reference's blit+swapchain).

    ``exposure`` scales radiance before the tone curve; ``curve`` is
    "clip" (plain clamp at 1 — the reference swapchain's behavior),
    "aces" (filmic highlight rolloff), "reinhard" (luminance-ratio
    L/(1+L), hue-preserving), or "filmic" (Hable Uncharted-2 toe, white
    point 11.2). Quantization is dithered with a
    deterministic per-pixel hash so smooth radial/linear gradients
    don't contour into visible bands at 8 bits (converged renders are
    noise-free enough to show them)."""
    linear_rgb = linear_rgb * exposure
    if curve in _CURVES:
        linear_rgb = _CURVES[curve](linear_rgb)
    srgb = linear_to_srgb(linear_rgb)
    if srgb.ndim == 3:
        h, w, _ = srgb.shape
        ys = jax.lax.broadcasted_iota(jnp.uint32, (h, w, 1), 0)
        xs = jax.lax.broadcasted_iota(jnp.uint32, (h, w, 1), 1)
        cs = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, srgb.shape[2]), 2)
        key = (ys * jnp.uint32(0x9E3779B1)
               ^ xs * jnp.uint32(0x85EBCA77)
               ^ cs * jnp.uint32(0xC2B2AE3D))
        key = key ^ (key >> 15)
        key = key * jnp.uint32(0x2C1B3C6D)
        key = key ^ (key >> 12)
        dither = (key & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
    else:
        dither = 0.5
    return jnp.clip(srgb * 255.0 + dither, 0.0, 255.0).astype(jnp.uint8)


def encode_png(rgb8: np.ndarray) -> bytes:
    """Minimal RGB8 PNG encoder (stdlib only). rgb8: (H, W, 3) uint8."""
    rgb8 = np.asarray(rgb8, np.uint8)
    h, w, c = rgb8.shape
    assert c == 3, "encode_png expects (H, W, 3) uint8"

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # Filter byte 0 (None) per scanline.
    raw = b"".join(b"\x00" + rgb8[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Minimal decoder for images produced by ``encode_png`` (tests only).

    Supports 8-bit RGB, filter 0 scanlines, single IDAT stream.
    """
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, *_ = struct.unpack(">IIBBBBB", payload)
            assert depth == 8 and color == 2, "decoder supports RGB8 only"
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        assert row[0] == 0, "decoder supports filter 0 only"
        rows.append(np.frombuffer(row[1:], np.uint8))
    return np.stack(rows).reshape(h, w, 3)


def write_png(path: str, linear_rgb, exposure=1.0,
              curve: str = "clip") -> None:
    """Tonemap + encode + write in one call."""
    rgb8 = np.asarray(jax.device_get(
        tonemap(jnp.asarray(linear_rgb), exposure, curve)
    ))
    with open(path, "wb") as f:
        f.write(encode_png(rgb8))


def write_image(path: str, linear_rgb, exposure=1.0,
                curve: str = "clip") -> None:
    """Format-dispatching writer: ``.hdr`` paths get LINEAR Radiance
    RGBE output (exposure applied, no tone curve — the archival /
    compositing format; ``ops.envmap.load_hdr`` round-trips it),
    ``.exr`` linear float32 OpenEXR (``utils.exr``, the compositing
    standard — full float precision, no RGBE mantissa sharing),
    ``.ppm`` the zero-dependency raster, anything else tonemapped
    PNG."""
    low = path.lower()
    if low.endswith(".hdr"):
        from pathtracing_tpu.ops.envmap import write_hdr

        img = np.asarray(jax.device_get(jnp.asarray(linear_rgb)))
        write_hdr(path, img[..., :3] * float(exposure))
    elif low.endswith(".exr"):
        from pathtracing_tpu.utils.exr import write_exr

        img = np.asarray(jax.device_get(jnp.asarray(linear_rgb)))
        write_exr(path, img[..., :3] * float(exposure))
    elif low.endswith(".ppm"):
        write_ppm(path, linear_rgb)
    else:
        write_png(path, linear_rgb, exposure, curve)


def write_ppm(path: str, linear_rgb) -> None:
    """Plain PPM (P6) writer — the zero-dependency fallback format."""
    rgb8 = np.asarray(jax.device_get(tonemap(jnp.asarray(linear_rgb))))
    h, w, _ = rgb8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(rgb8.tobytes())


def rmse(a, b) -> float:
    """Per-pixel RMSE between two linear images (the BASELINE.json metric)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))
