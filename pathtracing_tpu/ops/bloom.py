"""Bloom post-process: soft-knee bright pass + Gaussian mip pyramid.

The reference has no post-processing at all (its present path is a raw
blit, `RayTracing/Graphics/Renderer.cs:1042-1121`); bloom is part of the
production "present" feature set this framework provides on top. It runs
in LINEAR radiance before the tone curve, as a physically-motivated glow:
energy above a luminance threshold is extracted with a soft knee
(quadratic below the threshold so the cut is C1-continuous), blurred at
several octaves of a binomial-Gaussian pyramid, and added back scaled by
``strength``.

TPU mapping: every stage is static-shape stencil work — 5-tap separable
binomial blurs via padded slices (the same shifted-slice pattern as
``ops/denoise.py``, fully fusable on the VPU), 2x decimation by strided
slicing after the prefilter, and bilinear 2x upsampling. No gathers, no
data-dependent shapes; the whole pyramid jits into one program, so the
cost is negligible next to a render step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_KERNEL5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _blur5(img):
    """Separable 5-tap binomial blur, edge-replicated borders."""
    h, w = img.shape[0], img.shape[1]
    pad = jnp.pad(img, ((2, 2), (0, 0), (0, 0)), mode="edge")
    img = sum(k * jax.lax.dynamic_slice_in_dim(pad, i, h, axis=0)
              for i, k in enumerate(_KERNEL5))
    pad = jnp.pad(img, ((0, 0), (2, 2), (0, 0)), mode="edge")
    return sum(k * jax.lax.dynamic_slice_in_dim(pad, i, w, axis=1)
               for i, k in enumerate(_KERNEL5))


def _upsample2(img):
    """Bilinear 2x upsample (static output shape)."""
    h, w, c = img.shape
    return jax.image.resize(img, (2 * h, 2 * w, c), method="linear")


def _bright_pass(img, threshold: float, knee: float):
    """Soft-knee high-pass (Jimenez-style): full contribution above
    ``threshold``, quadratic ramp in [threshold - knee, threshold], zero
    below — scales the COLOR so hue is preserved."""
    lum = (0.2126 * img[..., 0] + 0.7152 * img[..., 1]
           + 0.0722 * img[..., 2])
    knee = max(knee, 1e-4)
    soft = jnp.clip(lum - threshold + knee, 0.0, 2.0 * knee)
    soft = soft * soft / (4.0 * knee)
    weight = jnp.maximum(soft, lum - threshold) / jnp.maximum(lum, 1e-6)
    return img * weight[..., None]


def num_levels(height: int, width: int, cap: int = 6) -> int:
    """Pyramid depth: halve until the short side would drop under ~8 px."""
    side = min(height, width)
    n = 0
    while side >= 16 and n < cap:
        side //= 2
        n += 1
    return max(n, 1)


@functools.partial(jax.jit, static_argnames=("threshold", "knee", "levels"))
def bloom_layer(img, threshold: float = 1.0, knee: float = 0.5,
                levels: int | None = None):
    """The normalized glow layer (same shape as ``img``), NOT yet scaled
    or added — callers do ``img + strength * bloom_layer(img)``.

    Progressive down/up chain: bright pass → L× (blur + 2x decimate) →
    coarsest up, adding each finer level back in — coarse octaves ride
    through every upsample, producing the long smooth halo. The sum is
    divided by the level count so ``strength`` has a scale-free meaning.
    """
    h, w, _ = img.shape
    if levels is None:
        levels = num_levels(h, w)
    # Edge-pad to a multiple of 2^levels so every decimation is exact.
    mult = 1 << levels
    ph = (-h) % mult
    pw = (-w) % mult
    base = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    down = [_bright_pass(base, threshold, knee)]
    for _ in range(levels):
        down.append(_blur5(down[-1])[::2, ::2])
    up = down[-1]
    for lvl in range(levels - 1, -1, -1):
        up = _blur5(_upsample2(up)) + down[lvl]
    return up[:h, :w] / float(levels + 1)


def apply_bloom(img, strength: float, threshold: float = 1.0,
                knee: float = 0.5):
    """``img + strength * glow`` in linear radiance. ``strength`` 0 is a
    true no-op (no pyramid is built)."""
    if strength <= 0.0:
        return img
    img = jnp.asarray(img)
    return img + jnp.float32(strength) * bloom_layer(
        img, threshold=float(threshold), knee=float(knee)
    )
