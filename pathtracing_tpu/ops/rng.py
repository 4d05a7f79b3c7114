"""Counter-based RNG for reproducible Monte Carlo rendering.

The reference has no RNG at all (one deterministic primary ray per pixel,
`Test.hlsl:4-10`); the progressive path tracer needs one. Keys are derived
purely from ``(seed, pixel_index, sample_index, bounce, use)`` counters via
threefry ``fold_in``, so renders are bit-identical regardless of device
count, sharding layout, or resume point (SURVEY.md §7 hard-part 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stream tags: distinct fold_in constants per consumer so streams never
# collide even at the same (pixel, sample, bounce) counter.
STREAM_PIXEL_JITTER = 0x9E37
STREAM_LENS = 0x7F4A
STREAM_SCATTER = 0x85EB
STREAM_RR = 0xC2B2
STREAM_NEE = 0x5BD1
STREAM_ENV = 0x68E3
STREAM_TIME = 0x2B7E  # shutter-time draw (camera motion blur)
STREAM_FOG = 0x3C6F   # medium distance + phase-direction draws (fog
                      # scenes only — fog-free scenes never fold this
                      # in, so their streams are untouched)
STREAM_DELTA = 0x51A3  # delta-light pick (scenes without point/spot/
                       # directional lights never fold this in)
STREAM_VOL = 0x6B43    # heterogeneous-volume delta-tracking draws
                       # (per-step distance + accept; grid-free scenes
                       # never fold this in)
STREAM_VOLT = 0x1F83   # heterogeneous-volume ratio-tracking draws
STREAM_SSS = 0x4D2B    # interior-scattering (subsurface random walk)
                       # distance + phase draws; scatter-free scenes
                       # never fold it in
                       # (NEE shadow-arm transmittance; one salt per arm)
# Extra fold_in salt for ld_scalar so its rotation stream is disjoint
# from every ld_pair stream BY CONSTRUCTION (a former ``stream_tag + 1``
# derivation would silently correlate if a future tag ever equaled an
# existing tag + 1 — ADVICE r2).
_LD_SCALAR_SALT = 0x27D4


def pixel_sample_key(seed, pixel_index, sample_index):
    """Key for one (pixel, sample) pair. All inputs may be traced arrays.

    ``pixel_index`` is the flat row-major pixel id; ``sample_index`` the
    global sample counter (monotone across progressive steps, so step
    boundaries don't change the sequence — checkpoint/resume is exact).
    """
    key = jax.random.key(seed)
    key = jax.random.fold_in(key, pixel_index)
    key = jax.random.fold_in(key, sample_index)
    return key


def stream_key(key, bounce, stream_tag):
    """Sub-key for one RNG consumer at one bounce."""
    return jax.random.fold_in(jax.random.fold_in(key, bounce), stream_tag)


def uniform2(key):
    """Two uniforms in [0, 1)."""
    return jax.random.uniform(key, (2,), dtype=jnp.float32)


def uniform3(key):
    return jax.random.uniform(key, (3,), dtype=jnp.float32)


# --- Progressive low-discrepancy sampling -------------------------------
#
# A Halton (base 2, base 3) pair indexed by the GLOBAL sample counter,
# Cranley-Patterson rotated by a per-(pixel, stream) uniform offset:
# each pixel sees a well-stratified 2D point set that refines
# progressively (no power-of-two spp needed), while the rotation
# decorrelates pixels so the shared sequence never shows as structured
# noise. Rotation of a uniform point is uniform, so every sample's
# marginal distribution is unchanged — the estimator stays unbiased;
# only the per-pixel variance drops. Counters only (no state), so
# engines, shardings, and resume points all reproduce bit-exactly, same
# as the threefry streams.


def _bitrev32(n):
    n = ((n >> 1) & 0x55555555) | ((n & 0x55555555) << 1)
    n = ((n >> 2) & 0x33333333) | ((n & 0x33333333) << 2)
    n = ((n >> 4) & 0x0F0F0F0F) | ((n & 0x0F0F0F0F) << 4)
    n = ((n >> 8) & 0x00FF00FF) | ((n & 0x00FF00FF) << 8)
    return (n >> 16) | (n << 16)


def _vdc2(s):
    """Base-2 radical inverse (van der Corput) of a uint32 index."""
    bits = _bitrev32(s.astype(jnp.uint32))
    return bits.astype(jnp.float32) * jnp.float32(2.0**-32)


def _vdc3(s):
    """Base-3 radical inverse; 20 digits cover indices past 3^20≈3.5e9."""
    n = s.astype(jnp.uint32)
    r = jnp.zeros_like(n, dtype=jnp.float32)
    base = jnp.float32(1.0 / 3.0)
    for _ in range(20):
        r = r + (n % 3).astype(jnp.float32) * base
        n = n // 3
        base = base * jnp.float32(1.0 / 3.0)
    return r


def _vdc5(s):
    """Base-5 radical inverse; 14 digits cover indices past 5^14≈6e9."""
    n = s.astype(jnp.uint32)
    r = jnp.zeros_like(n, dtype=jnp.float32)
    base = jnp.float32(1.0 / 5.0)
    for _ in range(14):
        r = r + (n % 5).astype(jnp.float32) * base
        n = n // 5
        base = base * jnp.float32(1.0 / 5.0)
    return r


def ld_scalar(seed, pixel_index, sample_index, stream_tag):
    """Stratified 1D sample (base-5 van der Corput + per-pixel
    rotation): used for the NEE light-pick dimension, where stratifying
    across samples spreads a pixel's shadow rays over the scene's
    lights instead of re-rolling them independently."""
    key = jax.random.fold_in(
        jax.random.fold_in(
            jax.random.fold_in(jax.random.key(seed), pixel_index),
            stream_tag,
        ),
        _LD_SCALAR_SALT,
    )
    rot = jax.random.uniform(key, (), dtype=jnp.float32)
    u = _vdc5(sample_index) + rot
    return u - jnp.floor(u)


def ld_pair(seed, pixel_index, sample_index, stream_tag):
    """Stratified 2D sample: Halton(2,3) point ``sample_index`` with a
    per-(seed, pixel, stream) rotation. Broadcasts over array inputs;
    returns values shaped like ``sample_index`` (+ trailing pair dim via
    tuple). Used for the variance-dominant first-vertex draws; deeper
    bounces keep independent threefry streams (their dimensionality is
    unbounded and stratification there buys little)."""
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(seed), pixel_index), stream_tag
    )
    rot = jax.random.uniform(key, (2,), dtype=jnp.float32)
    u0 = _vdc2(sample_index) + rot[0]
    u1 = _vdc3(sample_index) + rot[1]
    return u0 - jnp.floor(u0), u1 - jnp.floor(u1)
