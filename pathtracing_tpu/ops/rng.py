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
# Halton radical inverses indexed by the GLOBAL sample counter,
# Cranley-Patterson rotated by a per-(pixel, stream) uniform offset:
# each pixel sees a well-stratified point set that refines
# progressively (no power-of-two spp needed), while the rotation
# decorrelates pixels so the shared sequence never shows as structured
# noise. Rotation of a uniform point is uniform, so every sample's
# marginal distribution is unchanged — the estimator stays unbiased;
# only the per-pixel variance drops. Counters only (no state), so
# engines, shardings, and resume points all reproduce bit-exactly, same
# as the threefry streams.
#
# EVERY STREAM GETS ITS OWN PRIME BASES (the _LD_*_BASES tables): the
# streams jointly form one higher-dimensional Halton point, which
# equidistributes in the product space. The original design reused
# base (2, 3) for every ld_pair stream with only the rotation to
# decorrelate them — but a rotation is a CONSTANT per (pixel, stream),
# so any two streams' coordinates differed by a constant and their
# joint distribution degenerated to a line in [0,1)². Any integrand
# event depending jointly on two streams (e.g. Cornell's slit pixels,
# where pixel-jitter t picks the ceiling point and the scatter pair
# decides whether the bounce escapes the light/ceiling gap) then
# converges to a rotation-dependent WRONG frequency: a per-pixel
# conditional bias that the in-render variance estimate cannot see
# (samples concentrate tightly given the rotation). Measured as the
# r4 A-vs-B failure: ratio 2.38, with 68% of the excess squared error
# in ~100 slit-edge pixels whose A/B means disagreed by 10+ sigma
# (PERF.md r5a). Distinct prime bases are the standard fix (cf. the
# classic Halton-dimension assignment); the rotations stay, still
# doing their real job of decorrelating pixels.


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


# Digit counts per base, enough for every uint32 index (b**d >= 2**32).
_VDC_DIGITS = {3: 21, 5: 14, 7: 12, 11: 10, 13: 9, 17: 8, 19: 8,
               23: 8, 29: 7}


def _vdc(s, base):
    """Base-``base`` radical inverse (van der Corput) of a uint32
    index. Base 2 uses the bit-reversal fast path."""
    if base == 2:
        return _vdc2(s)
    n = s.astype(jnp.uint32)
    r = jnp.zeros_like(n, dtype=jnp.float32)
    inv = jnp.float32(1.0 / base)
    scale = inv
    for _ in range(_VDC_DIGITS[base]):
        r = r + (n % base).astype(jnp.float32) * scale
        n = n // base
        scale = scale * inv
    return r


# Halton dimension assignment: one prime (pair) per LD stream, so the
# streams are jointly equidistributed (see the block comment above).
# (2, 3) stays on the pixel jitter — the lowest-discrepancy pair on the
# variance-dominant dimension. New LD consumers MUST claim fresh primes
# here; an unlisted tag raises at trace time rather than silently
# re-correlating streams.
_LD_PAIR_BASES = {
    STREAM_PIXEL_JITTER: (2, 3),
    STREAM_LENS: (5, 7),
    STREAM_NEE: (13, 17),
    STREAM_SCATTER: (19, 23),
}
_LD_SCALAR_BASES = {
    STREAM_NEE: 11,
    STREAM_TIME: 29,
}


def ld_scalar(seed, pixel_index, sample_index, stream_tag):
    """Stratified 1D sample (van der Corput in the stream's own prime
    base + per-pixel rotation): used for the NEE light-pick dimension,
    where stratifying across samples spreads a pixel's shadow rays over
    the scene's lights instead of re-rolling them independently."""
    key = jax.random.fold_in(
        jax.random.fold_in(
            jax.random.fold_in(jax.random.key(seed), pixel_index),
            stream_tag,
        ),
        _LD_SCALAR_SALT,
    )
    rot = jax.random.uniform(key, (), dtype=jnp.float32)
    u = _vdc(sample_index, _LD_SCALAR_BASES[stream_tag]) + rot
    return u - jnp.floor(u)


def ld_pair(seed, pixel_index, sample_index, stream_tag):
    """Stratified 2D sample: the stream's own Halton prime pair at index
    ``sample_index`` with a per-(seed, pixel, stream) rotation.
    Broadcasts over array inputs; returns values shaped like
    ``sample_index`` (+ trailing pair dim via tuple). Used for the
    variance-dominant first-vertex draws; deeper bounces keep
    independent threefry streams (their dimensionality is unbounded and
    stratification there buys little)."""
    b0, b1 = _LD_PAIR_BASES[stream_tag]
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(seed), pixel_index), stream_tag
    )
    rot = jax.random.uniform(key, (2,), dtype=jnp.float32)
    u0 = _vdc(sample_index, b0) + rot[0]
    u1 = _vdc(sample_index, b1) + rot[1]
    return u0 - jnp.floor(u0), u1 - jnp.floor(u1)
