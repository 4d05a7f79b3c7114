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
