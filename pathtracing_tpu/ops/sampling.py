"""Monte Carlo sampling primitives (all branchless, vmap-friendly).

No reference analogue (the reference casts one deterministic ray per pixel,
`Test.hlsl:4-10`); these are the sampling routines the progressive path
tracer is built on. All take explicit uniforms (u in [0,1)) rather than keys
so they compose with both the jnp-level engine (jax.random) and Pallas
kernels (pltpu.prng_random_bits).
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracing_tpu.ops import linalg

TWO_PI = 6.283185307179586


def square_to_cosine_hemisphere(u1, u2):
    """Cosine-weighted direction in the local +z hemisphere (pdf = cosθ/π)."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    return jnp.stack([x, y, z], axis=-1)


def cosine_hemisphere(n, u1, u2):
    """Cosine-weighted direction about world-space unit normal ``n``."""
    local = square_to_cosine_hemisphere(u1, u2)
    t, b = linalg.orthonormal_basis(n)
    return (
        local[..., 0:1] * t + local[..., 1:2] * b + local[..., 2:3] * n
    )


def uniform_sphere(u1, u2):
    """Uniform direction on the unit sphere."""
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_in_sphere(u1, u2, u3):
    """Uniform point inside the unit ball (for metal fuzz lobes)."""
    d = uniform_sphere(u1, u2)
    return d * jnp.cbrt(jnp.maximum(u3, 1e-12))[..., None]


def uniform_in_disk(u1, u2):
    """Uniform point in the unit disk (thin-lens aperture sampling)."""
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def schlick_fresnel(cos_i, ior_ratio):
    """Schlick's reflectance approximation for dielectrics."""
    r0 = (1.0 - ior_ratio) / (1.0 + ior_ratio)
    r0 = r0 * r0
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    return r0 + (1.0 - r0) * m * m * m * m * m


def hg_phase(g, cos_t):
    """Henyey–Greenstein phase function value p(cosθ) — normalized over
    the sphere (∫ p dω = 1), so it doubles as the solid-angle pdf of
    ``hg_sample`` (perfect importance sampling)."""
    g2 = g * g
    denom = jnp.maximum(1.0 + g2 - 2.0 * g * cos_t, 1e-6)
    return (1.0 - g2) / (4.0 * jnp.pi * denom * jnp.sqrt(denom))


def hg_sample(d, g, u1, u2):
    """Sample a Henyey–Greenstein direction about incident direction ``d``.

    Returns (direction, cos_t). g ≈ 0 falls back to the isotropic
    inversion (the HG formula divides by g). The pdf of the returned
    direction is ``hg_phase(g, cos_t)``.
    """
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sq = (1.0 - safe_g * safe_g) / jnp.maximum(
        1.0 - safe_g + 2.0 * safe_g * u1, 1e-6
    )
    cos_hg = (1.0 + safe_g * safe_g - sq * sq) / (2.0 * safe_g)
    cos_t = jnp.clip(
        jnp.where(jnp.abs(g) < 1e-3, 1.0 - 2.0 * u1, cos_hg), -1.0, 1.0
    )
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2
    t, b = linalg.orthonormal_basis(d)
    out = (
        (sin_t * jnp.cos(phi))[..., None] * t
        + (sin_t * jnp.sin(phi))[..., None] * b
        + cos_t[..., None] * d
    )
    return linalg.normalize(out), cos_t
