"""Small-vector math used by every kernel.

Everything operates on trailing-dim-3 float arrays and is shape-polymorphic
(works per-ray under ``vmap`` and on whole (N,3) batches). This layer is the
analogue of the HLSL intrinsics the reference leans on (`normalize`, `dot`,
`reflect` — `Test.hlsl:10-28`).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length(v):
    return jnp.sqrt(jnp.maximum(dot(v, v), 0.0))


def normalize(v):
    return v * (1.0 / jnp.maximum(length(v), EPS))[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def reflect(d, n):
    """Mirror ``d`` about normal ``n`` (both unit)."""
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(d, n, eta):
    """Refract unit ``d`` through unit normal ``n`` with relative IOR ``eta``.

    Always returns a direction; callers must gate on total internal
    reflection themselves (see ``ops.materials``). ``cos_i = -d·n`` must be
    >= 0 (normal faces against the incident ray).
    """
    cos_i = jnp.minimum(-dot(d, n), 1.0)
    perp = eta[..., None] * (d + cos_i[..., None] * n)
    par_sq = jnp.maximum(1.0 - dot(perp, perp), 0.0)
    return perp - jnp.sqrt(par_sq)[..., None] * n


def orthonormal_basis(n):
    """Branchless ONB from a unit normal (Duff et al. 2017, public method).

    Returns (t, b) such that (t, b, n) is right-handed orthonormal.
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    bv = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * bv, -s * n[..., 0]], axis=-1
    )
    b = jnp.stack([bv, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, b


def luminance(rgb):
    return (
        0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]
    )
