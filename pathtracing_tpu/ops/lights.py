"""Area-light table + sampling for next-event estimation (NEE).

No reference analogue (the reference has no lighting at all — hit pixels
are shaded by surface normal, `Test.hlsl:26-32`); this implements direct
light sampling with multiple importance sampling for the progressive path
tracer, the single biggest variance reducer for interior scenes.

The table holds every emissive *primitive* — triangles AND spheres —
selected with probability ∝ emitted POWER (luminance · area): a small
bright lamp next to a large dim panel is picked by how much light it
contributes, not how big it is (area-uniform selection starves the
small-bright light — exactly the veach_mis failure mode, 80× area
ratio). The point WITHIN the chosen primitive stays area-uniform, so
the per-area pdf at a sampled point of light i is

    p_i / area_i = (lum_i · area_i / Σ lum·area) / area_i
                 = lum_i / total_power

— computable from the emitted radiance alone, on BOTH sides of the MIS
pairing (the NEE arm knows its sampled ``lemit``; the BSDF-hit arm
knows the ``emit`` it hit), so no per-primitive id ever flows through
the estimator. Sphere rows use the full 4πr² surface and are sampled
area-uniformly, so far-side samples are killed by the occlusion test —
standard, unbiased, ~2× the sphere-light noise of visible-cap sampling
(documented trade). Scenes whose lights all share one radiance (the
cornell family: one quad = two equal-emit triangles) reduce to the old
area-uniform CDF exactly, so their picks are unchanged.

All selection is one-hot masked-sum over the (small) light table — never
a device gather (see PERF.md for why gathers are banned on the hot
path), and never a matmul (bf16 default dots put sampled points off the
light plane; PERF.md "Correctness gotcha").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

KIND_TRI = 0
KIND_SPHERE = 1


class LightTable(NamedTuple):
    v0: jnp.ndarray       # (L, 3) f32 triangle corner / sphere center
    e1: jnp.ndarray       # (L, 3) f32 edge 1 / (radius, 0, 0)
    e2: jnp.ndarray       # (L, 3) f32 edge 2 / zeros
    normal: jnp.ndarray   # (L, 3) f32 unit geometric normal (tri only)
    emit: jnp.ndarray     # (L, 3) f32 radiance
    kind: jnp.ndarray     # (L,)  i32 KIND_TRI | KIND_SPHERE
    cum: jnp.ndarray      # (L,)  f32 inclusive cumulative POWER fraction
    total_area: jnp.ndarray  # () f32 — 0.0 means "no lights" (NEE no-op)
    total_power: jnp.ndarray  # () f32 Σ luminance·area; the per-area pdf
    #                           at a sample of light i is lum_i / this


def build_light_table(v0, v1, v2, tri_mat, mat_type, mat_emit,
                      emissive_type: int, sph_center=None, sph_radius=None,
                      sph_mat=None) -> LightTable:
    """Host-side (NumPy) collection of emissive triangles + spheres."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    tri_mat = np.asarray(tri_mat)
    types = np.asarray(mat_type)
    emits = np.asarray(mat_emit, np.float32)[tri_mat]
    # Select by TYPE only: the checker material reuses the emit columns
    # as its second color and must not be classed as a light.
    sel = types[tri_mat] == emissive_type
    lv0, lv1, lv2 = v0[sel], v1[sel], v2[sel]
    lemit = emits[sel]

    e1 = lv1 - lv0
    e2 = lv2 - lv0
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=1)
    area = 0.5 * norm
    keep = area > 1e-12
    lv0, e1, e2, n, norm, area, lemit = (
        lv0[keep], e1[keep], e2[keep], n[keep], norm[keep], area[keep],
        lemit[keep],
    )
    normal = (n / np.maximum(norm[:, None], 1e-20)).astype(np.float32)
    kind = np.zeros(lv0.shape[0], np.int32)

    if sph_center is not None and len(sph_center):
        sc = np.asarray(sph_center, np.float32)
        sr = np.asarray(sph_radius, np.float32)
        sm = np.asarray(sph_mat)
        ssel = (types[sm] == emissive_type) & (sr > 1e-12)
        if ssel.any():
            k = int(ssel.sum())
            lv0 = np.concatenate([lv0, sc[ssel]])
            se1 = np.zeros((k, 3), np.float32)
            se1[:, 0] = sr[ssel]
            e1 = np.concatenate([e1, se1])
            e2 = np.concatenate([e2, np.zeros((k, 3), np.float32)])
            normal = np.concatenate([normal, np.zeros((k, 3), np.float32)])
            lemit = np.concatenate(
                [lemit, np.asarray(mat_emit, np.float32)[sm[ssel]]]
            )
            area = np.concatenate(
                [area, 4.0 * np.pi * sr[ssel] * sr[ssel]]
            )
            kind = np.concatenate([kind, np.ones(k, np.int32)])

    # Selection weight = emitted power (luminance · area), f64 so the
    # all-equal-radiance case reduces to the area CDF bit-exactly.
    lum = (0.2126 * lemit[:, 0] + 0.7152 * lemit[:, 1]
           + 0.0722 * lemit[:, 2]).astype(np.float64)
    power = lum * area.astype(np.float64)
    total_power = float(power.sum())

    if lv0.shape[0] == 0 or total_power <= 0.0:
        # No lights, or only zero-radiance "emitters": NEE is a no-op.
        zero3 = np.zeros((1, 3), np.float32)
        return LightTable(
            v0=jnp.asarray(zero3), e1=jnp.asarray(zero3),
            e2=jnp.asarray(zero3), normal=jnp.asarray(zero3),
            emit=jnp.asarray(zero3),
            kind=jnp.zeros(1, jnp.int32),
            cum=jnp.ones(1, jnp.float32),
            total_area=jnp.float32(0.0),
            total_power=jnp.float32(0.0),
        )

    total = float(area.sum())
    cum = np.cumsum(power) / total_power
    return LightTable(
        v0=jnp.asarray(lv0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        normal=jnp.asarray(normal),
        emit=jnp.asarray(lemit),
        kind=jnp.asarray(kind),
        cum=jnp.asarray(cum.astype(np.float32)),
        total_area=jnp.float32(total),
        total_power=jnp.float32(total_power),
    )


def sample(lights: LightTable, u):
    """Power-weighted light pick, area-uniform point within it.

    u: (R, 3) uniforms. Returns (point (R,3), normal (R,3), emit (R,3)).
    The per-area pdf at the returned point is
    ``luminance(emit) / total_power`` (see module docstring).
    """
    n_lights = lights.cum.shape[0]
    idx = jnp.clip(
        jnp.sum((u[:, 0:1] > lights.cum[None, :]).astype(jnp.int32),
                axis=1),
        0, n_lights - 1,
    )
    onehot = (
        jnp.arange(n_lights, dtype=jnp.int32)[None, :] == idx[:, None]
    )                                           # (R, L) bool

    def select(table):  # (L, 3) -> (R, 3)
        # Exact masked-sum selection. NOT a matmul: TPU f32 dots default
        # to bf16 multiplies, and a light point 4e-3 off its own plane
        # makes shadow rays hit the light geometry itself — measured as
        # a ~20% darkening of every NEE estimate.
        return jnp.sum(
            jnp.where(onehot[:, :, None], table[None, :, :], 0.0), axis=1
        )

    v0 = select(lights.v0)
    e1 = select(lights.e1)
    e2 = select(lights.e2)
    normal = select(lights.normal)
    emit = select(lights.emit)
    is_sph = jnp.sum(
        jnp.where(onehot, lights.kind[None, :], 0), axis=1
    ) == KIND_SPHERE

    # Triangle: sqrt-warped uniform barycentrics.
    su = jnp.sqrt(jnp.maximum(u[:, 1:2], 1e-12))
    a = 1.0 - su
    b = su * u[:, 2:3]
    p_tri = v0 + a * e1 + b * e2

    # Sphere: area-uniform surface point (v0 = center, e1.x = radius).
    z = 1.0 - 2.0 * u[:, 1]
    rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[:, 2]
    dir_s = jnp.stack([rxy * jnp.cos(phi), rxy * jnp.sin(phi), z], axis=1)
    p_sph = v0 + e1[:, 0:1] * dir_s

    point = jnp.where(is_sph[:, None], p_sph, p_tri)
    normal = jnp.where(is_sph[:, None], dir_s, normal)
    return point, normal, emit
