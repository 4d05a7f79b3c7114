"""Branchless BSDF table: Lambertian / metal / dielectric / emissive.

No reference analogue (the reference shades hit pixels by surface normal,
`Test.hlsl:26-32`); this implements BASELINE config 2's "full BSDF set
(diffuse/metal/dielectric) with emissive lights". Divergent material dispatch
is the classic GPU megakernel problem; on TPU we solve it branchlessly
(SURVEY.md §7 hard-part 3): every lobe is evaluated for every ray and the
result selected by material type — pure VPU work, no data-dependent control
flow, so XLA fuses the whole shade stage into one elementwise pass.

Materials live in the scene as an SoA table indexed by ``mat_id``:
  mat_type   (K,)  int32   one of the TYPE_* constants
  mat_albedo (K,3) float32 reflectance (dielectric: tint, usually 1)
  mat_param  (K,)  float32 metal: fuzz radius; dielectric: IOR
  mat_emit   (K,3) float32 radiance emitted (emissive type, others 0)
"""

from __future__ import annotations

import jax.numpy as jnp

from pathtracing_tpu.ops import linalg, sampling

TYPE_LAMBERTIAN = 0
TYPE_METAL = 1
TYPE_DIELECTRIC = 2
TYPE_EMISSIVE = 3
TYPE_CHECKER = 4   # procedural two-tone Lambertian: albedo = color1,
                   # the emit columns are reused as color2, param = the
                   # checker frequency (cells per world unit)


def is_diffuse_type(mat_type):
    """Types shaded as Lambertian (cosine lobe + NEE-eligible)."""
    return (mat_type == TYPE_LAMBERTIAN) | (mat_type == TYPE_CHECKER)


def effective_albedo(mat_type, albedo, param, emit, position):
    """Surface color at a hit point (procedural checker evaluated here;
    plain materials pass through). emit doubles as the checker's second
    color, so callers must also use ``effective_emission``."""
    freq = jnp.maximum(param, 1e-6)[..., None]
    # Half-cell offset keeps axis-aligned geometry (a ground plane at
    # y = 0) in the middle of a cell instead of exactly on a boundary,
    # where float jitter in hit positions would render as parity noise.
    cell = jnp.floor(position * freq + 0.5)
    parity = (
        (cell[..., 0] + cell[..., 1] + cell[..., 2]).astype(jnp.int32) & 1
    )
    checker = jnp.where(parity[..., None] == 0, albedo, emit)
    return jnp.where(
        (mat_type == TYPE_CHECKER)[..., None], checker, albedo
    )


def effective_emission(mat_type, emit):
    """Emitted radiance (zero for checker, whose emit slot is color2)."""
    return jnp.where((mat_type == TYPE_CHECKER)[..., None], 0.0, emit)


def scatter(mat_type, albedo, param, emit, normal, d_in, front_face, u):
    """Sample the BSDF for a batch of hits. Fully branchless.

    Args:
      mat_type: (...,) int32 material type per ray.
      albedo: (..., 3), param: (...,), emit: (..., 3) — gathered table rows.
      normal: (..., 3) unit shading normal, already flipped to face against
        the incident direction.
      d_in: (..., 3) unit incident direction (toward the surface).
      front_face: (...,) bool — ray hit the geometric front side.
      u: (..., 5) uniforms in [0,1): 2 diffuse, 3 metal-fuzz / dielectric.

    Returns:
      (d_out, attenuation, scattered, emitted):
        d_out (..., 3) unit outgoing direction,
        attenuation (..., 3) throughput multiplier,
        scattered (...,) bool — path continues,
        emitted (..., 3) radiance added at this vertex.
    """
    # --- Lambertian: cosine-weighted hemisphere (pdf cancels the cosine).
    d_diffuse = sampling.cosine_hemisphere(normal, u[..., 0], u[..., 1])

    # --- Metal: mirror + fuzz * point-in-ball, rejected if driven below
    # the horizon (standard RTiOW-style lobe).
    d_mirror = linalg.reflect(d_in, normal)
    fuzz = param[..., None]
    d_metal = linalg.normalize(
        d_mirror
        + fuzz * sampling.uniform_in_sphere(u[..., 2], u[..., 3], u[..., 4])
    )
    metal_ok = linalg.dot(d_metal, normal) > 0.0

    # --- Dielectric: refract unless TIR or Fresnel (Schlick) says reflect.
    ior = jnp.maximum(param, 1.0)
    eta = jnp.where(front_face, 1.0 / ior, ior)
    cos_i = jnp.minimum(-linalg.dot(d_in, normal), 1.0)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    cannot_refract = eta * sin_i > 1.0
    reflect_prob = sampling.schlick_fresnel(cos_i, eta)
    do_reflect = cannot_refract | (u[..., 2] < reflect_prob)
    d_refract = linalg.refract(d_in, normal, eta)
    d_dielectric = linalg.normalize(
        jnp.where(do_reflect[..., None], d_mirror, d_refract)
    )

    # --- Select by type (branchless).
    is_diffuse = is_diffuse_type(mat_type)
    is_metal = mat_type == TYPE_METAL
    is_dielectric = mat_type == TYPE_DIELECTRIC

    d_out = jnp.where(
        is_diffuse[..., None],
        d_diffuse,
        jnp.where(is_metal[..., None], d_metal, d_dielectric),
    )
    attenuation = jnp.where(
        is_dielectric[..., None],
        albedo,  # tint only — no cosine term for specular transmission
        albedo,
    )
    scattered = jnp.where(
        is_metal,
        metal_ok,
        is_diffuse | is_dielectric,  # emissive terminates the path
    )
    emitted = emit
    return d_out, attenuation, scattered, emitted


def gather(mat_table, mat_id):
    """Gather the 4 SoA table columns for a batch of material ids.

    ``mat_id`` may be -1 (miss); callers mask by hit validity, but we clamp
    so the gather itself stays in-bounds.
    """
    mat_type, mat_albedo, mat_param, mat_emit = mat_table
    idx = jnp.clip(mat_id, 0, mat_type.shape[0] - 1)
    return (
        mat_type[idx],
        mat_albedo[idx],
        mat_param[idx],
        mat_emit[idx],
    )
