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
TYPE_GGX = 5       # microfacet conductor: albedo = F0 (Schlick),
                   # param = GGX roughness alpha. Unlike the RTiOW fuzz
                   # metal it has a proper pdf, so glossy vertices are
                   # NEE/MIS-eligible (the veach_mis workload).
TYPE_ROUGH_DIELECTRIC = 6   # microfacet glass (Walter 2007): albedo =
                   # tint, param = IOR, roughness alpha in the OPTIONAL
                   # mat_param2 column (scenes without one skip the
                   # lobe entirely — see ``scatter``). BSDF-sampling
                   # only, like the smooth dielectric.
TYPE_PRINCIPLED = 7  # metallic-roughness workflow (the glTF/Disney-lite
                   # standard): albedo = base color, param = perceptual
                   # roughness (GGX alpha = roughness²), metallic in the
                   # OPTIONAL mat_metallic column. One diffuse + one GGX
                   # specular lobe with F0 = lerp(0.04, base, metallic)
                   # and diffuse = base·(1−metallic); sampled by a
                   # Fresnel-luminance lobe pick, evaluated as the SUM
                   # with the mixture pdf — finite pdf, so principled
                   # vertices are fully NEE/MIS-eligible.

INV_PI = 0.3183098861837907
GGX_MIN_ALPHA = 1e-3   # below this the lobe is numerically a mirror


def is_diffuse_type(mat_type):
    """Types shaded as Lambertian (cosine lobe + NEE-eligible)."""
    return (mat_type == TYPE_LAMBERTIAN) | (mat_type == TYPE_CHECKER)


def is_nee_type(mat_type):
    """Types with a finite BSDF pdf — eligible for light sampling with
    MIS (diffuse lobes + GGX + principled; delta lobes are
    BSDF-sampling-only)."""
    return (is_diffuse_type(mat_type) | (mat_type == TYPE_GGX)
            | (mat_type == TYPE_PRINCIPLED))


def _ggx_d(alpha2, cos_h):
    c2 = jnp.square(jnp.maximum(cos_h, 0.0))
    denom = c2 * (alpha2 - 1.0) + 1.0
    return alpha2 * INV_PI / jnp.maximum(denom * denom, 1e-12)


def _smith_g1(alpha2, cos_x):
    c = jnp.maximum(cos_x, 1e-6)
    return 2.0 * c / (c + jnp.sqrt(alpha2 + (1.0 - alpha2) * c * c))


def ggx_eval(f0, alpha, normal, view, light):
    """Evaluate the GGX conductor BRDF for given directions.

    f0: (...,3) Fresnel normal reflectance; alpha: (...,) roughness;
    normal/view/light: (...,3) unit vectors, ``view`` pointing AWAY from
    the surface toward the previous vertex, ``light`` toward the sample.
    Returns (f (...,3), pdf (...,)) — both zero outside the upper
    hemisphere. pdf is the half-vector NDF sampling density mapped to
    solid angle: D(h) (n·h) / (4 (v·h)).
    """
    alpha = jnp.maximum(alpha, GGX_MIN_ALPHA)
    alpha2 = alpha * alpha
    cos_v = linalg.dot(normal, view)
    cos_l = linalg.dot(normal, light)
    h = linalg.normalize(view + light)
    cos_h = linalg.dot(normal, h)
    vh = linalg.dot(view, h)
    d = _ggx_d(alpha2, cos_h)
    g = _smith_g1(alpha2, cos_v) * _smith_g1(alpha2, cos_l)
    fres = f0 + (1.0 - f0) * jnp.power(
        jnp.clip(1.0 - vh, 0.0, 1.0), 5.0
    )[..., None]
    ok = (cos_v > 1e-6) & (cos_l > 1e-6) & (vh > 1e-6)
    f = fres * (d * g / jnp.maximum(4.0 * cos_v * cos_l, 1e-12))[..., None]
    pdf = d * jnp.maximum(cos_h, 0.0) / jnp.maximum(4.0 * vh, 1e-12)
    return (
        jnp.where(ok[..., None], f, 0.0),
        jnp.where(ok, pdf, 0.0),
    )


def _aniso_alphas(alpha, aniso):
    """Disney anisotropy convention: aspect = sqrt(1 - 0.9·aniso);
    alpha_x = alpha/aspect (along the tangent), alpha_y = alpha·aspect.
    aniso=0 gives alpha_x == alpha_y == alpha exactly."""
    aspect = jnp.sqrt(jnp.maximum(
        1.0 - 0.9 * jnp.clip(aniso, 0.0, 1.0), 1e-4
    ))
    ax = jnp.maximum(alpha / aspect, GGX_MIN_ALPHA)
    ay = jnp.maximum(alpha * aspect, GGX_MIN_ALPHA)
    return ax, ay


def _smith_g1_aniso(ax, ay, wt, wb, wn):
    """Separable Smith masking, anisotropic Trowbridge-Reitz lambda.
    Reduces exactly to ``_smith_g1`` at ax == ay."""
    wn_ = jnp.maximum(jnp.abs(wn), 1e-6)
    lam = 0.5 * (-1.0 + jnp.sqrt(
        1.0 + (jnp.square(ax * wt) + jnp.square(ay * wb)) / (wn_ * wn_)
    ))
    return 1.0 / (1.0 + lam)


def ggx_eval_aniso(f0, alpha, aniso, normal, view, light):
    """Anisotropic GGX conductor eval: same contract as ``ggx_eval``
    with the NDF stretched along a deterministic surface tangent frame
    (``linalg.orthonormal_basis(normal)`` — stable across engines and
    shardings because it is a pure function of the shading normal).
    Returns (f (...,3), pdf (...,)); pdf matches ``ggx_sample_aniso``.
    """
    alpha = jnp.maximum(alpha, GGX_MIN_ALPHA)
    ax, ay = _aniso_alphas(alpha, aniso)
    t, b = linalg.orthonormal_basis(normal)

    cos_v = linalg.dot(normal, view)
    cos_l = linalg.dot(normal, light)
    h = linalg.normalize(view + light)
    vh = linalg.dot(view, h)
    ht, hb, hn = linalg.dot(h, t), linalg.dot(h, b), linalg.dot(h, normal)
    e = (jnp.square(ht / ax) + jnp.square(hb / ay)
         + jnp.square(jnp.maximum(hn, 0.0)))
    d_ndf = 1.0 / jnp.maximum(jnp.pi * ax * ay * e * e, 1e-12)
    g = (
        _smith_g1_aniso(ax, ay, linalg.dot(view, t),
                        linalg.dot(view, b), cos_v)
        * _smith_g1_aniso(ax, ay, linalg.dot(light, t),
                          linalg.dot(light, b), cos_l)
    )
    fres = f0 + (1.0 - f0) * jnp.power(
        jnp.clip(1.0 - vh, 0.0, 1.0), 5.0
    )[..., None]
    ok = (cos_v > 1e-6) & (cos_l > 1e-6) & (vh > 1e-6)
    f = fres * (
        d_ndf * g / jnp.maximum(4.0 * cos_v * cos_l, 1e-12)
    )[..., None]
    pdf = d_ndf * jnp.maximum(hn, 0.0) / jnp.maximum(4.0 * vh, 1e-12)
    return (
        jnp.where(ok[..., None], f, 0.0),
        jnp.where(ok, pdf, 0.0),
    )


def ggx_sample_aniso(alpha, aniso, normal, d_in, u1, u2):
    """Sample the anisotropic GGX NDF and reflect (PBRT Trowbridge-Reitz
    Sample_wh, non-visible-normal form). Same contract as ``ggx_sample``:
    returns (d_out, cos_h, vh); pdf/weights come from the matching
    ``ggx_eval_aniso`` terms."""
    alpha = jnp.maximum(alpha, GGX_MIN_ALPHA)
    ax, ay = _aniso_alphas(alpha, aniso)
    t, b = linalg.orthonormal_basis(normal)

    a = 2.0 * jnp.pi * u2
    # atan2(ay sinA, ax cosA) warps the azimuth with the D-matched
    # density (the quadrant-safe form of atan(ay/ax · tanA)).
    phi = jnp.arctan2(ay * jnp.sin(a), ax * jnp.cos(a))
    cp, sp = jnp.cos(phi), jnp.sin(phi)
    inv_a2 = jnp.square(cp / ax) + jnp.square(sp / ay)
    u1 = jnp.clip(u1, 0.0, 1.0 - 1e-6)
    tan2t = (u1 / (1.0 - u1)) / jnp.maximum(inv_a2, 1e-12)
    cos_h = 1.0 / jnp.sqrt(1.0 + tan2t)
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    h = (
        (sin_h * cp)[..., None] * t
        + (sin_h * sp)[..., None] * b
        + cos_h[..., None] * normal
    )
    d_out = linalg.normalize(
        d_in - 2.0 * linalg.dot(d_in, h)[..., None] * h
    )
    return d_out, cos_h, linalg.dot(-d_in, h)


def ggx_sample_h(alpha, normal, u1, u2):
    """Sample a GGX half-vector around ``normal`` (NDF sampling).

    Returns (h (...,3) unit, cos_h (...,) = n·h). Shared by the
    conductor (reflect about h) and the rough dielectric (reflect OR
    refract through h).
    """
    alpha = jnp.maximum(alpha, GGX_MIN_ALPHA)
    # tan^2(theta_h) = alpha^2 u / (1 - u)
    u1 = jnp.clip(u1, 0.0, 1.0 - 1e-6)
    cos_h = 1.0 / jnp.sqrt(1.0 + alpha * alpha * u1 / (1.0 - u1))
    sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
    phi = 2.0 * jnp.pi * u2
    tx, ty = linalg.orthonormal_basis(normal)
    h = (
        (sin_h * jnp.cos(phi))[..., None] * tx
        + (sin_h * jnp.sin(phi))[..., None] * ty
        + cos_h[..., None] * normal
    )
    return h, cos_h


def ggx_sample(alpha, normal, d_in, u1, u2):
    """Sample a GGX half-vector (NDF sampling) and reflect.

    Returns (d_out (...,3), cos_h (...,), vh (...,)) — callers compute
    the throughput weight F * G2 * (v·h) / ((n·v)(n·h)) (Walter 2007
    eq. 41) and the pdf via ``ggx_eval``.
    """
    h, cos_h = ggx_sample_h(alpha, normal, u1, u2)
    d_out = linalg.normalize(
        d_in - 2.0 * linalg.dot(d_in, h)[..., None] * h
    )
    return d_out, cos_h, linalg.dot(-d_in, h)


def _principled_parts(base, metallic, rough):
    """(F0, diffuse color, GGX alpha) for the metallic-roughness model:
    F0 = lerp(0.04, base, metallic) (the universal dielectric normal
    reflectance), diffuse = base·(1−metallic) (metals have no diffuse),
    alpha = roughness² (the perceptual remap every engine uses)."""
    m = metallic[..., None]
    f0 = 0.04 * (1.0 - m) + base * m
    dif = base * (1.0 - m)
    alpha = jnp.maximum(rough * rough, GGX_MIN_ALPHA)
    return f0, dif, alpha


def _principled_pspec(f0, dif, cos_v):
    """Specular-lobe selection probability: luminance of the
    view-Fresnel vs the diffuse color (the standard heuristic). Clamped
    so neither lobe starves; purely a function of (material, view), so
    the SAME value weights the sampler and the mixture pdf."""
    fres = f0 + (1.0 - f0) * jnp.power(
        jnp.clip(1.0 - cos_v, 0.0, 1.0), 5.0
    )[..., None]
    ls = linalg.luminance(fres)
    ld = linalg.luminance(dif)
    return jnp.clip(ls / jnp.maximum(ls + ld, 1e-12), 0.05, 1.0)


_CC_F0 = 0.04   # clearcoat IOR is fixed at 1.5 (the glTF convention)


def _fc_scalar(cos_x):
    """Schlick Fresnel at the clearcoat's fixed F0 = 0.04."""
    return _CC_F0 + (1.0 - _CC_F0) * jnp.power(
        jnp.clip(1.0 - cos_x, 0.0, 1.0), 5.0
    )


def _principled_weights(f0, dif, cos_v, cc):
    """Three-way lobe-pick probabilities (clearcoat, base specular,
    diffuse) from per-lobe approximate view reflectances; functions of
    (material, view) only, so sampler and mixture pdf share them.
    ``cc`` (...,) is the clearcoat strength (0 rows reduce EXACTLY to
    the two-lobe split: w_cc = 0 drops out of the normalization)."""
    fres = f0 + (1.0 - f0) * jnp.power(
        jnp.clip(1.0 - cos_v, 0.0, 1.0), 5.0
    )[..., None]
    ls = linalg.luminance(fres)
    ld = linalg.luminance(dif)
    lc = cc * _fc_scalar(cos_v)
    tot = jnp.maximum(ls + ld + lc, 1e-12)
    p_cc = lc / tot
    p_s = jnp.clip(ls / tot, 0.05 * (1.0 - p_cc), 1.0)
    return p_cc, p_s


def principled_eval(base, metallic, rough, normal, view, light,
                    clearcoat=None):
    """Evaluate the principled BSDF for given directions (the NEE arm).

    Returns (f (...,3), pdf (...,)): f = diffuse/π + GGX specular
    (+ the clearcoat layer when ``clearcoat`` (..., 2) [strength,
    roughness] is given — a second GGX at fixed F0 = 0.04 whose view/
    light Fresnel attenuates the base, the glTF layering), pdf = the
    lobe-pick mixture — exactly the density ``scatter`` samples from,
    which is what MIS needs.
    """
    f0, dif, alpha = _principled_parts(base, metallic, rough)
    f_spec, pdf_spec = ggx_eval(f0, alpha, normal, view, light)
    cos_l = linalg.dot(normal, light)
    cos_v = linalg.dot(normal, view)
    f = dif * INV_PI + f_spec
    if clearcoat is None:
        p_s = _principled_pspec(f0, dif, cos_v)
        pdf = (p_s * pdf_spec
               + (1.0 - p_s) * jnp.maximum(cos_l, 0.0) * INV_PI)
    else:
        cc = clearcoat[..., 0]
        alpha_cc = jnp.maximum(
            clearcoat[..., 1] * clearcoat[..., 1], GGX_MIN_ALPHA
        )
        one = jnp.ones_like(dif)
        f_cc, pdf_cc = ggx_eval(_CC_F0 * one, alpha_cc, normal, view,
                                light)
        # ggx_eval folds its own Schlick(F0=0.04) into f_cc; the layer
        # strength scales it, and the base loses the coat's view/light
        # Fresnel (energy-plausible glTF layering).
        atten = ((1.0 - cc * _fc_scalar(cos_v))
                 * (1.0 - cc * _fc_scalar(jnp.maximum(cos_l, 0.0))))
        f = f * atten[..., None] + cc[..., None] * f_cc
        p_cc, p_s = _principled_weights(f0, dif, cos_v, cc)
        pdf = (p_cc * pdf_cc + p_s * pdf_spec
               + (1.0 - p_cc - p_s)
               * jnp.maximum(cos_l, 0.0) * INV_PI)
    ok = (cos_l > 1e-6) & (cos_v > 1e-6)
    return (
        jnp.where(ok[..., None], f, 0.0),
        jnp.where(ok, pdf, 0.0),
    )


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


def scatter(mat_type, albedo, param, emit, normal, d_in, front_face, u,
            param2=None, disp=None, throughput=None, metallic=None,
            clearcoat=None, aniso=None):
    """Sample the BSDF for a batch of hits. Fully branchless.

    Args:
      mat_type: (...,) int32 material type per ray.
      albedo: (..., 3), param: (...,), emit: (..., 3) — gathered table rows.
      normal: (..., 3) unit shading normal, already flipped to face against
        the incident direction.
      d_in: (..., 3) unit incident direction (toward the surface).
      front_face: (...,) bool — ray hit the geometric front side.
      u: (..., 5) uniforms in [0,1): 2 diffuse/GGX, 3 metal-fuzz /
        dielectric (dispersive dielectrics use the metal-only u[...,3]
        for their channel pick — no extra stream).
      param2: optional (...,) second parameter column (None for scenes
        without one). Today it carries the rough dielectric's GGX alpha;
        when None the rough-glass lobe is never built, so plain scenes
        keep the identical jit graph (and bitwise results) — the same
        feature-gating contract as ``Scene.mat_absorb``.
      disp: optional (...,) dispersion column (IOR spread blue − red;
        None for dispersion-free scenes — same gating contract). A
        dispersive dielectric hit SAMPLES one RGB channel c with
        probability ∝ throughput_c, then runs the whole interaction
        (Fresnel, TIR, refract) at that channel's IOR
        ior_c = ior + disp·(c−1)/2, and returns attenuation
        tint · onehot(c)/p_c — the textbook single-wavelength spectral
        split (unbiased for any p_c > 0 where tp_c > 0; channels the
        path no longer carries are never picked).
      throughput: (..., 3) current path throughput — required with
        ``disp`` (drives the channel-pick probabilities).
      metallic: optional (...,) metallic column for TYPE_PRINCIPLED rows
        (None for scenes without one — same gating contract as
        ``param2``: plain scenes never build the principled lobe).
        ``param`` carries the perceptual roughness for these rows.
      clearcoat: optional (..., 2) [strength, roughness] clearcoat
        column (requires ``metallic``; None for coat-free scenes — same
        gating contract). Strength-0 rows reduce bit-exactly to the
        two-lobe principled results.
      aniso: optional (...,) anisotropy column for TYPE_GGX rows
        (None for isotropic scenes — same gating contract). Rows with
        aniso > 0 sample/evaluate the anisotropic NDF over the
        deterministic ``orthonormal_basis(normal)`` tangent frame.

    Returns:
      (d_out, attenuation, scattered, pdf):
        d_out (..., 3) unit outgoing direction,
        attenuation (..., 3) throughput multiplier (f·cos/pdf),
        scattered (...,) bool — path continues,
        pdf (...,) solid-angle density of d_out under the lobe's
          sampler (0 for delta lobes: mirror/fuzz metal, dielectric) —
          feeds the MIS power-heuristic weight at emissive hits.
    """
    # --- Lambertian: cosine-weighted hemisphere (pdf cancels the cosine).
    d_diffuse = sampling.cosine_hemisphere(normal, u[..., 0], u[..., 1])
    pdf_diffuse = jnp.maximum(linalg.dot(normal, d_diffuse), 1e-6) * INV_PI

    # --- GGX conductor: NDF-sampled half vector, reflect; weight =
    # F G2 (v·h) / ((n·v)(n·h)) (Walter 2007 eq. 41).
    view = -d_in
    alpha = jnp.maximum(param, GGX_MIN_ALPHA)
    alpha2 = alpha * alpha
    d_ggx, cos_h, vh = ggx_sample(alpha, normal, d_in, u[..., 0], u[..., 1])
    if aniso is not None:
        # Anisotropic rows re-sample through the stretched NDF (same
        # uniforms — isotropic rows keep bit-identical draws via the
        # where-select below).
        use_a = aniso > 1e-6
        d_ga, cos_h_a, vh_a = ggx_sample_aniso(
            param, aniso, normal, d_in, u[..., 0], u[..., 1]
        )
        d_ggx = jnp.where(use_a[..., None], d_ga, d_ggx)
        cos_h = jnp.where(use_a, cos_h_a, cos_h)
        vh = jnp.where(use_a, vh_a, vh)
    cos_v = linalg.dot(normal, view)
    cos_lg = linalg.dot(normal, d_ggx)
    ggx_ok = (cos_lg > 1e-6) & (cos_v > 1e-6) & (vh > 1e-6)
    fres_g = albedo + (1.0 - albedo) * jnp.power(
        jnp.clip(1.0 - vh, 0.0, 1.0), 5.0
    )[..., None]
    g2 = _smith_g1(alpha2, cos_v) * _smith_g1(alpha2, cos_lg)
    w_ggx = fres_g * (
        g2 * vh / jnp.maximum(cos_v * jnp.maximum(cos_h, 1e-6), 1e-9)
    )[..., None]
    pdf_ggx = _ggx_d(alpha2, cos_h) * jnp.maximum(cos_h, 0.0) \
        / jnp.maximum(4.0 * vh, 1e-9)
    if aniso is not None:
        # Anisotropic weight via the generic f·cosθ/pdf (the Walter
        # form above is its algebraic simplification; eval/pdf share
        # the frame and NDF with the sampler).
        f_a, pdf_a = ggx_eval_aniso(
            albedo, param, aniso, normal, view, d_ggx
        )
        w_a = f_a * (
            jnp.maximum(cos_lg, 0.0) / jnp.maximum(pdf_a, 1e-12)
        )[..., None]
        w_ggx = jnp.where(use_a[..., None], w_a, w_ggx)
        pdf_ggx = jnp.where(use_a, pdf_a, pdf_ggx)

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

    # --- Dispersive dielectric: pick ONE channel ∝ current throughput,
    # rerun the dielectric interaction at that channel's IOR. Built only
    # when the scene carries a dispersion column; non-dispersive lanes
    # (disp == 0) select the plain-dielectric results above bit-for-bit.
    if disp is not None:
        tp = jnp.maximum(throughput, 0.0)
        tp_sum = jnp.sum(tp, axis=-1)
        w = tp / jnp.maximum(tp_sum, 1e-30)[..., None]
        c1 = w[..., 0]
        c2 = c1 + w[..., 1]
        ud = u[..., 3]
        chan = jnp.where(ud < c1, 0, jnp.where(ud < c2, 1, 2))
        onehot_c = (
            jnp.arange(3, dtype=jnp.int32) == chan[..., None]
        ).astype(jnp.float32)
        p_c = jnp.sum(onehot_c * w, axis=-1)
        ior_c = jnp.maximum(
            param + disp * 0.5 * (chan.astype(jnp.float32) - 1.0), 1.0
        )
        eta_c = jnp.where(front_face, 1.0 / ior_c, ior_c)
        cannot_c = eta_c * sin_i > 1.0
        refl_prob_c = sampling.schlick_fresnel(cos_i, eta_c)
        do_reflect_c = cannot_c | (u[..., 2] < refl_prob_c)
        d_disp = linalg.normalize(
            jnp.where(
                do_reflect_c[..., None],
                d_mirror,
                linalg.refract(d_in, normal, eta_c),
            )
        )
        w_disp = albedo * onehot_c / jnp.maximum(p_c, 1e-20)[..., None]
        disp_on = (mat_type == TYPE_DIELECTRIC) & (disp > 0.0) & (
            tp_sum > 0.0
        )
        d_dielectric = jnp.where(disp_on[..., None], d_disp, d_dielectric)

    # --- Rough dielectric (Walter 2007 microfacet glass), only when the
    # scene carries a param2 column: sample a GGX half-vector with the
    # rough lobe's OWN alpha (param is the IOR here), Fresnel-choose
    # reflect/refract THROUGH h, weight by G2 |v·h| / (|n·v| |n·h|)
    # (eq. 41 — the F/p(F) choice probability cancels). BSDF-sampling
    # only (pdf 0 → MIS treats it like the smooth dielectric).
    if param2 is not None:
        alpha_r = jnp.maximum(param2, GGX_MIN_ALPHA)
        h_rd, cos_h_rd = ggx_sample_h(alpha_r, normal, u[..., 0], u[..., 1])
        vh_rd = linalg.dot(-d_in, h_rd)
        sin2_t = jnp.square(eta) * jnp.maximum(1.0 - vh_rd * vh_rd, 0.0)
        cannot_r = sin2_t > 1.0
        fres_rd = sampling.schlick_fresnel(
            jnp.clip(vh_rd, 0.0, 1.0), eta
        )
        refl_rd = cannot_r | (u[..., 2] < fres_rd)
        d_rd = jnp.where(
            refl_rd[..., None],
            linalg.reflect(d_in, h_rd),
            linalg.refract(d_in, h_rd, eta),
        )
        d_rd = linalg.normalize(d_rd)
        cos_out = linalg.dot(normal, d_rd)
        cos_v_rd = linalg.dot(normal, -d_in)
        # Sampled microfacet must be visible and the outgoing direction
        # on the side the event implies (reflection: same hemisphere,
        # transmission: opposite) — backfacing-h samples terminate.
        rd_ok = (vh_rd > 1e-6) & (cos_v_rd > 1e-6) & jnp.where(
            refl_rd, cos_out > 1e-6, cos_out < -1e-6
        )
        a2_rd = alpha_r * alpha_r
        g2_rd = _smith_g1(a2_rd, cos_v_rd) * _smith_g1(
            a2_rd, jnp.abs(cos_out)
        )
        w_rd = albedo * (
            g2_rd * vh_rd
            / jnp.maximum(cos_v_rd * jnp.maximum(cos_h_rd, 1e-6), 1e-9)
        )[..., None]

    # --- Principled (metallic-roughness), only when the scene carries a
    # metallic column: pick diffuse vs GGX-specular by the Fresnel-
    # luminance probability (reusing the scatter draw u[...,2] — unused
    # by the diffuse/GGX lobes, so other materials' streams are
    # untouched), then weight by f·cos/pdf with the MIXTURE pdf — the
    # textbook one-sample estimator of the two-lobe sum. The u[...,0/1]
    # pair drives BOTH candidate directions (same draws as the plain
    # lobes), so the sampler stays stream-neutral.
    if metallic is not None:
        f0_p, dif_p, alpha_p = _principled_parts(albedo, metallic, param)
        d_spec, _, _ = ggx_sample(alpha_p, normal, d_in,
                                  u[..., 0], u[..., 1])
        cos_vp = linalg.dot(normal, view)
        if clearcoat is None:
            p_s = _principled_pspec(f0_p, dif_p, cos_vp)
            d_pr = jnp.where(
                (u[..., 2] < p_s)[..., None], d_spec, d_diffuse
            )
        else:
            # Three-way pick: clearcoat GGX / base GGX / diffuse. The
            # same (u0, u1) drive all three candidate directions; the
            # same weights feed the mixture pdf in principled_eval.
            cc_s = clearcoat[..., 0]
            alpha_cc = jnp.maximum(
                clearcoat[..., 1] * clearcoat[..., 1], GGX_MIN_ALPHA
            )
            d_cc, _, _ = ggx_sample(alpha_cc, normal, d_in,
                                    u[..., 0], u[..., 1])
            p_cc, p_s = _principled_weights(f0_p, dif_p, cos_vp, cc_s)
            pick = u[..., 2]
            d_pr = jnp.where(
                (pick < p_cc)[..., None], d_cc,
                jnp.where((pick < p_cc + p_s)[..., None],
                          d_spec, d_diffuse),
            )
        f_pr, pdf_pr = principled_eval(
            albedo, metallic, param, normal, view, d_pr,
            clearcoat=clearcoat,
        )
        cos_op = linalg.dot(normal, d_pr)
        pr_ok = (cos_op > 1e-6) & (cos_vp > 1e-6) & (pdf_pr > 1e-9)
        w_pr = f_pr * (
            cos_op / jnp.maximum(pdf_pr, 1e-12)
        )[..., None]

    # --- Select by type (branchless).
    is_diffuse = is_diffuse_type(mat_type)
    is_metal = mat_type == TYPE_METAL
    is_dielectric = mat_type == TYPE_DIELECTRIC
    is_ggx = mat_type == TYPE_GGX

    d_out = jnp.where(
        is_diffuse[..., None],
        d_diffuse,
        jnp.where(
            is_metal[..., None],
            d_metal,
            jnp.where(is_ggx[..., None], d_ggx, d_dielectric),
        ),
    )
    attenuation = jnp.where(is_ggx[..., None], w_ggx, albedo)
    if disp is not None:
        attenuation = jnp.where(disp_on[..., None], w_disp, attenuation)
    scattered = jnp.where(
        is_metal,
        metal_ok,
        jnp.where(is_ggx, ggx_ok,
                  is_diffuse | is_dielectric),  # emissive terminates
    )
    if param2 is not None:
        is_rd = mat_type == TYPE_ROUGH_DIELECTRIC
        d_out = jnp.where(is_rd[..., None], d_rd, d_out)
        attenuation = jnp.where(is_rd[..., None], w_rd, attenuation)
        scattered = jnp.where(is_rd, rd_ok, scattered)
    pdf = jnp.where(
        is_diffuse, pdf_diffuse, jnp.where(is_ggx, pdf_ggx, 0.0)
    )
    if metallic is not None:
        is_pr = mat_type == TYPE_PRINCIPLED
        d_out = jnp.where(is_pr[..., None], d_pr, d_out)
        attenuation = jnp.where(is_pr[..., None], w_pr, attenuation)
        scattered = jnp.where(is_pr, pr_ok, scattered)
        pdf = jnp.where(is_pr, pdf_pr, pdf)
    return d_out, attenuation, scattered, pdf


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
