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
the estimator. Scenes whose lights all share one radiance (the cornell
family: one quad = two equal-emit triangles) reduce to the old
area-uniform CDF exactly, so their picks are unchanged.

Sphere rows are sampled by the VISIBLE-CAP cone (``sample_solid_angle``:
uniform direction inside the cone the sphere subtends from the shading
point, PBRT-style) — never the far hemisphere, whose samples area-
uniform sampling wastes on a guaranteed-occluded half (measured ~3×
the one-sample std, tests/test_nee.py). The cone pdf is per SOLID
ANGLE, so it feeds the estimator denominator directly, while the MIS
weights on BOTH arms keep the locally-computable area-law pdf
(dist²·lum/(cosθ·total_power)): any weight pair summing to one is
unbiased (Veach's theorem needs partition of unity, not pdf-optimal
weights), and the BSDF-hit arm has no sphere center/radius to evaluate
a cone pdf with. A shading point INSIDE an emissive sphere falls back
to area-uniform sampling (the cone is undefined), same pdf law as
triangles. The legacy full-surface sampler stays as ``sample`` for
area-measure uses.

Selection is one-hot masked-sum over SMALL light tables — never a
matmul (bf16 default dots put sampled points off the light plane;
PERF.md "Correctness gotcha"). Masked-sum work grows as (rays × L) per
column, so tables with ``L >= _GATHER_MIN`` switch to a Σ(u > cum)
CDF pick + ONE packed row gather (the r3m single-gather pattern: all
sampler columns pre-packed into an (L, W) f32 table at build time,
fetched through the Pallas ``tpu.dynamic_gather`` kernel —
``ops/pgather.py``). History of the crossover (PERF.md r4e → r5e, 512²
4spp step, many_lights_demo grids): the ORIGINAL gather mode
(jnp.searchsorted + jnp.take) measured SLOWER than masked-sum through
L ≈ 2.4k and the threshold sat at 4096 — but the r5e decomposition
showed ~97% of that cost was jnp.searchsorted's gathered binary
search (79 ms vs 2 ms for the fused count at R=1M) plus XLA's slow
row take (5.8 ms vs 1.6 ms through pgather); with both replaced the
gather mode wins from L ≈ 192. The switch is a static table-size
property: every small-table scene keeps its bit-identical masked-sum
graph, and both paths draw identical picks AND identical row values
(gathers are exact copies), so images match bitwise across modes
(tests/test_many_lights.py locks it).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

KIND_TRI = 0
KIND_SPHERE = 1

# Table size at which light selection switches from one-hot masked-sum
# to a Σ(u > cum) pick + single pgather packed-row fetch. Re-measured
# r5e after replacing searchsorted/jnp.take with the fused count +
# Pallas dynamic_gather: the gather mode now wins from L ≈ 192 (and
# still bounds the (rays × L·W) masked-sum work for huge tables).
# Overridable for the crossover probe (benchmarks/probe_ris.py, which
# monkeypatches it); renders are identical either way — only the
# schedule changes.
import os as _os

_GATHER_MIN = int(_os.environ.get("PT_LIGHT_GATHER_MIN", 192))

# Pick-index mode inside the gather path: the fused Σ(u > cum) count
# costs O(R·L) VPU compares (~2 ms at R=1M, L=288) while XLA's
# searchsorted costs a flat ~79 ms in gathered binary-search steps
# (PERF.md r5e) — the count wins until L reaches tens of thousands.
_SUMCOUNT_MAX = int(_os.environ.get("PT_LIGHT_SUMCOUNT_MAX", 32768))

# Column layout of ``LightTable.packed`` ((L, 24) f32, built only for
# gather-mode tables): slices for the vector columns, scalar indices
# for kind/tex (small ints, exact in f32). uv columns are zeros when
# the scene has no textured emitter (with_uv callers never see them).
_P_V0 = slice(0, 3)
_P_E1 = slice(3, 6)
_P_E2 = slice(6, 9)
_P_NORMAL = slice(9, 12)
_P_EMIT = slice(12, 15)
_P_KIND = 15
_P_UV0 = slice(16, 18)
_P_UVE1 = slice(18, 20)
_P_UVE2 = slice(20, 22)
_P_TEX = 22
_P_WIDTH = 24


class LightTable(NamedTuple):
    v0: jnp.ndarray       # (L, 3) f32 triangle corner / sphere center
    e1: jnp.ndarray       # (L, 3) f32 edge 1 / (radius, 0, 0)
    e2: jnp.ndarray       # (L, 3) f32 edge 2 / zeros
    normal: jnp.ndarray   # (L, 3) f32 unit geometric normal (tri only)
    emit: jnp.ndarray     # (L, 3) f32 radiance
    # Feature gate (r4a): ``kind`` is None when the table holds no sphere
    # emitters, and BOTH samplers then trace a pure-triangle graph — no
    # cone/area-sphere math at all. The round-3 cone sampler ungated cost
    # +596 jaxpr equations (trig + orthonormal basis per NEE vertex per
    # bounce) on sphere-less scenes like the flagship cornell_mesh; see
    # PERF.md r4a for the bisect table.
    kind: jnp.ndarray     # (L,)  i32 KIND_TRI | KIND_SPHERE, or None
    cum: jnp.ndarray      # (L,)  f32 inclusive cumulative POWER fraction
    total_area: jnp.ndarray  # () f32 — 0.0 means "no lights" (NEE no-op)
    total_power: jnp.ndarray  # () f32 Σ luminance·area; the per-area pdf
    #                           at a sample of light i is lum_i / this
    # Textured emission (triangle lights only; feature-gated — None for
    # scenes without a textured emitter, keeping pytrees/jit keys
    # identical). uv0/uv_e1/uv_e2 mirror the v0/e1/e2 edge form; tex is
    # the atlas id (-1 on untextured rows, including every sphere).
    # Selection stays ∝ BASE power — the texture modulates the emitted
    # radiance at the sampled point, while both MIS arms keep the
    # locally-computable base-emission pdf (any weight pair summing to
    # one is unbiased).
    uv0: jnp.ndarray = None    # (L, 2) f32
    uv_e1: jnp.ndarray = None  # (L, 2) f32
    uv_e2: jnp.ndarray = None  # (L, 2) f32
    tex: jnp.ndarray = None    # (L,) i32
    # Many-light gather mode (L >= _GATHER_MIN only; None keeps every
    # small-table scene's pytree + jit graph untouched): all sampler
    # columns packed into one (L, _P_WIDTH) f32 table so selection is
    # searchsorted + ONE row gather (see module docstring).
    packed: jnp.ndarray = None


def build_light_table(v0, v1, v2, tri_mat, mat_type, mat_emit,
                      emissive_type: int, sph_center=None, sph_radius=None,
                      sph_mat=None, tri_uv=None, tri_tex=None) -> LightTable:
    """Host-side (NumPy) collection of emissive triangles + spheres.

    ``tri_uv`` ((T, 3, 2), optional): per-corner texture coordinates for
    ALL triangles (the scene's attr_uv rows, same order as v0);
    ``tri_tex`` ((T,), optional): per-triangle emission-texture atlas id
    (-1 = none). Both feed the textured-emission columns, attached only
    when some selected emitter actually has a texture.
    """
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
    luv = (np.asarray(tri_uv, np.float32)[sel]
           if tri_uv is not None else None)
    ltex = (np.asarray(tri_tex, np.int32)[sel]
            if tri_tex is not None else None)

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
    if luv is not None:
        luv = luv[keep]
    if ltex is not None:
        ltex = ltex[keep]
    normal = (n / np.maximum(norm[:, None], 1e-20)).astype(np.float32)
    kind = np.zeros(lv0.shape[0], np.int32)
    has_sphere = False

    if sph_center is not None and len(sph_center):
        sc = np.asarray(sph_center, np.float32)
        sr = np.asarray(sph_radius, np.float32)
        sm = np.asarray(sph_mat)
        ssel = (types[sm] == emissive_type) & (sr > 1e-12)
        if ssel.any():
            has_sphere = True
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
            if luv is not None:
                luv = np.concatenate(
                    [luv, np.zeros((k, 3, 2), np.float32)]
                )
            if ltex is not None:
                ltex = np.concatenate(
                    [ltex, np.full(k, -1, np.int32)]
                )

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
            kind=None,
            cum=jnp.ones(1, jnp.float32),
            total_area=jnp.float32(0.0),
            total_power=jnp.float32(0.0),
        )

    total = float(area.sum())
    cum = np.cumsum(power) / total_power
    uv_cols = {}
    if ltex is not None and (ltex >= 0).any():
        if luv is None:
            luv = np.zeros((lv0.shape[0], 3, 2), np.float32)
        uv_cols = dict(
            uv0=jnp.asarray(luv[:, 0]),
            uv_e1=jnp.asarray(luv[:, 1] - luv[:, 0]),
            uv_e2=jnp.asarray(luv[:, 2] - luv[:, 0]),
            tex=jnp.asarray(ltex),
        )
    packed = None
    if lv0.shape[0] >= _GATHER_MIN:
        pk = np.zeros((lv0.shape[0], _P_WIDTH), np.float32)
        pk[:, _P_V0] = lv0
        pk[:, _P_E1] = e1
        pk[:, _P_E2] = e2
        pk[:, _P_NORMAL] = normal
        pk[:, _P_EMIT] = lemit
        pk[:, _P_KIND] = kind
        if uv_cols:
            pk[:, _P_UV0] = np.asarray(uv_cols["uv0"])
            pk[:, _P_UVE1] = np.asarray(uv_cols["uv_e1"])
            pk[:, _P_UVE2] = np.asarray(uv_cols["uv_e2"])
            pk[:, _P_TEX] = np.asarray(uv_cols["tex"])
        else:
            pk[:, _P_TEX] = -1.0
        packed = jnp.asarray(pk)
    return LightTable(
        v0=jnp.asarray(lv0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        normal=jnp.asarray(normal),
        emit=jnp.asarray(lemit),
        kind=jnp.asarray(kind) if has_sphere else None,
        cum=jnp.asarray(cum.astype(np.float32)),
        total_area=jnp.float32(total),
        total_power=jnp.float32(total_power),
        packed=packed,
        **uv_cols,
    )


def _pick_and_select(lights: LightTable, u0):
    """Power-CDF light pick + row selection, mode chosen by table size.

    Returns ``(sel3, sel1)``: column selectors mapping a packed-layout
    name ('v0', 'e1', 'e2', 'normal', 'emit', 'kind', 'uv0', 'uv_e1',
    'uv_e2', 'tex') to the picked rows' values ((R, k) f32 / (R,) for
    scalars; 'kind'/'tex' come back i32). Small tables (packed is None)
    keep the historical one-hot masked-sum graph bit-exactly; large
    tables searchsorted the same CDF and fetch ONE packed row per ray.
    """
    n_lights = lights.cum.shape[0]
    if lights.packed is not None:
        # Pick: Σ(u > cum) count for tables the fused (R, L) compare
        # handles cheaply (2 ms vs jnp.searchsorted's 79 ms at R=1M,
        # L=288 on chip — its gathered binary search is the slowest op
        # in the old gather mode, PERF.md r5e); searchsorted only for
        # tables big enough that O(R·L) compares lose. Both compute the
        # IDENTICAL index (searchsorted(side='left') == the count by
        # construction; tests/test_many_lights.py locks it).
        if n_lights <= _SUMCOUNT_MAX:
            idx = jnp.sum(
                (u0[:, None] > lights.cum[None, :]).astype(jnp.int32),
                axis=1,
            )
        else:
            idx = jnp.searchsorted(lights.cum, u0, side="left")
        idx = jnp.clip(idx, 0, n_lights - 1)
        # One row gather — on TPU through the Pallas dynamic_gather
        # kernel (bit-identical to jnp.take, ~100x its throughput for
        # VMEM-resident tables; PERF.md r5d/r5e), XLA take elsewhere.
        from pathtracing_tpu.ops import pgather
        rows = pgather.gather_rows(lights.packed, idx)  # (R, W)
        cols = {"v0": _P_V0, "e1": _P_E1, "e2": _P_E2,
                "normal": _P_NORMAL, "emit": _P_EMIT,
                "uv0": _P_UV0, "uv_e1": _P_UVE1, "uv_e2": _P_UVE2}
        scalars = {"kind": _P_KIND, "tex": _P_TEX}

        def sel3(name):
            return rows[:, cols[name]]

        def sel1(name):
            v = rows[:, scalars[name]]
            return v.astype(jnp.int32)

        return sel3, sel1

    idx = jnp.clip(
        jnp.sum((u0[:, None] > lights.cum[None, :]).astype(jnp.int32),
                axis=1),
        0, n_lights - 1,
    )
    onehot = (
        jnp.arange(n_lights, dtype=jnp.int32)[None, :] == idx[:, None]
    )                                           # (R, L) bool

    def sel3(name):  # (L, 3) -> (R, 3)
        # Exact masked-sum selection. NOT a matmul: TPU f32 dots default
        # to bf16 multiplies, and a light point 4e-3 off its own plane
        # makes shadow rays hit the light geometry itself — measured as
        # a ~20% darkening of every NEE estimate.
        table = getattr(lights, name)
        return jnp.sum(
            jnp.where(onehot[:, :, None], table[None, :, :], 0.0), axis=1
        )

    def sel1(name):  # (L,) int -> (R,) int
        table = getattr(lights, name)
        return jnp.sum(jnp.where(onehot, table[None, :], 0), axis=1)

    return sel3, sel1


def sample(lights: LightTable, u):
    """Power-weighted light pick, area-uniform point within it.

    u: (R, 3) uniforms. Returns (point (R,3), normal (R,3), emit (R,3)).
    The per-area pdf at the returned point is
    ``luminance(emit) / total_power`` (see module docstring).
    """
    sel3, sel1 = _pick_and_select(lights, u[:, 0])
    v0 = sel3("v0")
    e1 = sel3("e1")
    e2 = sel3("e2")
    normal = sel3("normal")
    emit = sel3("emit")

    # Triangle: sqrt-warped uniform barycentrics.
    su = jnp.sqrt(jnp.maximum(u[:, 1:2], 1e-12))
    a = 1.0 - su
    b = su * u[:, 2:3]
    p_tri = v0 + a * e1 + b * e2

    if lights.kind is None:  # r4a gate: no sphere emitters in the table
        return p_tri, normal, emit

    is_sph = sel1("kind") == KIND_SPHERE

    # Sphere: area-uniform surface point (v0 = center, e1.x = radius).
    z = 1.0 - 2.0 * u[:, 1]
    rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[:, 2]
    dir_s = jnp.stack([rxy * jnp.cos(phi), rxy * jnp.sin(phi), z], axis=1)
    p_sph = v0 + e1[:, 0:1] * dir_s

    point = jnp.where(is_sph[:, None], p_sph, p_tri)
    normal = jnp.where(is_sph[:, None], dir_s, normal)
    return point, normal, emit


def sample_solid_angle(lights: LightTable, u, origin,
                       with_uv: bool = False):
    """NEE light sample with its actual per-solid-angle pdf.

    u: (R, 3) uniforms; origin: (R, 3) shading points. Returns
    (point (R,3), normal (R,3), emit (R,3), pdf_sa (R,)).

    Light pick and triangle points are identical draws to ``sample``
    (same uniforms, same CDF — triangle-only scenes are bit-identical).
    Sphere rows switch to visible-cap cone sampling: a uniform
    direction in the cone of half-angle asin(r/d) toward the center,
    mapped to its first sphere intersection. ``pdf_sa`` is the TRUE
    sampling density per solid angle at ``origin``:

      triangles / inside-sphere fallback:
          dist² · lum / (cosθ_l · total_power)     (area law converted)
      visible cap:
          pick_prob / (2π (1−cos θmax))
        = 2 · lum · r² / (total_power · (1−cos θmax))

    with 1−cosθmax computed as sin²θmax/(1+cosθmax) so tiny far-away
    lamps don't cancel to zero in f32.
    """
    from pathtracing_tpu.ops import linalg

    sel3, sel1 = _pick_and_select(lights, u[:, 0])
    v0 = sel3("v0")
    e1 = sel3("e1")
    e2 = sel3("e2")
    normal = sel3("normal")
    emit = sel3("emit")

    # Triangle: sqrt-warped uniform barycentrics (same draws as sample).
    su = jnp.sqrt(jnp.maximum(u[:, 1:2], 1e-12))
    a = 1.0 - su
    b = su * u[:, 2:3]
    p_tri = v0 + a * e1 + b * e2

    if lights.kind is None:
        # r4a gate: no sphere emitters — pure-triangle graph. Same
        # values as the general path (cone mask is all-False there), so
        # triangle-only scenes keep identical draws and pdfs.
        point = p_tri
        lum = linalg.luminance(emit)
        wi_vec = point - origin
        dist2 = jnp.sum(wi_vec * wi_vec, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        cos_l = jnp.abs(linalg.dot(normal, wi_vec / dist[:, None]))
        pdf_sa = dist2 * lum / (cos_l * lights.total_power + 1e-20)
        if with_uv:
            uv = (sel3("uv0") + a * sel3("uv_e1") + b * sel3("uv_e2"))
            tex = sel1("tex")
            return point, normal, emit, pdf_sa, uv, tex
        return point, normal, emit, pdf_sa

    is_sph = sel1("kind") == KIND_SPHERE

    # Sphere, area-uniform (inside-the-sphere fallback only).
    z = 1.0 - 2.0 * u[:, 1]
    rxy = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u[:, 2]
    dir_s = jnp.stack([rxy * jnp.cos(phi), rxy * jnp.sin(phi), z], axis=1)
    p_area = v0 + e1[:, 0:1] * dir_s

    # Sphere, visible-cap cone. Frame axis points from the center to the
    # shading point; α is the polar angle of the sampled surface normal.
    rad = e1[:, 0]
    ro = origin - v0
    dc2 = jnp.sum(ro * ro, axis=-1)
    dc = jnp.sqrt(jnp.maximum(dc2, 1e-20))
    outside = dc2 > rad * rad * 1.0002
    sin2max = jnp.clip(rad * rad / jnp.maximum(dc2, 1e-20), 0.0, 1.0)
    cosmax = jnp.sqrt(jnp.maximum(1.0 - sin2max, 0.0))
    one_minus = sin2max / (1.0 + cosmax)          # = 1 - cosθmax, stable
    cost = 1.0 - u[:, 1] * one_minus              # uniform in [cosmax, 1]
    sin2t = jnp.maximum(1.0 - cost * cost, 0.0)
    ds = dc * cost - jnp.sqrt(jnp.maximum(rad * rad - dc2 * sin2t, 0.0))
    cosa = jnp.clip(
        (dc2 + rad * rad - ds * ds)
        / jnp.maximum(2.0 * dc * rad, 1e-20),
        -1.0, 1.0,
    )
    sina = jnp.sqrt(jnp.maximum(1.0 - cosa * cosa, 0.0))
    w_axis = ro / dc[:, None]
    t1, t2 = linalg.orthonormal_basis(w_axis)
    n_cone = (
        (sina * jnp.cos(phi))[:, None] * t1
        + (sina * jnp.sin(phi))[:, None] * t2
        + cosa[:, None] * w_axis
    )
    p_cone = v0 + rad[:, None] * n_cone

    cone = is_sph & outside
    point = jnp.where(
        cone[:, None], p_cone,
        jnp.where(is_sph[:, None], p_area, p_tri),
    )
    normal = jnp.where(
        is_sph[:, None], jnp.where(cone[:, None], n_cone, dir_s), normal
    )

    # Actual per-solid-angle pdf at the returned point.
    lum = linalg.luminance(emit)
    wi_vec = point - origin
    dist2 = jnp.sum(wi_vec * wi_vec, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    cos_l = jnp.abs(linalg.dot(normal, wi_vec / dist[:, None]))
    pdf_gen = dist2 * lum / (cos_l * lights.total_power + 1e-20)
    pdf_cone = (2.0 * lum * rad * rad
                / (lights.total_power * one_minus + 1e-20))
    pdf_sa = jnp.where(cone, pdf_cone, pdf_gen)
    if with_uv:
        # Textured-emission support: the sampled point's interpolated
        # texture coordinate (triangle rows; sphere rows carry tex=-1
        # and zeros here) + the emission-texture atlas id. Same (a, b)
        # draws as the point, so the texel sits exactly at ``point``.
        uv = (sel3("uv0") + a * sel3("uv_e1") + b * sel3("uv_e2"))
        tex = sel1("tex")  # the selected row's id (may be -1 = untextured)
        return point, normal, emit, pdf_sa, uv, tex
    return point, normal, emit, pdf_sa


# ---------------------------------------------------------------------------
# Delta lights (point / spot / directional)
#
# The reference has no lights at all (`Test.hlsl` shades by normal); these
# are the classic zero-extent emitters every production renderer carries.
# A delta light cannot be hit by a BSDF-sampled ray, so its estimator is
# pure next-event estimation with MIS weight 1 — no pdf bookkeeping beyond
# the power-weighted pick probability. The table is feature-gated on the
# Scene (``scene.delta is None`` keeps every existing jit graph and RNG
# stream bit-identical).

DELTA_POSITIONAL = 0   # point / spot: intensity is radiant W/sr
DELTA_DIRECTIONAL = 1  # direction is the travel direction; intensity is
#                        the irradiance on a surface facing the light


class DeltaLights(NamedTuple):
    position: jnp.ndarray   # (L, 3) f32 (directional rows: zeros)
    intensity: jnp.ndarray  # (L, 3) f32 (see kind comments above)
    direction: jnp.ndarray  # (L, 3) f32 unit spot axis / travel direction
    cos_inner: jnp.ndarray  # (L,) f32 spot: full intensity inside
    cos_outer: jnp.ndarray  # (L,) f32 spot: zero outside (-2 = no cone)
    kind: jnp.ndarray       # (L,) i32 DELTA_POSITIONAL | DELTA_DIRECTIONAL
    cum: jnp.ndarray        # (L,) f32 inclusive pick CDF (power-weighted)
    prob: jnp.ndarray       # (L,) f32 pick probability of each row


def build_delta_lights(specs) -> "DeltaLights | None":
    """Host-side table from a list of dicts:

      {"type": "point", "position": [..], "intensity": [r,g,b]}
      {"type": "spot", "position": [..], "direction": [..],
       "intensity": [..], "inner_degrees": 20, "outer_degrees": 30}
      {"type": "directional", "direction": [..], "irradiance": [r,g,b]}

    Pick weights go with approximate emitted power: 4π·lum for points,
    the solid-angle-scaled lum for spots, and a nominal 4π·lum for
    directionals (selection weights affect variance only, never bias —
    the estimate divides by the matching pick probability).
    """
    if not specs:
        return None
    pos, inten, direc, ci, co, kind, power = [], [], [], [], [], [], []
    for s in specs:
        t = s["type"]
        if t == "directional":
            d = np.asarray(s["direction"], np.float64)
            d = d / np.linalg.norm(d)
            e = np.asarray(s.get("irradiance", s.get("intensity")),
                           np.float32)
            pos.append(np.zeros(3, np.float32))
            inten.append(e)
            direc.append(d.astype(np.float32))
            ci.append(-2.0)
            co.append(-2.0)
            kind.append(DELTA_DIRECTIONAL)
            lum = float(0.2126 * e[0] + 0.7152 * e[1] + 0.0722 * e[2])
            power.append(4.0 * np.pi * lum)
            continue
        p = np.asarray(s["position"], np.float32)
        e = np.asarray(s["intensity"], np.float32)
        lum = float(0.2126 * e[0] + 0.7152 * e[1] + 0.0722 * e[2])
        if t == "spot":
            d = np.asarray(s["direction"], np.float64)
            d = d / np.linalg.norm(d)
            inner = float(np.cos(np.radians(s.get("inner_degrees", 20.0))))
            outer = float(np.cos(np.radians(s.get("outer_degrees", 30.0))))
            if inner < outer:
                raise ValueError("spot inner cone must be <= outer cone")
            # Power of the smooth cone ≈ 2π(1-cos̄)·lum with the falloff
            # band counted at half weight.
            power.append(2.0 * np.pi * (1.0 - 0.5 * (inner + outer)) * lum)
        elif t == "point":
            d = np.array([0.0, -1.0, 0.0], np.float64)
            inner, outer = -2.0, -2.0
            power.append(4.0 * np.pi * lum)
        else:
            raise ValueError(f"unknown delta light type: {t!r}")
        pos.append(p)
        inten.append(e)
        direc.append(d.astype(np.float32))
        ci.append(inner)
        co.append(outer)
        kind.append(DELTA_POSITIONAL)
    power = np.asarray(power, np.float64)
    total = power.sum()
    if total <= 0.0:
        return None
    prob = (power / total).astype(np.float32)
    cum = np.cumsum(power / total).astype(np.float32)
    return DeltaLights(
        position=jnp.asarray(np.stack(pos)),
        intensity=jnp.asarray(np.stack(inten)),
        direction=jnp.asarray(np.stack(direc)),
        cos_inner=jnp.asarray(np.asarray(ci, np.float32)),
        cos_outer=jnp.asarray(np.asarray(co, np.float32)),
        kind=jnp.asarray(np.asarray(kind, np.int32)),
        cum=jnp.asarray(cum), prob=jnp.asarray(prob),
    )


def sample_delta(dl: DeltaLights, u, origin):
    """Pick one delta light per ray (power-weighted) and evaluate it.

    u: (R,) uniforms; origin: (R, 3) shading points. Returns
    (wi (R,3) unit direction toward the light, t_shadow (R,) occlusion
    query distance, radiance (R,3) — the FULL unshadowed NEE radiance
    already divided by the pick probability, i.e. the estimate is
    f·cosθ·radiance for surface vertices). Spot falloff is the standard
    smoothstep between the inner and outer cone cosines; directional
    rows shadow toward infinity like the environment arm.
    """
    from pathtracing_tpu.ops import linalg

    n = dl.cum.shape[0]
    # Same CDF-walk pick as ``sample`` (count of thresholds passed).
    idx = jnp.clip(
        jnp.sum((u[:, None] > dl.cum[None, :]).astype(jnp.int32), axis=1),
        0, n - 1,
    )
    onehot = jnp.arange(n, dtype=jnp.int32)[None, :] == idx[:, None]

    def pick(table):
        # Masked one-hot sum (never a matmul — bf16 default dots put
        # light positions off by 4e-3; see module docstring).
        mask = onehot[..., None] if table.ndim == 2 else onehot
        return jnp.sum(jnp.where(mask, table[None], 0.0), axis=1)

    p = pick(dl.position)
    e = pick(dl.intensity)
    axis = pick(dl.direction)
    cin = pick(dl.cos_inner)
    cout = pick(dl.cos_outer)
    knd = pick(dl.kind.astype(jnp.float32))
    prob = pick(dl.prob)

    is_dir = knd > 0.5
    to_l = p - origin
    dist2 = jnp.sum(to_l * to_l, axis=-1)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    wi_pos = to_l / dist[:, None]
    wi = jnp.where(is_dir[:, None], -axis, wi_pos)
    t_shadow = jnp.where(is_dir, 1.0e7, dist * (1.0 - 1e-3))

    # Spot smoothstep falloff on the angle between the axis and the
    # direction toward the receiver (point rows: cout = -2 → always 1).
    cosang = linalg.dot(axis, -wi_pos)
    tt = jnp.clip(
        (cosang - cout) / jnp.maximum(cin - cout, 1e-6), 0.0, 1.0
    )
    falloff = jnp.where(cout > -1.5, tt * tt * (3.0 - 2.0 * tt), 1.0)

    rad_pos = e * (falloff / jnp.maximum(dist2, 1e-12))[:, None]
    radiance = jnp.where(is_dir[:, None], e, rad_pos)
    return wi, t_shadow, radiance / jnp.maximum(prob, 1e-12)[:, None]
