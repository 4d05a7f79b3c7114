"""Shared per-bounce shading core used by every integrator.

One bounce = batched closest-hit query -> environment/emissive
accumulation (MIS-weighted) -> optional next-event estimation with a
shadow ray -> branchless BSDF scatter -> Russian roulette. The megakernel
engine runs ``bounce_batch`` in a ``fori_loop`` over a fixed depth; the
wavefront engine calls it once per pool iteration with per-slot depth
counters. Keeping the body in one place guarantees both engines draw the
*same* RNG streams for the same (pixel, sample, bounce) counters and
therefore produce bit-identical per-path radiance estimates (only the
accumulation order differs).

No reference analogue beyond the single normal-shade in `Test.hlsl:26-32`;
this implements the BASELINE north-star estimator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.ops import linalg, materials, rng


def background_radiance(direction, mode: str):
    """Environment lookup for escaped rays (static mode → fused constant)."""
    if mode == "black":
        return jnp.zeros(direction.shape[:-1] + (3,), jnp.float32)
    if mode == "white":
        # Uniform unit environment (furnace-test mode).
        return jnp.ones(direction.shape[:-1] + (3,), jnp.float32)
    if mode == "gradient":
        # The classic white→sky-blue vertical gradient.
        t = 0.5 * (direction[..., 1] + 1.0)
        white = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        blue = jnp.array([0.5, 0.7, 1.0], jnp.float32)
        return (1.0 - t)[..., None] * white + t[..., None] * blue
    if mode == "uv":
        # Reference miss shading (`Test.hlsl:36`): color = (uv, 0). Only
        # meaningful for the parity model where uv is the ray's film coord;
        # approximated here by the direction's xy (documented difference).
        return jnp.stack(
            [direction[..., 0], direction[..., 1],
             jnp.zeros_like(direction[..., 0])], axis=-1,
        )
    raise ValueError(f"unknown background mode: {mode}")


INV_PI = 0.3183098861837907


def bounce_batch(scene, o, d, keys, depth, radiance, throughput, active,
                 rr_start_depth, background: str, traversal: str,
                 nee: bool = False, prev_pdf=None, prev_nee=None,
                 bin_rays: bool = False, return_shadow_count: bool = False,
                 ld_nee=None, ld_scatter=None, medium=None, sss=None,
                 time=None, cone=None, cone_spread=None,
                 nee_candidates: int = 1):
    """One bounce for a whole (R,) ray batch — the production path.

    Identical math and RNG streams to the original per-ray form (the
    random draws are vmapped over per-ray keys), but the closest-hit
    query runs as ONE batched ``scene.intersect_batch`` call so the
    cluster-sweep / Pallas traversal sees the full ray front instead of
    being trapped under vmap. ``depth`` may be a scalar (megakernel) or
    (R,) per-slot counters (wavefront).

    With ``nee`` (static), each diffuse vertex additionally samples the
    scene's area-light table (``ops.lights``) with a shadow ray, combined
    with BSDF sampling by the power heuristic: BSDF-sampled hits on light
    triangles are down-weighted by the light pdf, and light samples by
    the cosine pdf. ``prev_pdf``/``prev_nee`` carry the previous
    vertex's BSDF pdf across bounces (init: zeros / False — camera hits
    on lights then count fully).

    Returns (radiance, throughput, o, d, active, prev_pdf, prev_nee);
    with ``return_shadow_count`` an extra trailing element counts the
    shadow rays ACTUALLY traced this bounce (the ``cand`` lanes — not
    every NEE-lobe vertex; backfacing-to-light vertices skip the ray),
    feeding the honest segments metric.

    ``ld_nee`` ((R, 3)) / ``ld_scatter`` ((R, 2)) (optional): PRECOMPUTED
    low-discrepancy pairs for the FIRST vertex's variance-dominant 2D
    draws — the NEE light-surface point and the BSDF direction pair
    (``ops.rng.ld_pair``; engines compute them once per sample, outside
    the bounce loop, so the Halton math doesn't run every wave). Used
    where ``depth == 0``; deeper bounces keep independent threefry
    streams. Unbiased (rotation preserves uniform marginals); only
    per-pixel variance drops.

    ``medium`` ((R, 3), required iff ``scene.mat_absorb is not None``):
    the per-path interior absorption coefficient sigma_a carried across
    bounces (zeros = vacuum). This bounce's segment loses
    exp(-sigma_a · t) of throughput (Beer–Lambert, applied BEFORE this
    vertex's emission/NEE so absorption covers the path up to the
    vertex), and the coefficient updates when the scatter TRANSMITS
    through a dielectric boundary (front face → the material's
    ``mat_absorb`` row; back face → vacuum; no nested-media stack —
    the standard single-medium simplification). Adds NO random draws,
    so absorption-free scenes (``mat_absorb is None``) keep identical
    RNG streams and results bit-for-bit. When media are active the
    return tuple gains ``medium`` after ``prev_nee``. Known
    simplification: NEE shadow rays ignore transmittance through
    absorbing media (a diffuse vertex seen through colored glass keeps
    full direct light) — matching the any-hit occlusion model.

    ``sss`` ((R, 2), required iff ``scene.mat_interior is not None``):
    the per-path interior scattering row [sigma_s, g] carried across
    bounces like ``medium`` (zeros = vacuum). Inside a scattering
    dielectric the path random-walks: free-flight distances sample
    ~ Exp(sigma_s) (the exp/pdf cancellation keeps both medium-event
    and surface-pass-through weights at exactly 1 — sigma_s is scalar
    by design, color comes from the chromatic ``mat_absorb`` row
    applied over the segment actually traveled), directions continue
    by Henyey–Greenstein phase sampling. Interior vertices do NO next-
    event estimation — the enclosing boundary geometrically occludes
    every shadow ray, so skipping it is exact (not an approximation)
    for closed media, and ``prev_nee`` stays False so a later emissive
    hit through the boundary takes full BSDF weight, like after any
    specular vertex. The row updates on dielectric transmission
    (enter → the material's ``mat_interior`` row, exit → vacuum,
    single-medium simplification like ``medium``). Scatter-free scenes
    (``mat_interior is None``) never draw STREAM_SSS — identical
    graphs and streams bit-for-bit. When active the return tuple gains
    ``sss`` after ``medium``. Known simplifications: a camera starting
    inside a scattering object sees it as vacuum until the first
    boundary, and surface-NEE shadow rays treat scattering objects as
    opaque occluders (the any-hit model, same as absorbing media).

    ``cone`` ((R,), required iff ``scene_mod.uses_mips(scene)``): the
    per-path distance accumulated from the camera, carried across
    bounces like ``medium``. With it the pixel's ray cone (angular
    spread ``cone_spread``, ``cone_spread_of``) gives a world-space
    footprint at each hit, and texture lookups become trilinear
    mip-interpolated (``ops.texture.sample_trilinear``) — the
    minification-antialiasing path. Adds no random draws; mip-free
    scenes (``cone=None``) keep identical graphs/streams bit-for-bit.
    When active the return tuple gains ``cone`` after ``medium``.
    Known simplifications: the cone's spread stays the pixel angle
    across bounces (no curvature/roughness growth), and the NEE
    emission-texture lookup at the sampled light point stays bilinear
    (no footprint exists there; the residual aliasing is MC-averaged).

    ``nee_candidates`` (static int M, default 1): Talbot resampled
    importance sampling for the NEE light pick. M power-CDF candidates
    are scored by the unshadowed solid-angle contribution
    (``luminance(f·Le) · cosθ_surface``; medium vertices swap f·cos
    for albedo·phase), ONE is resampled ∝ score, and the estimator
    divides by the unbiased effective density ``M · p̂(y) / Σ w_i``
    instead of ``pdf_sa`` — still ONE shadow ray per vertex. M = 1 is
    a Python-level branch that keeps the legacy graph and RNG streams
    bit-identical (the r3n zero-cost gating contract); M > 1 pays M
    cheap light-table samples per vertex and wins on many-light scenes
    (see ``RenderConfig.nee_candidates``). The MIS weight against BSDF
    sampling keeps the one-sample area-law ``pdf_l`` on both arms —
    any weight pair summing to one is unbiased.
    """
    from pathtracing_tpu.models import scene as scene_mod
    from pathtracing_tpu.ops import lights as lights_ops

    r = o.shape[0]
    depth = jnp.broadcast_to(depth, (r,))
    if prev_pdf is None:
        prev_pdf = jnp.zeros(r, jnp.float32)
    if prev_nee is None:
        prev_nee = jnp.zeros(r, jnp.bool_)
    # Sort policy: the dense nearest-first kernels at their 128-ray tile
    # measure FASTER UNSORTED on every wave type (camera 5.85 vs 3.91,
    # bounce 3.19 vs 2.80, shadow 5.95 vs 4.41 Mrays/s — PERF.md r2):
    # image/pool order already bounds the per-tile cluster footprint
    # better than 216 octant bins, and the counting sort itself is pure
    # cost. The tree kernels (past the DNF scratch budget) still want
    # the sort, so the policy checks the scene's static shapes. Binning
    # is order-restoring, so either choice is bitwise-identical.
    # (The bf16 tree-walk traversal mode that also used to force the
    # sort is retired — every bf16 variant measured slower, PERF.md
    # r3d.)
    bin_rays = bin_rays and not scene_mod.uses_dnf(scene)
    with jax.named_scope("intersect"):
        hit = scene_mod.intersect_batch(
            scene, o, d, traversal, active=active, bin_rays=bin_rays,
            time=time,
        )

    has_fog = scene.fog is not None
    med_event = None
    if has_fog:
        # Homogeneous scattering fog: sample a free-flight distance
        # against sigma_t; an in-medium event preempts the surface hit.
        # The exp(-sigma_t t)/pdf cancellation leaves surface lanes
        # unweighted and medium lanes carrying the single-scattering
        # albedo sigma_s/sigma_t — the standard distance-sampling
        # estimator. Direction continues by Henyey–Greenstein phase
        # sampling (pdf == phase, so no weight), which slots into the
        # existing MIS machinery as just another finite-pdf lobe.
        from pathtracing_tpu.ops import sampling as sampling_ops

        fog_ss, fog_sa, fog_g = scene.fog[0], scene.fog[1], scene.fog[2]
        fog_sigma_t = fog_ss + fog_sa
        fog_albedo = fog_ss / fog_sigma_t
        uf = jax.vmap(
            lambda k, dp: jax.random.uniform(
                rng.stream_key(k, dp, rng.STREAM_FOG), (3,),
                dtype=jnp.float32,
            )
        )(keys, depth)
        t_eff = jnp.where(hit.valid, hit.t, 3.0e38)
        t_fog = -jnp.log1p(
            -jnp.minimum(uf[:, 0], 1.0 - 1e-7)
        ) / fog_sigma_t
        med_event = active & (t_fog < t_eff)
        o_med = o + t_fog[:, None] * d
        d_phase, cos_hg = sampling_ops.hg_sample(
            d, fog_g, uf[:, 1], uf[:, 2]
        )
        p_phase = sampling_ops.hg_phase(fog_g, cos_hg)

    has_vol = scene.vol is not None
    vol_event = None
    if has_vol:
        # Heterogeneous voxel-grid medium (ops.volume): delta-tracking
        # free-flight sampling against the grid-max majorant — the
        # homogeneous-fog estimator with a spatially varying collision
        # density. An in-grid event preempts the surface hit; event
        # lanes carry the CONSTANT single-scattering albedo
        # sigma_s/sigma_t and continue by HG phase sampling. NEE shadow
        # arms pay ratio-tracked transmittance through the grid.
        # Feature-gated like fog: grid-free scenes never fold
        # STREAM_VOL/STREAM_VOLT in (SceneBuilder forbids fog+vol
        # together — the combined estimator is untested).
        from pathtracing_tpu.ops import sampling as sampling_ops
        from pathtracing_tpu.ops import volume as volume_ops

        t_eff_v = jnp.where(hit.valid, hit.t, 3.0e38)
        vol_event, t_vol, u_ph = volume_ops.sample_distance(
            scene.vol, keys, depth, o, d, t_eff_v, active
        )
        o_vol = o + t_vol[:, None] * d
        d_phase_v, cos_v = sampling_ops.hg_sample(
            d, scene.vol.g, u_ph[:, 0], u_ph[:, 1]
        )
        p_phase_v = sampling_ops.hg_phase(scene.vol.g, cos_v)
        vol_albedo = scene.vol.albedo

    has_sss = scene.mat_interior is not None
    sss_event = None
    if has_sss:
        # Interior scattering (subsurface random walk): per-path
        # homogeneous medium — the fog estimator with sigma_s/g read
        # from the carried ``sss`` row instead of scene-global scalars.
        # Lanes in vacuum (sigma_s = 0) draw a ~infinite flight and
        # never event; the draws still happen on every lane so the
        # traced graph stays static.
        from pathtracing_tpu.ops import sampling as sampling_ops

        sss_sig = sss[:, 0]
        sss_g = sss[:, 1]
        u_s = jax.vmap(
            lambda k, dp: jax.random.uniform(
                rng.stream_key(k, dp, rng.STREAM_SSS), (3,),
                dtype=jnp.float32,
            )
        )(keys, depth)
        t_eff_s = jnp.where(hit.valid, hit.t, 3.0e38)
        t_sss = -jnp.log1p(
            -jnp.minimum(u_s[:, 0], 1.0 - 1e-7)
        ) / jnp.maximum(sss_sig, 1e-12)
        sss_event = active & (sss_sig > 0.0) & (t_sss < t_eff_s)
        o_sss = o + t_sss[:, None] * d
        d_phase_s, cos_s = sampling_ops.hg_sample(
            d, sss_g, u_s[:, 1], u_s[:, 2]
        )
        p_phase_s = sampling_ops.hg_phase(sss_g, cos_s)

    has_media = scene.mat_absorb is not None
    if has_media:
        # Beer–Lambert absorption over the segment ACTUALLY traveled
        # (up to the fog event when one preempts the hit). Escaped rays
        # attenuate nothing (a path can only be inside an absorber in a
        # closed region; seg 0 keeps env lookups exact).
        seg = jnp.where(hit.valid, hit.t, 0.0)
        if has_fog:
            seg = jnp.where(med_event, t_fog, seg)
        if has_vol:
            seg = jnp.where(vol_event, t_vol, seg)
        if has_sss:
            seg = jnp.where(sss_event, t_sss, seg)
        transmit = jnp.exp(-medium * seg[:, None])
        throughput = throughput * jnp.where(
            active[:, None], transmit, 1.0
        )

    has_env = scene.env is not None
    if has_env:
        from pathtracing_tpu.ops import envmap as envmap_ops

        # Image-based environment light: escaped rays look up the
        # lat-long map. Under NEE the environment is ALSO sampled as a
        # light (block below), so a BSDF-sampled escape from an
        # NEE-capable vertex is the "other estimator" of the same
        # integral — power-heuristic weight, mirroring the area-light
        # emit_w path. Area lights and the environment are DISJOINT
        # sources (surface emission vs radiance-at-infinity), so both
        # NEE estimators simply add; each is MIS'd against BSDF
        # sampling independently.
        env = envmap_ops.radiance(scene.env, d)
        if nee:
            pdf_env_d = envmap_ops.pdf(scene.env, d)
            w_esc = prev_pdf**2 / (prev_pdf**2 + pdf_env_d**2 + 1e-30)
            env = env * jnp.where(prev_nee, w_esc, 1.0)[:, None]
    else:
        env = background_radiance(d, background)
    escaped = active & jnp.logical_not(hit.valid)
    if has_fog:
        # A fog event preempts the escape (with infinite homogeneous
        # fog an escape means "no event before 3e38" — effectively
        # never; the env shows only through RR/depth truncation).
        escaped = escaped & jnp.logical_not(med_event)
    if has_vol:
        # A grid event preempts the escape; rays that traverse the
        # bounded grid without an event keep their escape radiance
        # (weight-1 pass-through — the delta-tracking estimator).
        escaped = escaped & jnp.logical_not(vol_event)
    if has_sss:
        # Belt-and-braces: an interior event can only preempt a real
        # boundary hit (scattering media are enclosed), but a leaky
        # mesh must not turn an interior walk into env radiance.
        escaped = escaped & jnp.logical_not(sss_event)
    radiance = radiance + jnp.where(escaped[:, None], throughput * env, 0.0)

    mtype, alb, par, emit = materials.gather(scene.material_table, hit.mat_id)
    alb = materials.effective_albedo(mtype, alb, par, emit, hit.position)
    emit = materials.effective_emission(mtype, emit)
    # BASE emission — the MIS pdf side. Textured emitters (below)
    # modulate the accumulated radiance, but light SELECTION is ∝ base
    # power, so both MIS arms must keep the base-emission pdf.
    emit_pdf = emit
    metal_col = None
    cc_col = None
    aniso_col = None
    if scene.mat_aniso is not None:
        # Anisotropic-GGX column — feature-gated like mat_param2.
        aniso_col = scene.mat_aniso[
            jnp.clip(hit.mat_id, 0, scene.mat_aniso.shape[0] - 1)
        ]
    if scene.mat_metallic is not None:
        # Principled metallic column — feature-gated like mat_param2.
        # Gathered ONCE here so metallic-roughness maps (below) can
        # override it before the NEE evals and the scatter see it.
        metal_col = scene.mat_metallic[
            jnp.clip(hit.mat_id, 0, scene.mat_metallic.shape[0] - 1)
        ]
        if scene.mat_clearcoat is not None:
            cc_col = scene.mat_clearcoat[
                jnp.clip(hit.mat_id, 0, scene.mat_clearcoat.shape[0] - 1)
            ]

    use_mips = scene_mod.uses_mips(scene) and cone is not None
    if scene.attr_shn is not None or scene.textures is not None:
        # Surface attributes (smooth shading normals / UV textures) —
        # feature-gated: attribute-free scenes skip every gather here
        # and stay bitwise identical to the pre-attribute renderer.
        with jax.named_scope("surface_attrs"):
            lod_base = None
            if use_mips:
                # Ray-cone LOD: footprint = spread x distance-from-
                # camera, stretched by the grazing angle (clamped — the
                # isotropic footprint can't follow extreme anisotropy).
                cos_g = jnp.abs(linalg.dot(d, hit.normal))
                dist_c = cone + jnp.where(hit.valid, hit.t, 0.0)
                width_c = (dist_c * cone_spread
                           / jnp.maximum(cos_g, 0.1))
                s_normal, uv, dens = scene_mod.surface_attributes(
                    scene, hit, cone_width=width_c
                )
                lod_base = jnp.log2(
                    jnp.maximum(width_c * dens, 1e-20)
                )
            else:
                s_normal, uv = scene_mod.surface_attributes(scene, hit)
            if scene.mat_tex is not None:
                from pathtracing_tpu.ops import texture as texture_ops

                tex_id = scene.mat_tex[
                    jnp.clip(hit.mat_id, 0, scene.mat_tex.shape[0] - 1)
                ]
                if use_mips:
                    tex_rgb = texture_ops.sample_trilinear(
                        scene.textures, tex_id, uv, lod_base
                    )
                else:
                    tex_rgb = texture_ops.sample_bilinear(
                        scene.textures, tex_id, uv
                    )
                textured = (tex_id >= 0) & hit.valid
                alb = jnp.where(textured[:, None], alb * tex_rgb, alb)
                # Textured emission (TV screens, stained glass): the
                # texel scales the emitted radiance; ``emit_pdf`` above
                # keeps the selection-matched base for the MIS weight.
                emit = jnp.where(
                    (textured
                     & (mtype == materials.TYPE_EMISSIVE))[:, None],
                    emit * tex_rgb, emit,
                )
            if scene.mat_mrtex is not None:
                # Metallic-roughness map (glTF channels: G scales the
                # roughness factor, B the metallic factor) — sampled
                # from the same atlas at the same UVs.
                from pathtracing_tpu.ops import texture as texture_ops

                mr_id = scene.mat_mrtex[
                    jnp.clip(hit.mat_id, 0, scene.mat_mrtex.shape[0] - 1)
                ]
                if use_mips:
                    mr = texture_ops.sample_trilinear(
                        scene.textures, mr_id, uv, lod_base
                    )
                else:
                    mr = texture_ops.sample_bilinear(
                        scene.textures, mr_id, uv
                    )
                mr_on = (mr_id >= 0) & hit.valid
                par = jnp.where(mr_on, par * mr[:, 1], par)
                if metal_col is not None:
                    metal_col = jnp.where(
                        mr_on, metal_col * mr[:, 2], metal_col
                    )
            if scene.attr_shn is not None or scene.mat_ntex is not None:
                # The interpolated (and/or normal-mapped) normal drives
                # every downstream cosine, sampling frame, and MIS pdf;
                # hit.position stays on the true geometry.
                hit = hit._replace(normal=s_normal)

    live = active & hit.valid
    if has_fog:
        live = live & jnp.logical_not(med_event)
    if has_vol:
        live = live & jnp.logical_not(vol_event)
    if has_sss:
        # Interior-event lanes skip ALL surface work — including NEE,
        # which the enclosing boundary would occlude anyway (see the
        # ``sss`` docstring: skipping it is exact for closed media).
        live = live & jnp.logical_not(sss_event)

    nee_on = nee and scene.lights is not None
    emit_w = jnp.ones(r, jnp.float32)
    if nee_on:
        # MIS: a BSDF-sampled path that lands on an area-light triangle
        # is the "other estimator" of the same direct-light integral the
        # previous vertex already sampled — weight by the power heuristic.
        # The light-sampling pdf is POWER-weighted selection × area-
        # uniform point: per-area luminance(emit)/total_power — known
        # from the hit's own emission, no primitive id needed
        # (ops.lights module docstring).
        total_power = scene.lights.total_power
        cos_l = jnp.abs(linalg.dot(d, hit.normal))
        pdf_l = (hit.t * hit.t * linalg.luminance(emit_pdf)
                 / (cos_l * total_power + 1e-20))
        w = prev_pdf**2 / (prev_pdf**2 + pdf_l**2 + 1e-30)
        # Every emissive primitive (triangle or sphere) is in the NEE
        # light table, so every emissive hit is the "other estimator":
        # pdf_l above is the per-area pdf converted to solid angle,
        # valid for both kinds (sphere rows use the full 4πr² surface).
        is_light = hit.valid & (jnp.max(emit, axis=-1) > 0.0)
        emit_w = jnp.where(
            prev_nee & is_light & (total_power > 0.0), w, 1.0
        )
    radiance = radiance + jnp.where(
        live[:, None], throughput * emit * emit_w[:, None], 0.0
    )

    nee_lobe = materials.is_nee_type(mtype)
    n_shadow = jnp.float32(0.0)

    def _lobe(wi_v, cos_v, rep: int = 1):
        """Evaluate the finite-pdf lobe (f, pdf_b) toward ``wi_v`` for
        this batch's materials — shared by the area-light NEE arm, the
        env-NEE arm, and (with ``rep=M``) RIS candidate scoring. With
        rep == 1 this is a pure refactor of the historical inline code:
        identical ops in identical order, so the M = 1 / env graphs stay
        bit-identical (the r3n gating contract)."""
        def _R(x):
            return x if rep == 1 else jnp.repeat(x, rep, axis=0)
        is_g = _R(mtype) == materials.TYPE_GGX
        f_g, pdf_g = materials.ggx_eval(
            _R(alb), _R(par), _R(hit.normal), _R(-d), wi_v
        )
        f_l = jnp.where(is_g[:, None], f_g, _R(alb) * INV_PI)
        p_b = jnp.where(is_g, pdf_g, cos_v * INV_PI)
        if aniso_col is not None:
            f_ga, pdf_ga = materials.ggx_eval_aniso(
                _R(alb), _R(par), _R(aniso_col), _R(hit.normal),
                _R(-d), wi_v
            )
            sel_a = is_g & (_R(aniso_col) > 1e-6)
            f_l = jnp.where(sel_a[:, None], f_ga, f_l)
            p_b = jnp.where(sel_a, pdf_ga, p_b)
        if scene.mat_metallic is not None:
            # Principled vertices: both-lobe sum with the mixture pdf
            # (exactly what scatter samples from) — feature-gated.
            is_pr = _R(mtype) == materials.TYPE_PRINCIPLED
            f_p, pdf_p = materials.principled_eval(
                _R(alb), _R(metal_col), _R(par), _R(hit.normal),
                _R(-d), wi_v,
                clearcoat=None if cc_col is None else _R(cc_col),
            )
            f_l = jnp.where(is_pr[:, None], f_p, f_l)
            p_b = jnp.where(is_pr, pdf_p, p_b)
        return f_l, p_b

    if nee_on:
        # Next-event estimation: sample a light point, cast a shadow
        # ray. Fires at every vertex with a finite-pdf lobe: diffuse
        # (f = albedo/π, pdf_b = cosine) AND GGX glossy (f/pdf_b from
        # ops.materials.ggx_eval) — glossy NEE is what tames the
        # veach_mis scene's variance.
        # Fog scenes share ONE light sample + shadow ray between
        # surface vertices and in-medium phase vertices (the NEE origin
        # selects per lane) — no second occlusion query per bounce.
        o_nee = hit.position
        if has_fog:
            o_nee = jnp.where(med_event[:, None], o_med, hit.position)
        if has_vol:
            o_nee = jnp.where(vol_event[:, None], o_vol, o_nee)
        if nee_candidates > 1:
            # Talbot RIS (see docstring): score M power-CDF candidates
            # by the unshadowed per-solid-angle target, resample ONE.
            # Static Python branch — M = 1 keeps the legacy graph and
            # RNG stream consumption bit-identical.
            M = nee_candidates
            uu = jax.vmap(
                lambda k, dp: jax.random.uniform(
                    rng.stream_key(k, dp, rng.STREAM_NEE), (3 * M + 1,),
                    dtype=jnp.float32,
                )
            )(keys, depth)
            ul_all = uu[:, : 3 * M].reshape(r, M, 3)
            u_pick = uu[:, 3 * M]
            if ld_nee is not None:
                # The LD pair covers candidate 0's variance-dominant
                # first-vertex draws; the rest stay threefry.
                d0 = (depth == 0)[:, None]
                first = jnp.where(d0, ld_nee, ul_all[:, 0, :])
                ul_all = jnp.concatenate(
                    [first[:, None, :], ul_all[:, 1:, :]], axis=1
                )
            # One flattened sampler call scores all R*M candidates.
            o_rep = jnp.repeat(o_nee, M, axis=0)
            clp, cln, clemit, cpdf = lights_ops.sample_solid_angle(
                scene.lights, ul_all.reshape(r * M, 3), o_rep
            )
            cvec = clp - o_rep
            cd2 = jnp.maximum(jnp.sum(cvec * cvec, axis=-1), 1e-12)
            cwi = cvec / jnp.sqrt(cd2)[:, None]
            ccos = jnp.maximum(
                jnp.sum(jnp.repeat(hit.normal, M, axis=0) * cwi,
                        axis=-1),
                0.0,
            )
            # p̂ per solid angle: the full unshadowed contribution
            # luminance(f · Le) · cosθ_surface — the BSDF MUST be in
            # the target: a luminance(Le)·cos-only target resamples
            # glossy lanes toward lights their lobe can't see, which
            # MEASURED as a net variance INCREASE on the glossy
            # many_lights_demo floor (r4 probe). Medium vertices swap
            # (f · cos) for (albedo · phase), mirroring the estimator.
            cf_lobe, _ = _lobe(cwi, ccos, rep=M)
            target = linalg.luminance(cf_lobe * clemit) * ccos
            if has_fog or has_vol:
                from pathtracing_tpu.ops import sampling as sampling_ops

                is_med = jnp.zeros(r, jnp.bool_)
                ph_g = jnp.float32(0.0)
                alb_med = jnp.float32(0.0)
                if has_fog:
                    is_med = is_med | med_event
                    ph_g = jnp.where(med_event, fog_g, ph_g)
                    alb_med = jnp.where(med_event, fog_albedo, alb_med)
                if has_vol:
                    is_med = is_med | vol_event
                    ph_g = jnp.where(vol_event, scene.vol.g, ph_g)
                    alb_med = jnp.where(
                        vol_event, scene.vol.albedo, alb_med
                    )
                cph = sampling_ops.hg_phase(
                    jnp.repeat(jnp.broadcast_to(ph_g, (r,)), M),
                    jnp.sum(jnp.repeat(d, M, axis=0) * cwi, axis=-1),
                )
                t_med = (linalg.luminance(clemit) * cph
                         * jnp.repeat(
                             jnp.broadcast_to(alb_med, (r,)), M))
                target = jnp.where(
                    jnp.repeat(is_med, M), t_med, target
                )
            wgt = jnp.where(
                cpdf > 1e-20, target / jnp.maximum(cpdf, 1e-20), 0.0
            ).reshape(r, M)
            w_sum = jnp.sum(wgt, axis=1)
            cum_w = jnp.cumsum(wgt, axis=1)
            j = jnp.clip(
                jnp.sum((u_pick[:, None] * w_sum[:, None]
                         > cum_w).astype(jnp.int32), axis=1),
                0, M - 1,
            )
            ul = jnp.take_along_axis(
                ul_all, j[:, None, None], axis=1
            )[:, 0, :]
            p_hat = jnp.take_along_axis(
                target.reshape(r, M), j[:, None], axis=1
            )[:, 0]
            ris_ok = (w_sum > 0.0) & (p_hat > 0.0)
        else:
            ul = jax.vmap(
                lambda k, dp: jax.random.uniform(
                    rng.stream_key(k, dp, rng.STREAM_NEE), (3,),
                    dtype=jnp.float32,
                )
            )(keys, depth)
            if ld_nee is not None:
                d0 = (depth == 0)[:, None]
                ul = jnp.where(d0, ld_nee, ul)
        # Visible-cap cone sampling for sphere lights (area-uniform for
        # triangles) — pdf_sa is the TRUE per-solid-angle density, the
        # estimator denominator. Triangle-only scenes draw identical
        # points and pdfs to the legacy area sampler, bit-for-bit.
        if nee_candidates > 1 and scene.lights.uv0 is None:
            # RIS winner reuse: the candidate pass already evaluated the
            # sampler at every (ul, o_nee) pair — take the winner's
            # point/normal/emission instead of re-running the sampler
            # (bitwise-identical values: sample_solid_angle is a pure
            # function of (u, origin), and the RIS effective density
            # replaces pdf_sa anyway). Saves one full R-lane sampler
            # pass of the M+1 (PERF.md r4e: candidate passes are the
            # whole RIS cost). Textured emitters skip the reuse: their
            # winner needs uv/tex, and gathering uv on all R*M
            # candidates would cost more than the one re-sample.
            jj = j[:, None, None]
            lp = jnp.take_along_axis(clp.reshape(r, M, 3), jj,
                                     axis=1)[:, 0]
            ln = jnp.take_along_axis(cln.reshape(r, M, 3), jj,
                                     axis=1)[:, 0]
            lemit = jnp.take_along_axis(clemit.reshape(r, M, 3), jj,
                                        axis=1)[:, 0]
            lemit_mod = lemit
            pdf_sa = jnp.where(
                ris_ok,
                nee_candidates * p_hat / jnp.maximum(w_sum, 1e-20),
                jnp.inf,
            )
        elif scene.lights.uv0 is not None:
            # Textured emitters: same draws, plus the sampled point's
            # uv + atlas id; the texel scales the CONTRIBUTION while
            # pdf_sa / the MIS pdfs stay on the base emission (any
            # weight pair summing to one is unbiased).
            from pathtracing_tpu.ops import texture as texture_ops

            lp, ln, lemit, pdf_sa, uv_l, tex_l = (
                lights_ops.sample_solid_angle(
                    scene.lights, ul, o_nee, with_uv=True
                )
            )
            ltex_rgb = texture_ops.sample_bilinear(
                scene.textures, tex_l, uv_l
            )
            lemit_mod = jnp.where(
                (tex_l >= 0)[:, None], lemit * ltex_rgb, lemit
            )
        else:
            lp, ln, lemit, pdf_sa = lights_ops.sample_solid_angle(
                scene.lights, ul, o_nee
            )
            lemit_mod = lemit
        if nee_candidates > 1:
            # The estimator divides by the unbiased effective RIS
            # density M·p̂(y)/Σw instead of pdf_sa (Talbot 2005);
            # zero-weight lanes (all M candidates backfacing) are
            # masked out of ``cand`` below via ris_ok.
            pdf_sa = jnp.where(
                ris_ok,
                nee_candidates * p_hat / jnp.maximum(w_sum, 1e-20),
                jnp.inf,
            )
        wi_vec = lp - o_nee
        dist2 = jnp.sum(wi_vec * wi_vec, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        wi = wi_vec / dist[:, None]
        cos_s = linalg.dot(hit.normal, wi)
        cos_l = jnp.abs(linalg.dot(ln, wi))
        total_power = scene.lights.total_power
        cand = (
            live & nee_lobe & (cos_s > 1e-6) & (cos_l > 1e-6)
            & (dist2 > 1e-8) & (total_power > 0.0)
        )
        if has_fog:
            cand_med = (
                med_event & (cos_l > 1e-6) & (dist2 > 1e-8)
                & (total_power > 0.0) & (fog_albedo > 0.0)
            )
            cand = cand | cand_med
        if has_vol:
            cand_vol = (
                vol_event & (cos_l > 1e-6) & (dist2 > 1e-8)
                & (total_power > 0.0) & (vol_albedo > 0.0)
            )
            cand = cand | cand_vol
        if nee_candidates > 1:
            cand = cand & ris_ok
        t_shadow = dist * (1.0 - 1e-3)
        # Any-hit occlusion query — not a full closest-hit intersect:
        # shadow rays need a yes/no answer only, and the dedicated
        # kernel short-circuits occluded lanes (scene.occluded_batch).
        occluded = scene_mod.occluded_batch(
            scene, o_nee, wi, t_shadow, traversal, active=cand,
            bin_rays=bin_rays, time=time,
        )
        vis = cand & jnp.logical_not(occluded)
        n_shadow = jnp.sum(cand.astype(jnp.int32)).astype(jnp.float32)

        f_lobe, pdf_b = _lobe(wi, cos_s)

        # MIS weight-side pdf: the locally-computable area-law density
        # (per-area luminance(lemit)/total_power converted to solid
        # angle) on BOTH arms — the BSDF-hit arm can't evaluate a cone
        # pdf, and any weight pair summing to one is unbiased (see
        # ops.lights.sample_solid_angle). The ESTIMATE divides by the
        # true pdf_sa; for triangles the two coincide bitwise.
        pdf_l = (dist2 * linalg.luminance(lemit)
                 / (cos_l * total_power + 1e-20))
        if has_fog:
            # Medium vertices swap (BSDF · cosθ_surface) for
            # (albedo · phase) — the phase is per solid angle with no
            # receiver cosine — and the phase value doubles as pdf_b in
            # the power heuristic. ALL NEE arms additionally pay the
            # fog transmittance exp(-sigma_t · dist); the BSDF/phase
            # arm's transmittance is implicit in distance sampling, and
            # MIS weights stay a partition of unity either way.
            p_phase_l = sampling_ops.hg_phase(fog_g, linalg.dot(d, wi))
            pdf_b = jnp.where(med_event, p_phase_l, pdf_b)
        if has_vol:
            p_phase_lv = sampling_ops.hg_phase(
                scene.vol.g, linalg.dot(d, wi)
            )
            pdf_b = jnp.where(vol_event, p_phase_lv, pdf_b)
        w = pdf_l**2 / (pdf_l**2 + pdf_b**2 + 1e-30)
        scale = cos_s / jnp.maximum(pdf_sa, 1e-20) * w
        contrib = throughput * f_lobe * lemit_mod * scale[:, None]
        if has_fog:
            scale_med = w / jnp.maximum(pdf_sa, 1e-20)
            contrib_med = (
                throughput * lemit_mod
                * (fog_albedo * p_phase_l * scale_med)[:, None]
            )
            contrib = jnp.where(
                med_event[:, None], contrib_med, contrib
            ) * jnp.exp(-fog_sigma_t * dist)[:, None]
        if has_vol:
            # Medium vertices swap (BSDF · cosθ) for (albedo · phase)
            # exactly like fog; EVERY arm additionally pays the
            # ratio-tracked grid transmittance over the shadow segment
            # (surface arms too — the grid occludes surface NEE).
            scale_med_v = w / jnp.maximum(pdf_sa, 1e-20)
            contrib_med_v = (
                throughput * lemit_mod
                * (vol_albedo * p_phase_lv * scale_med_v)[:, None]
            )
            contrib = jnp.where(
                vol_event[:, None], contrib_med_v, contrib
            )
            t_vnee = volume_ops.transmittance(
                scene.vol, keys, depth, o_nee, wi, t_shadow,
                volume_ops.SALT_NEE,
            )
            contrib = contrib * t_vnee[:, None]
        radiance = radiance + jnp.where(vis[:, None], contrib, 0.0)

    if nee and has_env:
        # Environment NEE: importance-sample the lat-long map
        # (∝ luminance·sinθ — what makes a small HDR sun disc usable),
        # cast an any-hit shadow ray toward infinity, MIS against the
        # BSDF lobe. Disjoint from area-light emission (see the escape
        # block above), so this adds to — never double-counts — the
        # area-light NEE estimate.
        from pathtracing_tpu.ops import envmap as envmap_ops

        ue = jax.vmap(
            lambda k, dp: jax.random.uniform(
                rng.stream_key(k, dp, rng.STREAM_ENV), (2,),
                dtype=jnp.float32,
            )
        )(keys, depth)
        wi_e, pdf_e = envmap_ops.sample(scene.env, ue[:, 0], ue[:, 1])
        le = envmap_ops.radiance(scene.env, wi_e)

        cos_e = linalg.dot(hit.normal, wi_e)
        cand_e = live & nee_lobe & (cos_e > 1e-6) & (pdf_e > 1e-12)
        o_env = hit.position
        if has_vol:
            # Medium vertices ALSO env-NEE (unlike infinite homogeneous
            # fog, a bounded grid sees the sky): phase swaps for the
            # BSDF·cos, and the escape-arm MIS (prev_nee includes
            # vol_event below) stays a partition of unity.
            cand_e = cand_e | (
                vol_event & (pdf_e > 1e-12) & (vol_albedo > 0.0)
            )
            o_env = jnp.where(vol_event[:, None], o_vol, o_env)
        occ_e = scene_mod.occluded_batch(
            scene, o_env, wi_e,
            jnp.full(r, 1.0e7, jnp.float32), traversal, active=cand_e,
            bin_rays=bin_rays, time=time,
        )
        vis_e = cand_e & jnp.logical_not(occ_e)
        n_shadow = n_shadow + jnp.sum(
            cand_e.astype(jnp.int32)
        ).astype(jnp.float32)

        f_lobe_e, pdf_b_e = _lobe(wi_e, cos_e)

        if has_vol:
            p_ph_e = sampling_ops.hg_phase(
                scene.vol.g, linalg.dot(d, wi_e)
            )
            pdf_b_e = jnp.where(vol_event, p_ph_e, pdf_b_e)
        w_e = pdf_e**2 / (pdf_e**2 + pdf_b_e**2 + 1e-30)
        scale_e = cos_e / jnp.maximum(pdf_e, 1e-20) * w_e
        contrib_e = throughput * f_lobe_e * le * scale_e[:, None]
        if has_fog:
            # Environment light sits at infinity — under homogeneous
            # fog its NEE transmittance is exp(-sigma_t·1e7) == 0.
            contrib_e = contrib_e * jnp.exp(-fog_sigma_t * 1.0e7)
        if has_vol:
            contrib_med_e = (
                throughput * le
                * (vol_albedo * p_ph_e * w_e
                   / jnp.maximum(pdf_e, 1e-20))[:, None]
            )
            contrib_e = jnp.where(
                vol_event[:, None], contrib_med_e, contrib_e
            )
            t_venv = volume_ops.transmittance(
                scene.vol, keys, depth, o_env, wi_e,
                jnp.full(r, 1.0e7, jnp.float32), volume_ops.SALT_ENV,
            )
            contrib_e = contrib_e * t_venv[:, None]
        radiance = radiance + jnp.where(vis_e[:, None], contrib_e, 0.0)

    if nee and scene.delta is not None:
        # Delta lights (point / spot / directional, ops.lights): pure
        # NEE with MIS weight 1 — a BSDF-sampled ray can never hit a
        # zero-extent emitter, so there is no "other estimator" to
        # weight against. One power-weighted pick per vertex; the
        # returned radiance already carries falloff, 1/d², and the pick
        # probability. Feature-gated: delta-free scenes never draw the
        # STREAM_DELTA uniform, keeping their graphs and streams
        # bit-identical.
        ud = jax.vmap(
            lambda k, dp: jax.random.uniform(
                rng.stream_key(k, dp, rng.STREAM_DELTA), (),
                dtype=jnp.float32,
            )
        )(keys, depth)
        o_dl = hit.position
        if has_fog:
            o_dl = jnp.where(med_event[:, None], o_med, hit.position)
        if has_vol:
            o_dl = jnp.where(vol_event[:, None], o_vol, o_dl)
        wi_d, t_sh_d, le_d = lights_ops.sample_delta(
            scene.delta, ud, o_dl
        )
        cos_d = linalg.dot(hit.normal, wi_d)
        cand_d = live & nee_lobe & (cos_d > 1e-6)
        if has_fog:
            cand_d = cand_d | (med_event & (fog_albedo > 0.0))
        if has_vol:
            cand_d = cand_d | (vol_event & (vol_albedo > 0.0))
        occ_d = scene_mod.occluded_batch(
            scene, o_dl, wi_d, t_sh_d, traversal, active=cand_d,
            bin_rays=bin_rays, time=time,
        )
        vis_d = cand_d & jnp.logical_not(occ_d)
        n_shadow = n_shadow + jnp.sum(
            cand_d.astype(jnp.int32)
        ).astype(jnp.float32)

        is_ggx_d = mtype == materials.TYPE_GGX
        f_ggx_d, _ = materials.ggx_eval(alb, par, hit.normal, -d, wi_d)
        f_lobe_d = jnp.where(is_ggx_d[:, None], f_ggx_d, alb * INV_PI)
        if aniso_col is not None:
            f_gad, _ = materials.ggx_eval_aniso(
                alb, par, aniso_col, hit.normal, -d, wi_d
            )
            sel_ad = is_ggx_d & (aniso_col > 1e-6)
            f_lobe_d = jnp.where(sel_ad[:, None], f_gad, f_lobe_d)
        if scene.mat_metallic is not None:
            is_pr_d = mtype == materials.TYPE_PRINCIPLED
            f_pd, _ = materials.principled_eval(
                alb, metal_col, par, hit.normal, -d, wi_d,
                clearcoat=cc_col,
            )
            f_lobe_d = jnp.where(is_pr_d[:, None], f_pd, f_lobe_d)

        contrib_d = throughput * f_lobe_d * le_d * cos_d[:, None]
        if has_fog:
            # Medium vertices swap f·cosθ for albedo·phase, and every
            # arm pays the fog transmittance over the shadow distance
            # (directional rows query to 1e7 → transmittance 0, like
            # the environment arm).
            p_ph_d = sampling_ops.hg_phase(fog_g, linalg.dot(d, wi_d))
            contrib_med_d = (
                throughput * le_d * (fog_albedo * p_ph_d)[:, None]
            )
            contrib_d = jnp.where(
                med_event[:, None], contrib_med_d, contrib_d
            ) * jnp.exp(-fog_sigma_t * t_sh_d)[:, None]
        if has_vol:
            # Same swap for grid-medium vertices; every arm pays the
            # ratio-tracked transmittance over the (finite or 1e7
            # directional) shadow segment — the _ray_box clip makes the
            # directional case a walk across the grid only.
            p_ph_dv = sampling_ops.hg_phase(
                scene.vol.g, linalg.dot(d, wi_d)
            )
            contrib_med_dv = (
                throughput * le_d * (vol_albedo * p_ph_dv)[:, None]
            )
            contrib_d = jnp.where(
                vol_event[:, None], contrib_med_dv, contrib_d
            )
            t_vdl = volume_ops.transmittance(
                scene.vol, keys, depth, o_dl, wi_d, t_sh_d,
                volume_ops.SALT_DELTA,
            )
            contrib_d = contrib_d * t_vdl[:, None]
        radiance = radiance + jnp.where(vis_d[:, None], contrib_d, 0.0)

    u = jax.vmap(
        lambda k, dp: jax.random.uniform(
            rng.stream_key(k, dp, rng.STREAM_SCATTER), (5,),
            dtype=jnp.float32,
        )
    )(keys, depth)
    if ld_scatter is not None:
        d0 = (depth == 0)[:, None]
        u = jnp.concatenate(
            [jnp.where(d0, ld_scatter, u[:, 0:2]), u[:, 2:]], axis=1
        )
    par2 = None
    if scene.mat_param2 is not None:
        # Second material parameter (rough dielectric's GGX alpha) —
        # feature-gated like mat_absorb: scenes without one never build
        # the rough-glass lobe.
        par2 = scene.mat_param2[
            jnp.clip(hit.mat_id, 0, scene.mat_param2.shape[0] - 1)
        ]
    disp = None
    if scene.mat_disp is not None:
        # Spectral dispersion column — feature-gated like mat_param2;
        # the channel pick needs the CURRENT throughput (channels the
        # path no longer carries are never picked).
        disp = scene.mat_disp[
            jnp.clip(hit.mat_id, 0, scene.mat_disp.shape[0] - 1)
        ]
    d_out, atten, scattered, scatter_pdf = materials.scatter(
        mtype, alb, par, emit, hit.normal, d, hit.front, u, param2=par2,
        disp=disp, throughput=throughput, metallic=metal_col,
        clearcoat=cc_col, aniso=aniso_col,
    )

    throughput = throughput * jnp.where(live[:, None], atten, 1.0)
    active = live & scattered
    if has_fog:
        # Medium vertices: throughput carries the single-scattering
        # albedo (sigma_s/sigma_t); the path continues along the
        # phase-sampled direction. Pure-absorption fog (sigma_s = 0)
        # kills the path outright.
        throughput = throughput * jnp.where(
            med_event[:, None], fog_albedo, 1.0
        )
        active = active | (med_event & (fog_albedo > 0.0))
    if has_vol:
        if scene.vol.emission is not None:
            # Emissive medium (fire): a real collision samples
            # ∝ sigma_t(x)·T(x), so (sigma_a/sigma_t)·Le(x) there is
            # the unbiased estimator of ∫ T·sigma_a·Le dt — the
            # absorption share of the collision carries the emission,
            # the scattering share (albedo, below) continues the path.
            le_v = volume_ops.emission_at(scene.vol, o_vol)
            radiance = radiance + jnp.where(
                vol_event[:, None],
                throughput * (1.0 - vol_albedo) * le_v, 0.0,
            )
        # Grid-medium vertices: constant single-scattering albedo
        # (density cancels — sigma_s(x)/sigma_t(x) = sigma_s/sigma_t),
        # path continues along the phase-sampled direction.
        throughput = throughput * jnp.where(
            vol_event[:, None], vol_albedo, 1.0
        )
        active = active | (vol_event & (vol_albedo > 0.0))
    if has_sss:
        # Interior-event weight is exactly 1 (scalar sigma_s cancels
        # against its own pdf; absorption was already paid by the
        # has_media segment factor) — the lane just stays alive and
        # keeps walking. RR below bounds the walk length.
        active = active | sss_event

    tp_max = jnp.max(throughput, axis=-1)
    rr_u = jax.vmap(
        lambda k, dp: jax.random.uniform(
            rng.stream_key(k, dp, rng.STREAM_RR), (), dtype=jnp.float32
        )
    )(keys, depth)
    p_continue = jnp.clip(tp_max, 0.05, 1.0)
    do_rr = depth >= rr_start_depth
    survive = jnp.logical_not(do_rr) | (rr_u < p_continue)
    throughput = jnp.where(
        (do_rr & survive)[:, None], throughput / p_continue[:, None],
        throughput,
    )
    active = active & survive

    o = hit.position
    if has_fog:
        o = jnp.where(med_event[:, None], o_med, o)
        d_out = jnp.where(med_event[:, None], d_phase, d_out)
        scatter_pdf = jnp.where(med_event, p_phase, scatter_pdf)
    if has_vol:
        o = jnp.where(vol_event[:, None], o_vol, o)
        d_out = jnp.where(vol_event[:, None], d_phase_v, d_out)
        scatter_pdf = jnp.where(vol_event, p_phase_v, scatter_pdf)
    if has_sss:
        o = jnp.where(sss_event[:, None], o_sss, o)
        d_out = jnp.where(sss_event[:, None], d_phase_s, d_out)
        # The phase pdf feeds MIS only if the NEXT hit is emissive —
        # possible only for emitters embedded inside the medium, where
        # full BSDF weight (prev_nee False, below) is the correct
        # single-estimator weight; still record the honest pdf.
        scatter_pdf = jnp.where(sss_event, p_phase_s, scatter_pdf)
    d = jnp.where(active[:, None], d_out, d)
    # The lobe's actual sampling pdf (cosine for diffuse, GGX NDF for
    # glossy, phase for fog vertices, 0 for delta lobes) feeds the next
    # vertex's MIS weight.
    prev_pdf = jnp.maximum(scatter_pdf, 1e-6)
    prev_nee = live & nee_lobe
    if has_fog:
        # Phase sampling is a finite-pdf lobe — emissive hits on the
        # next segment MIS against it exactly like a diffuse bounce.
        prev_nee = prev_nee | med_event
    if has_vol:
        prev_nee = prev_nee | vol_event
    out = (radiance, throughput, o, d, active, prev_pdf, prev_nee)
    if has_media:
        # Medium handoff at dielectric boundaries: a scattered direction
        # pointing INTO the surface (d_out·n < 0 against the ray-facing
        # normal) is a transmission — entering picks up the material's
        # absorption row, exiting returns to vacuum.
        absorb = scene.mat_absorb[
            jnp.clip(hit.mat_id, 0, scene.mat_absorb.shape[0] - 1)
        ]
        is_diel = (mtype == materials.TYPE_DIELECTRIC) | (
            mtype == materials.TYPE_ROUGH_DIELECTRIC
        )
        transmitted = live & is_diel & (linalg.dot(d_out, hit.normal) < 0.0)
        medium = jnp.where(
            (transmitted & hit.front)[:, None], absorb,
            jnp.where(
                (transmitted & jnp.logical_not(hit.front))[:, None],
                0.0, medium,
            ),
        )
        out = out + (medium,)
    if has_sss:
        # Same boundary handoff for the scattering row: entering a
        # dielectric picks up its [sigma_s, g], exiting returns to
        # vacuum; interior events keep the row (still inside).
        interior = scene.mat_interior[
            jnp.clip(hit.mat_id, 0, scene.mat_interior.shape[0] - 1)
        ]
        is_diel_s = (mtype == materials.TYPE_DIELECTRIC) | (
            mtype == materials.TYPE_ROUGH_DIELECTRIC
        )
        transmitted_s = (
            live & is_diel_s & (linalg.dot(d_out, hit.normal) < 0.0)
        )
        sss = jnp.where(
            (transmitted_s & hit.front)[:, None], interior,
            jnp.where(
                (transmitted_s & jnp.logical_not(hit.front))[:, None],
                0.0, sss,
            ),
        )
        out = out + (sss,)
    if use_mips:
        # The cone grows by the segment actually traveled (hit distance,
        # or the fog event's free-flight distance when one preempts the
        # hit); escaped/dead lanes keep their value (never read again).
        seg_c = jnp.where(hit.valid, hit.t, 0.0)
        if has_fog:
            seg_c = jnp.where(med_event, t_fog, seg_c)
        if has_vol:
            seg_c = jnp.where(vol_event, t_vol, seg_c)
        if has_sss:
            seg_c = jnp.where(sss_event, t_sss, seg_c)
        out = out + (cone + seg_c,)
    return out + (n_shadow,) if return_shadow_count else out


def cone_spread_of(camera, config):
    """Per-pixel angular spread of the primary ray cone (the mip/LOD
    footprint driver): the vertical FOV split over the image rows — a
    traced scalar, so it never forces a recompile. Motion pairs use the
    opening pose (the FOV is rigid across the shutter)."""
    cam = camera[0] if isinstance(camera, tuple) else camera
    return 2.0 * cam.half_fov / jnp.float32(config.height)


def camera_sample(camera, config, seed, pixel_index, sample_index):
    """Primary-ray generation for one (pixel, sample) pair.

    Returns (key, origin, direction). The key is the per-path base key both
    engines derive every bounce stream from — identical counters mean
    identical paths regardless of engine or sharding.

    ``camera`` is either a single pose or a ``(open, close)`` motion
    pair; a pair draws a per-sample shutter time (its own stream —
    static-camera scenes never touch it, keeping their streams/graphs
    bit-identical) and traces through the interpolated pose.
    """
    from pathtracing_tpu.ops import camera as camera_ops

    h, w = config.height, config.width
    x = (pixel_index % w).astype(jnp.float32)
    # Film t runs bottom→top; image row 0 is the top.
    y = (h - 1 - pixel_index // w).astype(jnp.float32)
    k = rng.pixel_sample_key(seed, pixel_index, sample_index)
    if getattr(config, "sampler", "ld") == "ld":
        # Stratified pixel jitter: each pixel's samples form a
        # progressively refining Halton point set (ops.rng.ld_pair).
        j0, j1 = rng.ld_pair(seed, pixel_index, sample_index,
                             rng.STREAM_PIXEL_JITTER)
        ju = jnp.stack([j0, j1])
        l0, l1 = rng.ld_pair(seed, pixel_index, sample_index,
                             rng.STREAM_LENS)
        lu = jnp.stack([l0, l1])
    else:
        ju = jax.random.uniform(
            rng.stream_key(k, 0, rng.STREAM_PIXEL_JITTER), (2,),
            dtype=jnp.float32,
        )
        lu = jax.random.uniform(
            rng.stream_key(k, 0, rng.STREAM_LENS), (2,),
            dtype=jnp.float32,
        )
    if isinstance(camera, tuple):
        cam0, cam1 = camera
        if getattr(config, "sampler", "ld") == "ld":
            time = rng.ld_scalar(seed, pixel_index, sample_index,
                                 rng.STREAM_TIME)
        else:
            time = jax.random.uniform(
                rng.stream_key(k, 0, rng.STREAM_TIME), (),
                dtype=jnp.float32,
            )
        camera = camera_ops.lerp(cam0, cam1, time)
    s = (x + ju[0]) / w
    t = (y + ju[1]) / h
    o, d = camera_ops.generate_ray(camera, s, t, lu[0], lu[1])
    return k, o, d
