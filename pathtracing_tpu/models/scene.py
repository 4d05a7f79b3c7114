"""Scene representation: an SoA pytree of spheres, triangles, BVH, materials.

The reference's "scene" is one hard-coded sphere inside the compute kernel
(`Test.hlsl:12-13`); here scenes are data. Everything is a flat float32/int32
array so the scene shards/jits cleanly and the intersection kernels stay
branchless. Host-side construction goes through ``SceneBuilder`` (numpy);
``SceneBuilder.build()`` runs the BVH builder over all triangles and uploads
device arrays.

Layout invariants:
  * ≥ 1 sphere and ≥ 1 triangle always exist (degenerate, mat_id 0, can
    never be hit) so gathers/reductions never see zero-length axes.
  * Triangles are permuted so BVH leaves cover contiguous ranges.
  * Materials are a 4-column table indexed by per-primitive int32 mat ids
    (see ``ops.materials``).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.ops import bvh as bvh_ops
from pathtracing_tpu.ops import clusters as cluster_ops
from pathtracing_tpu.ops import cluster_trace, intersect, lights, linalg, materials


class Scene(NamedTuple):
    sph_center: jnp.ndarray   # (S, 3) f32
    sph_radius: jnp.ndarray   # (S,)   f32
    sph_mat: jnp.ndarray      # (S,)   i32
    tri_v0: jnp.ndarray       # (T, 3) f32
    tri_e1: jnp.ndarray       # (T, 3) f32
    tri_e2: jnp.ndarray       # (T, 3) f32
    tri_mat: jnp.ndarray      # (T,)   i32
    bvh: bvh_ops.FlatBVH
    mat_type: jnp.ndarray     # (K,)   i32
    mat_albedo: jnp.ndarray   # (K, 3) f32
    mat_param: jnp.ndarray    # (K,)   f32
    mat_emit: jnp.ndarray     # (K, 3) f32
    # TPU cluster-sweep acceleration structure (ops.clusters); None only
    # for hand-built Scene instances that skip SceneBuilder.
    clusters: cluster_ops.ClusterSet = None
    # Area-light table for next-event estimation (ops.lights); total_area
    # 0 disables NEE for the scene.
    lights: lights.LightTable = None
    # HBM page tables (ops.clusters.PageSet) for scenes whose Woop data
    # exceeds the whole-in-VMEM budget; None for small scenes. When set,
    # clusters are renumbered page-contiguously and the Pallas traversal
    # streams pages (cluster_trace.trace_pallas_paged).
    pages: cluster_ops.PageSet = None
    # Image-based environment light (ops.envmap.EnvMap); None falls back
    # to the static `background` mode. When set, escaped rays look up
    # the lat-long map and NEE importance-samples it as a light.
    env: "object" = None
    # Surface attributes (None unless the builder saw any — scenes
    # without them keep the zero-gather hot path and identical jit
    # keys). attr_uv (T, 3, 2) / attr_shn (T, 3, 3): per-corner texture
    # coordinates / shading normals in tri_v0 order (shn rows of 0 mean
    # "use the geometric normal"). slot_to_tri (C*128,) i32 maps padded
    # cluster slot ids to tri_v0 rows (-1 = padding).
    attr_uv: jnp.ndarray = None
    attr_shn: jnp.ndarray = None
    slot_to_tri: jnp.ndarray = None
    # Packed SLOT-indexed attribute table (C*128, 25) f32: one row per
    # padded cluster slot holding [valid, v0(3), e1(3), e2(3), shn(9),
    # uv(6)] — the per-wave resolve is then ONE gather by the kernel's
    # slot id instead of slot_to_tri + v0/e1/e2 + attr row gathers
    # (5 gathers; measured +18.8%/step on smooth-normal scenes,
    # PERF.md r3g). Values are the same f32 bits the row arrays hold,
    # so the packed path is arithmetically identical to the legacy
    # prim-indexed path (kept for the BVH/oracle route, whose hits
    # carry no slot). None unless the scene has attributes.
    attr_pack: jnp.ndarray = None
    # Image textures (ops.texture.TextureAtlas) + per-material texture id
    # ((K,) i32, -1 = untextured); both None for texture-free scenes.
    textures: "object" = None
    mat_tex: jnp.ndarray = None
    # Interior absorption coefficients ((K, 3) f32 Beer–Lambert sigma_a
    # per material, used by dielectrics: throughput *=
    # exp(-sigma_a * segment) while a path travels inside). None when no
    # material absorbs — absorption-free scenes keep the unmodified
    # bounce math, state shapes, and RNG streams bit-for-bit.
    mat_absorb: jnp.ndarray = None
    # Interior scattering media ((K, 2) f32 [sigma_s, g] per material,
    # used by dielectrics): paths inside random-walk with free flights
    # ~ Exp(sigma_s) and Henyey–Greenstein phase scattering — full
    # volumetric subsurface scattering (milk, jade, wax) when combined
    # with a chromatic ``mat_absorb`` row (scattering is monochromatic
    # by design: the exp/pdf cancellation keeps event weights at exactly
    # 1, so color comes from absorption, the Chiang-style "analog
    # scattering + deterministic absorption" split). None when no
    # material scatters — scatter-free scenes never draw STREAM_SSS,
    # keeping graphs and streams bit-identical.
    mat_interior: jnp.ndarray = None
    # Homogeneous scattering fog: (3,) f32 [sigma_s, sigma_a, g]
    # (Henyey–Greenstein anisotropy g). None disables — fog-free scenes
    # never draw the STREAM_FOG uniforms, keeping streams bit-identical.
    fog: jnp.ndarray = None
    # Optional (K,) f32 second material parameter (today: the rough
    # dielectric's GGX alpha; mat_param carries its IOR). None unless
    # some material is TYPE_ROUGH_DIELECTRIC — plain scenes skip the
    # rough-glass lobe in ``ops.materials.scatter`` entirely (identical
    # jit graphs and bitwise results, like ``mat_absorb``).
    mat_param2: jnp.ndarray = None
    # Optional (K,) i32 per-material NORMAL-MAP texture id into the same
    # atlas (-1 = none). Tangent-space maps ((2·texel − 1) = (t, b, n)
    # offsets) perturb the shading normal in ``surface_attributes``;
    # None unless some material carries one — unmapped scenes skip the
    # tangent math and atlas gathers entirely (bitwise-identical
    # renders, like every other feature gate above).
    mat_ntex: jnp.ndarray = None
    # Optional (K,) f32 dispersion column (IOR spread blue − red) for
    # spectral glass: a dispersive dielectric hit samples ONE RGB
    # channel ∝ throughput and refracts at that channel's IOR
    # (``ops.materials.scatter``). None unless some dielectric disperses
    # — plain scenes keep the identical jit graph and bitwise results.
    mat_disp: jnp.ndarray = None
    # Optional (K,) f32 metallic column for TYPE_PRINCIPLED materials
    # (metallic-roughness workflow; mat_param carries the perceptual
    # roughness). None unless some material is principled — plain
    # scenes skip the lobe entirely (identical jit graphs and bitwise
    # results, the same feature-gating contract as ``mat_param2``).
    mat_metallic: jnp.ndarray = None
    # Optional (K, 2) f32 clearcoat column [strength, roughness] for
    # principled materials (a second GGX layer at fixed IOR 1.5 — the
    # glTF clearcoat extension). None unless some material has
    # clearcoat > 0; strength-0 rows in a coated scene reduce
    # bit-exactly to the two-lobe principled results.
    mat_clearcoat: jnp.ndarray = None
    # Optional (K,) i32 metallic-roughness MAP id into the shared atlas
    # (-1 = none; glTF channel convention: G scales the roughness
    # factor, B the metallic factor). None unless some principled
    # material carries one — unmapped scenes skip the extra atlas
    # gather entirely.
    mat_mrtex: jnp.ndarray = None
    # Shared-geometry instancing (ops.clusters.InstanceSet): expanded
    # per-instance world AABBs + transforms over the PROTOTYPE clusters
    # stored in ``clusters`` (base geometry rides along as identity-
    # transform entries). When set, all cluster traversal routes through
    # the instanced DNF kernels (cluster_trace.trace_pallas_dnf_inst)
    # and the BVH fallback refuses (it only indexes base triangles).
    # None for ordinary scenes — identical pytrees and jit keys.
    instances: cluster_ops.InstanceSet = None
    # Anisotropic-GGX column: per-material anisotropy in [0, 1)
    # (Disney aspect convention, ops.materials._aniso_alphas). None for
    # isotropic scenes — identical pytrees, jit keys, and streams.
    mat_aniso: jnp.ndarray = None
    # Delta lights (ops.lights.DeltaLights): point / spot / directional
    # emitters, pure-NEE (a BSDF ray can't hit a zero-extent light, so
    # their estimator carries MIS weight 1). None for scenes without
    # them — identical pytrees, jit keys, and RNG streams.
    delta: lights.DeltaLights = None
    # Heterogeneous voxel-grid medium (ops.volume.VolumeGrid):
    # delta-tracking free flights + ratio-tracked NEE transmittance
    # against a dense density grid in a world AABB. None disables —
    # grid-free scenes never fold STREAM_VOL/STREAM_VOLT in, keeping
    # graphs and streams bit-identical. Mutually exclusive with ``fog``
    # (the builder raises; the combined estimator is untested).
    vol: "object" = None

    @property
    def material_table(self):
        return (self.mat_type, self.mat_albedo, self.mat_param, self.mat_emit)


class Hit(NamedTuple):
    """Per-ray hit record (SoA under vmap)."""

    t: jnp.ndarray        # distance, +inf on miss
    position: jnp.ndarray  # (…, 3)
    normal: jnp.ndarray    # (…, 3) unit, flipped to face against the ray
    mat_id: jnp.ndarray    # int32, 0 on miss (mask with .valid)
    front: jnp.ndarray     # bool, geometric front side
    valid: jnp.ndarray     # bool
    tri: jnp.ndarray       # bool, hit a triangle (vs sphere) — drives the
                           # MIS weighting of area-light hits
    prim: jnp.ndarray      # int32 index into tri_v0 order for triangle
                           # hits (-1 for spheres/misses, and for cluster
                           # paths when the scene has no slot_to_tri) —
                           # feeds surface-attribute interpolation
    slot: jnp.ndarray = None  # int32 padded cluster slot id (cluster
                           # traversal paths only; None from the BVH/
                           # oracle route). With ``scene.attr_pack`` it
                           # drives the single-gather attribute resolve;
                           # unused hits cost nothing (XLA DCE).


class SceneBuilder:
    """Host-side scene assembly (numpy): the ResourceFactory the reference
    stubbed out (`Graphics/ResourceFactory.cs:3-28`) plus the missing scene
    compiler. Not jit-traceable; call once per scene."""

    def __init__(self) -> None:
        self._sph = []          # (center, radius, mat)
        self._tri = []          # (v0, v1, v2, mat, uv3 | None)
        # (v0 (k,3), v1, v2, mat (k,), uv3 (k,3,2) | None,
        #  shn3 (k,3,3) | None) arrays
        self._tri_chunks = []
        self._mat = []          # (type, albedo, param, emit)
        self._mat_tex = []      # per-material texture id (-1 = none)
        self._mat_ntex = []     # per-material normal-map id (-1 = none)
        self._mat_absorb = []   # per-material interior sigma_a (r, g, b)
        self._mat_sss = []      # per-material interior (sigma_s, g)
        self._mat_param2 = []   # per-material second scalar (rough alpha)
        self._mat_disp = []     # per-material IOR dispersion (blue - red)
        self._mat_metallic = []  # per-material metallic (principled)
        self._mat_mrtex = []    # per-material metallic-roughness map id
        self._mat_cc = []       # per-material (clearcoat, cc roughness)
        self._mat_aniso = []    # per-material GGX anisotropy [0, 1)
        self._fog = None        # (sigma_s, sigma_a, g) scattering fog
        self._vol = None        # ops.volume.VolumeGrid (heterogeneous)
        self._tex = []          # host texture images (H, W, 3) f32
        self._mipmaps = False   # build a mip pyramid into the atlas
        self._env = None        # ops.envmap.EnvMap (image-based light)
        self._protos = []       # (v0, e1, e2, mats, [(3,4) xforms], [imat])
        self._delta = []        # delta-light spec dicts (ops.lights)

    def set_fog(self, sigma_s: float, sigma_a: float = 0.0,
                g: float = 0.0) -> None:
        """Fill the scene with a homogeneous scattering medium
        (``models.shading`` distance-samples it, scatters by the
        Henyey–Greenstein phase with anisotropy ``g``, and MIS-combines
        phase sampling with NEE). ``sigma_s + sigma_a`` must be > 0."""
        if sigma_s + sigma_a <= 0.0:
            raise ValueError("fog needs sigma_s + sigma_a > 0")
        if not -1.0 < g < 1.0:
            raise ValueError("HG anisotropy g must be in (-1, 1)")
        self._fog = (float(sigma_s), float(sigma_a), float(g))
        if self._vol is not None:
            raise ValueError("fog and a volume grid are mutually "
                             "exclusive (untested combined estimator)")

    def set_volume(self, density, bbox_min, bbox_max, sigma_s: float,
                   sigma_a: float = 0.0, g: float = 0.0,
                   n_steps=None, emission=None,
                   emit_color=None) -> None:
        """Place a heterogeneous voxel-grid medium (``ops.volume``):
        ``density`` is a (Nz, Ny, Nx) non-negative array filling the
        world AABB [bbox_min, bbox_max]; extinction at a point is
        ``trilinear(density) * (sigma_s + sigma_a)`` and scattering uses
        the Henyey–Greenstein phase with anisotropy ``g``. An optional
        ``emission`` grid (same shape) times ``emit_color`` makes the
        medium emit (fire); emissive media need ``sigma_a > 0``."""
        if self._fog is not None:
            raise ValueError("fog and a volume grid are mutually "
                             "exclusive (untested combined estimator)")
        if not -1.0 < g < 1.0:
            raise ValueError("HG anisotropy g must be in (-1, 1)")
        from pathtracing_tpu.ops import volume as volume_ops

        self._vol = volume_ops.build_grid(
            density, bbox_min, bbox_max, sigma_s, sigma_a=sigma_a, g=g,
            n_steps=n_steps, emission=emission, emit_color=emit_color,
        )

    # -- delta lights --------------------------------------------------
    def point_light(self, position, intensity) -> None:
        """Zero-extent point emitter: ``intensity`` is radiant W/sr
        (received radiance falls off as 1/d²)."""
        self._delta.append({
            "type": "point", "position": tuple(map(float, position)),
            "intensity": tuple(map(float, intensity)),
        })

    def spot_light(self, position, direction, intensity,
                   inner_degrees: float = 20.0,
                   outer_degrees: float = 30.0) -> None:
        """Point emitter restricted to a cone around ``direction`` with a
        smoothstep falloff between the inner and outer half-angles."""
        if inner_degrees > outer_degrees:
            raise ValueError("spot inner cone must be <= outer cone")
        self._delta.append({
            "type": "spot", "position": tuple(map(float, position)),
            "direction": tuple(map(float, direction)),
            "intensity": tuple(map(float, intensity)),
            "inner_degrees": float(inner_degrees),
            "outer_degrees": float(outer_degrees),
        })

    def directional_light(self, direction, irradiance) -> None:
        """Sun-style parallel light: ``direction`` is the travel
        direction; ``irradiance`` the power received by a surface facing
        it (no distance falloff; shadows query toward infinity)."""
        self._delta.append({
            "type": "directional",
            "direction": tuple(map(float, direction)),
            "irradiance": tuple(map(float, irradiance)),
        })

    def environment(self, texels_or_envmap) -> None:
        """Attach an image-based environment light: either a pre-built
        ``ops.envmap.EnvMap`` or a (H, W, 3) lat-long radiance grid."""
        from pathtracing_tpu.ops import envmap as envmap_ops

        if isinstance(texels_or_envmap, envmap_ops.EnvMap):
            self._env = texels_or_envmap
        else:
            self._env = envmap_ops.build_envmap(texels_or_envmap)

    # -- textures ----------------------------------------------------------
    def set_mipmaps(self, enabled: bool = True) -> None:
        """Build a box-filtered mip pyramid into the texture atlas and
        render with ray-cone LOD selection (``ops.texture`` mip docs).
        Off by default: the mip-free atlas keeps the exact pre-mip array
        shapes, jit graphs, and fixed-seed images (the feature gate)."""
        self._mipmaps = bool(enabled)

    def add_texture(self, image, srgb: bool = True) -> int:
        """Register a texture: an (H, W, 3) linear float array, or a path
        (PNG/JPEG converted from sRGB; .hdr/.npy pass through). Returns
        the texture id to pass as a material's ``texture=``. Pass
        ``srgb=False`` for data maps (normal maps) whose 8-bit values
        must stay linear in [0, 1]."""
        if isinstance(image, (str, os.PathLike)):
            from pathtracing_tpu.ops import texture as texture_ops

            image = texture_ops.load_texture(os.fspath(image), srgb=srgb)
        self._tex.append(np.asarray(image, np.float32))
        return len(self._tex) - 1

    def _tex_id(self, texture, srgb: bool = True) -> int:
        if texture is None:
            return -1
        if isinstance(texture, int):
            if not 0 <= texture < len(self._tex):
                raise ValueError(f"unknown texture id {texture}")
            return texture
        return self.add_texture(texture, srgb=srgb)

    # -- materials ---------------------------------------------------------
    def add_material(self, mtype, albedo=(0.0, 0.0, 0.0), param=0.0,
                     emit=(0.0, 0.0, 0.0), texture=None,
                     absorption=(0.0, 0.0, 0.0), param2=0.0,
                     normal_map=None, dispersion=0.0,
                     metallic=0.0, mr_texture=None,
                     clearcoat=0.0, clearcoat_roughness=0.1,
                     anisotropy=0.0, scattering=0.0,
                     scatter_g=0.0) -> int:
        """``texture`` (optional): a texture id from ``add_texture``, an
        image array, or a path. The sampled color MODULATES the albedo
        at UV-mapped hits (white albedo shows the texture alone).
        ``absorption``: interior Beer–Lambert sigma_a per channel —
        meaningful on dielectrics (colored glass); paths inside lose
        exp(-sigma_a · distance) of throughput per segment.
        ``param2``: second scalar parameter — the rough dielectric's
        GGX alpha (ignored by every other type today).
        ``normal_map`` (optional): tangent-space normal map (id, array,
        or path — 8-bit files load WITHOUT the sRGB transfer); texels
        decode as 2·rgb − 1 = (t, b, n) and perturb the shading normal
        (``surface_attributes``). Triangles need UVs for a tangent
        frame; spheres use their lat-long frame.
        ``dispersion``: IOR spread (blue − red) for spectral glass —
        smooth dielectrics only."""
        self._mat.append((int(mtype), tuple(albedo), float(param), tuple(emit)))
        self._mat_tex.append(self._tex_id(texture))
        self._mat_ntex.append(self._tex_id(normal_map, srgb=False))
        self._mat_absorb.append(tuple(float(x) for x in absorption))
        self._mat_param2.append(float(param2))
        self._mat_disp.append(float(dispersion))
        self._mat_metallic.append(float(metallic))
        # Metallic-roughness maps are DATA (G = roughness scale, B =
        # metallic scale) — loaded without the sRGB transfer.
        self._mat_mrtex.append(self._tex_id(mr_texture, srgb=False))
        self._mat_cc.append((float(clearcoat), float(clearcoat_roughness)))
        if not 0.0 <= anisotropy < 1.0:
            raise ValueError("anisotropy must be in [0, 1)")
        self._mat_aniso.append(float(anisotropy))
        # Interior scattering (subsurface random walk) — meaningful on
        # dielectrics; see Scene.mat_interior.
        if scattering < 0.0:
            raise ValueError("scattering (sigma_s) must be >= 0")
        if not -1.0 < scatter_g < 1.0:
            raise ValueError("HG anisotropy scatter_g must be in (-1, 1)")
        self._mat_sss.append((float(scattering), float(scatter_g)))
        return len(self._mat) - 1

    def lambertian(self, albedo, texture=None, normal_map=None) -> int:
        return self.add_material(
            materials.TYPE_LAMBERTIAN, albedo, texture=texture,
            normal_map=normal_map,
        )

    def metal(self, albedo, fuzz=0.0, texture=None, normal_map=None) -> int:
        return self.add_material(
            materials.TYPE_METAL, albedo, fuzz, texture=texture,
            normal_map=normal_map,
        )

    def ggx(self, f0, roughness=0.1, texture=None, normal_map=None,
            anisotropy=0.0) -> int:
        """Microfacet conductor: f0 = Fresnel normal reflectance,
        roughness = GGX alpha. Unlike ``metal`` it has a real pdf, so
        glossy vertices participate in NEE/MIS. ``anisotropy`` in
        [0, 1) stretches the NDF along a deterministic surface tangent
        (Disney aspect convention) — brushed-metal highlights."""
        return self.add_material(
            materials.TYPE_GGX, f0, roughness, texture=texture,
            normal_map=normal_map, anisotropy=anisotropy,
        )

    def dielectric(self, ior=1.5, tint=(1.0, 1.0, 1.0),
                   absorption=(0.0, 0.0, 0.0), roughness=0.0,
                   dispersion=0.0, scattering=0.0,
                   scatter_g=0.0) -> int:
        """``absorption``: interior sigma_a (Beer–Lambert) — e.g.
        (0.1, 2.0, 2.0) is red glass (green/blue absorbed).
        ``roughness`` > 0 selects the microfacet (Walter 2007) glass:
        GGX alpha = roughness, frosted reflections AND refractions.
        ``dispersion``: IOR spread blue − red (e.g. 0.04 ≈ dense flint);
        paths split to one RGB channel at the first dispersive hit —
        prism/rainbow caustics. Smooth dielectrics only (the rough-glass
        lobe ignores it today).
        ``scattering``: interior scattering coefficient sigma_s (per
        world unit) — paths inside the object random-walk (free flights
        ~ Exp(sigma_s), Henyey–Greenstein anisotropy ``scatter_g``):
        volumetric subsurface scattering. Combine with a chromatic
        ``absorption`` for colored translucency (milk: high sigma_s, low
        sigma_a; jade: green-transparent sigma_a). Dispersion and
        scattering are mutually exclusive (spectral paths through a
        random walk are untested)."""
        if scattering > 0.0 and dispersion > 0.0:
            raise ValueError("dispersion + scattering unsupported")
        if roughness > 0.0:
            return self.add_material(
                materials.TYPE_ROUGH_DIELECTRIC, tint, ior,
                absorption=absorption, param2=roughness,
                scattering=scattering, scatter_g=scatter_g,
            )
        return self.add_material(
            materials.TYPE_DIELECTRIC, tint, ior, absorption=absorption,
            dispersion=dispersion, scattering=scattering,
            scatter_g=scatter_g,
        )

    def principled(self, base_color, metallic=0.0, roughness=0.5,
                   texture=None, normal_map=None, mr_texture=None,
                   clearcoat=0.0, clearcoat_roughness=0.1) -> int:
        """Metallic-roughness material (the glTF/Disney-lite standard
        workflow): diffuse + GGX specular with F0 = lerp(0.04,
        base_color, metallic); ``roughness`` is perceptual (GGX alpha =
        roughness²). Fully NEE/MIS-eligible. A ``texture`` modulates the
        base color like every other textured material; ``mr_texture``
        is a metallic-roughness MAP in the glTF channel convention —
        its G channel scales ``roughness``, its B channel scales
        ``metallic`` (loaded linearly, it is data, not color).
        ``clearcoat`` adds a second GGX layer at fixed IOR 1.5 (the
        glTF clearcoat extension) with its own ``clearcoat_roughness``;
        the layer's Fresnel attenuates the base lobes."""
        return self.add_material(
            materials.TYPE_PRINCIPLED, base_color, roughness,
            texture=texture, normal_map=normal_map, metallic=metallic,
            mr_texture=mr_texture, clearcoat=clearcoat,
            clearcoat_roughness=clearcoat_roughness,
        )

    def emissive(self, radiance, texture=None) -> int:
        """``texture`` (optional) modulates the emitted radiance by the
        texel at the hit/sampled uv (TV screens, stained glass) — the
        emitter's geometry needs texture coordinates, like any textured
        surface. Light selection and the MIS pdfs stay on the BASE
        ``radiance`` power (see ops.lights.LightTable)."""
        return self.add_material(
            materials.TYPE_EMISSIVE, (0.0, 0.0, 0.0), 0.0, radiance,
            texture=texture,
        )

    def checker(self, color1, color2, frequency: float = 3.0) -> int:
        """Procedural two-tone Lambertian (world-space checkerboard);
        the emit columns carry the second color, param the frequency."""
        return self.add_material(
            materials.TYPE_CHECKER, color1, frequency, color2
        )

    # -- geometry ----------------------------------------------------------
    def add_sphere(self, center, radius, mat_id) -> None:
        self._sph.append((tuple(center), float(radius), int(mat_id)))

    def add_triangle(self, v0, v1, v2, mat_id, uv=None) -> None:
        """``uv`` (optional): three (u, v) pairs, one per corner."""
        uv3 = None if uv is None else tuple(
            (float(p[0]), float(p[1])) for p in uv
        )
        self._tri.append((tuple(v0), tuple(v1), tuple(v2), int(mat_id), uv3))

    def add_quad(self, corner, edge_u, edge_v, mat_id, uv=False) -> None:
        """Parallelogram as two triangles (Cornell walls). ``uv=True``
        attaches the unit square's texture coordinates (corner = (0,0),
        corner+edge_u = (1,0), corner+edge_v = (0,1))."""
        c = np.asarray(corner, np.float64)
        u = np.asarray(edge_u, np.float64)
        v = np.asarray(edge_v, np.float64)
        uv_a = ((0, 0), (1, 0), (1, 1)) if uv else None
        uv_b = ((0, 0), (1, 1), (0, 1)) if uv else None
        self.add_triangle(c, c + u, c + u + v, mat_id, uv=uv_a)
        self.add_triangle(c, c + u + v, c + v, mat_id, uv=uv_b)

    def add_mesh(self, vertices: np.ndarray, faces: np.ndarray, mat_id,
                 uvs=None, uv_faces=None, normals=None, normal_faces=None,
                 smooth: bool = False) -> None:
        """Indexed triangle mesh: vertices (V,3) float, faces (F,3) int.
        Stored as one array chunk — per-triangle Python tuples measured
        ~10 s of pure append/convert overhead at 2.6M triangles.

        Optional surface attributes:
          uvs (U, 2) + uv_faces (F, 3) — texture coordinates (uv_faces
            defaults to ``faces`` when the UV array is per-vertex);
          normals (M, 3) + normal_faces (F, 3) — shading normals;
          smooth=True — derive area-weighted vertex normals from the
            geometry (the standard smooth-shading look for meshes that
            ship without normals, e.g. icospheres).
        """
        vertices = np.asarray(vertices, np.float64)
        faces = np.asarray(faces, np.int64)
        tri = vertices[faces]  # (F, 3, 3)

        uv3 = None
        if uvs is not None:
            uvs = np.asarray(uvs, np.float64)
            uvf = faces if uv_faces is None else np.asarray(uv_faces, np.int64)
            uv3 = uvs[uvf].astype(np.float32)          # (F, 3, 2)

        shn3 = None
        if normals is None and smooth:
            from pathtracing_tpu.models.meshes import smooth_vertex_normals

            normals = smooth_vertex_normals(vertices, faces)
            normal_faces = faces
        if normals is not None:
            normals = np.asarray(normals, np.float64)
            nf = faces if normal_faces is None else np.asarray(
                normal_faces, np.int64
            )
            shn3 = normals[nf].astype(np.float32)      # (F, 3, 3)

        self._tri_chunks.append((
            tri[:, 0], tri[:, 1], tri[:, 2],
            np.full(tri.shape[0], int(mat_id), np.int32),
            uv3, shn3,
        ))

    def add_instances(self, vertices: np.ndarray, faces: np.ndarray,
                      mat_id, transforms, materials=None,
                      motion_transforms=None) -> None:
        """Instance one prototype mesh many times by object→world affine
        transforms — TRUE shared geometry (``ops.clusters.InstanceSet``):
        the mesh's Woop/material tensors are stored ONCE; each transform
        adds only ~72 bytes per prototype cluster of expanded traversal
        metadata, so a forest of N copies costs a fraction of N meshes.

        ``transforms``: sequence of (3, 4) or (4, 4) affine matrices
        (rotation, translation, uniform or non-uniform scale — any
        invertible affine; normals transform exactly via the inverse
        transpose). Restrictions (enforced at ``build()``): instanced
        materials cannot be emissive (the NEE light table indexes world-
        space triangles), instanced triangles carry no surface
        attributes (UVs / smooth normals — hits fall back to the exact
        geometric normal), and the expanded cluster count must fit the
        flat DNF budget. The reference has no instancing at all (one
        world-space triangle list, RayTracing/Graphics/Renderer.cs).

        ``materials`` (optional): one material id (or None) PER
        TRANSFORM, overriding ``mat_id`` for that instance — a forest of
        shared-geometry trees in varied colors. Overrides cannot be
        emissive either (same light-table reason).

        ``motion_transforms`` (optional): one SHUTTER-CLOSE transform
        (or None = static) per entry of ``transforms`` — object motion
        blur. The motion path lerps the forward affine per-ray at the
        path's shutter time (the same time that drives camera motion
        blur), so rigid camera+object motion stays consistent; see
        ops.cluster_trace._lerp_affine_inverse."""
        vertices = np.asarray(vertices, np.float64)
        faces = np.asarray(faces, np.int64)
        tri = vertices[faces]
        v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
        mats = np.full(tri.shape[0], int(mat_id), np.int32)
        ts = []
        for m in transforms:
            m = np.asarray(m, np.float64)
            if m.shape == (4, 4):
                m = m[:3]
            if m.shape != (3, 4):
                raise ValueError(
                    f"instance transform must be (3,4) or (4,4); "
                    f"got {m.shape}"
                )
            if abs(np.linalg.det(m[:, :3])) < 1e-12:
                raise ValueError("instance transform is singular")
            ts.append(m)
        if not ts:
            raise ValueError("add_instances needs at least one transform")
        mts = []
        if motion_transforms is not None:
            if len(motion_transforms) != len(ts):
                raise ValueError(
                    "add_instances motion_transforms must match "
                    f"transforms ({len(motion_transforms)} vs {len(ts)})"
                )
            for m1 in motion_transforms:
                if m1 is None:
                    mts.append(None)
                    continue
                m1 = np.asarray(m1, np.float64)
                if m1.shape == (4, 4):
                    m1 = m1[:3]
                if m1.shape != (3, 4):
                    raise ValueError(
                        "motion transform must be (3,4) or (4,4); "
                        f"got {m1.shape}"
                    )
                if abs(np.linalg.det(m1[:, :3])) < 1e-12:
                    raise ValueError("motion transform is singular")
                mts.append(m1)
        else:
            mts = [None] * len(ts)
        if materials is None:
            imats = [-1] * len(ts)
        else:
            if len(materials) != len(ts):
                raise ValueError(
                    "add_instances materials must match transforms "
                    f"({len(materials)} vs {len(ts)})"
                )
            imats = [int(m) if m is not None else -1 for m in materials]
        # Cast-then-subtract in f32 to match build()'s edge math exactly
        # (an identity-transform instance must trace bit-identically to
        # the same mesh added flat).
        v0f = v0.astype(np.float32)
        self._protos.append((
            v0f, v1.astype(np.float32) - v0f,
            v2.astype(np.float32) - v0f, mats, ts, imats, mts,
        ))

    # -- finalize ----------------------------------------------------------
    def build(self, page_clusters: int = 0) -> Scene:
        """Build device arrays. ``page_clusters`` forces HBM paging with
        that page size (testing); by default paging kicks in when the
        Woop tensors exceed the whole-in-VMEM budget (~64 MB) or the
        cluster tree exceeds the flat kernel's SMEM/cand_box ceiling."""
        if not self._mat:
            self.lambertian((0.5, 0.5, 0.5))

        # Degenerate pads: a zero-radius sphere at +inf-ish and a
        # zero-area triangle (both unhittable, mat 0).
        sph = self._sph or []
        far = (3.0e38, 3.0e38, 3.0e38)
        sph = sph + [(far, 0.0, 0)] if not sph else sph

        sph_center = np.array([s[0] for s in sph], np.float32)
        sph_radius = np.array([s[1] for s in sph], np.float32)
        sph_mat = np.array([s[2] for s in sph], np.int32)

        chunks = list(self._tri_chunks)
        if self._tri:
            t = self._tri
            uv3 = None
            if any(x[4] is not None for x in t):
                uv3 = np.zeros((len(t), 3, 2), np.float32)
                for i, x in enumerate(t):
                    if x[4] is not None:
                        uv3[i] = x[4]
            chunks.append((
                np.array([x[0] for x in t], np.float64),
                np.array([x[1] for x in t], np.float64),
                np.array([x[2] for x in t], np.float64),
                np.array([x[3] for x in t], np.int32),
                uv3, None,
            ))
        if not chunks:
            z = np.zeros((1, 3), np.float64)
            chunks = [(z, z, z, np.zeros(1, np.int32), None, None)]
        v0 = np.concatenate([c[0] for c in chunks]).astype(np.float32)
        v1 = np.concatenate([c[1] for c in chunks]).astype(np.float32)
        v2 = np.concatenate([c[2] for c in chunks]).astype(np.float32)
        tri_mat = np.concatenate([c[3] for c in chunks]).astype(np.int32)
        e1 = v1 - v0
        e2 = v2 - v0

        # Surface attributes (built only when some chunk carries them —
        # attribute-free scenes keep None fields, identical pytrees, and
        # the zero-gather shading path).
        def gather_attr(col: int, width: int):
            if not any(c[col] is not None for c in chunks):
                return None
            parts = []
            for c in chunks:
                k = c[0].shape[0]
                parts.append(
                    c[col].astype(np.float32) if c[col] is not None
                    else np.zeros((k, 3, width), np.float32)
                )
            return np.concatenate(parts)

        attr_uv = gather_attr(4, 2)
        attr_shn = gather_attr(5, 3)

        (node_min, node_max, node_meta), perm = bvh_ops.build_bvh(v0, e1, e2)
        cl, _, slot_to_tri = cluster_ops.build_clusters(v0, e1, e2, tri_mat)
        pages = None
        if self._protos and (page_clusters or (
                cl.woop.shape[0] > cluster_trace.DNF_MAX_CLUSTERS)):
            raise ValueError(
                "instanced scenes cannot page: base geometry must fit "
                f"the flat DNF budget ({cluster_trace.DNF_MAX_CLUSTERS} "
                "clusters)"
            )
        if page_clusters or (
                cl.woop.shape[0] > cluster_trace.DNF_MAX_CLUSTERS) or (
                cl.node_meta.shape[1] > cluster_ops.CAND_MAX_NODES):
            # Page as soon as the scene exceeds the flat DNF kernel's
            # scratch budget: the paged DNF sweep beats the flat tree
            # walk well before the ~64 MB whole-in-VMEM Woop ceiling
            # (PERF.md r2e), so there is no un-paged tree band left.
            cl, pages, page_remap = cluster_ops.build_pages(
                cl, page_clusters or cluster_ops.PAGE_CLUSTERS
            )
            slot_to_tri = cluster_ops.remap_slot_to_tri(
                slot_to_tri, page_remap, cl.aabb_min.shape[0]
            )
        v0, e1, e2, tri_mat = v0[perm], e1[perm], e2[perm], tri_mat[perm]

        has_attrs = attr_uv is not None or attr_shn is not None
        if has_attrs:
            # Attribute rows follow the stored (BVH-permuted) triangle
            # order; slot_to_tri re-targets the cluster slots' INPUT
            # indices to stored positions so every traversal backend
            # resolves the same attribute rows.
            if attr_uv is not None:
                attr_uv = attr_uv[perm]
            if attr_shn is not None:
                attr_shn = attr_shn[perm]
            inv_perm = np.empty(perm.shape[0], np.int64)
            inv_perm[perm] = np.arange(perm.shape[0])
            slot_to_tri = np.where(
                slot_to_tri >= 0,
                inv_perm[np.maximum(slot_to_tri, 0)], -1,
            ).astype(np.int32)

        # Shared-geometry instancing: append each prototype's clusters
        # (built in OBJECT space, SAH-packed per prototype so cluster id
        # ranges stay contiguous) after the base clusters, then expand
        # placements — base geometry as one identity-transform entry,
        # every instance as a (first, count, M) range — into the
        # InstanceSet the instanced DNF kernels traverse. The combined
        # ClusterSet keeps the BASE tree fields untouched: instanced
        # scenes never run a tree kernel (uses_dnf → True, routing below).
        instances = None
        if self._protos:
            mat_types = np.array([m[0] for m in self._mat], np.int32)
            n_base = cl.aabb_min.shape[0]
            placements = [(0, n_base, np.concatenate(
                [np.eye(3), np.zeros((3, 1))], axis=1))]
            parts = [cl]
            offset = n_base
            for pv0, pe1, pe2, pmats, ts, imats, mts in self._protos:
                if (mat_types[pmats] == materials.TYPE_EMISSIVE).any():
                    raise ValueError(
                        "instanced prototypes cannot use emissive "
                        "materials (the NEE light table indexes world-"
                        "space triangles); add emitters as base geometry"
                    )
                for im in imats:
                    if im >= 0 and mat_types[im] == materials.TYPE_EMISSIVE:
                        raise ValueError(
                            "per-instance material overrides cannot be "
                            "emissive (same light-table reason)"
                        )
                pcl, _, _ = cluster_ops.build_clusters(
                    np.asarray(pv0, np.float32),
                    np.asarray(pe1, np.float32),
                    np.asarray(pe2, np.float32), pmats,
                )
                npc = pcl.aabb_min.shape[0]
                parts.append(pcl)
                for m, im, m1 in zip(ts, imats, mts):
                    placements.append((offset, npc, m, im, m1))
                offset += npc
            cl = cl._replace(
                aabb_min=np.concatenate([p.aabb_min for p in parts]),
                aabb_max=np.concatenate([p.aabb_max for p in parts]),
                woop=np.concatenate([p.woop for p in parts]),
                normal=np.concatenate([p.normal for p in parts]),
                mat=np.concatenate([p.mat for p in parts]),
            )
            instances = cluster_ops.expand_instances(cl, placements)
            ce = instances.cmap.shape[0]
            if ce > cluster_trace.DNF_MAX_CLUSTERS:
                raise ValueError(
                    f"{ce} expanded instance clusters exceed the DNF "
                    f"budget ({cluster_trace.DNF_MAX_CLUSTERS}); reduce "
                    "instance counts or split the scene"
                )
            if has_attrs:
                # Prototype slots carry no attribute rows (shared
                # geometry shares them by design) — pad with -1 so
                # instanced hits resolve prim = -1 → geometric normal.
                slot_to_tri = np.concatenate([
                    slot_to_tri,
                    np.full((offset - n_base) * cluster_ops.CLUSTER_SIZE,
                            -1, np.int32),
                ])

        # Packed slot-indexed attribute rows (see the Scene field doc):
        # built LAST so slot_to_tri already carries paging remaps and
        # instanced-prototype -1 padding. Rows hold the exact f32 values
        # of the prim-indexed arrays, so both resolve paths compute
        # identical attributes.
        attr_pack = None
        if has_attrs:
            s_valid = slot_to_tri >= 0
            s_idx = np.maximum(slot_to_tri, 0)
            attr_pack = np.zeros((slot_to_tri.shape[0], 25), np.float32)
            attr_pack[:, 0] = s_valid
            attr_pack[:, 1:4] = v0[s_idx]
            attr_pack[:, 4:7] = e1[s_idx]
            attr_pack[:, 7:10] = e2[s_idx]
            if attr_shn is not None:
                attr_pack[:, 10:19] = attr_shn[s_idx].reshape(-1, 9)
            if attr_uv is not None:
                attr_pack[:, 19:25] = attr_uv[s_idx].reshape(-1, 6)
            attr_pack *= s_valid[:, None]

        textures = mat_tex = mat_ntex = mat_mrtex = None
        mat_tex_np = np.array(self._mat_tex, np.int32)
        mat_ntex_np = np.array(self._mat_ntex, np.int32)
        mat_mrtex_np = np.array(self._mat_mrtex, np.int32)
        any_tex = (mat_tex_np >= 0).any()
        any_ntex = (mat_ntex_np >= 0).any()
        any_mrtex = (mat_mrtex_np >= 0).any()
        if self._tex and (any_tex or any_ntex or any_mrtex):
            from pathtracing_tpu.ops import texture as texture_ops

            textures = texture_ops.build_atlas(self._tex,
                                               mips=self._mipmaps)
            if any_tex:
                mat_tex = jnp.asarray(mat_tex_np)
            if any_ntex:
                mat_ntex = jnp.asarray(mat_ntex_np)
            if any_mrtex:
                mat_mrtex = jnp.asarray(mat_mrtex_np)

        mat_absorb = None
        absorb_np = np.array(self._mat_absorb, np.float32)
        if absorb_np.size and (absorb_np > 0.0).any():
            mat_absorb = jnp.asarray(absorb_np)

        mat_interior = None
        sss_np = np.array(self._mat_sss, np.float32)
        if sss_np.size and (sss_np[:, 0] > 0.0).any():
            if self._fog is not None or self._vol is not None:
                raise ValueError(
                    "interior scattering and fog/volume grids are "
                    "mutually exclusive (the combined estimator is "
                    "untested)"
                )
            mat_interior = jnp.asarray(sss_np)

        mat_param2 = None
        types_np = np.array([m[0] for m in self._mat], np.int32)
        if (types_np == materials.TYPE_ROUGH_DIELECTRIC).any():
            mat_param2 = jnp.asarray(
                np.array(self._mat_param2, np.float32)
            )

        mat_disp = None
        disp_np = np.array(self._mat_disp, np.float32)
        if (disp_np > 0.0).any():
            mat_disp = jnp.asarray(disp_np)

        mat_aniso = None
        aniso_np = np.array(self._mat_aniso, np.float32)
        if (aniso_np > 0.0).any():
            mat_aniso = jnp.asarray(aniso_np)

        mat_metallic = None
        mat_clearcoat = None
        if (types_np == materials.TYPE_PRINCIPLED).any():
            mat_metallic = jnp.asarray(
                np.array(self._mat_metallic, np.float32)
            )
            cc_np = np.array(self._mat_cc, np.float32)
            if (cc_np[:, 0] > 0.0).any():
                mat_clearcoat = jnp.asarray(cc_np)

        mat_type = np.array([m[0] for m in self._mat], np.int32)
        mat_albedo = np.array([m[1] for m in self._mat], np.float32)
        mat_param = np.array([m[2] for m in self._mat], np.float32)
        mat_emit = np.array([m[3] for m in self._mat], np.float32)

        return Scene(
            sph_center=jnp.asarray(sph_center),
            sph_radius=jnp.asarray(sph_radius),
            sph_mat=jnp.asarray(sph_mat),
            tri_v0=jnp.asarray(v0),
            tri_e1=jnp.asarray(e1),
            tri_e2=jnp.asarray(e2),
            tri_mat=jnp.asarray(tri_mat),
            bvh=bvh_ops.FlatBVH(
                jnp.asarray(node_min), jnp.asarray(node_max),
                jnp.asarray(node_meta),
            ),
            mat_type=jnp.asarray(mat_type),
            mat_albedo=jnp.asarray(mat_albedo),
            mat_param=jnp.asarray(mat_param),
            mat_emit=jnp.asarray(mat_emit),
            clusters=jax.tree.map(jnp.asarray, cl),
            pages=(jax.tree.map(jnp.asarray, pages)
                   if pages is not None else None),
            lights=lights.build_light_table(
                v0, v0 + e1, v0 + e2, tri_mat, mat_type, mat_emit,
                materials.TYPE_EMISSIVE,
                sph_center=sph_center, sph_radius=sph_radius,
                sph_mat=sph_mat,
                # Textured emission: per-tri uv rows + the material's
                # texture id (columns attach only when an emitter is
                # actually textured — build_light_table gates).
                tri_uv=attr_uv,
                tri_tex=(mat_tex_np[tri_mat] if any_tex else None),
            ),
            env=self._env,
            attr_uv=(jnp.asarray(attr_uv) if attr_uv is not None else None),
            attr_shn=(jnp.asarray(attr_shn)
                      if attr_shn is not None else None),
            slot_to_tri=(jnp.asarray(slot_to_tri) if has_attrs else None),
            attr_pack=(jnp.asarray(attr_pack)
                       if attr_pack is not None else None),
            textures=textures,
            mat_tex=mat_tex,
            mat_ntex=mat_ntex,
            mat_absorb=mat_absorb,
            mat_interior=mat_interior,
            fog=(jnp.asarray(self._fog, jnp.float32)
                 if self._fog is not None else None),
            mat_param2=mat_param2,
            mat_disp=mat_disp,
            mat_aniso=mat_aniso,
            mat_metallic=mat_metallic,
            mat_clearcoat=mat_clearcoat,
            mat_mrtex=mat_mrtex,
            instances=(jax.tree.map(jnp.asarray, instances)
                       if instances is not None else None),
            delta=lights.build_delta_lights(self._delta),
            vol=self._vol,
        )


def intersect_scene(scene: Scene, origin, direction) -> Hit:
    """Closest hit for ONE ray against all primitives (vmap over batches).

    Spheres are brute-forced (few, analytic); triangles go through the
    threaded BVH (``ops.bvh.traverse``).
    """
    # Spheres: vectorized over the (small) sphere set.
    ts = intersect.ray_sphere(
        origin[None, :], direction[None, :],
        scene.sph_center, scene.sph_radius,
    )
    sph_idx = jnp.argmin(ts)
    sph_t = ts[sph_idx]

    tri_t, tri_idx = bvh_ops.traverse(
        scene.bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
        origin, direction, sph_t,  # BVH culls against the best sphere t
    )

    hit_tri = tri_t < sph_t
    t = jnp.where(hit_tri, tri_t, sph_t)
    valid = jnp.isfinite(t)
    position = origin + t[..., None] * direction

    # Geometric normals.
    safe_sph = jnp.minimum(sph_idx, scene.sph_center.shape[0] - 1)
    n_sph = (position - scene.sph_center[safe_sph]) / jnp.maximum(
        scene.sph_radius[safe_sph], 1e-12
    )
    safe_tri = jnp.clip(tri_idx, 0, scene.tri_v0.shape[0] - 1)
    n_tri = linalg.normalize(
        linalg.cross(scene.tri_e1[safe_tri], scene.tri_e2[safe_tri])
    )
    n_geo = jnp.where(hit_tri, n_tri, n_sph)

    front = linalg.dot(direction, n_geo) < 0.0
    normal = jnp.where(front, 1.0, -1.0) * n_geo

    mat_id = jnp.where(
        hit_tri, scene.tri_mat[safe_tri], scene.sph_mat[safe_sph]
    ).astype(jnp.int32)
    mat_id = jnp.where(valid, mat_id, 0)

    return Hit(
        t=t,
        position=position,
        normal=normal,
        mat_id=mat_id,
        front=front,
        valid=valid,
        tri=hit_tri & valid,
        prim=jnp.where(hit_tri & valid, tri_idx, -1).astype(jnp.int32),
    )


intersect_scene_batch = jax.vmap(intersect_scene, in_axes=(None, 0, 0))


def has_motion(scene: Scene) -> bool:
    """True when the scene carries motion-blurred instances — engines
    then draw a per-path shutter time (the camera-motion stream) and
    thread it through every traversal/occlusion query. Static predicate
    (shapes only), like ``uses_dnf``."""
    return (scene.instances is not None
            and scene.instances.fw0 is not None)


def uses_mips(scene: Scene) -> bool:
    """True when the texture atlas carries a mip pyramid — engines then
    carry a per-path accumulated distance (the ray cone) and shading
    selects texture LOD from it. Static predicate (shapes only), like
    ``uses_dnf``; mip-free scenes keep their exact pre-mip jit graphs."""
    return (scene.textures is not None
            and scene.textures.mip_table is not None)


def uses_dnf(scene: Scene) -> bool:
    """True when ``intersect_batch``/``occluded_batch`` will route this
    scene's cluster queries to a dense nearest-first kernel — flat
    scenes under the DNF scratch budget AND HBM-paged scenes (the
    per-page DNF sweep). A Python-level static predicate (shapes only)
    — engines use it to pick wave policies at trace time: DNF waves
    measure FASTER unsorted on every wave type, flat and paged alike
    (PERF.md r2c/r2e), and benefit from the megakernel's live-first
    compaction. Only the rare unpaged band past the DNF budget still
    wants the octant-sorted tree walk."""
    return scene.clusters is not None and (
        scene.pages is not None
        or scene.instances is not None
        or scene.clusters.woop.shape[0] <= cluster_trace.DNF_MAX_CLUSTERS
    )


def surface_attributes(scene: Scene, hit: Hit, cone_width=None):
    """Interpolated shading normal + texture coordinates at a hit batch.

    Returns (normal (R, 3), uv (R, 2)); with ``cone_width`` ((R,) f32,
    the ray cone's world-space footprint width at the hit — the mip/LOD
    path, ``ops.texture`` mip docs) an extra (R,) UV-per-world density
    ``sqrt(|det_uv| / |e1 x e2|)`` is appended, and normal-map lookups
    go through ``sample_trilinear`` at the matching LOD (zero density on
    sphere/UV-less hits clamps their LOD to 0 = plain bilinear).

    Triangle hits recover
    barycentrics from the hit point against the stored (v0, e1, e2)
    rows — the kernels stay attribute-free and return only the slot id;
    one slot→row gather resolves everything (PERF.md round-1 fact #1:
    XLA gathers are fine). Shading-normal rows of 0 (or scenes without
    ``attr_shn``) fall back to the geometric normal; the interpolated
    normal is flipped into the geometric hemisphere so BSDF sampling
    cannot tunnel through the surface. Sphere hits keep their analytic
    normal and get lat-long UVs from it.

    Only called when the scene carries attributes or textures —
    attribute-free scenes never pay these gathers.
    """
    r = hit.t.shape[0]
    if scene.attr_pack is not None and hit.slot is not None:
        # Cluster-kernel hits: ONE slot-indexed gather resolves the
        # validity bit, the triangle rows, and both attribute corners
        # (PERF.md r3m — replaces the 5-gather slot_to_tri chain; the
        # packed values are the same f32 bits, so both paths compute
        # identical attributes).
        safe_slot = jnp.clip(hit.slot, 0, scene.attr_pack.shape[0] - 1)
        pack = scene.attr_pack[safe_slot]
        tri = hit.tri & (pack[:, 0] > 0.0)
        v0 = pack[:, 1:4]
        e1 = pack[:, 4:7]
        e2 = pack[:, 7:10]
        shn = (pack[:, 10:19].reshape(r, 3, 3)
               if scene.attr_shn is not None else None)
        uvs = (pack[:, 19:25].reshape(r, 3, 2)
               if scene.attr_uv is not None else None)
    else:
        # BVH/oracle hits carry a prim index instead of a slot.
        tri = hit.tri & (hit.prim >= 0)
        safe = jnp.clip(hit.prim, 0, scene.tri_v0.shape[0] - 1)
        v0 = scene.tri_v0[safe]
        e1 = scene.tri_e1[safe]
        e2 = scene.tri_e2[safe]
        shn = scene.attr_shn[safe] if scene.attr_shn is not None else None
        uvs = scene.attr_uv[safe] if scene.attr_uv is not None else None

    # Barycentrics (u along e1, v along e2) by projecting the hit point
    # onto the edge basis — elementwise dots only (never a matmul: TPU
    # f32 dots default to bf16, PERF.md "Correctness gotcha").
    p = hit.position - v0
    d11 = linalg.dot(e1, e1)
    d12 = linalg.dot(e1, e2)
    d22 = linalg.dot(e2, e2)
    dp1 = linalg.dot(p, e1)
    dp2 = linalg.dot(p, e2)
    det = jnp.maximum(d11 * d22 - d12 * d12, 1e-20)
    bu = jnp.clip((d22 * dp1 - d12 * dp2) / det, 0.0, 1.0)
    bv = jnp.clip((d11 * dp2 - d12 * dp1) / det, 0.0, 1.0)
    bw = jnp.clip(1.0 - bu - bv, 0.0, 1.0)

    normal = hit.normal
    if shn is not None:
        ns = (bw[:, None] * shn[:, 0] + bu[:, None] * shn[:, 1]
              + bv[:, None] * shn[:, 2])
        len2 = jnp.sum(ns * ns, axis=-1)
        ok = tri & (len2 > 1e-12)
        ns = ns / jnp.sqrt(jnp.maximum(len2, 1e-20))[:, None]
        # Same hemisphere as the (already ray-facing) geometric normal.
        flip = jnp.where(linalg.dot(ns, hit.normal) < 0.0, -1.0, 1.0)
        normal = jnp.where(ok[:, None], ns * flip[:, None], hit.normal)

    if uvs is not None:
        uv_tri = (bw[:, None] * uvs[:, 0] + bu[:, None] * uvs[:, 1]
                  + bv[:, None] * uvs[:, 2])
    else:
        uv_tri = jnp.zeros((r, 2), jnp.float32)

    # Spheres: lat-long parameterization of the shading normal (exact
    # for outside hits; inside hits see the map mirrored — documented).
    n = hit.normal
    su = 0.5 + jnp.arctan2(n[:, 2], n[:, 0]) * (0.5 / jnp.pi)
    sv = 0.5 + jnp.arcsin(jnp.clip(n[:, 1], -1.0, 1.0)) * (1.0 / jnp.pi)
    uv = jnp.where(tri[:, None], uv_tri, jnp.stack([su, sv], axis=-1))

    dens = lod_base = None
    if cone_width is not None:
        # UV-per-world density for mip selection: the ratio of the
        # triangle's UV-space to world-space area, sqrt'd back to a
        # length scale (isotropic footprint approximation; no ray
        # differentials). Sphere and UV-less hits get 0 -> their LOD
        # clamps to level 0 (bilinear), documented in ops.texture.
        if uvs is not None:
            duv1d = uvs[:, 1] - uvs[:, 0]
            duv2d = uvs[:, 2] - uvs[:, 0]
            det_d = jnp.abs(duv1d[:, 0] * duv2d[:, 1]
                            - duv2d[:, 0] * duv1d[:, 1])
            area_w = jnp.sqrt(jnp.maximum(
                jnp.sum(linalg.cross(e1, e2) ** 2, axis=-1), 1e-30))
            dens = jnp.where(tri, jnp.sqrt(det_d / area_w), 0.0)
        else:
            dens = jnp.zeros(r, jnp.float32)
        lod_base = jnp.log2(jnp.maximum(cone_width * dens, 1e-20))

    if scene.mat_ntex is not None and scene.textures is not None:
        # Tangent-space normal mapping. The UV-aligned tangent frame
        # solves [e1 e2] = [T B]·[[du1 du2],[dv1 dv2]] per triangle ROW
        # (recomputed from the already-gathered e1/e2/uv rows — no extra
        # memory, a handful of VPU flops at mapped hits only); spheres
        # use their lat-long frame (T = ∂n/∂φ). The frame is built
        # around the CURRENT shading normal (smooth normals compose),
        # Gram-Schmidt-orthogonalized, with bitangent handedness taken
        # from the UV winding so mirrored UVs don't flip bumps.
        from pathtracing_tpu.ops import texture as texture_ops

        ntex_id = scene.mat_ntex[
            jnp.clip(hit.mat_id, 0, scene.mat_ntex.shape[0] - 1)
        ]
        if scene.attr_uv is not None:
            duv1 = uvs[:, 1] - uvs[:, 0]
            duv2 = uvs[:, 2] - uvs[:, 0]
        else:
            duv1 = jnp.zeros((r, 2), jnp.float32)
            duv2 = jnp.zeros((r, 2), jnp.float32)
        det_uv = duv1[:, 0] * duv2[:, 1] - duv2[:, 0] * duv1[:, 1]
        inv = 1.0 / jnp.where(jnp.abs(det_uv) > 1e-12, det_uv, 1.0)
        t_tri = (duv2[:, 1:2] * e1 - duv1[:, 1:2] * e2) * inv[:, None]
        b_tri = (duv1[:, 0:1] * e2 - duv2[:, 0:1] * e1) * inv[:, None]

        # Sphere frame: T along +φ (the u axis of the lat-long map).
        rxz = jnp.sqrt(jnp.maximum(n[:, 0] ** 2 + n[:, 2] ** 2, 1e-20))
        t_sph = jnp.stack(
            [-n[:, 2] / rxz, jnp.zeros(r, jnp.float32), n[:, 0] / rxz],
            axis=-1,
        )
        at_pole = rxz < 1e-6
        t_raw = jnp.where(tri[:, None], t_tri, t_sph)
        b_raw = jnp.where(tri[:, None], b_tri, linalg.cross(normal, t_sph))

        # Orthonormalize against the shading normal; bitangent by cross
        # product, sign matched to the raw (UV-derived) bitangent.
        t_p = t_raw - normal * linalg.dot(normal, t_raw)[:, None]
        t_len2 = jnp.sum(t_p * t_p, axis=-1)
        t_hat = t_p / jnp.sqrt(jnp.maximum(t_len2, 1e-20))[:, None]
        b_cross = linalg.cross(normal, t_hat)
        handed = jnp.where(linalg.dot(b_cross, b_raw) < 0.0, -1.0, 1.0)
        b_hat = b_cross * handed[:, None]

        if lod_base is not None and scene.textures.mip_table is not None:
            texel = texture_ops.sample_trilinear(
                scene.textures, ntex_id, uv, lod_base
            )
        else:
            texel = texture_ops.sample_bilinear(
                scene.textures, ntex_id, uv
            )
        tn = 2.0 * texel - 1.0
        n_map = (tn[:, 0:1] * t_hat + tn[:, 1:2] * b_hat
                 + tn[:, 2:3] * normal)
        len2 = jnp.sum(n_map * n_map, axis=-1)
        n_map = n_map / jnp.sqrt(jnp.maximum(len2, 1e-20))[:, None]
        # Keep the mapped normal in the geometric (ray-facing)
        # hemisphere, like interpolated shading normals above.
        flip = jnp.where(linalg.dot(n_map, hit.normal) < 0.0, -1.0, 1.0)
        tangent_ok = jnp.where(
            tri, jnp.abs(det_uv) > 1e-12, jnp.logical_not(at_pole)
        )
        mapped = (
            hit.valid & (ntex_id >= 0) & tangent_ok
            & (len2 > 1e-12) & (t_len2 > 1e-12)
        )
        normal = jnp.where(mapped[:, None], n_map * flip[:, None], normal)

    if cone_width is not None:
        return normal, uv, dens
    return normal, uv


def occluded_batch(scene: Scene, origin, direction, t_max,
                   traversal: str = "bvh", active=None,
                   bin_rays: bool = False, time=None):
    """Any-hit occlusion for a (R,3) ray batch: True where ANY primitive
    lies strictly inside (T_MIN, t_max). The shadow-ray fast path — a
    yes/no answer needs no closest-hit ordering, no normals, no material
    ids, and lets the Pallas kernel short-circuit lanes on first hit
    (``cluster_trace.occluded_pallas``). Equivalent by construction to
    ``intersect_batch(...).t < t_max`` (tests pin this).
    """
    ts = intersect.ray_sphere(
        origin[:, None, :], direction[:, None, :],
        scene.sph_center[None, :, :], scene.sph_radius[None, :],
    )
    occ_sph = jnp.min(ts, axis=1) < t_max
    if active is not None:
        occ_sph = occ_sph & active

    cap = t_max
    if active is not None:
        cap = jnp.where(active, cap, 0.0)
    # Lanes the (cheap, already-computed) sphere pass occluded need no
    # cluster answer: zero their cap so they short-circuit the kernel's
    # slab tests. Bitwise-neutral (the return ORs occ_sph back in).
    cap = jnp.where(occ_sph, 0.0, cap)

    if traversal == "bvh" or scene.clusters is None:
        if scene.instances is not None:
            raise ValueError(
                "instanced scenes need a cluster traversal mode (the "
                "BVH only indexes base triangles)"
            )
        hit = intersect_scene_batch(scene, origin, direction)
        occ = hit.valid & (hit.t < t_max)
        return (occ & active) if active is not None else occ

    perm = inv = None
    if bin_rays and traversal != "cluster_jax":
        from pathtracing_tpu.ops import binning

        bsrc = (scene.instances if scene.instances is not None
                else scene.clusters)
        lo = jnp.min(bsrc.aabb_min, axis=0)
        hi = jnp.max(bsrc.aabb_max, axis=0)
        bins = binning.ray_bin(origin, direction, lo, hi, cap > 0.0)
        perm, inv = binning.binning_perm(bins, binning.N_BINS)
        origin, direction, cap = origin[perm], direction[perm], cap[perm]
        if time is not None:
            time = time[perm]

    if scene.instances is not None:
        if traversal == "cluster_jax":
            _, slot, _, _ = cluster_trace.trace_jax_inst(
                scene.clusters, scene.instances, origin, direction, cap,
                time=time,
            )
            occ_tri = slot >= 0
        else:
            occ_tri = cluster_trace.occluded_pallas_dnf_inst(
                scene.clusters, scene.instances, origin, direction, cap,
                time=time,
                interpret=(traversal == "cluster_interpret"),
            )
    elif traversal == "cluster_jax":
        _, slot, _, _ = cluster_trace.trace_jax(
            scene.clusters, origin, direction, cap
        )
        occ_tri = slot >= 0
    elif scene.pages is not None:
        # Paged scenes reuse the closest-hit page streamer (a dedicated
        # paged any-hit kernel would only save the epilogue).
        _, slot, _, _ = cluster_trace.trace_pallas_paged_dnf(
            scene.clusters, scene.pages, origin, direction, cap,
            interpret=(traversal == "cluster_interpret"),
        )
        occ_tri = slot >= 0
    elif (scene.clusters.woop.shape[0]
          <= cluster_trace.DNF_MAX_CLUSTERS):
        occ_tri = cluster_trace.occluded_pallas_dnf(
            scene.clusters, origin, direction, cap,
            interpret=(traversal == "cluster_interpret"),
        )
    else:
        occ_tri = cluster_trace.occluded_pallas(
            scene.clusters, origin, direction, cap,
            interpret=(traversal == "cluster_interpret"),
        )
    if inv is not None:
        occ_tri = occ_tri[inv]
    return occ_sph | occ_tri


def intersect_batch(scene: Scene, origin, direction,
                    traversal: str = "bvh", active=None,
                    t_max=None, bin_rays: bool = False,
                    time=None) -> Hit:
    """Closest hit for a whole (R,3) ray batch — the engine-facing API.

    ``traversal`` (static):
      "bvh"            — vmapped threaded-BVH walk (CPU / fallback).
      "cluster_jax"    — dense cluster sweep in plain XLA (oracle path).
      "cluster_pallas" — Pallas TPU kernel with per-tile cluster skip.
      "cluster_interpret" — the Pallas kernel in interpret mode (tests).

    ``active`` (optional (R,) bool): dead lanes get ``t_init = 0`` so the
    kernel's tile walk short-circuits on fully-dead tiles. Their Hit
    fields are garbage — callers must mask, which the engines already do.
    """
    if traversal == "bvh":
        if scene.instances is not None:
            raise ValueError(
                "instanced scenes need a cluster traversal mode (the "
                "BVH only indexes base triangles)"
            )
        return intersect_scene_batch(scene, origin, direction)
    if scene.clusters is None:
        raise ValueError("scene has no cluster data; rebuild via SceneBuilder")

    # Spheres first (brute force over the small set); their best t culls
    # the cluster sweep.
    ts = intersect.ray_sphere(
        origin[:, None, :], direction[:, None, :],
        scene.sph_center[None, :, :], scene.sph_radius[None, :],
    )                                          # (R, S)
    sph_idx = jnp.argmin(ts, axis=1)
    sph_t = jnp.min(ts, axis=1)

    t_init = jnp.where(jnp.isfinite(sph_t), sph_t, 3.0e38)
    if t_max is not None:
        # Shadow-ray culling: nothing beyond t_max matters (occlusion
        # queries pass the light distance here).
        t_init = jnp.minimum(t_init, t_max)
    if active is not None:
        t_init = jnp.where(active, t_init, 0.0)
    # Optional ray binning: feed the traversal kernel in (origin cell,
    # direction octant) groups so its per-tile cluster skip fires on
    # incoherent waves; results return in original order, so the render
    # is bitwise independent of the binning (ops.binning docstring).
    perm = inv = None
    if bin_rays and traversal != "cluster_jax":
        from pathtracing_tpu.ops import binning

        bsrc = (scene.instances if scene.instances is not None
                else scene.clusters)
        lo = jnp.min(bsrc.aabb_min, axis=0)
        hi = jnp.max(bsrc.aabb_max, axis=0)
        bins = binning.ray_bin(
            origin, direction, lo, hi, t_init > 0.0
        )
        perm, inv = binning.binning_perm(bins, binning.N_BINS)
        origin_t, direction_t, t_init_t = (
            origin[perm], direction[perm], t_init[perm]
        )
        if time is not None:
            time = time[perm]
    else:
        origin_t, direction_t, t_init_t = origin, direction, t_init

    if scene.instances is not None and traversal in (
            "cluster_jax", "cluster_pallas", "cluster_interpret"):
        if traversal == "cluster_jax":
            tri_t, slot, n_tri, mat_tri = cluster_trace.trace_jax_inst(
                scene.clusters, scene.instances, origin_t, direction_t,
                t_init_t, time=time,
            )
        else:
            tri_t, slot, n_tri, mat_tri = (
                cluster_trace.trace_pallas_dnf_inst(
                    scene.clusters, scene.instances, origin_t,
                    direction_t, t_init_t, time=time,
                    interpret=(traversal == "cluster_interpret"),
                )
            )
    elif traversal == "cluster_jax":
        tri_t, slot, n_tri, mat_tri = cluster_trace.trace_jax(
            scene.clusters, origin_t, direction_t, t_init_t
        )
    elif traversal in ("cluster_pallas", "cluster_interpret"):
        # (The cluster_pallas_bf16 mode is retired: every bf16 variant
        # measured slower — bf16 tree walk ~2x slower family, bf16 MXU
        # eval negative on bounce waves; PERF.md r3d.)
        if scene.pages is not None:
            # HBM-resident scene: stream Woop pages through VMEM with
            # the per-page dense nearest-first sweep (5x the per-page
            # tree walk on bounce waves, PERF.md r2e).
            tri_t, slot, n_tri, mat_tri = (
                cluster_trace.trace_pallas_paged_dnf(
                    scene.clusters, scene.pages, origin_t, direction_t,
                    t_init_t,
                    interpret=(traversal == "cluster_interpret"),
                )
            )
        elif (scene.clusters.woop.shape[0]
              <= cluster_trace.DNF_MAX_CLUSTERS):
            # Production path: dense nearest-first kernel — no tree, no
            # scalar walk; scalar syncs scale with evaluated clusters
            # (~3.5x the lookahead walk on bounce waves, PERF.md r2).
            tri_t, slot, n_tri, mat_tri = cluster_trace.trace_pallas_dnf(
                scene.clusters, origin_t, direction_t, t_init_t,
                interpret=(traversal == "cluster_interpret"),
            )
        else:
            # Past the DNF scratch budget: octant-ordered 4-step
            # lookahead walk (falls back to the plain ordered walk past
            # the cand_box ceiling — see trace_pallas).
            tri_t, slot, n_tri, mat_tri = cluster_trace.trace_pallas(
                scene.clusters, origin_t, direction_t, t_init_t,
                interpret=(traversal == "cluster_interpret"),
                lookahead=4, drain=1,
            )
    else:
        raise ValueError(f"unknown traversal mode: {traversal!r}")

    if perm is not None:
        tri_t, slot = tri_t[inv], slot[inv]
        n_tri, mat_tri = n_tri[inv], mat_tri[inv]

    hit_tri = slot >= 0
    t = jnp.where(hit_tri, tri_t, sph_t)
    valid = jnp.isfinite(t) & (t < 1.0e37)
    position = origin + t[:, None] * direction

    safe_sph = jnp.minimum(sph_idx, scene.sph_center.shape[0] - 1)
    n_sph = (position - scene.sph_center[safe_sph]) / jnp.maximum(
        scene.sph_radius[safe_sph], 1e-12
    )[:, None]
    n_geo = jnp.where(hit_tri[:, None], n_tri, n_sph)

    front = linalg.dot(direction, n_geo) < 0.0
    normal = jnp.where(front[:, None], 1.0, -1.0) * n_geo

    mat_id = jnp.where(
        hit_tri, mat_tri, scene.sph_mat[safe_sph]
    ).astype(jnp.int32)
    mat_id = jnp.where(valid, mat_id, 0)

    if scene.slot_to_tri is not None:
        # Attribute-bearing scenes: resolve the padded cluster slot to
        # its stored triangle row (one small gather, only built/paid
        # when the scene has surface attributes).
        safe_slot = jnp.clip(slot, 0, scene.slot_to_tri.shape[0] - 1)
        prim = jnp.where(
            hit_tri & valid, scene.slot_to_tri[safe_slot], -1
        ).astype(jnp.int32)
    else:
        prim = jnp.full(t.shape, -1, jnp.int32)

    return Hit(
        t=t, position=position, normal=normal,
        mat_id=mat_id, front=front, valid=valid, tri=hit_tri & valid,
        prim=prim,
        slot=jnp.where(hit_tri & valid, slot, -1).astype(jnp.int32),
    )
