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


class SceneBuilder:
    """Host-side scene assembly (numpy): the ResourceFactory the reference
    stubbed out (`Graphics/ResourceFactory.cs:3-28`) plus the missing scene
    compiler. Not jit-traceable; call once per scene."""

    def __init__(self) -> None:
        self._sph = []          # (center, radius, mat)
        self._tri = []          # (v0, v1, v2, mat)
        self._tri_chunks = []   # (v0 (k,3), v1, v2, mat (k,)) arrays
        self._mat = []          # (type, albedo, param, emit)
        self._env = None        # ops.envmap.EnvMap (image-based light)

    def environment(self, texels_or_envmap) -> None:
        """Attach an image-based environment light: either a pre-built
        ``ops.envmap.EnvMap`` or a (H, W, 3) lat-long radiance grid."""
        from pathtracing_tpu.ops import envmap as envmap_ops

        if isinstance(texels_or_envmap, envmap_ops.EnvMap):
            self._env = texels_or_envmap
        else:
            self._env = envmap_ops.build_envmap(texels_or_envmap)

    # -- materials ---------------------------------------------------------
    def add_material(self, mtype, albedo=(0.0, 0.0, 0.0), param=0.0,
                     emit=(0.0, 0.0, 0.0)) -> int:
        self._mat.append((int(mtype), tuple(albedo), float(param), tuple(emit)))
        return len(self._mat) - 1

    def lambertian(self, albedo) -> int:
        return self.add_material(materials.TYPE_LAMBERTIAN, albedo)

    def metal(self, albedo, fuzz=0.0) -> int:
        return self.add_material(materials.TYPE_METAL, albedo, fuzz)

    def ggx(self, f0, roughness=0.1) -> int:
        """Microfacet conductor: f0 = Fresnel normal reflectance,
        roughness = GGX alpha. Unlike ``metal`` it has a real pdf, so
        glossy vertices participate in NEE/MIS."""
        return self.add_material(materials.TYPE_GGX, f0, roughness)

    def dielectric(self, ior=1.5, tint=(1.0, 1.0, 1.0)) -> int:
        return self.add_material(materials.TYPE_DIELECTRIC, tint, ior)

    def emissive(self, radiance) -> int:
        return self.add_material(
            materials.TYPE_EMISSIVE, (0.0, 0.0, 0.0), 0.0, radiance
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

    def add_triangle(self, v0, v1, v2, mat_id) -> None:
        self._tri.append((tuple(v0), tuple(v1), tuple(v2), int(mat_id)))

    def add_quad(self, corner, edge_u, edge_v, mat_id) -> None:
        """Parallelogram as two triangles (Cornell walls)."""
        c = np.asarray(corner, np.float64)
        u = np.asarray(edge_u, np.float64)
        v = np.asarray(edge_v, np.float64)
        self.add_triangle(c, c + u, c + u + v, mat_id)
        self.add_triangle(c, c + u + v, c + v, mat_id)

    def add_mesh(self, vertices: np.ndarray, faces: np.ndarray, mat_id) -> None:
        """Indexed triangle mesh: vertices (V,3) float, faces (F,3) int.
        Stored as one array chunk — per-triangle Python tuples measured
        ~10 s of pure append/convert overhead at 2.6M triangles."""
        vertices = np.asarray(vertices, np.float64)
        faces = np.asarray(faces, np.int64)
        tri = vertices[faces]  # (F, 3, 3)
        self._tri_chunks.append((
            tri[:, 0], tri[:, 1], tri[:, 2],
            np.full(tri.shape[0], int(mat_id), np.int32),
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
            chunks.append((
                np.array([x[0] for x in t], np.float64),
                np.array([x[1] for x in t], np.float64),
                np.array([x[2] for x in t], np.float64),
                np.array([x[3] for x in t], np.int32),
            ))
        if not chunks:
            z = np.zeros((1, 3), np.float64)
            chunks = [(z, z, z, np.zeros(1, np.int32))]
        v0 = np.concatenate([c[0] for c in chunks]).astype(np.float32)
        v1 = np.concatenate([c[1] for c in chunks]).astype(np.float32)
        v2 = np.concatenate([c[2] for c in chunks]).astype(np.float32)
        tri_mat = np.concatenate([c[3] for c in chunks]).astype(np.int32)
        e1 = v1 - v0
        e2 = v2 - v0

        (node_min, node_max, node_meta), perm = bvh_ops.build_bvh(v0, e1, e2)
        cl, _ = cluster_ops.build_clusters(v0, e1, e2, tri_mat)
        pages = None
        if page_clusters or (
                cl.woop.shape[0] > cluster_trace.DNF_MAX_CLUSTERS) or (
                cl.node_meta.shape[1] > cluster_ops.CAND_MAX_NODES):
            # Page as soon as the scene exceeds the flat DNF kernel's
            # scratch budget: the paged DNF sweep beats the flat tree
            # walk well before the ~64 MB whole-in-VMEM Woop ceiling
            # (PERF.md r2e), so there is no un-paged tree band left.
            cl, pages, _ = cluster_ops.build_pages(
                cl, page_clusters or cluster_ops.PAGE_CLUSTERS
            )
        v0, e1, e2, tri_mat = v0[perm], e1[perm], e2[perm], tri_mat[perm]

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
            ),
            env=self._env,
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
    )


intersect_scene_batch = jax.vmap(intersect_scene, in_axes=(None, 0, 0))


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
        or scene.clusters.woop.shape[0] <= cluster_trace.DNF_MAX_CLUSTERS
    )


def occluded_batch(scene: Scene, origin, direction, t_max,
                   traversal: str = "bvh", active=None,
                   bin_rays: bool = False):
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
        hit = intersect_scene_batch(scene, origin, direction)
        occ = hit.valid & (hit.t < t_max)
        return (occ & active) if active is not None else occ

    perm = inv = None
    if bin_rays and traversal != "cluster_jax":
        from pathtracing_tpu.ops import binning

        lo = jnp.min(scene.clusters.aabb_min, axis=0)
        hi = jnp.max(scene.clusters.aabb_max, axis=0)
        bins = binning.ray_bin(origin, direction, lo, hi, cap > 0.0)
        perm, inv = binning.binning_perm(bins, binning.N_BINS)
        origin, direction, cap = origin[perm], direction[perm], cap[perm]

    if traversal == "cluster_jax":
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
                    t_max=None, bin_rays: bool = False) -> Hit:
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

        lo = jnp.min(scene.clusters.aabb_min, axis=0)
        hi = jnp.max(scene.clusters.aabb_max, axis=0)
        bins = binning.ray_bin(
            origin, direction, lo, hi, t_init > 0.0
        )
        perm, inv = binning.binning_perm(bins, binning.N_BINS)
        origin_t, direction_t, t_init_t = (
            origin[perm], direction[perm], t_init[perm]
        )
    else:
        origin_t, direction_t, t_init_t = origin, direction, t_init

    if traversal == "cluster_jax":
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

    return Hit(
        t=t, position=position, normal=normal,
        mat_id=mat_id, front=front, valid=valid, tri=hit_tri & valid,
    )
