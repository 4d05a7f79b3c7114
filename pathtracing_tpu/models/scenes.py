"""Built-in scenes covering the BASELINE.json eval configs.

The reference's only scene is a hard-coded unit-ish sphere
(`Test.hlsl:12-13`); these builders construct the staged benchmark scenes:
  cornell_sphere — config 1: Lambertian-only Cornell box with one sphere.
  cornell_bsdf   — config 2: full BSDF set (diffuse/metal/dielectric) +
                   emissive light.
  cornell_mesh   — config 3: high-poly triangle mesh (procedurally generated
                   icosphere; the environment has no network access, so the
                   Stanford bunny is stood in for by an equivalent-size mesh)
                   in the Cornell box, exercising BVH traversal.
  sphere_demo    — the reference scene itself (one sphere, gradient sky) for
                   eyeballing parity with `Test.hlsl`.

Cornell geometry: axis-aligned box spanning [-1, 1]³, open toward +z, camera
on the +z axis. Light: emissive quad centered on the ceiling.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from pathtracing_tpu.models.scene import Scene, SceneBuilder
from pathtracing_tpu.utils.config import CameraConfig

CORNELL_CAMERA = CameraConfig(
    position=(0.0, 0.0, 3.4),
    look_at=(0.0, 0.0, 0.0),
    up=(0.0, 1.0, 0.0),
    vfov_degrees=40.0,
)

LIGHT_RADIANCE = (15.0, 15.0, 15.0)


def _cornell_walls(b: SceneBuilder) -> None:
    white = b.lambertian((0.73, 0.73, 0.73))
    red = b.lambertian((0.65, 0.05, 0.05))
    green = b.lambertian((0.12, 0.45, 0.15))
    light = b.emissive(LIGHT_RADIANCE)

    # Interior normals (two-sided triangles; orientation chosen for clarity).
    b.add_quad((-1, -1, -1), (2, 0, 0), (0, 0, 2), white)    # floor
    b.add_quad((-1, 1, -1), (0, 0, 2), (2, 0, 0), white)     # ceiling
    b.add_quad((-1, -1, -1), (0, 2, 0), (2, 0, 0), white)    # back wall
    b.add_quad((-1, -1, -1), (0, 0, 2), (0, 2, 0), red)      # left wall
    b.add_quad((1, -1, -1), (0, 2, 0), (0, 0, 2), green)     # right wall
    # Ceiling light: 0.9×0.9 quad just below the ceiling.
    b.add_quad((-0.45, 0.995, -0.45), (0.9, 0, 0), (0, 0, 0.9), light)


def cornell_sphere() -> Tuple[Scene, CameraConfig]:
    """BASELINE config 1: Lambertian-only Cornell box with one sphere."""
    b = SceneBuilder()
    _cornell_walls(b)
    ball = b.lambertian((0.73, 0.73, 0.73))
    b.add_sphere((0.0, -0.5, 0.0), 0.5, ball)
    return b.build(), CORNELL_CAMERA


def cornell_bsdf() -> Tuple[Scene, CameraConfig]:
    """BASELINE config 2: diffuse + metal + dielectric + emissive light."""
    b = SceneBuilder()
    _cornell_walls(b)
    diffuse = b.lambertian((0.4, 0.2, 0.8))
    mirror = b.metal((0.9, 0.8, 0.7), fuzz=0.05)
    glass = b.dielectric(ior=1.5)
    b.add_sphere((-0.55, -0.65, -0.2), 0.35, diffuse)
    b.add_sphere((0.55, -0.6, -0.35), 0.4, mirror)
    b.add_sphere((0.0, -0.62, 0.45), 0.38, glass)
    return b.build(), CORNELL_CAMERA


def icosphere(subdivisions: int = 4, radius: float = 1.0):
    """Procedural icosphere mesh: (vertices (V,3) f64, faces (F,3) i64).

    20 * 4**subdivisions triangles; level 6 ≈ 82k triangles — the same
    order as the Stanford bunny (69k), used as the BVH stress mesh.
    """
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            (-1, phi, 0), (1, phi, 0), (-1, -phi, 0), (1, -phi, 0),
            (0, -1, phi), (0, 1, phi), (0, -1, -phi), (0, 1, -phi),
            (phi, 0, -1), (phi, 0, 1), (-phi, 0, -1), (-phi, 0, 1),
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
            (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
            (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
            (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
        ],
        np.int64,
    )
    for _ in range(subdivisions):
        edge_mid: Dict[Tuple[int, int], int] = {}
        new_verts = list(verts)

        def midpoint(a: int, b: int) -> int:
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                edge_mid[key] = len(new_verts)
                new_verts.append(m)
            return edge_mid[key]

        new_faces = []
        for a, b_, c in faces:
            ab, bc, ca = midpoint(a, b_), midpoint(b_, c), midpoint(c, a)
            new_faces += [(a, ab, ca), (b_, bc, ab), (c, ca, bc),
                          (ab, bc, ca)]
        verts = np.array(new_verts)
        faces = np.array(new_faces, np.int64)
    return verts * radius, faces


def _cornell_mesh_builder(subdivisions: int) -> SceneBuilder:
    b = SceneBuilder()
    _cornell_walls(b)
    body = b.lambertian((0.6, 0.55, 0.45))
    verts, faces = icosphere(subdivisions, radius=0.5)
    verts = verts + np.array([0.0, -0.5, 0.0])
    b.add_mesh(verts, faces, body)
    return b


def cornell_mesh(subdivisions: int = 5) -> Tuple[Scene, CameraConfig]:
    """BASELINE config 3: high-poly mesh in the Cornell box (BVH workload).

    ``subdivisions=5`` → 20,480 triangles (tests); the benchmark uses 6
    (81,920 — Stanford-bunny scale); 9 → 5.24M (the HBM-paged scale
    demo, past the whole-in-VMEM budget).
    """
    return _cornell_mesh_builder(subdivisions).build(), CORNELL_CAMERA


def checker_demo() -> Tuple[Scene, CameraConfig]:
    """Ray-Tracing-in-One-Weekend-style hero shot: three spheres on a
    procedural checkerboard ground under the gradient sky — exercises
    every BSDF plus the checker material with no lights (pure
    BSDF-sampled environment lighting)."""
    b = SceneBuilder()
    ground = b.checker((0.85, 0.85, 0.85), (0.15, 0.25, 0.15),
                       frequency=1.5)
    b.add_quad((-30.0, 0.0, -30.0), (60.0, 0.0, 0.0), (0.0, 0.0, 60.0),
               ground)
    b.add_sphere((0.0, 1.0, 0.0), 1.0, b.dielectric(1.5))
    b.add_sphere((-2.2, 1.0, 0.0), 1.0, b.lambertian((0.4, 0.2, 0.1)))
    b.add_sphere((2.2, 1.0, 0.0), 1.0, b.metal((0.7, 0.6, 0.5), 0.03))
    cam = CameraConfig(position=(0.0, 1.6, 6.5), look_at=(0.0, 0.9, 0.0),
                       vfov_degrees=35.0)
    return b.build(), cam


def veach_mis(roughness_floor: float = 0.0) -> Tuple[Scene, CameraConfig]:
    """Veach-style MIS demo: glossy strips of increasing roughness under
    three area lights of very different size but similar power. Light
    sampling alone is noisy on the sharp strips, BSDF sampling alone on
    the big dim light — the power-heuristic combination (ops.lights +
    models.shading) handles all nine pairings.

    ``roughness_floor`` clamps the strip roughness from below. The
    default 0 is the true stress scene; tests that need a CONVERGENT
    brute-force reference pass ~0.25: at roughness 0.02 the NDF-sampled
    BSDF weight f·cosθ/pdf has an effectively unbounded tail against the
    380-radiance light, and a 16k-spp brute mean still wanders ±5%
    (measured seeds 0.188-0.205 vs the NEE estimators' converged 0.210-
    0.213) — the very failure MIS exists to fix, so it cannot serve as
    an unbiasedness oracle."""
    b = SceneBuilder()
    floor = b.lambertian((0.22, 0.22, 0.24))
    back = b.lambertian((0.05, 0.05, 0.06))
    b.add_quad((-12.0, -2.0, -6.0), (24.0, 0.0, 0.0), (0.0, 0.0, 18.0),
               floor)
    b.add_quad((-12.0, -2.0, -6.0), (24.0, 0.0, 0.0), (0.0, 14.0, 0.0),
               back)

    # Three lights, areas 0.04 / 0.36 / 3.24, radiance ~1/area.
    for x, half, rad in [(-3.0, 0.1, (380.0, 330.0, 280.0)),
                         (0.0, 0.3, (42.0, 38.0, 30.0)),
                         (3.0, 0.9, (4.7, 4.2, 3.5))]:
        light = b.emissive(rad)
        b.add_quad((x - half, 5.0, -4.0), (2 * half, 0.0, 0.0),
                   (0.0, 0.0, 2 * half), light)

    # Four long strips, GGX roughness 0.02..0.3, tilted to reflect the
    # lights toward the camera. GGX (not the RTiOW fuzz metal) so the
    # glossy vertices carry a real pdf: light sampling fires on them and
    # MIS blends both estimators — the actual Veach construction.
    strips = [(0.02, -1.1, 0.0, 18.0), (0.08, -0.4, 1.2, 14.0),
              (0.18, 0.4, 2.4, 10.0), (0.30, 1.3, 3.6, 6.0)]
    for rough, y, z, tilt_deg in strips:
        m = b.ggx((0.85, 0.82, 0.78),
                  roughness=max(rough, roughness_floor))
        t = np.radians(tilt_deg)
        depth = 0.9
        # Normal (0, cos t, sin t): up, leaning toward the camera, so the
        # strip mirrors the high back lights into the viewer.
        edge_v = (0.0, depth * np.sin(t), -depth * np.cos(t))
        b.add_quad((-5.0, y, z), (10.0, 0.0, 0.0), edge_v, m)

    cam = CameraConfig(position=(0.0, 3.0, 10.0), look_at=(0.0, 1.2, 0.0),
                       vfov_degrees=40.0)
    return b.build(), cam


def sphere_demo() -> Tuple[Scene, CameraConfig]:
    """The reference's scene (`Test.hlsl:8-13`): r=0.5 sphere at the origin,
    eye at (0,0,1) — rendered with real materials + gradient sky."""
    b = SceneBuilder()
    mat = b.lambertian((0.7, 0.7, 0.7))
    b.add_sphere((0.0, 0.0, 0.0), 0.5, mat)
    cam = CameraConfig(position=(0.0, 0.0, 1.0), look_at=(0.0, 0.0, 0.0),
                       vfov_degrees=90.0)
    return b.build(), cam


def envmap_demo() -> Tuple[Scene, CameraConfig]:
    """Outdoor image-based-lighting demo: procedural sun-sky environment
    (ops/envmap.py — HDR sun disc ~4 orders brighter than the sky,
    importance-sampled by NEE), a ground plane, and a diffuse / glossy /
    glass sphere row. The environment is the only light — nothing
    renders without the env-NEE/MIS path."""
    from pathtracing_tpu.ops import envmap as envmap_ops

    b = SceneBuilder()
    ground = b.checker((0.45, 0.45, 0.45), (0.2, 0.25, 0.3), 1.5)
    white = b.lambertian((0.75, 0.72, 0.68))
    gold = b.ggx((1.0, 0.78, 0.34), 0.15)
    glass = b.dielectric(1.5)
    b.add_quad((-20.0, 0.0, -20.0), (40.0, 0.0, 0.0), (0.0, 0.0, 40.0),
               ground)
    b.add_sphere((-1.3, 0.55, 0.0), 0.55, white)
    b.add_sphere((0.0, 0.55, 0.0), 0.55, gold)
    b.add_sphere((1.3, 0.55, 0.0), 0.55, glass)
    b.environment(envmap_ops.sky_texels(
        sun_direction=(0.45, 0.55, -0.55), sky_scale=0.35,
    ))
    cam = CameraConfig(position=(0.0, 1.1, 3.4),
                       look_at=(0.0, 0.55, 0.0), vfov_degrees=38.0)
    return b.build(), cam


def glass_demo() -> Tuple[Scene, CameraConfig]:
    """Absorbing-media showcase: three glass spheres with Beer–Lambert
    interior absorption (red / amber / blue — thick paths go dark, thin
    rims stay bright, the classic colored-glass look) over a checker
    floor under the gradient sky, with a clear control sphere."""
    b = SceneBuilder()
    ground = b.checker((0.8, 0.8, 0.8), (0.25, 0.25, 0.28), 1.5)
    b.add_quad((-30.0, 0.0, -30.0), (60.0, 0.0, 0.0), (0.0, 0.0, 60.0),
               ground)
    # sigma_a per channel: what the glass REMOVES (red glass absorbs
    # green+blue). Sphere diameter 1.4 → center paths lose e^-(1.4σ).
    red = b.dielectric(1.5, absorption=(0.1, 2.2, 2.2))
    amber = b.dielectric(1.5, absorption=(0.05, 0.7, 2.5))
    blue = b.dielectric(1.5, absorption=(2.2, 1.2, 0.08))
    clear = b.dielectric(1.5)
    for x, m in [(-2.4, red), (-0.8, amber), (0.8, blue), (2.4, clear)]:
        b.add_sphere((x, 0.7, 0.0), 0.7, m)
    cam = CameraConfig(position=(0.0, 1.5, 5.2), look_at=(0.0, 0.65, 0.0),
                       vfov_degrees=36.0)
    return b.build(), cam


def frosted_demo() -> Tuple[Scene, CameraConfig]:
    """Rough-dielectric showcase: a roughness sweep (0 → 0.4) of glass
    spheres over a checker floor under the gradient sky — sharp
    refraction on the left blurring to frosted glass on the right. The
    last sphere combines roughness with Beer–Lambert absorption
    (frosted amber). Exercises the Walter 2007 microfacet glass lobe
    (ops.materials.scatter ``param2`` path)."""
    b = SceneBuilder()
    ground = b.checker((0.8, 0.8, 0.8), (0.25, 0.25, 0.28), 1.5)
    b.add_quad((-30.0, 0.0, -30.0), (60.0, 0.0, 0.0), (0.0, 0.0, 60.0),
               ground)
    xs = (-2.4, -0.8, 0.8, 2.4)
    mats = (
        b.dielectric(1.5),
        b.dielectric(1.5, roughness=0.08),
        b.dielectric(1.5, roughness=0.25),
        b.dielectric(1.5, roughness=0.4, absorption=(0.05, 0.7, 2.5)),
    )
    for x, m in zip(xs, mats):
        b.add_sphere((x, 0.7, 0.0), 0.7, m)
    cam = CameraConfig(position=(0.0, 1.5, 5.2), look_at=(0.0, 0.65, 0.0),
                       vfov_degrees=36.0)
    return b.build(), cam


def fog_demo() -> Tuple[Scene, CameraConfig]:
    """Volumetric-scattering showcase: the Cornell box filled with a
    forward-scattering homogeneous fog (sigma_s 0.22, g 0.4) — the
    ceiling light grows a visible glow cone and shadows soften into
    light shafts. Exercises distance sampling, HG phase scattering, the
    shared medium/surface NEE shadow ray, and phase↔light MIS."""
    b = SceneBuilder()
    _cornell_walls(b)
    metal = b.metal((0.85, 0.85, 0.9), 0.02)
    diffuse = b.lambertian((0.55, 0.45, 0.35))
    b.add_sphere((-0.45, -0.6, -0.3), 0.4, metal)
    b.add_sphere((0.5, -0.65, 0.25), 0.35, diffuse)
    b.set_fog(sigma_s=0.22, sigma_a=0.02, g=0.4)
    return b.build(), CORNELL_CAMERA


def smoke_density(res: int = 48, blobs: int = 160,
                  seed: int = 7) -> np.ndarray:
    """Procedural smoke-plume density grid (res, res, res): Gaussian
    puffs scattered along a rising, swirling axis, fading and widening
    with height — a recognisable plume with strong heterogeneity
    (zero-egress volume asset; fixed numpy seed, so the suite caches
    stay reproducible). Values normalised to max 1."""
    rng_np = np.random.default_rng(seed)
    t = np.linspace(0.0, 1.0, blobs, dtype=np.float32)
    swirl = 0.22 * (1.0 - t)
    cx = 0.5 + swirl * np.cos(9.0 * t) + 0.03 * rng_np.standard_normal(blobs)
    cy = 0.08 + 0.84 * t + 0.02 * rng_np.standard_normal(blobs)
    cz = 0.5 + swirl * np.sin(9.0 * t) + 0.03 * rng_np.standard_normal(blobs)
    radius = (0.05 + 0.16 * t).astype(np.float32)
    weight = (1.0 - 0.65 * t).astype(np.float32)

    g = (np.arange(res, dtype=np.float32) + 0.5) / res
    gz, gy, gx = np.meshgrid(g, g, g, indexing="ij")
    dens = np.zeros((res, res, res), np.float32)
    for i in range(blobs):
        d2 = ((gx - cx[i]) ** 2 + (gy - cy[i]) ** 2
              + (gz - cz[i]) ** 2) / (radius[i] ** 2)
        dens += weight[i] * np.exp(-3.0 * d2, dtype=np.float32)
    dens -= 0.08 * dens.max()           # carve wispy zero-density edges
    np.maximum(dens, 0.0, out=dens)
    return dens / max(float(dens.max()), 1e-9)


def smoke_demo() -> Tuple[Scene, CameraConfig]:
    """Heterogeneous-media showcase: a procedural smoke plume
    (ops.volume voxel grid, delta tracking) rising through the Cornell
    box under the ceiling light, with a metal sphere behind it —
    exercises free-flight sampling through empty and dense regions,
    in-medium NEE with ratio-tracked shadow transmittance, and the
    grid occluding SURFACE NEE (the sphere dims behind the plume)."""
    b = SceneBuilder()
    _cornell_walls(b)
    metal = b.metal((0.85, 0.85, 0.9), 0.02)
    b.add_sphere((0.55, -0.6, -0.35), 0.35, metal)
    b.set_volume(
        smoke_density(), bbox_min=(-0.62, -1.0, -0.52),
        bbox_max=(0.38, 0.7, 0.48), sigma_s=14.0, sigma_a=1.2, g=0.25,
    )
    return b.build(), CORNELL_CAMERA


def fire_demo() -> Tuple[Scene, CameraConfig]:
    """Emissive-media showcase: the smoke plume's dense core emits
    blackbody-orange radiance (emission grid = density², so the core
    glows and the wisps stay dark smoke), over a dim gray floor with no
    other light — the flame IS the light source, exercising the
    collision-sampled emission estimator and multiple scattering of
    emitted light back through the medium."""
    b = SceneBuilder()
    floor = b.lambertian((0.4, 0.4, 0.42))
    b.add_quad((-3.0, -1.0, -3.0), (6.0, 0.0, 0.0), (0.0, 0.0, 6.0),
               floor)
    dens = smoke_density()
    b.set_volume(
        dens, bbox_min=(-0.62, -1.0, -0.52), bbox_max=(0.38, 0.7, 0.48),
        sigma_s=10.0, sigma_a=6.0, g=0.0,
        emission=dens * dens, emit_color=(14.0, 5.5, 1.6),
    )
    cam = CameraConfig(position=(0.4, 0.2, 3.2), look_at=(-0.1, -0.2, 0.0),
                       vfov_degrees=38.0)
    return b.build(), cam


def grid_texture(res: int = 256, cells: int = 8,
                 line: float = 0.06) -> np.ndarray:
    """Procedural UV-grid test texture (res, res, 3): warm cells under
    dark grid lines, hue varying with u so orientation errors are
    visible. Linear color; no asset files needed (zero-egress image)."""
    t = (np.arange(res, dtype=np.float32) + 0.5) / res
    u, v = np.meshgrid(t, t[::-1])   # row 0 = top = v near 1
    fu = u * cells - np.floor(u * cells)
    fv = v * cells - np.floor(v * cells)
    on_line = (np.minimum(fu, 1 - fu) < line / 2) | (
        np.minimum(fv, 1 - fv) < line / 2
    )
    img = np.empty((res, res, 3), np.float32)
    img[..., 0] = 0.25 + 0.65 * u
    img[..., 1] = 0.55 - 0.25 * u * v
    img[..., 2] = 0.25 + 0.65 * v
    img[on_line] = (0.04, 0.04, 0.05)
    return img


def textured_demo() -> Tuple[Scene, CameraConfig]:
    """Surface-attribute showcase: a UV-grid textured floor and back
    wall (quad UVs), a SMOOTH-shaded textured icosphere (area-weighted
    vertex normals + spherical UVs via per-corner attributes), and a
    flat-shaded control sphere — all under one area light. Exercises
    attr_uv/attr_shn interpolation, the texture atlas, and lat-long
    sphere UVs in one frame."""
    b = SceneBuilder()
    tex = b.add_texture(grid_texture())
    floor = b.lambertian((1.0, 1.0, 1.0), texture=tex)
    wall = b.lambertian((0.8, 0.85, 1.0), texture=tex)
    plain = b.lambertian((0.55, 0.5, 0.45))
    b.add_quad((-2.0, 0.0, -2.0), (4.0, 0.0, 0.0), (0.0, 0.0, 4.0),
               floor, uv=True)
    b.add_quad((-2.0, 0.0, -2.0), (4.0, 0.0, 0.0), (0.0, 3.0, 0.0),
               wall, uv=True)

    # Smooth textured icosphere (left) vs flat-shaded control (right):
    # the faceting difference IS the vertex-normal interpolation.
    verts, faces = icosphere(2, radius=0.55)   # coarse → visible facets
    normals = None
    from pathtracing_tpu.models import meshes as meshes_mod

    normals = meshes_mod.smooth_vertex_normals(verts, faces)
    # Spherical per-vertex UVs for the textured ball (seam at -z, the
    # side away from the camera — shared vertices can't wrap u, so the
    # seam column smears; a demo-acceptable limitation of per-vertex
    # spherical UVs).
    d = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    uvs = np.stack([
        0.5 + np.arctan2(d[:, 0], d[:, 2]) / (2 * np.pi),
        0.5 + np.arcsin(np.clip(d[:, 1], -1, 1)) / np.pi,
    ], axis=1)
    ball = b.lambertian((1.0, 1.0, 1.0), texture=tex)
    b.add_mesh(verts + np.array([-0.75, 0.56, 0.2]), faces, ball,
               uvs=uvs, normals=normals)
    b.add_mesh(verts + np.array([0.75, 0.56, 0.2]), faces, plain)

    light = b.emissive((14.0, 13.5, 12.5))
    b.add_quad((-0.6, 2.95, -0.7), (1.2, 0.0, 0.0), (0.0, 0.0, 1.2),
               light)
    cam = CameraConfig(position=(0.0, 1.25, 3.1),
                       look_at=(0.0, 0.7, 0.0), vfov_degrees=42.0)
    return b.build(), cam


def ripple_normal_map(res: int = 256, rings: float = 6.0,
                      strength: float = 0.75) -> np.ndarray:
    """Procedural tangent-space normal map (res, res, 3): concentric
    ripples around the UV center, encoded 0.5 + 0.5·(t, b, n). Linear
    data; no asset files needed (zero-egress image)."""
    t = (np.arange(res, dtype=np.float32) + 0.5) / res
    u, v = np.meshgrid(t, t[::-1])   # row 0 = top = v near 1
    du = u - 0.5
    dv = v - 0.5
    rr = np.sqrt(du * du + dv * dv) + 1e-6
    # Height h = cos(2π·rings·r); slope magnitude along the radial dir.
    slope = strength * np.sin(2 * np.pi * rings * rr)
    nx = -slope * du / rr
    ny = -slope * dv / rr
    nz = np.ones_like(nx)
    inv = 1.0 / np.sqrt(nx * nx + ny * ny + nz * nz)
    img = np.stack([nx * inv, ny * inv, nz * inv], axis=-1)
    return (0.5 + 0.5 * img).astype(np.float32)


def bump_demo() -> Tuple[Scene, CameraConfig]:
    """Normal-mapping showcase: a rippled floor (tangent-space map on
    quad UVs), a normal-mapped GGX panel leaning against the wall, and
    a normal-mapped sphere (lat-long frame) — one area light off to the
    side so the fake relief shades directionally."""
    b = SceneBuilder()
    nmap = b.add_texture(ripple_normal_map(), srgb=False)
    floor = b.lambertian((0.65, 0.62, 0.58), normal_map=nmap)
    panel = b.ggx((0.9, 0.75, 0.4), roughness=0.18, normal_map=nmap)
    ball = b.lambertian((0.4, 0.5, 0.7), normal_map=nmap)
    plain = b.lambertian((0.55, 0.55, 0.58))

    b.add_quad((-2.0, 0.0, -2.0), (4.0, 0.0, 0.0), (0.0, 0.0, 4.0),
               floor, uv=True)
    b.add_quad((-2.0, 0.0, -2.0), (4.0, 0.0, 0.0), (0.0, 3.0, 0.0),
               plain, uv=True)
    b.add_quad((-1.5, 0.05, -1.6), (1.6, 0.0, 0.35),
               (0.25, 1.6, -0.3), panel, uv=True)
    b.add_sphere((0.85, 0.55, 0.1), 0.55, ball)

    light = b.emissive((16.0, 15.0, 13.0))
    b.add_quad((0.6, 2.9, -0.8), (1.1, 0.0, 0.0), (0.0, 0.0, 1.1),
               light)
    cam = CameraConfig(position=(0.0, 1.35, 3.2),
                       look_at=(0.0, 0.65, 0.0), vfov_degrees=42.0)
    return b.build(), cam


def prism_demo() -> Tuple[Scene, CameraConfig]:
    """Spectral-dispersion showcase: a dense-flint glass sphere
    (dispersion 0.12, exaggerated for a small render) under a narrow
    bright slit light over a white floor — the refracted caustic fans
    into a rainbow; a plain-glass control sphere sits beside it."""
    b = SceneBuilder()
    white = b.lambertian((0.85, 0.85, 0.85))
    flint = b.dielectric(ior=1.62, dispersion=0.12)
    plain = b.dielectric(ior=1.62)
    b.add_quad((-3.0, 0.0, -3.0), (6.0, 0.0, 0.0), (0.0, 0.0, 6.0), white)
    b.add_sphere((-0.8, 0.8, 0.0), 0.7, flint)
    b.add_sphere((0.8, 0.8, 0.0), 0.7, plain)
    # Narrow slit light high above, offset so the caustics throw sideways.
    light = b.emissive((60.0, 60.0, 60.0))
    b.add_quad((-1.6, 3.2, -0.15), (3.2, 0.0, 0.0), (0.0, 0.0, 0.3),
               light)
    cam = CameraConfig(position=(0.0, 2.1, 3.6), look_at=(0.0, 0.5, 0.0),
                       vfov_degrees=45.0)
    return b.build(), cam


def instanced_demo(grid: int = 12,
                   subdivisions: int = 3) -> Tuple[Scene, CameraConfig]:
    """Instancing showcase: a ``grid``×``grid`` field of one icosphere
    prototype (stored ONCE — true shared geometry via
    ``SceneBuilder.add_instances``), each copy rotated, squashed, and
    placed on a ground plane under the gradient sky plus a sun-like
    area light. 144 instances of a 1280-triangle prototype trace as
    ~184k effective triangles while the Woop tensors stay at the
    prototype's 10 clusters."""
    b = SceneBuilder()
    ground = b.lambertian((0.6, 0.58, 0.52))
    b.add_quad((-14.0, 0.0, -14.0), (28.0, 0.0, 0.0), (0.0, 0.0, 28.0),
               ground)
    light = b.emissive((40.0, 38.0, 34.0))
    b.add_quad((-2.0, 9.0, -6.0), (4.0, 0.0, 0.0), (0.0, 0.0, 4.0),
               light)

    mats = [
        b.lambertian((0.70, 0.30, 0.25)),
        b.metal((0.85, 0.85, 0.9), 0.08),
        b.ggx((0.9, 0.7, 0.35), roughness=0.25),
    ]
    verts, faces = icosphere(subdivisions, 0.45)
    rng = np.random.default_rng(7)
    ts, overrides = [], []
    for i in range(grid):
        for j in range(grid):
            a = float(rng.uniform(0.0, 2.0 * np.pi))
            c, s = np.cos(a), np.sin(a)
            rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            sy = float(rng.uniform(0.6, 1.6))
            sxz = float(rng.uniform(0.7, 1.2))
            scale = np.diag([sxz, sy, sxz])
            t = np.array([
                -9.0 + 18.0 * i / (grid - 1) + float(rng.uniform(-0.3, 0.3)),
                0.45 * sy,
                -9.0 + 18.0 * j / (grid - 1) + float(rng.uniform(-0.3, 0.3)),
            ])
            ts.append(np.concatenate([rot @ scale, t[:, None]], axis=1))
            overrides.append(mats[(i * grid + j) % len(mats)])
    # ONE prototype, ONE add_instances call: the material variety comes
    # from per-instance overrides, so the Woop tensors are stored once
    # (the pre-override version duplicated the prototype per material).
    b.add_instances(verts, faces, mats[0], ts, materials=overrides)
    cam = CameraConfig(position=(0.0, 5.5, 14.0),
                       look_at=(0.0, 0.6, 0.0), vfov_degrees=42.0)
    return b.build(), cam


def principled_demo(rows: int = 4, cols: int = 6) -> Tuple[Scene, CameraConfig]:
    """The classic material-ball grid: metallic varies down the rows
    (0 → 1), perceptual roughness across the columns (0.04 → 1), under
    the sun-sky environment on a checker floor — the standard visual
    reference for a metallic-roughness (principled) workflow."""
    from pathtracing_tpu.ops import envmap as envmap_ops

    b = SceneBuilder()
    ground = b.checker((0.5, 0.5, 0.5), (0.25, 0.25, 0.28), 1.2)
    b.add_quad((-30.0, 0.0, -30.0), (60.0, 0.0, 0.0), (0.0, 0.0, 60.0),
               ground)
    r_ball = 0.42
    pitch = 1.0
    base = (0.75, 0.25, 0.2)
    for i in range(rows):
        metallic = i / max(rows - 1, 1)
        for j in range(cols):
            rough = 0.04 + (1.0 - 0.04) * j / max(cols - 1, 1)
            m = b.principled(base, metallic=metallic, roughness=rough)
            x = (j - (cols - 1) / 2.0) * pitch
            z = (i - (rows - 1) / 2.0) * pitch
            b.add_sphere((x, r_ball, z), r_ball, m)
    b.environment(envmap_ops.sky_texels(
        sun_direction=(0.4, 0.6, 0.5), sky_scale=0.35,
    ))
    cam = CameraConfig(position=(0.0, 3.4, 5.6),
                       look_at=(0.0, 0.3, 0.0), vfov_degrees=36.0)
    return b.build(), cam


def spotlight_demo() -> Tuple[Scene, CameraConfig]:
    """Delta-light showcase (ops.lights.DeltaLights): a spot pooling on
    a brushed-metal (anisotropic GGX) disk-stand ball, a cool point
    light rimming a chrome sphere, and a faint directional fill — the
    three zero-extent emitter kinds plus the anisotropic conductor in
    one frame. Pure-NEE lighting: with no area lights, every photon
    here comes from the delta-light estimator."""
    b = SceneBuilder()
    floor = b.ggx((0.55, 0.55, 0.58), roughness=0.3, anisotropy=0.7)
    b.add_quad((-20.0, 0.0, -20.0), (40.0, 0.0, 0.0), (0.0, 0.0, 40.0),
               floor)
    ball = b.principled((0.7, 0.22, 0.15), metallic=0.15, roughness=0.35)
    b.add_sphere((-0.7, 0.5, 0.0), 0.5, ball)
    chrome = b.metal((0.9, 0.9, 0.95), fuzz=0.04)
    b.add_sphere((0.8, 0.4, 0.6), 0.4, chrome)
    b.spot_light((-0.7, 3.5, 0.3), (0.0, -1.0, -0.08),
                 (55.0, 50.0, 42.0), inner_degrees=12.0,
                 outer_degrees=22.0)
    b.point_light((3.0, 1.5, 2.5), (2.5, 3.5, 6.0))
    b.directional_light((-0.4, -1.0, -0.3), (0.25, 0.25, 0.3))
    cam = CameraConfig(position=(0.0, 1.6, 4.5),
                       look_at=(0.0, 0.5, 0.0), vfov_degrees=40.0)
    return b.build(), cam


def screenlight_demo() -> Tuple[Scene, CameraConfig]:
    """Textured-emission showcase: a color-bar "TV screen" panel is the
    only light; its texels tint both the directly visible screen and
    the NEE-sampled light on the glossy floor (the NEE arm carries the
    sampled point's texel, ops.lights.sample_solid_angle with_uv)."""
    b = SceneBuilder()
    # Color bars over a dim lower band (a tiny procedural test card).
    card = np.zeros((8, 8, 3), np.float32)
    bars = [(1, 1, 1), (1, 1, 0), (0, 1, 1), (0, 1, 0),
            (1, 0, 1), (1, 0, 0), (0, 0, 1), (0.05, 0.05, 0.05)]
    for i, c in enumerate(bars):
        card[2:, i] = c
    card[:2] = 0.25
    tex = b.add_texture(card)
    floor = b.ggx((0.7, 0.7, 0.72), roughness=0.12)
    b.add_quad((-5.0, 0.0, -3.0), (10.0, 0.0, 0.0), (0.0, 0.0, 8.0),
               floor)
    wall = b.lambertian((0.3, 0.3, 0.32))
    b.add_quad((-5.0, 0.0, -3.0), (10.0, 0.0, 0.0), (0.0, 4.0, 0.0),
               wall)
    screen = b.emissive((10.0, 10.0, 10.0), texture=tex)
    b.add_quad((-1.6, 0.35, -2.2), (3.2, 0.0, 0.0), (0.0, 1.8, 0.0),
               screen, uv=True)
    cam = CameraConfig(position=(0.0, 1.3, 4.2),
                       look_at=(0.0, 0.8, 0.0), vfov_degrees=45.0)
    return b.build(), cam


def many_lights_demo(grid: int = 12) -> Tuple[Scene, CameraConfig]:
    """Many-light stress scene: a dark hall lit by a ``grid``×``grid``
    ceiling array of emissive panels (2 triangles each — 288 light rows
    at the default 12; below ops.lights._GATHER_MIN since the r4e
    crossover measurement, so the default build stays masked-sum —
    raise ``grid`` past ~34 or lower the threshold to exercise the
    packed-gather path) with power-law
    brightness spread and varied hues, over a glossy floor and three
    probe spheres. Exercises the searchsorted + packed-row-gather light
    selection path (the masked-sum path's (rays × L) work would dominate
    here) and the power-weighted pick (a few panels carry most of the
    total power). Deterministic: panel colors/powers from a fixed-seed
    NumPy generator at build time."""
    rng = np.random.default_rng(20260819)
    b = SceneBuilder()
    floor = b.ggx((0.6, 0.6, 0.62), roughness=0.15)
    b.add_quad((-8.0, 0.0, -8.0), (16.0, 0.0, 0.0), (0.0, 0.0, 16.0),
               floor)
    wall = b.lambertian((0.25, 0.25, 0.27))
    b.add_quad((-8.0, 0.0, -8.0), (16.0, 0.0, 0.0), (0.0, 5.0, 0.0),
               wall)
    b.add_quad((-8.0, 0.0, -8.0), (0.0, 0.0, 16.0), (0.0, 5.0, 0.0),
               wall)
    b.add_quad((8.0, 0.0, 8.0), (-16.0, 0.0, 0.0), (0.0, 5.0, 0.0),
               wall)
    b.add_quad((8.0, 0.0, 8.0), (0.0, 0.0, -16.0), (0.0, 5.0, 0.0),
               wall)
    span, gap = 14.0, 0.25
    cell = span / grid
    for i in range(grid):
        for j in range(grid):
            x = -span / 2 + i * cell
            z = -span / 2 + j * cell
            hue = rng.uniform(0.0, 1.0, 3)
            col = 0.25 + 0.75 * hue / max(float(hue.max()), 1e-6)
            power = 2.0 * float(rng.pareto(2.5) + 0.05)
            mat = b.emissive(tuple(power * col))
            b.add_quad((x + gap / 2, 4.999, z + gap / 2),
                       (cell - gap, 0.0, 0.0), (0.0, 0.0, cell - gap),
                       mat)
    b.add_sphere((-1.6, 0.8, 0.3), 0.8, b.lambertian((0.75, 0.72, 0.68)))
    b.add_sphere((0.9, 0.7, -0.9), 0.7,
                 b.metal((0.9, 0.9, 0.95), fuzz=0.05))
    b.add_sphere((1.7, 0.55, 1.3), 0.55,
                 b.principled((0.2, 0.45, 0.8), metallic=0.0,
                              roughness=0.25))
    cam = CameraConfig(position=(0.0, 2.2, 7.5),
                       look_at=(0.0, 1.0, 0.0), vfov_degrees=45.0)
    return b.build(), cam


def sss_demo() -> Tuple[Scene, CameraConfig]:
    """Subsurface-scattering showcase: four spheres sweeping the
    interior random walk (``SceneBuilder.dielectric(scattering=...)``)
    over a checker floor under the gradient sky — milk (dense isotropic
    scatter, slight blue absorption), jade (forward scatter, red/blue
    absorbed → deep green translucency), amber wax, and a clear-glass
    control. Light enters through the dielectric boundary, random-walks
    with Exp(sigma_s) flights + HG phase, pays chromatic Beer–Lambert
    absorption over every interior segment, and exits — full volumetric
    SSS, no diffusion approximation."""
    b = SceneBuilder()
    ground = b.checker((0.8, 0.8, 0.8), (0.25, 0.25, 0.28), 1.5)
    b.add_quad((-30.0, 0.0, -30.0), (60.0, 0.0, 0.0), (0.0, 0.0, 60.0),
               ground)
    milk = b.dielectric(1.35, scattering=9.0, scatter_g=0.2,
                        absorption=(0.02, 0.04, 0.12))
    jade = b.dielectric(1.5, scattering=4.0, scatter_g=0.6,
                        absorption=(1.6, 0.12, 1.3))
    wax = b.dielectric(1.45, scattering=2.5, scatter_g=0.0,
                       absorption=(0.05, 0.5, 1.8))
    clear = b.dielectric(1.5)
    for x, m in [(-2.4, milk), (-0.8, jade), (0.8, wax), (2.4, clear)]:
        b.add_sphere((x, 0.7, 0.0), 0.7, m)
    cam = CameraConfig(position=(0.0, 1.5, 5.2), look_at=(0.0, 0.65, 0.0),
                       vfov_degrees=36.0)
    return b.build(), cam


SCENES: Dict[str, Callable[[], Tuple[Scene, CameraConfig]]] = {
    "cornell_sphere": cornell_sphere,
    "cornell_bsdf": cornell_bsdf,
    "cornell_mesh": cornell_mesh,
    "sphere_demo": sphere_demo,
    "veach_mis": veach_mis,
    "checker_demo": checker_demo,
    "envmap_demo": envmap_demo,
    "textured_demo": textured_demo,
    "bump_demo": bump_demo,
    "prism_demo": prism_demo,
    "glass_demo": glass_demo,
    "frosted_demo": frosted_demo,
    "fog_demo": fog_demo,
    "smoke_demo": smoke_demo,
    "fire_demo": fire_demo,
    "instanced_demo": instanced_demo,
    "principled_demo": principled_demo,
    "spotlight_demo": spotlight_demo,
    "screenlight_demo": screenlight_demo,
    "many_lights_demo": many_lights_demo,
    "sss_demo": sss_demo,
}


# Emitter-free outdoor scenes are lit purely by the sky: the CLI's
# "auto" background picks the gradient for these (black renders
# nothing). Everything else (lit interiors, envmap scenes) stays black.
PREFERRED_BACKGROUND: Dict[str, str] = {
    "checker_demo": "gradient",
    "sphere_demo": "gradient",
    "glass_demo": "gradient",
    "frosted_demo": "gradient",
    "instanced_demo": "gradient",
    "sss_demo": "gradient",
}


def preferred_background(name: str) -> str:
    return PREFERRED_BACKGROUND.get(name, "black")


def get_scene(name: str) -> Tuple[Scene, CameraConfig]:
    if name not in SCENES:
        raise KeyError(f"unknown scene {name!r}; have {sorted(SCENES)}")
    return SCENES[name]()
