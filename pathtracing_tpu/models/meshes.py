"""Mesh IO: Wavefront OBJ loading + mesh transforms (host-side, NumPy).

The reference has no asset pipeline at all (its one "asset" is a sphere
hard-coded in the kernel, `Test.hlsl:12-13`); a real framework needs to
ingest triangle meshes. Supports the OBJ subset that covers the standard
benchmark assets (v / f with polygon triangulation, negative indices,
ignores normals/texcoords/materials) plus procedural generators and
affine placement helpers.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse an OBJ file -> (vertices (V,3) f64, faces (F,3) i64).

    Polygons are fan-triangulated; indices may be negative (relative) per
    the OBJ spec. Normals/texcoords are dropped here — use
    ``load_obj_full`` to keep them; materials come from the scene
    description, not .mtl files.
    """
    verts, faces, *_ = load_obj_full(path)
    return verts, faces


def load_obj_full(path: str):
    """Parse an OBJ file keeping surface attributes.

    Returns (vertices (V,3) f64, faces (F,3) i64, uvs (U,2) f64 | None,
    uv_faces (F,3) i64 | None, normals (M,3) f64 | None,
    normal_faces (F,3) i64 | None). The attribute index buffers are None
    unless EVERY face corner carries that attribute (partially-attributed
    OBJs degrade to geometry-only, matching ``SceneBuilder.add_mesh``'s
    all-or-nothing per-chunk contract).
    """
    verts, uvs, norms = [], [], []
    faces, uvf, nrf = [], [], []
    uv_ok = nr_ok = True

    def resolve(raw: str, count: int):
        if not raw:
            return None
        i = int(raw)
        return i - 1 if i > 0 else count + i

    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                p = line.split()
                verts.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("vt "):
                p = line.split()
                uvs.append((float(p[1]), float(p[2]) if len(p) > 2 else 0.0))
            elif line.startswith("vn "):
                p = line.split()
                norms.append((float(p[1]), float(p[2]), float(p[3])))
            elif line.startswith("f "):
                vi, ti, ni = [], [], []
                for token in line.split()[1:]:
                    comps = token.split("/")
                    vi.append(resolve(comps[0], len(verts)))
                    ti.append(resolve(comps[1], len(uvs))
                              if len(comps) > 1 else None)
                    ni.append(resolve(comps[2], len(norms))
                              if len(comps) > 2 else None)
                for k in range(1, len(vi) - 1):  # fan triangulation
                    faces.append((vi[0], vi[k], vi[k + 1]))
                    if ti[0] is None or ti[k] is None or ti[k + 1] is None:
                        uv_ok = False
                    else:
                        uvf.append((ti[0], ti[k], ti[k + 1]))
                    if ni[0] is None or ni[k] is None or ni[k + 1] is None:
                        nr_ok = False
                    else:
                        nrf.append((ni[0], ni[k], ni[k + 1]))
    if not verts or not faces:
        raise ValueError(f"OBJ file {path!r} has no triangles")
    has_uv = uv_ok and uvs and len(uvf) == len(faces)
    has_nr = nr_ok and norms and len(nrf) == len(faces)
    return (
        np.asarray(verts, np.float64),
        np.asarray(faces, np.int64),
        np.asarray(uvs, np.float64) if has_uv else None,
        np.asarray(uvf, np.int64) if has_uv else None,
        np.asarray(norms, np.float64) if has_nr else None,
        np.asarray(nrf, np.int64) if has_nr else None,
    )


def smooth_vertex_normals(vertices: np.ndarray,
                          faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (V, 3): each face's unnormalized
    cross product (∝ area) accumulates at its three corners — the
    standard smooth-shading normals for meshes that ship without them."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    acc = np.zeros_like(v)
    for c in range(3):
        np.add.at(acc, f[:, c], fn)
    norm = np.linalg.norm(acc, axis=1, keepdims=True)
    return acc / np.maximum(norm, 1e-20)


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Write a minimal OBJ (round-trip partner of ``load_obj``)."""
    with open(path, "w") as f:
        for v in np.asarray(vertices, np.float64):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in np.asarray(faces, np.int64) + 1:
            f.write(f"f {a} {b} {c}\n")


def fit_to_box(vertices: np.ndarray, center, size: float) -> np.ndarray:
    """Uniformly scale + translate a mesh so its bounding box is centered
    at ``center`` with the longest side equal to ``size``."""
    v = np.asarray(vertices, np.float64)
    lo, hi = v.min(axis=0), v.max(axis=0)
    extent = (hi - lo).max()
    if extent <= 0:
        raise ValueError("degenerate mesh: zero bounding box")
    scale = size / extent
    mid = (lo + hi) * 0.5
    return (v - mid) * scale + np.asarray(center, np.float64)


def transform(vertices: np.ndarray, scale=1.0, rotate_y_degrees=0.0,
              translate=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Scale -> rotate about +y -> translate (the common placement combo)."""
    v = np.asarray(vertices, np.float64) * float(scale)
    th = np.radians(rotate_y_degrees)
    c, s = np.cos(th), np.sin(th)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
    return v @ rot.T + np.asarray(translate, np.float64)
