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
    the OBJ spec. Normals/texcoords/groups/materials are ignored — the
    renderer computes geometric normals and materials come from the scene
    description, not .mtl files.
    """
    verts = []
    faces = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append(
                    (float(parts[1]), float(parts[2]), float(parts[3]))
                )
            elif line.startswith("f "):
                idx = []
                for token in line.split()[1:]:
                    raw = token.split("/")[0]
                    i = int(raw)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):  # fan triangulation
                    faces.append((idx[0], idx[k], idx[k + 1]))
    if not verts or not faces:
        raise ValueError(f"OBJ file {path!r} has no triangles")
    return np.asarray(verts, np.float64), np.asarray(faces, np.int64)


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
