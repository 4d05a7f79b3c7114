"""Stanford PLY mesh loading (models/meshes.load_ply)."""

import struct

import numpy as np
import pytest

from pathtracing_tpu.models import meshes

# A quad pyramid: 5 vertices, 6 triangles after fan-triangulating the
# quad base.
VERTS = np.array([
    [0.0, 1.0, 0.0],
    [-1.0, 0.0, -1.0], [1.0, 0.0, -1.0],
    [1.0, 0.0, 1.0], [-1.0, 0.0, 1.0],
], np.float64)
FACES_IN = [(0, 1, 2), (0, 2, 3), (0, 3, 4), (0, 4, 1), (1, 4, 3, 2)]
TRIS = np.array([
    [0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 1],
    [1, 4, 3], [1, 3, 2],
], np.int64)


def _write_ascii(path, with_attrs=False):
    props = ["property float x", "property float y", "property float z"]
    if with_attrs:
        props += ["property float nx", "property float ny",
                  "property float nz",
                  "property float u", "property float v"]
    lines = ["ply", "format ascii 1.0", "comment test fixture",
             f"element vertex {len(VERTS)}", *props,
             f"element face {len(FACES_IN)}",
             "property list uchar int vertex_indices", "end_header"]
    for i, v in enumerate(VERTS):
        row = list(v)
        if with_attrs:
            row += [0.0, 1.0, 0.0, i / 10.0, i / 5.0]
        lines.append(" ".join(f"{x:.6f}" for x in row))
    for f in FACES_IN:
        lines.append(f"{len(f)} " + " ".join(map(str, f)))
    path.write_text("\n".join(lines) + "\n")


def _write_binary(path):
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 5\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 5\n"
              b"property list uchar int vertex_indices\nend_header\n")
    body = b""
    for v in VERTS:
        body += struct.pack("<fff", *v)
    for f in FACES_IN:
        body += struct.pack("<B", len(f)) + struct.pack(
            f"<{len(f)}i", *f
        )
    path.write_bytes(header + body)


def test_ascii_geometry(tmp_path):
    p = tmp_path / "pyr.ply"
    _write_ascii(p)
    v, f, uvs, uvf, nrm, nrf = meshes.load_ply(str(p))
    np.testing.assert_allclose(v, VERTS, atol=1e-6)
    np.testing.assert_array_equal(f, TRIS)
    assert uvs is None and nrm is None


def test_ascii_attributes(tmp_path):
    p = tmp_path / "pyr_attr.ply"
    _write_ascii(p, with_attrs=True)
    v, f, uvs, uvf, nrm, nrf = meshes.load_ply(str(p))
    np.testing.assert_allclose(nrm, np.tile([0.0, 1.0, 0.0], (5, 1)))
    np.testing.assert_allclose(uvs[:, 0], np.arange(5) / 10.0,
                               atol=1e-6)
    np.testing.assert_array_equal(uvf, f)
    np.testing.assert_array_equal(nrf, f)


def test_binary_matches_ascii(tmp_path):
    pa = tmp_path / "a.ply"
    pb = tmp_path / "b.ply"
    _write_ascii(pa)
    _write_binary(pb)
    va, fa, *_ = meshes.load_ply(str(pa))
    vb, fb, *_ = meshes.load_ply(str(pb))
    np.testing.assert_allclose(va, vb, atol=1e-6)
    np.testing.assert_array_equal(fa, fb)


def test_rejects_non_ply(tmp_path):
    p = tmp_path / "x.ply"
    p.write_bytes(b"solid nope\nend_header\n")
    with pytest.raises(ValueError, match="not a PLY"):
        meshes.load_ply(str(p))


def test_json_scene_renders_ply(tmp_path):
    import json

    from pathtracing_tpu import render as render_cli

    _write_ascii(tmp_path / "pyr.ply")
    spec = {
        "camera": {"position": [0, 1.5, 4], "look_at": [0, 0.4, 0],
                   "vfov_degrees": 45},
        "materials": {"w": {"type": "lambertian",
                            "albedo": [0.6, 0.6, 0.6]}},
        "objects": [{"type": "mesh", "ply": "pyr.ply", "material": "w",
                     "fit_box": {"center": [0, 0.4, 0], "size": 1.2}}],
        "background": "gradient",
    }
    scene_path = tmp_path / "s.json"
    scene_path.write_text(json.dumps(spec))
    out = tmp_path / "r.png"
    rc = render_cli.main([
        "--scene", str(scene_path), "--width", "24", "--height", "18",
        "--spp", "2", "--spp-per-step", "2", "--max-depth", "2",
        "--out", str(out),
    ])
    assert rc == 0 and out.exists()
