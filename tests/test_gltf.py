"""glTF 2.0 loading (models/gltf.load_gltf): container parsing, accessor
decode, node transforms, material mapping, instancing, punctual lights."""

import base64
import io
import json
import struct

import numpy as np
import pytest

from pathtracing_tpu.models import gltf as gltf_io
from pathtracing_tpu.ops import materials

# Unit quad in the XY plane (2 triangles).
QUAD_POS = np.array([
    [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 1.0, 0.0],
], np.float32)
QUAD_IDX = np.array([0, 1, 2, 0, 2, 3], np.uint16)
QUAD_UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
QUAD_NRM = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))


def _png_2x2() -> bytes:
    """Checker PNG via PIL (the repo's texture loader dependency)."""
    from PIL import Image

    arr = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [255, 255, 255]]], np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _data_uri(data: bytes, mime: str) -> str:
    return f"data:{mime};base64," + base64.b64encode(data).decode()


def _base_buffer():
    """Packed buffer: positions | indices | uvs | normals (tight)."""
    blob = QUAD_POS.tobytes() + QUAD_IDX.tobytes() + QUAD_UV.tobytes() \
        + QUAD_NRM.tobytes()
    views = [
        {"buffer": 0, "byteOffset": 0, "byteLength": QUAD_POS.nbytes},
        {"buffer": 0, "byteOffset": QUAD_POS.nbytes,
         "byteLength": QUAD_IDX.nbytes},
        {"buffer": 0, "byteOffset": QUAD_POS.nbytes + QUAD_IDX.nbytes,
         "byteLength": QUAD_UV.nbytes},
        {"buffer": 0,
         "byteOffset": QUAD_POS.nbytes + QUAD_IDX.nbytes + QUAD_UV.nbytes,
         "byteLength": QUAD_NRM.nbytes},
    ]
    accessors = [
        {"bufferView": 0, "componentType": 5126, "count": 4,
         "type": "VEC3"},
        {"bufferView": 1, "componentType": 5123, "count": 6,
         "type": "SCALAR"},
        {"bufferView": 2, "componentType": 5126, "count": 4,
         "type": "VEC2"},
        {"bufferView": 3, "componentType": 5126, "count": 4,
         "type": "VEC3"},
    ]
    return blob, views, accessors


def _gltf_doc():
    """Two meshes: a bare quad (POSITION+indices only) used by TWO nodes
    (the instancing path) and an attributed quad (UV+NORMAL, textured
    principled material) used once; plus an emissive quad, a punctual
    point light, and a perspective camera."""
    blob, views, accessors = _base_buffer()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{
            "byteLength": len(blob),
            "uri": _data_uri(blob, "application/octet-stream"),
        }],
        "bufferViews": views,
        "accessors": accessors,
        "images": [{"uri": _data_uri(_png_2x2(), "image/png")}],
        "textures": [{"source": 0}],
        "materials": [
            {"name": "gold", "pbrMetallicRoughness": {
                "baseColorFactor": [1.0, 0.8, 0.2, 1.0],
                "baseColorTexture": {"index": 0},
                "metallicFactor": 1.0, "roughnessFactor": 0.3,
            }},
            {"name": "lamp", "emissiveFactor": [1.0, 1.0, 1.0],
             "extensions": {"KHR_materials_emissive_strength": {
                 "emissiveStrength": 5.0}}},
            {"name": "plain", "pbrMetallicRoughness": {
                "baseColorFactor": [0.5, 0.5, 0.5, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 1.0,
            }},
        ],
        "meshes": [
            {"primitives": [{
                "attributes": {"POSITION": 0}, "indices": 1,
                "material": 2,
            }]},
            {"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 2,
                               "NORMAL": 3},
                "indices": 1, "material": 0,
            }]},
            {"primitives": [{
                "attributes": {"POSITION": 0}, "indices": 1,
                "material": 1,
            }]},
        ],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.7, "znear": 0.01}}],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1, 1, 1], "intensity": 10.0},
        ]}},
        "extensionsUsed": ["KHR_lights_punctual",
                           "KHR_materials_emissive_strength"],
        "nodes": [
            # 0/1: the shared bare mesh — instanced (TRS and matrix forms).
            {"mesh": 0, "translation": [2.0, 0.0, 0.0]},
            {"mesh": 0, "matrix": [2, 0, 0, 0,   # column-major: scale 2
                                   0, 2, 0, 0,
                                   0, 0, 2, 0,
                                   -3, 0, 0, 1]},
            # 2: the attributed mesh, rotated 90° about Y (quaternion).
            {"mesh": 1, "rotation": [0.0, np.sin(np.pi / 4), 0.0,
                                     np.cos(np.pi / 4)]},
            # 3: emissive quad.
            {"mesh": 2, "translation": [0.0, 3.0, 0.0]},
            # 4: point light at (0, 2, 2).
            {"translation": [0.0, 2.0, 2.0],
             "extensions": {"KHR_lights_punctual": {"light": 0}}},
            # 5: camera at (0, 1, 6) looking down -Z.
            {"camera": 0, "translation": [0.0, 1.0, 6.0]},
        ],
        "scenes": [{"nodes": [0, 1, 2, 3, 4, 5]}],
        "scene": 0,
    }
    return doc


def _write_glb(path, doc, bin_chunk=None):
    payload = json.dumps(doc).encode()
    payload += b" " * (-len(payload) % 4)
    chunks = struct.pack("<I4s", len(payload), b"JSON") + payload
    if bin_chunk is not None:
        bin_chunk = bin_chunk + b"\x00" * (-len(bin_chunk) % 4)
        chunks += struct.pack("<I4s", len(bin_chunk), b"BIN\x00") + bin_chunk
    total = 12 + len(chunks)
    path.write_bytes(struct.pack("<4sII", b"glTF", 2, total) + chunks)


@pytest.fixture()
def asset_path(tmp_path):
    p = tmp_path / "scene.gltf"
    p.write_text(json.dumps(_gltf_doc()))
    return p


def test_geometry_and_instancing(asset_path):
    scene, cam = gltf_io.load_gltf(str(asset_path))
    # The shared bare mesh becomes 2 instances of one 2-tri prototype;
    # the attributed + emissive quads expand to 2 tris each.
    assert scene.clusters is not None
    assert int(scene.tri_v0.shape[0]) >= 4   # expanded (non-inst) quads
    # Camera came from the camera node.
    np.testing.assert_allclose(cam.position, (0.0, 1.0, 6.0), atol=1e-6)
    assert abs(cam.vfov_degrees - np.degrees(0.7)) < 1e-4
    # look_at is straight down -Z from the node.
    np.testing.assert_allclose(cam.look_at, (0.0, 1.0, 5.0), atol=1e-6)


def test_materials_map(asset_path):
    scene, _ = gltf_io.load_gltf(str(asset_path))
    types = np.asarray(scene.mat_type)
    assert (types == materials.TYPE_PRINCIPLED).sum() >= 2
    assert (types == materials.TYPE_EMISSIVE).sum() == 1
    # Emissive strength multiplied through.
    emit = np.asarray(scene.mat_emit)
    assert np.isclose(emit.max(), 5.0)
    # NEE table sees the emissive quad's two triangles.
    assert float(scene.lights.total_power) > 0.0
    # Punctual light present.
    assert scene.delta is not None
    np.testing.assert_allclose(
        np.asarray(scene.delta.position)[0], (0.0, 2.0, 2.0), atol=1e-6
    )


def test_node_transforms(asset_path):
    scene, _ = gltf_io.load_gltf(str(asset_path))
    # The matrix-form instance scales by 2 and translates to x=-3: its
    # world-space AABB must appear in the scene bounds.
    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    # Rotated attributed quad: 90° about Y maps (1,1,0) -> (0,1,-1).
    # Find a corner near that point among expanded triangles.
    pts = np.concatenate([v0, v0 + e1, v0 + e2], axis=0)
    d = np.linalg.norm(pts - np.array([0.0, 1.0, -1.0]), axis=1)
    assert d.min() < 1e-5


def test_glb_container(tmp_path):
    doc = _gltf_doc()
    # Move the buffer into the GLB BIN chunk.
    blob, _, _ = _base_buffer()
    doc["buffers"] = [{"byteLength": len(blob)}]
    p = tmp_path / "scene.glb"
    _write_glb(p, doc, blob)
    scene, cam = gltf_io.load_gltf(str(p))
    assert float(scene.lights.total_power) > 0.0
    np.testing.assert_allclose(cam.position, (0.0, 1.0, 6.0), atol=1e-6)


def test_strided_and_normalized_accessors(tmp_path):
    """Interleaved POSITION/NORMAL (byteStride) + normalized uint16 UVs."""
    inter = np.zeros((4, 6), np.float32)
    inter[:, :3] = QUAD_POS
    inter[:, 3:] = QUAD_NRM
    uv16 = (QUAD_UV * 65535).astype(np.uint16)
    blob = inter.tobytes() + QUAD_IDX.tobytes() + uv16.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(blob),
                     "uri": _data_uri(blob, "application/octet-stream")}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": inter.nbytes,
             "byteStride": 24},
            {"buffer": 0, "byteOffset": inter.nbytes,
             "byteLength": QUAD_IDX.nbytes},
            {"buffer": 0, "byteOffset": inter.nbytes + QUAD_IDX.nbytes,
             "byteLength": uv16.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5123, "count": 4,
             "type": "VEC2", "normalized": True},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 3},
            "indices": 2,
        }]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
    }
    p = tmp_path / "strided.gltf"
    p.write_text(json.dumps(doc))
    from pathtracing_tpu.models.gltf import _Asset, _load_buffers

    parsed = json.loads(p.read_text())
    asset = _Asset(parsed, _load_buffers(parsed, None, str(tmp_path)),
                   str(tmp_path))
    np.testing.assert_allclose(asset.accessor(0), QUAD_POS)
    np.testing.assert_allclose(asset.accessor(1), QUAD_NRM)
    uv = asset.accessor(3)
    np.testing.assert_allclose(uv, QUAD_UV, atol=2e-5)
    # And the whole scene builds (default material path).
    scene, _ = gltf_io.load_gltf(str(p))
    assert int(scene.tri_v0.shape[0]) >= 2


def test_render_smoke(asset_path, tmp_path):
    """End-to-end: the asset renders through the megakernel without NaNs
    and with nonzero radiance (lamp + point light illuminate the quads)."""
    from pathtracing_tpu.models import progressive
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    scene, cam_cfg = gltf_io.load_gltf(str(asset_path))
    config = RenderConfig(width=32, height=32, samples_per_pixel=2,
                          max_depth=4, samples_per_step=2, seed=3)
    cam = build_camera(cam_cfg, 1.0)
    state = progressive.render_step(
        progressive.init_state(config), scene, cam, config
    )
    img = np.asarray(progressive.resolve(state))
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_sparse_accessor_rejected(tmp_path):
    doc = _gltf_doc()
    doc["accessors"][0]["sparse"] = {"count": 1}
    p = tmp_path / "sparse.gltf"
    p.write_text(json.dumps(doc))
    with pytest.raises(ValueError, match="sparse"):
        gltf_io.load_gltf(str(p))
