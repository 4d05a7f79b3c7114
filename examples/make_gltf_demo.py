"""Author examples/gltf_demo.glb — a self-contained glTF 2.0 sample.

The repo can't fetch public sample assets (no egress), so this script
writes a non-trivial binary-glTF scene exercising the loader end to end:
a checker-textured floor (baseColorTexture, data in the BIN chunk), a
ring of 8 instanced gold columns (one shared mesh, 8 TRS nodes → TRUE
instancing), a glass sphere (KHR_materials_transmission + ior), a
clearcoat sphere, an emissive panel (KHR_materials_emissive_strength),
a punctual spot light, and a perspective camera node.

Run:  python examples/make_gltf_demo.py     (rewrites gltf_demo.glb)
Render:  python -m pathtracing_tpu.render --scene examples/gltf_demo.glb
"""

from __future__ import annotations

import io
import json
import os
import struct

import numpy as np


def icosphere(subdiv: int, radius: float):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pathtracing_tpu.models.scenes import icosphere as ico

    return ico(subdiv, radius)


def cylinder(radius: float, height: float, segments: int = 12):
    """Open-capped cylinder mesh around +Y."""
    a = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    ring = np.stack([np.cos(a) * radius, np.zeros_like(a),
                     np.sin(a) * radius], axis=1)
    verts = np.concatenate([ring, ring + [0, height, 0],
                            [[0, 0, 0], [0, height, 0]]])
    faces = []
    top0 = segments
    c_bot, c_top = 2 * segments, 2 * segments + 1
    for i in range(segments):
        j = (i + 1) % segments
        faces += [(i, top0 + i, j), (j, top0 + i, top0 + j),
                  (i, j, c_bot), (top0 + j, top0 + i, c_top)]
    return verts.astype(np.float32), np.asarray(faces, np.uint16)


def checker_png(n: int = 8, size: int = 64) -> bytes:
    from PIL import Image

    t = size // n
    yy, xx = np.mgrid[0:size, 0:size]
    c = (((yy // t) + (xx // t)) % 2).astype(np.uint8)
    img = np.stack([200 * c + 40, 160 * c + 60, 120 * c + 60],
                   axis=-1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))

    chunks: list[bytes] = []
    views = []
    accessors = []

    def add_blob(data: bytes, stride=None, target=None) -> int:
        off = sum(len(c) for c in chunks)
        pad = -off % 4
        if pad:
            chunks.append(b"\x00" * pad)
            off += pad
        chunks.append(data)
        v = {"buffer": 0, "byteOffset": off, "byteLength": len(data)}
        if stride:
            v["byteStride"] = stride
        views.append(v)
        return len(views) - 1

    def add_mesh_arrays(verts: np.ndarray, faces: np.ndarray):
        verts = np.ascontiguousarray(verts, np.float32)
        faces = np.ascontiguousarray(faces, np.uint32).reshape(-1)
        vi = add_blob(verts.tobytes())
        fi = add_blob(faces.tobytes())
        accessors.append({
            "bufferView": vi, "componentType": 5126,
            "count": len(verts), "type": "VEC3",
            "min": verts.min(axis=0).tolist(),
            "max": verts.max(axis=0).tolist(),
        })
        pos_acc = len(accessors) - 1
        accessors.append({
            "bufferView": fi, "componentType": 5125,
            "count": len(faces), "type": "SCALAR",
        })
        return pos_acc, len(accessors) - 1

    # Floor quad with UVs.
    fl_pos = np.array([[-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6]],
                      np.float32)
    fl_uv = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32)
    fl_idx = np.array([0, 2, 1, 0, 3, 2], np.uint32)
    p_acc, i_acc = add_mesh_arrays(fl_pos, fl_idx)
    uv_view = add_blob(fl_uv.tobytes())
    accessors.append({"bufferView": uv_view, "componentType": 5126,
                      "count": 4, "type": "VEC2"})
    uv_acc = len(accessors) - 1

    col_v, col_f = cylinder(0.25, 2.2, 14)
    c_acc, cf_acc = add_mesh_arrays(col_v, col_f)

    sph_v, sph_f = icosphere(3, 1.0)
    s_acc, sf_acc = add_mesh_arrays(np.asarray(sph_v, np.float32),
                                    np.asarray(sph_f, np.uint32))

    panel_pos = np.array([[-1.6, 0, 0], [1.6, 0, 0], [1.6, 1.1, 0],
                          [-1.6, 1.1, 0]], np.float32)
    panel_idx = np.array([0, 1, 2, 0, 2, 3], np.uint32)
    pa_acc, pi_acc = add_mesh_arrays(panel_pos, panel_idx)

    png = checker_png()
    img_view = add_blob(png)

    meshes = [
        {"name": "floor", "primitives": [{
            "attributes": {"POSITION": p_acc, "TEXCOORD_0": uv_acc},
            "indices": i_acc, "material": 0}]},
        {"name": "column", "primitives": [{
            "attributes": {"POSITION": c_acc}, "indices": cf_acc,
            "material": 1}]},
        {"name": "glass", "primitives": [{
            "attributes": {"POSITION": s_acc}, "indices": sf_acc,
            "material": 2}]},
        {"name": "coated", "primitives": [{
            "attributes": {"POSITION": s_acc}, "indices": sf_acc,
            "material": 3}]},
        {"name": "panel", "primitives": [{
            "attributes": {"POSITION": pa_acc}, "indices": pi_acc,
            "material": 4}]},
    ]
    materials = [
        {"name": "floor", "pbrMetallicRoughness": {
            "baseColorFactor": [1, 1, 1, 1],
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.0, "roughnessFactor": 1.0}},
        {"name": "gold", "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 0.78, 0.3, 1.0],
            "metallicFactor": 1.0, "roughnessFactor": 0.25}},
        {"name": "glass", "pbrMetallicRoughness": {
            "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.0},
         "extensions": {
             "KHR_materials_transmission": {"transmissionFactor": 1.0},
             "KHR_materials_ior": {"ior": 1.5}}},
        {"name": "coated", "pbrMetallicRoughness": {
            "baseColorFactor": [0.62, 0.07, 0.09, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.6},
         "extensions": {"KHR_materials_clearcoat": {
             "clearcoatFactor": 1.0, "clearcoatRoughnessFactor": 0.05}}},
        {"name": "panel", "emissiveFactor": [1.0, 0.95, 0.85],
         "extensions": {"KHR_materials_emissive_strength": {
             "emissiveStrength": 14.0}}},
    ]

    nodes = [{"mesh": 0, "name": "floor"}]
    ring_r = 4.2
    for k in range(8):
        a = 2 * np.pi * k / 8
        nodes.append({"mesh": 1, "translation": [
            float(ring_r * np.cos(a)), 0.0, float(ring_r * np.sin(a))]})
    nodes += [
        {"mesh": 2, "translation": [-1.1, 1.0, 0.2]},
        {"mesh": 3, "translation": [1.3, 1.0, -0.6]},
        {"mesh": 4, "translation": [0.0, 2.4, -3.4]},
        {"name": "spot", "translation": [0.0, 5.0, 4.0],
         "rotation": [-0.383, 0.0, 0.0, 0.924],   # pitch ~-45° (down -Z)
         "extensions": {"KHR_lights_punctual": {"light": 0}}},
        {"name": "cam", "camera": 0,
         "translation": [0.0, 2.6, 9.0],
         "rotation": [-0.0872, 0.0, 0.0, 0.9962]},   # pitch -10°
    ]

    gltf = {
        "asset": {"version": "2.0",
                  "generator": "pathtracing_tpu examples"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": meshes,
        "materials": materials,
        "images": [{"bufferView": img_view, "mimeType": "image/png"}],
        "textures": [{"source": 0}],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.6, "znear": 0.01}}],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "spot", "color": [1.0, 0.96, 0.9],
             "intensity": 220.0,
             "spot": {"innerConeAngle": 0.35, "outerConeAngle": 0.6}},
        ]}},
        "extensionsUsed": [
            "KHR_lights_punctual", "KHR_materials_emissive_strength",
            "KHR_materials_transmission", "KHR_materials_ior",
            "KHR_materials_clearcoat",
        ],
        "buffers": [{"byteLength": sum(len(c) for c in chunks)}],
        "bufferViews": views,
        "accessors": accessors,
    }

    payload = json.dumps(gltf).encode()
    payload += b" " * (-len(payload) % 4)
    bin_chunk = b"".join(chunks)
    bin_chunk += b"\x00" * (-len(bin_chunk) % 4)
    body = (struct.pack("<I4s", len(payload), b"JSON") + payload
            + struct.pack("<I4s", len(bin_chunk), b"BIN\x00") + bin_chunk)
    out = os.path.join(here, "gltf_demo.glb")
    with open(out, "wb") as f:
        f.write(struct.pack("<4sII", b"glTF", 2, 12 + len(body)) + body)
    print(f"wrote {out} ({12 + len(body)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
