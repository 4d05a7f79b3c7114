"""Hand-build examples/gltf_torture.glb from raw structs (VERDICT r4
item 7): a second committed glTF fixture covering the corners the
self-generated demo (make_gltf_demo.py) never exercises —

  * one INTERLEAVED vertex buffer view (byteStride 20) holding
    f32 positions + NORMALIZED i16 normals + NORMALIZED u8 UVs,
  * index accessors at nonzero byteOffsets into a shared view,
  * a NESTED TRS chain (translation -> quaternion rotation ->
    scale+translation) above an instanced node,
  * shared-MESH instancing (3 nodes referencing one attribute-free
    cube mesh -> the loader's TRUE-instancing path), and
  * shared-ACCESSOR meshes (two mesh objects reusing the same
    position/index accessors with different materials — the glTF way
    to express "same geometry, per-node materials"),
  * a camera node and a KHR_lights_punctual point light.

Everything is packed with struct/json by hand — no generator
abstractions — so the committed bytes are an independent check on the
loader's container/accessor/node-walk layers (models/gltf.py). The
EXPECTED decoded values are duplicated in tests/test_gltf_torture.py
as literals.

Run:  python examples/make_gltf_torture.py   (rewrites the .glb)
"""

import json
import os
import struct

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "gltf_torture.glb")


def build_binary():
    """Pack the single binary buffer; returns (blob, offsets dict)."""
    blob = bytearray()

    def align(n):
        while len(blob) % n:
            blob.append(0)

    # --- Interleaved floor quad: stride 20 =
    #     pos f32x3 @0 | normal i16x3 normalized @12 | uv u8x2 @18
    floor_pos = [(-2.0, 0.0, -2.0), (2.0, 0.0, -2.0),
                 (2.0, 0.0, 2.0), (-2.0, 0.0, 2.0)]
    floor_uv8 = [(0, 0), (255, 0), (255, 255), (0, 255)]
    interleaved_off = len(blob)
    for (x, y, z), (u, v) in zip(floor_pos, floor_uv8):
        blob += struct.pack("<fff", x, y, z)
        blob += struct.pack("<hhh", 0, 32767, 0)   # +Y, normalized i16
        blob += struct.pack("<BB", u, v)
    interleaved_len = len(blob) - interleaved_off

    # --- Shared index view: floor indices first, cube indices at a
    #     nonzero byteOffset inside the SAME view.
    align(4)
    index_view_off = len(blob)
    floor_idx = [0, 1, 2, 0, 2, 3]
    for i in floor_idx:
        blob += struct.pack("<H", i)
    cube_idx_off = len(blob) - index_view_off     # 12 bytes
    cube_faces = [
        (0, 1, 2), (0, 2, 3), (4, 6, 5), (4, 7, 6),   # -z, +z
        (0, 4, 5), (0, 5, 1), (3, 2, 6), (3, 6, 7),   # -y, +y
        (0, 3, 7), (0, 7, 4), (1, 5, 6), (1, 6, 2),   # -x, +x
    ]
    for f in cube_faces:
        blob += struct.pack("<HHH", *f)
    index_view_len = len(blob) - index_view_off

    # --- Tight cube positions (unit cube centered at origin).
    align(4)
    cube_pos_off = len(blob)
    cube_pos = [(-0.5, -0.5, -0.5), (0.5, -0.5, -0.5),
                (0.5, 0.5, -0.5), (-0.5, 0.5, -0.5),
                (-0.5, -0.5, 0.5), (0.5, -0.5, 0.5),
                (0.5, 0.5, 0.5), (-0.5, 0.5, 0.5)]
    for p in cube_pos:
        blob += struct.pack("<fff", *p)
    cube_pos_len = len(blob) - cube_pos_off

    return bytes(blob), {
        "interleaved_off": interleaved_off,
        "interleaved_len": interleaved_len,
        "index_view_off": index_view_off,
        "index_view_len": index_view_len,
        "cube_idx_off": cube_idx_off,
        "cube_pos_off": cube_pos_off,
        "cube_pos_len": cube_pos_len,
    }


def build_gltf(o):
    s2 = float(np.sqrt(0.5))
    return {
        "asset": {"version": "2.0",
                  "generator": "make_gltf_torture.py (raw structs)"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1, 2, 3, 5, 8, 9, 10]}],
        "nodes": [
            {"name": "floor", "mesh": 0},                        # 0
            {"name": "camera", "camera": 0,
             "translation": [0.0, 2.2, 5.5],
             "rotation": [-0.13052619, 0.0, 0.0, 0.9914449]},    # 1
            {"name": "light",
             "translation": [0.0, 3.5, 0.0],
             "extensions": {"KHR_lights_punctual": {"light": 0}}},  # 2
            # Instanced cube A: plain translation.
            {"name": "cubeA", "mesh": 1,
             "translation": [-1.2, 0.25, 0.0],
             "scale": [0.5, 0.5, 0.5]},                          # 3
            # Nested TRS chain: root T -> mid R(90deg about Y) ->
            # leaf S(0.5)+T -> instanced cube B.
            {"name": "chainLeaf", "mesh": 1,
             "translation": [0.0, 0.5, 0.0],
             "scale": [0.5, 0.5, 0.5]},                          # 4
            {"name": "chainRoot", "translation": [1.2, 0.0, 0.0],
             "children": [6]},                                   # 5
            {"name": "chainMid",
             "rotation": [0.0, s2, 0.0, s2],
             "children": [4]},                                   # 6
            # (unused slot kept for stable indices)
            {"name": "spare"},                                   # 7
            # Instanced cube C under a matrix-node parent.
            {"name": "matrixParent",
             "matrix": [1, 0, 0, 0,  0, 1, 0, 0,  0, 0, 1, 0,
                        0.0, 0.25, -1.4, 1],
             "children": [11]},                                  # 8
            # Shared-accessor meshes with their own materials.
            {"name": "cubeRed", "mesh": 2,
             "translation": [-0.5, 0.25, 1.3],
             "scale": [0.5, 0.5, 0.5]},                          # 9
            {"name": "cubeBlue", "mesh": 3,
             "translation": [0.5, 0.25, 1.3],
             "scale": [0.5, 0.5, 0.5]},                          # 10
            {"name": "cubeC", "mesh": 1,
             "scale": [0.5, 0.5, 0.5]},                          # 11
        ],
        "cameras": [{"type": "perspective",
                     "perspective": {"yfov": 0.7, "znear": 0.01}}],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1.0, 0.95, 0.9],
             "intensity": 120.0},
        ]}},
        "extensionsUsed": ["KHR_lights_punctual"],
        "meshes": [
            {"name": "floor", "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1,
                               "TEXCOORD_0": 2},
                "indices": 3, "material": 0}]},
            {"name": "cube", "primitives": [{
                "attributes": {"POSITION": 4},
                "indices": 5, "material": 1}]},
            {"name": "cubeRed", "primitives": [{
                "attributes": {"POSITION": 4},
                "indices": 5, "material": 2}]},
            {"name": "cubeBlue", "primitives": [{
                "attributes": {"POSITION": 4},
                "indices": 5, "material": 3}]},
        ],
        "materials": [
            {"name": "floorGray", "pbrMetallicRoughness": {
                "baseColorFactor": [0.62, 0.62, 0.6, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.9}},
            {"name": "protoWhite", "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.8, 0.78, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.6}},
            {"name": "red", "pbrMetallicRoughness": {
                "baseColorFactor": [0.75, 0.08, 0.06, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.4}},
            {"name": "blue", "pbrMetallicRoughness": {
                "baseColorFactor": [0.08, 0.12, 0.75, 1.0],
                "metallicFactor": 1.0, "roughnessFactor": 0.25}},
        ],
        "buffers": [{"byteLength": 0}],     # patched below
        "bufferViews": [
            # 0: interleaved vertex view (the torture case).
            {"buffer": 0, "byteOffset": o["interleaved_off"],
             "byteLength": o["interleaved_len"], "byteStride": 20},
            # 1: shared index view (two accessors at different offsets).
            {"buffer": 0, "byteOffset": o["index_view_off"],
             "byteLength": o["index_view_len"]},
            # 2: tight cube positions.
            {"buffer": 0, "byteOffset": o["cube_pos_off"],
             "byteLength": o["cube_pos_len"]},
        ],
        "accessors": [
            # 0: floor POSITION — f32x3 inside the interleaved view.
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3",
             "min": [-2.0, 0.0, -2.0], "max": [2.0, 0.0, 2.0]},
            # 1: floor NORMAL — normalized i16x3 at offset 12.
            {"bufferView": 0, "byteOffset": 12, "componentType": 5122,
             "count": 4, "type": "VEC3", "normalized": True},
            # 2: floor TEXCOORD_0 — normalized u8x2 at offset 18.
            {"bufferView": 0, "byteOffset": 18, "componentType": 5121,
             "count": 4, "type": "VEC2", "normalized": True},
            # 3: floor indices — u16 at view offset 0.
            {"bufferView": 1, "byteOffset": 0, "componentType": 5123,
             "count": 6, "type": "SCALAR"},
            # 4: cube POSITION — tight f32x3.
            {"bufferView": 2, "byteOffset": 0, "componentType": 5126,
             "count": 8, "type": "VEC3",
             "min": [-0.5, -0.5, -0.5], "max": [0.5, 0.5, 0.5]},
            # 5: cube indices — u16 at NONZERO offset in the shared view.
            {"bufferView": 1, "byteOffset": o["cube_idx_off"],
             "componentType": 5123, "count": 36, "type": "SCALAR"},
        ],
    }


def write_glb(path, gltf, blob):
    gltf["buffers"][0]["byteLength"] = len(blob)
    js = json.dumps(gltf, separators=(",", ":")).encode()
    js += b" " * (-len(js) % 4)
    binp = blob + b"\0" * (-len(blob) % 4)
    total = 12 + 8 + len(js) + 8 + len(binp)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
        f.write(struct.pack("<II", len(binp), 0x004E4942) + binp)


if __name__ == "__main__":
    blob, offsets = build_binary()
    write_glb(OUT, build_gltf(offsets), blob)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
