"""The committed hand-built glTF fixture (VERDICT r4 item 7).

examples/gltf_torture.glb is packed from raw structs
(examples/make_gltf_torture.py) — NOT by the demo generator — so these
assertions are an independent check on models/gltf.py's container,
accessor, and node-walk layers against literal expected values:
interleaved byteStride accessors, normalized int attributes, shared
index views at nonzero offsets, nested TRS chains, true shared-mesh
instancing, and shared-accessor meshes with per-node materials.
"""

import os

import numpy as np
import pytest

from pathtracing_tpu.models import gltf as gltf_io

GLB = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "gltf_torture.glb")


@pytest.fixture(scope="module")
def asset():
    gltf, bin_chunk = gltf_io._read_container(GLB)
    return gltf_io._Asset(
        gltf, gltf_io._load_buffers(gltf, bin_chunk,
                                    os.path.dirname(GLB)),
        os.path.dirname(GLB),
    )


def test_interleaved_position_accessor(asset):
    pos = asset.accessor(0)
    np.testing.assert_array_equal(
        pos, np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]],
                      np.float32))


def test_normalized_i16_normals(asset):
    n = asset.accessor(1)
    assert n.dtype == np.float32
    np.testing.assert_allclose(
        n, np.tile([0.0, 1.0, 0.0], (4, 1)), atol=1e-6)


def test_normalized_u8_uvs(asset):
    uv = asset.accessor(2)
    assert uv.dtype == np.float32
    np.testing.assert_allclose(
        uv, np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        atol=1e-6)


def test_shared_index_view_nonzero_offset(asset):
    floor_idx = asset.accessor(3).reshape(-1)
    np.testing.assert_array_equal(floor_idx, [0, 1, 2, 0, 2, 3])
    cube_idx = asset.accessor(5).reshape(-1, 3)
    assert cube_idx.shape == (12, 3)
    assert cube_idx.max() == 7 and cube_idx.min() == 0


def test_nested_trs_chain_world_matrix(asset):
    """chainRoot T(1.2,0,0) -> chainMid R(+90 deg about Y) -> chainLeaf
    T(0,0.5,0)*S(0.5): the leaf's world matrix must equal the literal
    composition (rotation maps +x to -z / +z to +x; the leaf's local
    translation happens BEFORE the parent rotation, so it stays +y)."""
    worlds = {n.get("name"): w for n, w in gltf_io._walk_nodes(
        asset.gltf)}
    leaf = worlds["chainLeaf"]
    expected = np.array([
        [0.0, 0.0, 0.5, 1.2],
        [0.0, 0.5, 0.0, 0.5],
        [-0.5, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    np.testing.assert_allclose(leaf, expected, atol=1e-6)


def test_true_instancing_and_shared_accessor_meshes():
    scene, cam = gltf_io.load_gltf(GLB)
    # The attribute-free cube mesh is referenced by 3 nodes -> the
    # TRUE-instancing path; cubeRed/cubeBlue share its accessors but
    # are distinct meshes with their own materials -> expanded, so the
    # base triangle list holds floor (2) + 2 x cube (12).
    assert scene.instances is not None
    assert int(scene.tri_v0.shape[0]) == 2 + 12 + 12
    # Per-"node" materials survived: three distinct materials over the
    # base triangles — floor (2 tris) + red cube (12) + blue cube (12).
    # (Build-time cluster packing permutes triangle order, so count by
    # value, not position.)
    mats, counts = np.unique(np.asarray(scene.tri_mat),
                             return_counts=True)
    assert sorted(counts.tolist()) == [2, 12, 12]


def test_camera_and_light_nodes():
    scene, cam = gltf_io.load_gltf(GLB)
    np.testing.assert_allclose(cam.position, (0.0, 2.2, 5.5), atol=1e-6)
    # KHR_lights_punctual point light -> delta-light table.
    assert scene.delta is not None


def test_render_smoke(tmp_path):
    scene, cam_cfg = gltf_io.load_gltf(GLB)
    import jax

    from pathtracing_tpu.models import progressive
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=48, height=32, samples_per_pixel=2,
                       max_depth=3, samples_per_step=2, seed=0)
    camera = build_camera(cam_cfg, 1.5)
    state = progressive.init_state(cfg)
    state = progressive.render_step(state, scene, camera, cfg)
    img = np.asarray(state.accum) / max(int(state.spp), 1)
    assert np.isfinite(img).all()
    assert img.max() > 0.0
