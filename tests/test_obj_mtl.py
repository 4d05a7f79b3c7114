"""OBJ + MTL asset loading (models/obj_mtl.load_obj_scene): usemtl
grouping, MTL material mapping heuristics, texture/normal-map wiring,
camera auto-framing, end-to-end render smoke."""

import io
import os

import numpy as np
import pytest

from pathtracing_tpu.models import obj_mtl
from pathtracing_tpu.ops import materials

MTL = """
# classic Phong materials exercising every mapping branch
newmtl matte
Kd 0.60 0.20 0.20
Ns 10

newmtl shiny_floor
Kd 0.50 0.50 0.55
Ks 0.04 0.04 0.04
Ns 250
map_Kd checker.png
bump -bm 0.5 bumps.png

newmtl mirror
Kd 0.0 0.0 0.0
Ks 0.95 0.95 0.95
illum 5
Ns 1000

newmtl glass
Kd 0.9 0.9 0.9
Ni 1.52
d 0.1
illum 7

newmtl lamp
Kd 0 0 0
Ke 12.0 11.0 10.0
"""

# One shared vertex/uv/normal pool, five single-quad groups. The matte
# group omits vt/vn (geometry-only chunk); the floor keeps both.
OBJ = """
mtllib scene.mtl extra.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
v 1 0 1
v 1 1 1
v 0 1 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl matte
f 1 2 3 4
usemtl shiny_floor
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl mirror
f 5 6 7
usemtl glass
f 5 7 8
usemtl lamp
f -8 -7 -6
usemtl ghost_material
f 1 3 8
"""


def _png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.fixture()
def asset_path(tmp_path):
    (tmp_path / "scene.mtl").write_text(MTL)
    (tmp_path / "scene.obj").write_text(OBJ)
    _png(tmp_path / "checker.png",
         np.array([[[255, 0, 0], [0, 255, 0]],
                   [[0, 0, 255], [255, 255, 255]]]))
    _png(tmp_path / "bumps.png",
         np.full((2, 2, 3), (128, 128, 255)))
    return tmp_path / "scene.obj"


def test_material_mapping(asset_path):
    scene, _ = obj_mtl.load_obj_scene(str(asset_path))
    types = np.asarray(scene.mat_type)
    # matte (no Ks -> pure diffuse) + ghost-default -> lambertian;
    # floor -> textured principled; mirror -> GGX; glass -> dielectric;
    # lamp -> emissive.
    assert (types == materials.TYPE_PRINCIPLED).sum() == 1
    assert (types == materials.TYPE_LAMBERTIAN).sum() == 2
    assert (types == materials.TYPE_GGX).sum() == 1
    assert (types == materials.TYPE_DIELECTRIC).sum() == 1
    assert (types == materials.TYPE_EMISSIVE).sum() == 1
    # Ke flowed into the emission columns and the NEE light table.
    assert np.isclose(np.asarray(scene.mat_emit).max(), 12.0)
    assert float(scene.lights.total_power) > 0.0
    # Dielectric IOR came from Ni.
    d = int(np.argmax(types == materials.TYPE_DIELECTRIC))
    assert np.isclose(float(np.asarray(scene.mat_param)[d]), 1.52)
    # Textures (checker sRGB + bump map) registered.
    assert scene.textures is not None


def test_group_attribute_contract(asset_path):
    """Per-GROUP all-or-nothing: the floor group keeps its UVs even
    though the matte group has none."""
    scene, _ = obj_mtl.load_obj_scene(str(asset_path))
    assert scene.attr_uv is not None
    uv = np.asarray(scene.attr_uv)
    # At least the floor's two triangles carry a real UV spread.
    spans = uv.max(axis=1) - uv.min(axis=1)
    assert (spans.max(axis=-1) > 0.5).sum() >= 2


def test_quads_triangulated(asset_path):
    scene, _ = obj_mtl.load_obj_scene(str(asset_path))
    # 2 quads (2 tris each) + 4 single triangles = 8 triangles.
    assert int(np.asarray(scene.tri_mat).shape[0]) == 8


def test_camera_frames_scene(asset_path):
    _, cam = obj_mtl.load_obj_scene(str(asset_path))
    pos = np.asarray(cam.position)
    look = np.asarray(cam.look_at)
    # Looks at the bbox center of the unit-ish cube from +Z.
    np.testing.assert_allclose(look, (0.5, 0.5, 0.5), atol=1e-6)
    assert pos[2] > 1.0 and np.isfinite(pos).all()


def test_missing_mtllib_defaults(tmp_path):
    p = tmp_path / "lone.obj"
    p.write_text("mtllib nowhere.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                 "usemtl whatever\nf 1 2 3\n")
    scene, _ = obj_mtl.load_obj_scene(str(p))
    assert int(np.asarray(scene.mat_type)[0]) == materials.TYPE_LAMBERTIAN


def test_missing_texture_ignored(tmp_path):
    (tmp_path / "t.mtl").write_text(
        "newmtl m\nKd 0.5 0.5 0.5\nmap_Kd not_there.png\n"
    )
    p = tmp_path / "t.obj"
    p.write_text("mtllib t.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                 "usemtl m\nf 1 2 3\n")
    scene, _ = obj_mtl.load_obj_scene(str(p))
    assert scene.textures is None   # texture dropped, scene still loads


def test_empty_obj_raises(tmp_path):
    p = tmp_path / "empty.obj"
    p.write_text("v 0 0 0\n")
    with pytest.raises(ValueError, match="no triangles"):
        obj_mtl.load_obj_scene(str(p))


def test_ns_roughness_monotone():
    rs = [obj_mtl._ns_to_roughness(ns) for ns in (0, 10, 100, 1000)]
    assert all(a > b for a, b in zip(rs, rs[1:]))
    assert 0.02 <= min(rs) and max(rs) <= 1.0


def test_render_smoke(asset_path):
    """End-to-end: the asset renders through the progressive engine
    without NaNs and with nonzero radiance (the lamp triangle emits)."""
    from pathtracing_tpu.models import progressive
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    scene, cam_cfg = obj_mtl.load_obj_scene(str(asset_path))
    config = RenderConfig(width=32, height=32, samples_per_pixel=2,
                          max_depth=4, samples_per_step=2, seed=3)
    cam = build_camera(cam_cfg, 1.0)
    state = progressive.render_step(
        progressive.init_state(config), scene, cam, config
    )
    img = np.asarray(progressive.resolve(state))
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_cli_renders_obj(asset_path, tmp_path):
    """The .obj extension dispatches through the CLI."""
    import subprocess
    import sys

    out = tmp_path / "obj_render.png"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pathtracing_tpu.render",
         "--scene", str(asset_path), "--width", "24", "--height", "16",
         "--spp", "1", "--max-depth", "2", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
