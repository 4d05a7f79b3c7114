"""Mesh IO (OBJ) and JSON scene descriptions."""

import os

import numpy as np
import pytest

from pathtracing_tpu.models import meshes, scene_io, scenes
from pathtracing_tpu.models.scene import SceneBuilder

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestObj:
    def test_roundtrip(self, tmp_path):
        verts, faces = scenes.icosphere(1, 0.5)
        p = str(tmp_path / "ico.obj")
        meshes.save_obj(p, verts, faces)
        v2, f2 = meshes.load_obj(p)
        np.testing.assert_allclose(v2, verts, rtol=1e-12)
        np.testing.assert_array_equal(f2, faces)

    def test_polygon_fan_and_negative_indices(self, tmp_path):
        p = str(tmp_path / "quad.obj")
        with open(p, "w") as f:
            f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n")
            f.write("f 1 2 3 4\n")       # quad -> 2 triangles
            f.write("f -4 -3 -2\n")      # negative (relative) indices
        v, faces = meshes.load_obj(p)
        assert faces.shape == (3, 3)
        np.testing.assert_array_equal(faces[0], (0, 1, 2))
        np.testing.assert_array_equal(faces[1], (0, 2, 3))
        np.testing.assert_array_equal(faces[2], (0, 1, 2))

    def test_empty_rejected(self, tmp_path):
        p = str(tmp_path / "empty.obj")
        open(p, "w").close()
        with pytest.raises(ValueError, match="no triangles"):
            meshes.load_obj(p)

    def test_fit_to_box(self):
        verts, _ = scenes.icosphere(1, 2.0)
        out = meshes.fit_to_box(verts, (1.0, 2.0, 3.0), 0.5)
        lo, hi = out.min(axis=0), out.max(axis=0)
        np.testing.assert_allclose((lo + hi) / 2, (1.0, 2.0, 3.0),
                                   atol=1e-9)
        assert abs((hi - lo).max() - 0.5) < 1e-9

    def test_transform_rotation(self):
        v = np.array([[1.0, 0.0, 0.0]])
        out = meshes.transform(v, rotate_y_degrees=90.0)
        np.testing.assert_allclose(out, [[0.0, 0.0, -1.0]], atol=1e-12)


class TestJsonScene:
    def test_example_scene_loads_and_matches_builder(self):
        scene, cam = scene_io.load_scene(
            os.path.join(REPO, "examples", "cornell.json")
        )
        assert cam.vfov_degrees == 40.0
        # 6 quads (12 tris) + icosphere(3) = 12 + 20*4**3 = 1292 tris
        # (+1 if the degenerate pad was needed — it is not, tris exist).
        assert scene.tri_v0.shape[0] == 12 + 20 * 4**3
        assert scene.sph_center.shape[0] == 2
        assert float(scene.lights.total_area) == pytest.approx(0.81)

    def test_render_smoke(self):
        from pathtracing_tpu.models import progressive
        from pathtracing_tpu.ops.camera import build_camera
        from pathtracing_tpu.utils.config import RenderConfig

        scene, cam_cfg = scene_io.load_scene(
            os.path.join(REPO, "examples", "cornell.json")
        )
        config = RenderConfig(width=16, height=16, samples_per_pixel=2,
                              max_depth=3, samples_per_step=2, seed=0)
        s = progressive.render_step(
            progressive.init_state(config), scene,
            build_camera(cam_cfg, 1.0), config,
        )
        img = np.asarray(s.accum)
        assert np.isfinite(img).all() and img.max() > 0

    def test_mesh_object_with_fit_box(self, tmp_path):
        verts, faces = scenes.icosphere(1, 3.0)
        obj_path = str(tmp_path / "m.obj")
        meshes.save_obj(obj_path, verts, faces)
        spec = {
            "materials": {"m": {"type": "lambertian",
                                "albedo": [0.5, 0.5, 0.5]}},
            "objects": [{
                "type": "mesh", "obj": "m.obj", "material": "m",
                "fit_box": {"center": [0, 0, 0], "size": 1.0},
            }],
        }
        import json

        scene_path = str(tmp_path / "s.json")
        with open(scene_path, "w") as f:
            json.dump(spec, f)
        scene, _ = scene_io.load_scene(scene_path)  # relative obj resolves
        assert scene.tri_v0.shape[0] == faces.shape[0]

    def test_unknown_material_rejected(self, tmp_path):
        import json

        p = str(tmp_path / "bad.json")
        with open(p, "w") as f:
            json.dump({"objects": [{"type": "sphere", "center": [0, 0, 0],
                                    "radius": 1, "material": "nope"}]}, f)
        with pytest.raises(ValueError, match="unknown material"):
            scene_io.load_scene(p)

    def test_unknown_object_rejected(self, tmp_path):
        import json

        p = str(tmp_path / "bad2.json")
        with open(p, "w") as f:
            json.dump({"objects": [{"type": "torus"}]}, f)
        with pytest.raises(ValueError, match="unknown object"):
            scene_io.load_scene(p)

    def test_instances_object(self, tmp_path):
        import json

        spec = {
            "materials": {"white": {"type": "lambertian",
                                    "albedo": [0.7, 0.7, 0.7]}},
            "objects": [{
                "type": "instances", "material": "white",
                "icosphere": {"subdivisions": 1, "radius": 0.4},
                "transforms": [
                    {"translate": [0, 0, 0]},
                    {"scale": [1, 1.5, 1], "rotate_y_degrees": 45,
                     "translate": [2, 0, 0]},
                    {"matrix": [[1, 0, 0, -2], [0, 1, 0, 0],
                                [0, 0, 1, 0]]},
                ],
            }],
        }
        p = str(tmp_path / "inst.json")
        with open(p, "w") as f:
            json.dump(spec, f)
        scene, _ = scene_io.load_scene(p)
        assert scene.instances is not None
        proto_c = scene.clusters.woop.shape[0]
        # base pad cluster(s) + one proto range expanded 3x
        assert scene.instances.cmap.shape[0] > proto_c
        # Component transform: scale→rotate→translate lands the second
        # instance's world bounds around x = 2.
        m = scene_io._affine(spec["objects"][0]["transforms"][1])
        np.testing.assert_allclose(m[:, 3], [2, 0, 0])
        assert m.shape == (3, 4)

    def test_instances_matrix_shape_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="matrix"):
            scene_io._affine({"matrix": [[1, 0], [0, 1]]})


class TestJsonVolume:
    def test_volume_from_npy_and_builtin(self, tmp_path):
        import json

        import numpy as np

        dens = np.zeros((4, 4, 4), np.float32)
        dens[1:3, 1:3, 1:3] = 1.0
        np.save(str(tmp_path / "dens.npy"), dens)
        spec = {
            "materials": {"gray": {"type": "lambertian",
                                   "albedo": [0.5, 0.5, 0.5]}},
            "objects": [{"type": "sphere", "center": [0, 0, 0],
                         "radius": 1.0, "material": "gray"}],
            "volume": {"density": "dens.npy", "bbox_min": [-1, -1, -1],
                       "bbox_max": [1, 1, 1], "sigma_s": 2.0,
                       "sigma_a": 0.5, "g": 0.3},
        }
        p = str(tmp_path / "vol.json")
        with open(p, "w") as f:
            json.dump(spec, f)
        scene, _ = scene_io.load_scene(p)
        assert scene.vol is not None
        np.testing.assert_allclose(float(scene.vol.majorant), 2.5)
        np.testing.assert_allclose(float(scene.vol.g), 0.3)
        assert scene.vol.density.shape == (4, 4, 4)

        spec["volume"] = {"density": "smoke", "resolution": 12,
                          "bbox_min": [-1, -1, -1],
                          "bbox_max": [1, 1, 1], "sigma_s": 5.0}
        with open(p, "w") as f:
            json.dump(spec, f)
        scene, _ = scene_io.load_scene(p)
        assert scene.vol is not None
        assert scene.vol.density.shape == (12, 12, 12)
