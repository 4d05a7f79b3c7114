"""Surface attributes: barycentric interpolation, smooth shading normals,
UV image textures, and the slot→triangle hit resolution.

The kernels stay attribute-free (they return only t/slot/normal/mat);
``models.scene.surface_attributes`` recovers barycentrics from the hit
point and one slot→row gather. These tests pin: the interpolation math
against analytic expectations, the ``Hit.prim`` mapping across every
traversal backend, the bilinear texture sampler against a NumPy oracle,
modulation semantics (constant-white texture == untextured render), and
the all-or-nothing feature gating (attribute-free scenes keep None
fields, i.e. the zero-gather hot path).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import meshes, scenes
from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import texture as texture_ops


def _single_tri_scene(uv=None, normals=None):
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    v = np.array([[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.5, 0.0]])
    if uv is None and normals is None:
        b.add_triangle(v[0], v[1], v[2], m)
    else:
        b.add_mesh(v, np.array([[0, 1, 2]]), m,
                   uvs=uv, normals=normals)
    return b.build(), v


@pytest.mark.parametrize(
    "traversal", ["bvh", "cluster_jax", "cluster_interpret"]
)
def test_barycentric_uv_interpolation(traversal):
    """Rays aimed at known barycentric points recover the per-corner UV
    attribute exactly (to fp tolerance), on every traversal backend."""
    uv = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    sc, v = _single_tri_scene(uv=uv)
    rs = np.random.RandomState(7)
    w = rs.dirichlet((1.5, 1.5, 1.5), size=64)        # interior points
    pts = w @ v                                        # (64, 3)
    o = jnp.asarray(pts + [0.0, 0.0, 2.0], jnp.float32)
    d = jnp.asarray(np.repeat([[0.0, 0.0, -1.0]], 64, 0), jnp.float32)
    hit = scene_mod.intersect_batch(sc, o, d, traversal)
    assert bool(jnp.all(hit.valid))
    assert bool(jnp.all(hit.prim == 0))
    _, got = scene_mod.surface_attributes(sc, hit)
    # With corner UVs ((0,0),(1,0),(0,1)) the interpolated uv IS the
    # (u, v) barycentric pair.
    np.testing.assert_allclose(np.asarray(got), w[:, 1:], atol=2e-5)


def test_prim_matches_across_backends():
    """Hit.prim points at the same stored triangle row from the BVH walk
    and from the cluster slot mapping (multi-cluster mesh)."""
    b = SceneBuilder()
    m = b.lambertian((0.6, 0.6, 0.6))
    verts, faces = scenes.icosphere(3, radius=0.6)
    b.add_mesh(verts, faces, m, smooth=True)  # attrs → slot_to_tri built
    sc = b.build()
    rs = np.random.RandomState(3)
    o = jnp.asarray(np.repeat([[0.0, 0.0, 2.0]], 400, 0)
                    + rs.randn(400, 3) * 0.1, jnp.float32)
    dn = rs.randn(400, 3) * 0.25 - np.array([0.0, 0.0, 1.0])
    d = jnp.asarray(
        dn / np.linalg.norm(dn, axis=1, keepdims=True), jnp.float32
    )
    h_ref = scene_mod.intersect_batch(sc, o, d, "bvh")
    h_new = scene_mod.intersect_batch(sc, o, d, "cluster_interpret")
    m_ = np.asarray(h_ref.valid) & np.asarray(h_new.valid)
    # Same triangle (ties between coplanar tris can differ; the icosphere
    # has none along these rays).
    np.testing.assert_array_equal(
        np.asarray(h_ref.prim)[m_], np.asarray(h_new.prim)[m_]
    )


def test_smooth_normals_approach_analytic_sphere():
    """Interpolated area-weighted vertex normals on a coarse icosphere
    land far closer to the analytic sphere normal than flat shading."""
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    verts, faces = scenes.icosphere(2, radius=1.0)
    b.add_mesh(verts, faces, m, smooth=True)
    sc = b.build()

    n = 512
    rs = np.random.RandomState(11)
    dirs = rs.randn(n, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = jnp.asarray(dirs * 3.0, jnp.float32)
    d = jnp.asarray(-dirs, jnp.float32)
    hit = scene_mod.intersect_batch(sc, o, d, "cluster_jax")
    assert bool(jnp.all(hit.valid))
    ns, _ = scene_mod.surface_attributes(sc, hit)

    exact = np.array(hit.position)
    exact /= np.linalg.norm(exact, axis=1, keepdims=True)
    cos_flat = np.sum(np.asarray(hit.normal) * exact, axis=1)
    cos_smooth = np.sum(np.asarray(ns) * exact, axis=1)
    err_flat = np.degrees(np.arccos(np.clip(cos_flat, -1, 1)))
    err_smooth = np.degrees(np.arccos(np.clip(cos_smooth, -1, 1)))
    # Subdiv-2 icosphere: facet normals are ~5-10° off; interpolation
    # should cut the mean error by >3x and stay under ~2.5° everywhere.
    assert err_smooth.mean() < err_flat.mean() / 3.0
    assert err_smooth.max() < 2.5
    assert err_flat.mean() > 2.0  # the comparison is meaningful


def test_shading_normal_stays_in_geometric_hemisphere():
    """Adversarial vertex normals (pointing into the surface) get flipped
    to the geometric side — BSDF sampling can't tunnel."""
    bad = np.array([[0.0, 0.0, -1.0]] * 3)  # backwards on purpose
    sc, _ = _single_tri_scene(normals=bad)
    o = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = scene_mod.intersect_batch(sc, o, d, "cluster_jax")
    ns, _ = scene_mod.surface_attributes(sc, hit)
    assert float(jnp.sum(ns * hit.normal)) > 0.0


def test_bilinear_sampler_matches_numpy_oracle():
    rs = np.random.RandomState(5)
    img = rs.rand(13, 9, 3).astype(np.float32)
    atlas = texture_ops.build_atlas([img])
    uv = rs.rand(256, 2).astype(np.float32) * 2.0 - 0.5   # exercises wrap

    def oracle(u, v):
        h, w = img.shape[:2]
        x = (u % 1.0) * w - 0.5
        y = (1.0 - v % 1.0) * h - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        x1, y1 = x0 + 1, y0 + 1
        t = [img[yy % h, xx % w]
             for yy, xx in ((y0, x0), (y0, x1), (y1, x0), (y1, x1))]
        return (t[0] * (1 - fx) * (1 - fy) + t[1] * fx * (1 - fy)
                + t[2] * (1 - fx) * fy + t[3] * fx * fy)

    got = np.asarray(texture_ops.sample_bilinear(
        atlas, jnp.zeros(256, jnp.int32), jnp.asarray(uv)
    ))
    want = np.stack([oracle(u, v) for u, v in uv])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_atlas_padding_and_per_texture_size():
    """Two textures of different sizes share one padded atlas; each wraps
    over its true size, not the padded one."""
    a = np.full((4, 4, 3), 0.25, np.float32)
    b = np.full((8, 2, 3), 0.75, np.float32)
    atlas = texture_ops.build_atlas([a, b])
    assert atlas.texels.shape == (2, 8, 4, 3)
    uv = jnp.asarray([[0.9, 0.9], [0.9, 0.9]], jnp.float32)
    got = np.asarray(texture_ops.sample_bilinear(
        atlas, jnp.asarray([0, 1], jnp.int32), uv
    ))
    np.testing.assert_allclose(got[0], 0.25, atol=1e-6)
    np.testing.assert_allclose(got[1], 0.75, atol=1e-6)


def _render_small(sc, camcfg, seed=0, size=48, spp=2):
    from pathtracing_tpu.models import progressive
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    cfg = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                       max_depth=3, samples_per_step=spp, seed=seed,
                       engine="megakernel", traversal="cluster_jax")
    cam = build_camera(camcfg, 1.0)
    st = progressive.init_state(cfg)
    st = progressive.render_step(st, sc, cam, cfg)
    return np.asarray(st.accum) / float(st.spp)


def _quad_scene(albedo, texture=None):
    from pathtracing_tpu.utils.config import CameraConfig

    b = SceneBuilder()
    m = b.lambertian(albedo, texture=texture)
    b.add_quad((-1.0, -1.0, 0.0), (2.0, 0.0, 0.0), (0.0, 2.0, 0.0), m,
               uv=texture is not None)
    light = b.emissive((8.0, 8.0, 8.0))
    b.add_quad((-0.5, -0.5, 2.5), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), light)
    cam = CameraConfig(position=(0.0, 0.0, 1.8), look_at=(0.0, 0.0, 0.0),
                       vfov_degrees=60.0)
    return b.build(), cam


def test_constant_texture_equals_plain_albedo():
    """A constant-white texture modulating a colored albedo renders the
    same image as the untextured material — the modulation contract."""
    sc_plain, cam = _quad_scene((0.6, 0.45, 0.3))
    white = np.ones((8, 8, 3), np.float32)
    sc_tex, _ = _quad_scene((0.6, 0.45, 0.3), texture=white)
    img_a = _render_small(sc_plain, cam)
    img_b = _render_small(sc_tex, cam)
    np.testing.assert_allclose(img_b, img_a, atol=1e-5)


def test_texture_varies_with_uv():
    """A horizontally-split red/green texture lands red on the quad's
    left (u < 0.5) and green on the right, i.e. UV orientation is right."""
    img = np.zeros((4, 4, 3), np.float32)
    img[:, :2, 0] = 1.0   # left half red
    img[:, 2:, 1] = 1.0   # right half green
    sc, cam = _quad_scene((1.0, 1.0, 1.0), texture=img)
    out = _render_small(sc, cam, size=64, spp=4)
    left = out[28:36, 8:20].mean(axis=(0, 1))
    right = out[28:36, 44:56].mean(axis=(0, 1))
    assert left[0] > 4 * max(left[1], 1e-6)
    assert right[1] > 4 * max(right[0], 1e-6)


def test_attribute_free_scene_has_no_attr_fields():
    sc, _ = scenes.cornell_bsdf()
    assert sc.attr_uv is None and sc.attr_shn is None
    assert sc.slot_to_tri is None and sc.textures is None
    assert sc.mat_tex is None


def test_paged_scene_slot_to_tri(tmp_path):
    """Paged builds renumber clusters; the slot map must follow. A paged
    smooth icosphere's prim ids agree with the BVH walk."""
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    verts, faces = scenes.icosphere(4, radius=0.8)
    b.add_mesh(verts, faces, m, smooth=True)
    sc = b.build(page_clusters=8)   # force paging with tiny pages
    assert sc.pages is not None and sc.slot_to_tri is not None
    rs = np.random.RandomState(9)
    dirs = rs.randn(300, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = jnp.asarray(dirs * 3.0, jnp.float32)
    d = jnp.asarray(-dirs, jnp.float32)
    h_ref = scene_mod.intersect_batch(sc, o, d, "bvh")
    h_new = scene_mod.intersect_batch(sc, o, d, "cluster_interpret")
    msk = np.asarray(h_ref.valid)
    np.testing.assert_array_equal(
        np.asarray(h_new.valid), msk
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.prim)[msk], np.asarray(h_new.prim)[msk]
    )


def test_obj_roundtrip_with_attributes(tmp_path):
    path = os.path.join(tmp_path, "tri.obj")
    with open(path, "w") as f:
        f.write("""v 0 0 0
v 1 0 0
v 0 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
""")
    verts, faces, uvs, uvf, norms, nrf = meshes.load_obj_full(path)
    assert verts.shape == (3, 3) and faces.shape == (1, 3)
    np.testing.assert_allclose(uvs, [[0, 0], [1, 0], [0, 1]])
    np.testing.assert_array_equal(uvf, [[0, 1, 2]])
    np.testing.assert_allclose(norms, [[0, 0, 1]])
    np.testing.assert_array_equal(nrf, [[0, 0, 0]])


def test_obj_partial_attributes_degrade(tmp_path):
    """Faces without texcoords → no UV buffers (all-or-nothing)."""
    path = os.path.join(tmp_path, "mixed.obj")
    with open(path, "w") as f:
        f.write("""v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
f 1/1 2/2 3/3
f 2 4 3
""")
    _, faces, uvs, uvf, norms, nrf = meshes.load_obj_full(path)
    assert faces.shape == (2, 3)
    assert uvs is None and uvf is None and norms is None and nrf is None


def test_scene_io_texture_and_smooth(tmp_path):
    """JSON scenes: material textures by path + smooth meshes."""
    import json

    tex = np.zeros((4, 4, 3), np.float32)
    tex[:, :, 2] = 1.0
    np.save(os.path.join(tmp_path, "blue.npy"), tex)
    spec = {
        "camera": {"position": [0, 0, 2], "look_at": [0, 0, 0]},
        "materials": {
            "tex": {"type": "lambertian", "albedo": [1, 1, 1],
                    "texture": "blue.npy"},
            "plain": {"type": "lambertian", "albedo": [0.5, 0.5, 0.5]},
        },
        "objects": [
            {"type": "quad", "corner": [-1, -1, 0], "edge_u": [2, 0, 0],
             "edge_v": [0, 2, 0], "material": "tex", "uv": True},
            {"type": "icosphere", "subdivisions": 1, "radius": 0.3,
             "center": [0, 0, 0.5], "material": "plain", "smooth": True},
        ],
    }
    path = os.path.join(tmp_path, "scene.json")
    with open(path, "w") as f:
        json.dump(spec, f)
    from pathtracing_tpu.models import scene_io

    sc, cam = scene_io.load_scene(path)
    assert sc.textures is not None
    assert sc.attr_uv is not None and sc.attr_shn is not None
    img = _render_small(sc, cam, size=32)
    assert np.isfinite(img).all()


def test_textured_demo_scene_renders():
    sc, cam = scenes.textured_demo()
    img = _render_small(sc, cam, size=48)
    assert np.isfinite(img).all() and img.max() > 0.05


def test_attr_pack_matches_legacy_resolve():
    """The packed slot-indexed resolve (one gather) computes bitwise the
    same attributes as the legacy prim-indexed chain, on a scene with
    UVs + smooth normals + paging (slot renumbering) in play."""
    b = SceneBuilder()
    m = b.lambertian((0.5, 0.5, 0.5))
    verts, faces = scenes.icosphere(3, radius=0.8)
    uvs = np.stack([verts[:, 0] * 0.5 + 0.5, verts[:, 1] * 0.5 + 0.5],
                   axis=-1)
    b.add_mesh(verts, faces, m, smooth=True, uvs=uvs)
    sc = b.build(page_clusters=8)
    assert sc.attr_pack is not None
    assert sc.attr_pack.shape == (sc.slot_to_tri.shape[0], 25)
    rs = np.random.RandomState(3)
    dirs = rs.randn(256, 3)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    o = jnp.asarray(dirs * 3.0, jnp.float32)
    d = jnp.asarray(-dirs, jnp.float32)
    hit = scene_mod.intersect_batch(sc, o, d, "cluster_interpret")
    assert bool(jnp.any(hit.tri))
    n_pack, uv_pack = scene_mod.surface_attributes(sc, hit)
    n_leg, uv_leg = scene_mod.surface_attributes(
        sc._replace(attr_pack=None), hit
    )
    msk = np.asarray(hit.valid)
    np.testing.assert_array_equal(
        np.asarray(n_pack)[msk], np.asarray(n_leg)[msk]
    )
    np.testing.assert_array_equal(
        np.asarray(uv_pack)[msk], np.asarray(uv_leg)[msk]
    )


def test_attr_pack_gating():
    """Attribute-free scenes build no pack; cluster hits carry slots."""
    sc, _ = scenes.cornell_bsdf()
    assert sc.attr_pack is None
    sc2, _ = scenes.textured_demo()
    assert sc2.attr_pack is not None
