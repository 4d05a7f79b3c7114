"""Shared-geometry instancing: expand_instances layout, instanced DNF
kernels vs the instanced oracle (bitwise), scene-level equivalence to
flattened duplicates, and builder/routing guards.

The reference has no instancing (one world-space triangle list,
RayTracing/Graphics/Renderer.cs); this is framework surface — see
ops/clusters.InstanceSet and ops/cluster_trace.trace_pallas_dnf_inst.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.models import progressive
from pathtracing_tpu.models import scenes as scenes_mod
from pathtracing_tpu.models.scene import (
    SceneBuilder, intersect_batch, occluded_batch, uses_dnf,
)
from pathtracing_tpu.ops import clusters as cl_ops
from pathtracing_tpu.ops import cluster_trace as ct
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import RenderConfig


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _proto(n=300, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (n, 3))
    e1 = rng.uniform(-0.3, 0.3, (n, 3))
    e2 = rng.uniform(-0.3, 0.3, (n, 3))
    mat = rng.integers(0, 4, n).astype(np.int32)
    cl, _, _ = cl_ops.build_clusters(v0, e1, e2, mat)
    return (v0, e1, e2, mat), cl


def _placements(nc, k):
    out = []
    for i in range(k):
        a = _rot_y(0.37 * i) @ np.diag(
            [1.0 + 0.1 * (i % 4), 0.8, 1.2]
        )
        t = np.array([2.5 * (i % 8) - 8.0, 0.2 * i, 3.0 + 2.0 * (i // 8)])
        out.append((0, nc, np.concatenate([a, t[:, None]], axis=1)))
    return out


def _rays(r, seed=1):
    rng = np.random.default_rng(seed)
    o = np.tile([0.0, 0.0, -12.0], (r, 1)) + rng.uniform(-1, 1, (r, 3))
    tgt = rng.uniform(-9, 9, (r, 3)) * [1, 0.25, 0.4] + [0, 0, 5.0]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_expand_instances_world_bounds():
    (v0, e1, e2, _), cl = _proto()
    nc = cl.aabb_min.shape[0]
    pls = _placements(nc, 3)
    inst = cl_ops.expand_instances(cl, pls)
    assert inst.cmap.shape[0] == 3 * nc
    assert (inst.cmap == np.tile(np.arange(nc), 3)).all()
    # Every transformed proto-AABB corner lies inside the world bounds.
    for i, (first, cnt, m) in enumerate(pls):
        a, t = m[:, :3], m[:, 3]
        sel = slice(i * nc, (i + 1) * nc)
        for mask in np.ndindex(2, 2, 2):
            corner = np.where(np.array(mask, bool),
                              cl.aabb_max, cl.aabb_min)
            wc = corner @ a.T + t
            assert (wc >= inst.aabb_min[sel] - 1e-5).all()
            assert (wc <= inst.aabb_max[sel] + 1e-5).all()
        # The stored world→object transform inverts the placement.
        li = inst.xform[i * nc, :9].reshape(3, 3)
        np.testing.assert_allclose(li @ a, np.eye(3), atol=1e-5)


@pytest.mark.parametrize("n_inst", [5, 14])  # 5 → serial pop, 14 → windowed
def test_instanced_kernel_matches_oracle(n_inst):
    (v0, e1, e2, mat), cl = _proto(n=1200 if n_inst > 5 else 300)
    nc = cl.aabb_min.shape[0]
    inst = cl_ops.expand_instances(cl, _placements(nc, n_inst))
    clj = jax.tree.map(jnp.asarray, cl)
    instj = jax.tree.map(jnp.asarray, inst)
    o, d = _rays(256)
    t0 = jnp.full(256, 3.0e38, jnp.float32)

    tj, sj, nj, mj = ct.trace_jax_inst(clj, instj, o, d, t0)
    tp, sp, npk, mp = ct.trace_pallas_dnf_inst(
        clj, instj, o, d, t0, interpret=True
    )
    assert int(jnp.sum(sj >= 0)) > 10   # the scene is actually hit
    assert jnp.all(tj == tp)            # bitwise: same transform math
    assert jnp.all(sj == sp)
    assert jnp.all(mj == mp)
    # Oracle normalizes the unit-normal table; the kernel normalizes the
    # raw Woop w-row — same direction, a few ulp apart.
    assert float(jnp.max(jnp.abs(nj - npk))) < 1e-5

    # Any-hit agrees with a capped closest-hit everywhere.
    cap = jnp.full(256, 20.0, jnp.float32)
    occ = ct.occluded_pallas_dnf_inst(clj, instj, o, d, cap,
                                      interpret=True)
    tj2, sj2, _, _ = ct.trace_jax_inst(clj, instj, o, d, cap)
    assert jnp.all(occ == (sj2 >= 0))


def test_instanced_matches_flattened_duplicates():
    (v0, e1, e2, mat), cl = _proto()
    nc = cl.aabb_min.shape[0]
    pls = _placements(nc, 6)
    inst = cl_ops.expand_instances(cl, pls)
    clj = jax.tree.map(jnp.asarray, cl)
    instj = jax.tree.map(jnp.asarray, inst)

    w0, w1, w2, wm = [], [], [], []
    for first, cnt, m in pls:
        a, t = m[:, :3], m[:, 3]
        w0.append(v0 @ a.T + t)
        w1.append(e1 @ a.T)
        w2.append(e2 @ a.T)
        wm.append(mat)
    flat, _, _ = cl_ops.build_clusters(
        np.concatenate(w0), np.concatenate(w1), np.concatenate(w2),
        np.concatenate(wm),
    )
    fj = jax.tree.map(jnp.asarray, flat)

    o, d = _rays(256, seed=3)
    t0 = jnp.full(256, 3.0e38, jnp.float32)
    ti, si, ni, mi = ct.trace_jax_inst(clj, instj, o, d, t0)
    tf, sf, nf, mf = ct.trace_jax(fj, o, d, t0)
    hit = si >= 0
    assert jnp.all(hit == (sf >= 0))
    rel = jnp.abs(ti - tf) / jnp.maximum(tf, 1e-6)
    assert float(jnp.max(jnp.where(hit, rel, 0.0))) < 1e-5
    assert jnp.all(jnp.where(hit, mi == mf, True))
    ndot = jnp.sum(ni * nf, axis=-1)
    assert float(jnp.min(jnp.where(hit, ndot, 1.0))) > 0.999


def _instanced_cornell(identity=False, n=4):
    b = SceneBuilder()
    scenes_mod._cornell_walls(b)
    metal = b.metal((0.8, 0.8, 0.9), 0.1)
    verts, faces = scenes_mod.icosphere(1, 0.2)
    ts = []
    for i in range(n):
        if identity:
            m = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
        else:
            a = _rot_y(0.7 * i) @ np.diag([1.0, 0.8, 1.1])
            t = np.array([-0.6 + 0.4 * i, -0.75, -0.3])
            m = np.concatenate([a, t[:, None]], axis=1)
        ts.append(m)
    b.add_instances(verts, faces, metal, ts)
    return b.build(), verts, faces, metal


def test_identity_instance_matches_flat_mesh():
    """One identity-transform instance == the same mesh added flat:
    identical rays, bit-identical hit distances (the instanced eval's
    identity transform is an exact pass-through)."""
    scene_i, verts, faces, _ = _instanced_cornell(identity=True, n=1)

    b = SceneBuilder()
    scenes_mod._cornell_walls(b)
    metal = b.metal((0.8, 0.8, 0.9), 0.1)
    b.add_mesh(verts, faces, metal)
    scene_f = b.build()

    o, d = _rays(256, seed=5)
    o = o * 0.1 + jnp.asarray([0.0, 0.0, 3.0])
    tgt = jnp.zeros_like(o)
    d = (tgt - o) / jnp.linalg.norm(tgt - o, axis=1, keepdims=True)
    hi = intersect_batch(scene_i, o, d, traversal="cluster_interpret")
    hf = intersect_batch(scene_f, o, d, traversal="cluster_interpret")
    assert jnp.all(hi.valid == hf.valid)
    assert jnp.all(jnp.where(hi.valid, hi.t == hf.t, True))
    assert jnp.all(jnp.where(hi.valid, hi.mat_id == hf.mat_id, True))

    occ_i = occluded_batch(scene_i, o, d, jnp.full(256, 5.0),
                           traversal="cluster_interpret")
    occ_f = occluded_batch(scene_f, o, d, jnp.full(256, 5.0),
                           traversal="cluster_interpret")
    assert jnp.all(occ_i == occ_f)


def test_instanced_scene_renders():
    scene, _, _, _ = _instanced_cornell(n=4)
    assert uses_dnf(scene)
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=2,
                       max_depth=3, traversal="cluster_interpret")
    cam = build_camera(scenes_mod.CORNELL_CAMERA, cfg.width / cfg.height)
    img = np.asarray(progressive.render_once(scene, cam, cfg))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_guards():
    b = SceneBuilder()
    light = b.emissive((5.0, 5.0, 5.0))
    verts, faces = scenes_mod.icosphere(0, 0.2)
    b.add_instances(verts, faces, light,
                    [np.concatenate([np.eye(3), np.zeros((3, 1))], 1)])
    with pytest.raises(ValueError, match="emissive"):
        b.build()

    b = SceneBuilder()
    white = b.lambertian((0.7, 0.7, 0.7))
    with pytest.raises(ValueError, match="singular"):
        b.add_instances(verts, faces, white, [np.zeros((3, 4))])
    with pytest.raises(ValueError, match="transform"):
        b.add_instances(verts, faces, white, [np.eye(2)])

    scene, _, _, _ = _instanced_cornell(n=1)
    o, d = _rays(8)
    with pytest.raises(ValueError, match="BVH"):
        intersect_batch(scene, o, d, traversal="bvh")
    with pytest.raises(ValueError, match="BVH"):
        occluded_batch(scene, o, d, jnp.full(8, 1.0), traversal="bvh")


def test_per_instance_material_override_bitwise():
    """Overridden instances report the override id from BOTH the oracle
    and the Pallas kernel (bitwise vs each other, t/slot untouched);
    un-overridden rays match a no-override run exactly."""
    (v0, e1, e2, mat), cl = _proto()
    nc = cl.aabb_min.shape[0]
    pls = _placements(nc, 5)
    pls_ov = [
        p + ((10,) if i == 1 else (11,) if i == 3 else ())
        for i, p in enumerate(pls)
    ]
    inst0 = cl_ops.expand_instances(cl, pls)
    inst1 = cl_ops.expand_instances(cl, pls_ov)
    assert inst0.imat is None and inst1.imat is not None
    clj = jax.tree.map(jnp.asarray, cl)
    i0 = jax.tree.map(jnp.asarray, inst0)
    i1 = jax.tree.map(jnp.asarray, inst1)
    o, d = _rays(256, seed=7)
    t0 = jnp.full(256, 3.0e38, jnp.float32)

    tj, sj, nj, mj = ct.trace_jax_inst(clj, i1, o, d, t0)
    tp, sp, npk, mp = ct.trace_pallas_dnf_inst(
        clj, i1, o, d, t0, interpret=True
    )
    assert jnp.all(tj == tp) and jnp.all(sj == sp)
    assert jnp.all(mj == mp)
    assert int(jnp.sum((mj == 10) | (mj == 11))) > 0  # overrides seen

    # Geometry identical to the no-override run; mats differ ONLY by
    # becoming 10/11 (base mats are 0..3).
    tb, sb, _, mb = ct.trace_jax_inst(clj, i0, o, d, t0)
    assert jnp.all(tb == tj) and jnp.all(sb == sj)
    changed = mj != mb
    assert jnp.all(jnp.where(changed, (mj == 10) | (mj == 11), True))


def test_override_guards_and_builder():
    b = SceneBuilder()
    scenes_mod._cornell_walls(b)
    metal = b.metal((0.8, 0.8, 0.9), 0.1)
    red = b.lambertian((0.7, 0.1, 0.1))
    verts, faces = scenes_mod.icosphere(1, 0.2)
    eye = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    with pytest.raises(ValueError, match="materials must match"):
        b.add_instances(verts, faces, metal, [eye, eye],
                        materials=[red])

    light = b.emissive((5.0, 5.0, 5.0))
    b.add_instances(verts, faces, metal, [eye], materials=[light])
    with pytest.raises(ValueError, match="emissive"):
        b.build()


def test_override_flows_to_hits_via_builder():
    b = SceneBuilder()
    scenes_mod._cornell_walls(b)
    metal = b.metal((0.8, 0.8, 0.9), 0.1)
    red = b.lambertian((0.7, 0.1, 0.1))
    verts, faces = scenes_mod.icosphere(1, 0.2)
    ts = []
    for x in (-0.5, 0.5):
        m = np.concatenate(
            [np.eye(3), np.array([[x], [-0.6], [0.0]])], axis=1
        )
        ts.append(m)
    b.add_instances(verts, faces, metal, ts, materials=[None, red])
    scene = b.build()

    # One ray at each ball: left keeps metal, right reports red.
    o = jnp.asarray([[-0.5, -0.6, 3.0], [0.5, -0.6, 3.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 2, jnp.float32)
    hit = intersect_batch(scene, o, d, traversal="cluster_interpret")
    assert bool(hit.valid[0]) and bool(hit.valid[1])
    assert int(hit.mat_id[0]) == metal
    assert int(hit.mat_id[1]) == red
