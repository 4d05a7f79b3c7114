"""Object motion blur on shared-geometry instances.

The motion path lerps each instance's FORWARD object→world affine at
the per-path shutter time and inverts per ray in-kernel
(ops/cluster_trace._lerp_affine_inverse) — every prototype point then
travels a straight world segment, so the endpoint-corner union AABB is
an exact bound. These tests pin: kernel↔oracle bitwise at random
times, endpoint consistency against static scenes, mid-shutter
coverage (the union-AABB + lerp actually finds intermediate poses),
engine agreement, and feature gating.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.models import progressive, wavefront
from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.models import scenes as scenes_mod
from pathtracing_tpu.ops import clusters as cl_ops
from pathtracing_tpu.ops import cluster_trace as ct
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _aff(a, t):
    return np.concatenate([a, np.asarray(t, np.float64)[:, None]],
                          axis=1)


def _proto(n=300, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (n, 3))
    e1 = rng.uniform(-0.3, 0.3, (n, 3))
    e2 = rng.uniform(-0.3, 0.3, (n, 3))
    mat = rng.integers(0, 4, n).astype(np.int32)
    cl, _, _ = cl_ops.build_clusters(v0, e1, e2, mat)
    return cl


def _rays(r, seed=1):
    rng = np.random.default_rng(seed)
    o = np.tile([0.0, 0.0, -8.0], (r, 1)) + rng.uniform(-1, 1, (r, 3))
    tgt = rng.uniform(-5, 5, (r, 3)) * [1, 0.3, 0.2] + [0, 0, 4.0]
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_kernel_matches_oracle_bitwise_at_random_times():
    cl = _proto()
    nc = cl.aabb_min.shape[0]
    m0 = _aff(_rot_y(0.3), [0, 0, 4])
    m1 = _aff(_rot_y(1.1), [2.0, 0.5, 4])
    ms = _aff(np.eye(3), [-3, 0, 4])
    inst = cl_ops.expand_instances(
        cl, [(0, nc, m0, -1, m1), (0, nc, ms)]
    )
    assert inst.fw0 is not None
    clj = jax.tree.map(jnp.asarray, cl)
    instj = jax.tree.map(jnp.asarray, inst)
    o, d = _rays(256)
    t0 = jnp.full(256, 3.0e38, jnp.float32)
    times = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, 256).astype(np.float32)
    )

    tj, sj, nj, mj = ct.trace_jax_inst(clj, instj, o, d, t0, time=times)
    tp, sp, npk, mp = ct.trace_pallas_dnf_inst(
        clj, instj, o, d, t0, time=times, interpret=True
    )
    assert int(jnp.sum(sj >= 0)) > 30
    assert jnp.all(tj == tp) and jnp.all(sj == sp) and jnp.all(mj == mp)
    assert float(jnp.max(jnp.abs(nj - npk))) < 1e-5

    # Any-hit at matched times agrees with a capped closest hit.
    cap = jnp.full(256, 11.0, jnp.float32)
    occ = ct.occluded_pallas_dnf_inst(clj, instj, o, d, cap, time=times,
                                      interpret=True)
    tj2, sj2, _, _ = ct.trace_jax_inst(clj, instj, o, d, cap, time=times)
    assert jnp.all(occ == (sj2 >= 0))


@pytest.mark.parametrize("t_query", [0.0, 1.0])
def test_endpoints_match_static_scenes(t_query):
    cl = _proto()
    nc = cl.aabb_min.shape[0]
    m0 = _aff(_rot_y(0.2) @ np.diag([1.0, 0.8, 1.2]), [0, 0, 4])
    m1 = _aff(_rot_y(0.9), [1.5, 0.3, 4.5])
    inst_m = cl_ops.expand_instances(cl, [(0, nc, m0, -1, m1)])
    inst_s = cl_ops.expand_instances(
        cl, [(0, nc, m0 if t_query == 0.0 else m1)]
    )
    clj = jax.tree.map(jnp.asarray, cl)
    im = jax.tree.map(jnp.asarray, inst_m)
    istat = jax.tree.map(jnp.asarray, inst_s)
    o, d = _rays(256, seed=3)
    t0 = jnp.full(256, 3.0e38, jnp.float32)

    ta, sa, na, ma = ct.trace_jax_inst(
        clj, im, o, d, t0, time=jnp.full(256, t_query)
    )
    tb, sb, nb, mb = ct.trace_jax_inst(clj, istat, o, d, t0)
    hit = sb >= 0
    assert int(jnp.sum(hit)) >= 15
    # t = 0 reproduces fw0's bits exactly (f0 + 0·(f1−f0) == f0), so
    # hit/miss classification matches everywhere; t = 1 computes
    # f0 + 1·(f1−f0), which rounds a few ulp off f1 — near-tangent
    # boundary rays may flip, so allow a small disagreement fraction.
    agree = hit == (sa >= 0)
    if t_query == 0.0:
        assert bool(jnp.all(agree))
    else:
        assert float(jnp.mean(agree.astype(jnp.float32))) > 0.98
    both = hit & (sa >= 0)
    rel = jnp.abs(ta - tb) / jnp.maximum(tb, 1e-6)
    # Static tables precompute the inverse in f64; the motion path
    # inverts the lerped f32 forward affine — same transform to f32
    # rounding.
    assert float(jnp.max(jnp.where(both, rel, 0.0))) < 1e-4
    assert jnp.all(jnp.where(both, ma == mb, True))


def test_mid_shutter_pose_is_reachable():
    # A unit box sweeping x: -2 → +2. A ray down the z axis at x == 0
    # misses BOTH endpoints but must hit at t = 0.5; at t = 0 it must
    # miss (the union AABB may admit it, the Woop eval must reject).
    b_ = scene_mod.SceneBuilder()
    white = b_.lambertian((0.7, 0.7, 0.7))
    verts, faces = scenes_mod.icosphere(2, 0.5)
    b_.add_instances(
        verts, faces, white,
        [_aff(np.eye(3), [-2.0, 0.0, 0.0])],
        motion_transforms=[_aff(np.eye(3), [2.0, 0.0, 0.0])],
    )
    scene = b_.build()
    assert scene_mod.has_motion(scene)

    o = jnp.asarray([[0.0, 0.0, 5.0]] * 2, jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 2, jnp.float32)
    for time, want in ((jnp.asarray([0.5, 0.0]), (True, False)),):
        hit = scene_mod.intersect_batch(
            scene, o, d, traversal="cluster_interpret", time=time
        )
        assert bool(hit.valid[0]) == want[0]
        assert bool(hit.valid[1]) == want[1]


def _motion_scene():
    b = scene_mod.SceneBuilder()
    floor = b.lambertian((0.6, 0.6, 0.6))
    b.add_quad((-6.0, -0.6, -6.0), (12.0, 0.0, 0.0), (0.0, 0.0, 12.0),
               floor)
    lamp = b.emissive((25.0, 25.0, 25.0))
    b.add_quad((-0.7, 3.0, -0.7), (1.4, 0.0, 0.0), (0.0, 0.0, 1.4),
               lamp)
    red = b.lambertian((0.7, 0.15, 0.1))
    verts, faces = scenes_mod.icosphere(2, 0.4)
    b.add_instances(
        verts, faces, red,
        [_aff(np.eye(3), [-1.0, 0.0, 0.0])],
        motion_transforms=[_aff(np.eye(3), [1.0, 0.0, 0.0])],
    )
    return b.build()


def test_engines_match_and_blur_spreads():
    scene = _motion_scene()
    cfg = RenderConfig(width=32, height=20, samples_per_pixel=4,
                       max_depth=3, seed=2, samples_per_step=4,
                       background="black",
                       traversal="cluster_interpret")
    cam = build_camera(
        CameraConfig(position=(0.0, 0.8, 4.5), look_at=(0.0, 0.0, 0.0),
                     vfov_degrees=45.0), cfg.width / cfg.height,
    )
    s_m = progressive.render_step(progressive.init_state(cfg), scene,
                                  cam, cfg)
    img_m = np.asarray(progressive.resolve(s_m))
    s_w = wavefront.render_step(progressive.init_state(cfg), scene,
                                cam, cfg)
    img_w = np.asarray(progressive.resolve(s_w))
    np.testing.assert_allclose(img_m, img_w, atol=3e-4)

    # The red ball must appear at BOTH travel extremes across samples
    # (different shutter times) — the signature of motion blur.
    red = img_m[:, :, 0] - img_m[:, :, 1]
    h, w = red.shape
    left = red[:, : w // 2].max()
    right = red[:, w // 2:].max()
    assert left > 0.02 and right > 0.02, (left, right)


def test_gating_and_guards():
    # Static instanced scenes carry no motion columns.
    scene, _ = scenes_mod.get_scene("instanced_demo")
    assert not scene_mod.has_motion(scene)
    assert scene.instances.fw0 is None

    b = scene_mod.SceneBuilder()
    white = b.lambertian((0.7, 0.7, 0.7))
    verts, faces = scenes_mod.icosphere(0, 0.2)
    eye = _aff(np.eye(3), [0, 0, 0])
    with pytest.raises(ValueError, match="motion_transforms must match"):
        b.add_instances(verts, faces, white, [eye, eye],
                        motion_transforms=[eye])
    with pytest.raises(ValueError, match="singular"):
        b.add_instances(verts, faces, white, [eye],
                        motion_transforms=[_aff(np.zeros((3, 3)),
                                                [0, 0, 0])])
