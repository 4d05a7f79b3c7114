"""Cluster-sweep traversal: equivalence with the threaded-BVH walk.

Three implementations of closest-hit must agree: the vmapped per-ray BVH
walk (``ops.bvh.traverse``), the dense pure-JAX cluster sweep
(``ops.cluster_trace.trace_jax``), and the Pallas kernel in interpret mode.
Random ray soups + the mesh scene exercise AABB culling, padded clusters,
sphere/triangle merging, and the Woop transform math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.models import scenes
from pathtracing_tpu.models.scene import SceneBuilder


def random_rays(n, seed, spread=0.3, center=(0.0, 0.0, 3.0)):
    rs = np.random.RandomState(seed)
    o = np.repeat([center], n, 0) + rs.randn(n, 3) * spread
    d = rs.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.fixture(scope="module")
def mesh_scene():
    scene, _ = scenes.cornell_mesh(3)
    return scene


@pytest.fixture(scope="module")
def soup_scene():
    """Random triangle soup + spheres: irregular cluster shapes."""
    rs = np.random.RandomState(42)
    b = SceneBuilder()
    m0 = b.lambertian((0.5, 0.5, 0.5))
    m1 = b.metal((0.8, 0.8, 0.8))
    for i in range(333):  # not a multiple of the cluster size
        c = rs.randn(3) * 1.5
        v = c + rs.randn(3, 3) * 0.25
        b.add_triangle(v[0], v[1], v[2], m0 if i % 2 else m1)
    b.add_sphere((0.0, 0.0, 0.0), 0.4, m0)
    b.add_sphere((1.0, 1.0, 0.0), 0.3, m1)
    return b.build()


def assert_hits_match(h_ref, h_new, rtol=1e-4):
    vr, vn = np.asarray(h_ref.valid), np.asarray(h_new.valid)
    np.testing.assert_array_equal(vr, vn)
    m = vr
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[m], np.asarray(h_new.t)[m], rtol=rtol
    )
    np.testing.assert_allclose(
        np.asarray(h_ref.normal)[m], np.asarray(h_new.normal)[m],
        atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.mat_id)[m], np.asarray(h_new.mat_id)[m]
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.front)[m], np.asarray(h_new.front)[m]
    )


@pytest.mark.parametrize("traversal", ["cluster_jax", "cluster_interpret"])
def test_mesh_scene_matches_bvh(mesh_scene, traversal):
    o, d = random_rays(1500, 0)  # non-multiple of RAY_TILE → padding path
    h_ref = scene_mod.intersect_batch(mesh_scene, o, d, "bvh")
    h_new = scene_mod.intersect_batch(mesh_scene, o, d, traversal)
    assert_hits_match(h_ref, h_new)


@pytest.mark.parametrize("traversal", ["cluster_jax", "cluster_interpret"])
def test_soup_scene_matches_bvh(soup_scene, traversal):
    o, d = random_rays(1024, 3, spread=1.5, center=(0, 0, 4))
    h_ref = scene_mod.intersect_batch(soup_scene, o, d, "bvh")
    h_new = scene_mod.intersect_batch(soup_scene, o, d, traversal)
    assert_hits_match(h_ref, h_new)


@pytest.mark.parametrize("kw", [
    dict(ordered=False),
    dict(ordered=True),
    dict(lookahead=3, drain=2, ordered=False),
    dict(lookahead=3, drain=2, ordered=True),
    dict(lookahead=4, drain=1, ordered=True),
])
def test_kernel_variants_match_jax(mesh_scene, kw):
    """Every traversal-kernel variant (octant-ordered walk, K-step
    lookahead with leaf-queue drain) agrees with the sweep oracle in
    interpret mode. Hit t must match exactly; the winning slot may
    differ only where two triangles tie at the exact same t (shared
    edges) — any visit order legitimately picks either."""
    import jax.numpy as jnp

    from pathtracing_tpu.ops import cluster_trace

    o, d = random_rays(600, 2)
    t0 = jnp.full(600, 3.0e38, jnp.float32)
    t0 = t0.at[::11].set(0.0)  # dead lanes short-circuit
    tj = cluster_trace.trace_jax(mesh_scene.clusters, o, d, t0)
    tw = cluster_trace.trace_pallas(
        mesh_scene.clusters, o, d, t0, interpret=True, **kw
    )
    live = np.asarray(t0) > 0
    np.testing.assert_allclose(
        np.where(live, np.asarray(tj[0]), 0.0),
        np.where(live, np.asarray(tw[0]), 0.0), rtol=1e-6,
    )
    slot_match = np.asarray(tj[1]) == np.asarray(tw[1])
    tie = np.asarray(tj[0]) == np.asarray(tw[0])
    assert np.all(slot_match | tie | ~live)


def test_dnf_kernel_matches_jax(mesh_scene):
    """The dense nearest-first kernel (no tree, packed-key extraction)
    agrees with the sweep oracle under the same tie contract as the walk
    kernels, including dead lanes and ray padding."""
    import jax.numpy as jnp

    from pathtracing_tpu.ops import cluster_trace

    o, d = random_rays(600, 2)
    t0 = jnp.full(600, 3.0e38, jnp.float32)
    t0 = t0.at[::11].set(0.0)
    tj = cluster_trace.trace_jax(mesh_scene.clusters, o, d, t0)
    tw = cluster_trace.trace_pallas_dnf(
        mesh_scene.clusters, o, d, t0, interpret=True
    )
    live = np.asarray(t0) > 0
    np.testing.assert_allclose(
        np.where(live, np.asarray(tj[0]), 0.0),
        np.where(live, np.asarray(tw[0]), 0.0), rtol=1e-6,
    )
    slot_match = np.asarray(tj[1]) == np.asarray(tw[1])
    tie = np.asarray(tj[0]) == np.asarray(tw[0])
    assert np.all(slot_match | tie | ~live)
    # Normals from the Woop w-row must match the table to float noise.
    same = slot_match & live & (np.asarray(tj[1]) >= 0)
    np.testing.assert_allclose(
        np.asarray(tj[2])[same], np.asarray(tw[2])[same], atol=1e-4
    )


def test_dnf_banded_matches_jax(mesh_scene):
    """Banded-cull DNF (per-band key minima, per-band max caps) must
    agree with the oracle — the coarser cull is conservative, so only
    extra idempotent evals are admitted, never different answers."""
    import jax.numpy as jnp

    from pathtracing_tpu.ops import cluster_trace

    o, d = random_rays(600, 2)
    t0 = jnp.full(600, 3.0e38, jnp.float32)
    t0 = t0.at[::11].set(0.0)
    tj = cluster_trace.trace_jax(mesh_scene.clusters, o, d, t0)
    live = np.asarray(t0) > 0
    for band in (16, cluster_trace.DNF_TILE):
        tw = cluster_trace.trace_pallas_dnf(
            mesh_scene.clusters, o, d, t0, interpret=True, band=band
        )
        np.testing.assert_allclose(
            np.where(live, np.asarray(tj[0]), 0.0),
            np.where(live, np.asarray(tw[0]), 0.0), rtol=1e-6,
        )
        slot_match = np.asarray(tj[1]) == np.asarray(tw[1])
        tie = np.asarray(tj[0]) == np.asarray(tw[0])
        assert np.all(slot_match | tie | ~live), band


def test_dnf_pops_eval_always_bitwise(mesh_scene):
    """pops>1 (batched pop rounds per loop iteration), eval_always
    (branch-free eval of clamp-padded pops) and chains>1 (independent
    tile chains per program) are pure scheduling changes: both
    closest-hit and any-hit DNF kernels must match the baseline kernel
    BITWISE for every combination."""
    import jax.numpy as jnp

    from pathtracing_tpu.ops import cluster_trace

    o, d = random_rays(600, 2)
    t0 = jnp.full(600, 3.0e38, jnp.float32)
    t0 = t0.at[::11].set(0.0)
    base = cluster_trace.trace_pallas_dnf(
        mesh_scene.clusters, o, d, t0, interpret=True
    )
    tmax = jnp.asarray(
        np.random.RandomState(5).rand(600).astype(np.float32) * 2.0
    )
    occ_base = cluster_trace.occluded_pallas_dnf(
        mesh_scene.clusters, o, d, tmax, interpret=True
    )
    for kw in (dict(pops=2), dict(eval_always=True),
               dict(pops=2, eval_always=True),
               dict(pops=3, eval_always=True),
               dict(windowed=True, pops=2),
               dict(windowed=True, win2=True),
               dict(windowed=True, win2=True, pops=2),
               dict(chains=2), dict(chains=4),
               dict(chains=2, pops=2, eval_always=True)):
        tw = cluster_trace.trace_pallas_dnf(
            mesh_scene.clusters, o, d, t0, interpret=True, **kw
        )
        for a, b in zip(base, tw):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(kw))
        occ = cluster_trace.occluded_pallas_dnf(
            mesh_scene.clusters, o, d, tmax, interpret=True, **kw
        )
        np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_base),
                                      err_msg=str(kw))


def test_dnf_occlusion_matches_jax(mesh_scene):
    """Any-hit DNF kernel vs the oracle: exact boolean agreement."""
    import jax.numpy as jnp

    from pathtracing_tpu.ops import cluster_trace

    o, d = random_rays(700, 9, spread=0.8, center=(0.0, -0.3, 0.5))
    tmax = jnp.asarray(
        np.random.RandomState(5).rand(700).astype(np.float32) * 2.0
    )
    tmax = tmax.at[::13].set(0.0)  # dead lanes
    tj = cluster_trace.trace_jax(
        mesh_scene.clusters, o, d, jnp.where(tmax > 0, tmax, 0.0)
    )
    ref = np.asarray(tj[1] >= 0)
    occ = np.asarray(cluster_trace.occluded_pallas_dnf(
        mesh_scene.clusters, o, d, tmax, interpret=True
    ))
    np.testing.assert_array_equal(occ, ref)


def test_rays_from_inside_geometry(mesh_scene):
    """Secondary-bounce-like rays originating on/near surfaces."""
    o, d = random_rays(512, 7, spread=0.8, center=(0.0, -0.5, 0.0))
    h_ref = scene_mod.intersect_batch(mesh_scene, o, d, "bvh")
    h_new = scene_mod.intersect_batch(mesh_scene, o, d, "cluster_jax")
    assert_hits_match(h_ref, h_new)


def test_render_image_cluster_vs_bvh(mesh_scene):
    """Full render through the engines with each traversal (same RNG)."""
    from pathtracing_tpu.models import progressive
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    _, cam_cfg = scenes.cornell_mesh(3)
    camera = build_camera(cam_cfg, 1.0)
    imgs = {}
    for traversal in ["bvh", "cluster_jax"]:
        config = RenderConfig(
            width=24, height=24, samples_per_pixel=2, max_depth=4,
            samples_per_step=2, seed=5, traversal=traversal,
        )
        s = progressive.render_step(
            progressive.init_state(config), mesh_scene, camera, config
        )
        imgs[traversal] = np.asarray(s.accum)
    # Same RNG streams; only the intersection arithmetic differs (Woop vs
    # Möller-Trumbore). Boundary pixels can diverge; compare in aggregate.
    a, b = imgs["bvh"], imgs["cluster_jax"]
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3).mean()
    assert close > 0.98, f"only {close:.3f} of pixels match"


@pytest.fixture(scope="module")
def paged_scene():
    """Cornell mesh rebuilt with a tiny page size so the HBM-paged
    traversal path exercises multiple pages without a huge scene."""
    from pathtracing_tpu.models.scenes import _cornell_mesh_builder

    b = _cornell_mesh_builder(3)
    scene = b.build(page_clusters=16)
    assert scene.pages is not None
    assert scene.pages.node_box.shape[0] >= 2  # really multi-page
    return scene


def test_paged_traversal_matches_oracle(paged_scene):
    """The page-streaming kernel agrees with the dense sweep over the
    SAME (page-reordered, padded) cluster set: identical t everywhere,
    identical slots except exact-t ties."""
    o, d = random_rays(1500, 4)
    h_ref = scene_mod.intersect_batch(paged_scene, o, d, "cluster_jax")
    h_new = scene_mod.intersect_batch(
        paged_scene, o, d, "cluster_interpret"
    )
    assert_hits_match(h_ref, h_new)


def test_paged_occlusion_matches(paged_scene):
    import jax

    o, d = random_rays(700, 8, spread=0.8, center=(0.0, -0.3, 0.5))
    tmax = jnp.asarray(
        np.random.RandomState(3).rand(700).astype(np.float32) * 2.0
    )
    occ = scene_mod.occluded_batch(
        paged_scene, o, d, tmax, "cluster_interpret", active=tmax > 0
    )
    hit = scene_mod.intersect_batch(
        paged_scene, o, d, "cluster_jax", active=tmax > 0, t_max=tmax
    )
    ref = np.asarray(hit.valid & (hit.t < tmax))
    np.testing.assert_array_equal(np.asarray(occ), ref)


def test_windowed_pop_matches_serial(mesh_scene):
    """The windowed pop (interleaved columns + per-window minima +
    scalar tournament) must be BITWISE equal to the serial 4-pop — it
    only changes evaluation order, which conservative culling and
    idempotent evals make invisible. Forced on explicitly (the auto
    policy enables it only past 512 clusters)."""
    from pathtracing_tpu.ops import cluster_trace

    o, d = random_rays(512, 11, spread=0.8, center=(0.0, -0.3, 0.5))
    t0 = jnp.full((512,), 3.0e38, jnp.float32)
    t0 = t0.at[::5].set(0.0)   # dead lanes short-circuit too
    base = cluster_trace.trace_pallas_dnf(
        mesh_scene.clusters, o, d, t0, interpret=True, windowed=False,
        group=4,
    )
    for g in (2, 4, 8):
        for win2 in (False, True):
            win = cluster_trace.trace_pallas_dnf(
                mesh_scene.clusters, o, d, t0, interpret=True,
                windowed=True, group=g, win2=win2,
            )
            live = np.asarray(t0) > 0
            for a, b in zip(base, win):
                np.testing.assert_array_equal(
                    np.asarray(a)[live], np.asarray(b)[live]
                )


def test_windowed_multiwindow_matches_oracle():
    """Multi-window case (938 clusters -> 8 windows, the production
    shape): windowed DNF closest-hit and any-hit vs the pure-JAX
    oracle."""
    from pathtracing_tpu.ops import cluster_trace

    scene, _ = scenes.cornell_mesh(6)
    assert scene.clusters.woop.shape[0] >= 512   # auto windowed fires
    o, d = random_rays(256, 13, spread=0.8, center=(0.0, -0.3, 0.5))
    t0 = jnp.full((256,), 3.0e38, jnp.float32)
    ref = cluster_trace.trace_jax(scene.clusters, o, d, t0)
    got = cluster_trace.trace_pallas_dnf(
        scene.clusters, o, d, t0, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    # win2 (2nd-smallest-per-window pops) on the real 8-window shape:
    # the tournament sees 16 candidates — results must stay bitwise.
    got2 = cluster_trace.trace_pallas_dnf(
        scene.clusters, o, d, t0, interpret=True, win2=True
    )
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got2[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got2[1]))

    tmax = jnp.full((256,), 1.0, jnp.float32)
    occ = cluster_trace.occluded_pallas_dnf(
        scene.clusters, o, d, tmax, interpret=True
    )
    _, slot, _, _ = cluster_trace.trace_jax(scene.clusters, o, d, tmax)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(slot >= 0))
