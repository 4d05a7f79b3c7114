"""Host sim: static distance-ordered schedule (SDOS) vs dynamic DNF.

Every dynamic-scheduling lever on the DNF kernel has measured dead
(PERF.md r3a-r3c): the ~2 us/iteration scalar pop phase is a Mosaic
serialization floor. SDOS removes the dynamic pops entirely: order
clusters ONCE near-to-far from the ray tile's spatial region (kernel
reality: a precomputed per-cell order; this sim prices both the exact
per-tile order and a coarse-grid approximation), then sweep that static
schedule in GROUP-sized chunks:

  - a chunk with no live (ray, member) pair is SKIPPED at one branch
    (~0.3 us measured branch cost), not evaluated;
  - the sweep STOPS when the remaining entries' conservative distance
    lower bound exceeds every ray's best_t;
  - per-ray best_t culling still gates chunk liveness, so extra evals
    relative to the dynamic kernel come only from order mismatch.

Cost model per tile (us): dynamic = iter * (2.07 + 1.07)
                          sdos    = live*1.07 + skip*0.30 + fixed
Prints both so the kernel is only built if the sim says >= ~1.3x.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/sdos_sim.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.walk_stats import eval_cluster  # noqa: E402

T_MIN = 1e-4
TILE = int(os.environ.get("SD_TILE", "128"))
GROUP = int(os.environ.get("SD_GROUP", "6"))
US_SCALAR = 2.07   # measured per-iteration scalar phase (PERF.md r3a)
US_EVAL = 1.07     # measured per-iteration 6-cluster dense eval
US_BRANCH = 0.30   # measured pl.when cost bound (r1/r3b: ~free-to-0.5)


def phase1(cl, o, d, cap):
    inv_d = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    t0a = (cl.aabb_min[None] - o[:, None]) * inv_d[:, None]
    t1a = (cl.aabb_max[None] - o[:, None]) * inv_d[:, None]
    tn = np.minimum(t0a, t1a).max(axis=2)
    tf = np.maximum(t0a, t1a).min(axis=2)
    hit = (tn <= tf) & (tf > T_MIN) & (tn < cap[:, None])
    return np.where(hit, np.maximum(tn, 0.0), np.inf)


def dnf_iters(cl, o, d, t0, group: int):
    """Dynamic nearest-first with perfect group-wide pops (ideal lower
    bound on the shipping kernel's iterations; the windowed pop wastes
    ~1.5x on top)."""
    cap = t0.copy()
    tn = phase1(cl, o, d, cap)
    iters = 0
    while True:
        alive = tn < cap[:, None]
        rowmin = np.where(alive, tn, np.inf).min(axis=0)
        order = np.argsort(rowmin)[:group]
        order = order[np.isfinite(rowmin[order])]
        if order.size == 0:
            return iters
        iters += 1
        for c in order:
            t = eval_cluster(cl, int(c), o, d, cap)
            cap = np.minimum(cap, t.astype(np.float32))
            tn[:, c] = np.inf


def sdos_tile(cl, o, d, t0, group: int, order, centers, origin_lo,
              origin_hi):
    """Static sweep in ``order``; returns (live chunks, skipped chunks,
    stop chunk index)."""
    cap = t0.copy()
    tn = phase1(cl, o, d, cap)
    n_cl = order.shape[0]
    # Conservative per-entry distance lower bound: point-to-AABB
    # distance from the tile's origin bounding box to the cluster AABB.
    lo_d = np.maximum(cl.aabb_min[order] - origin_hi[None, :], 0.0)
    hi_d = np.maximum(origin_lo[None, :] - cl.aabb_max[order], 0.0)
    dist_lb = np.sqrt(((np.maximum(lo_d, hi_d)) ** 2).sum(axis=1))
    live_chunks = skip_chunks = 0
    stop = n_cl
    for c0 in range(0, n_cl, group):
        ids = order[c0:c0 + group]
        if dist_lb[c0:c0 + group].min() > cap.max():
            stop = c0
            break
        sub = tn[:, ids]
        if (sub < cap[:, None]).any():
            live_chunks += 1
            for c in ids:
                t = eval_cluster(cl, int(c), o, d, cap)
                cap = np.minimum(cap, t.astype(np.float32))
        else:
            skip_chunks += 1
    return live_chunks, skip_chunks, stop


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.models import scenes, scene as scene_mod
    from pathtracing_tpu.ops.camera import build_camera, generate_ray

    level = int(os.environ.get("SD_SCENE", "6"))
    res = int(os.environ.get("SD_RES", "96"))
    grid_n = int(os.environ.get("SD_GRID", "4"))
    scene, cam_cfg = scenes.cornell_mesh(level)
    camera = build_camera(cam_cfg, 1.0)
    n = res * res

    px = jnp.arange(n, dtype=jnp.int32)
    s = ((px % res).astype(jnp.float32) + 0.5) / res
    t = ((px // res).astype(jnp.float32) + 0.5) / res
    o_cam, d_cam = jax.vmap(
        lambda a, b: generate_ray(camera, a, b, 0.5, 0.5)
    )(s, t)
    hit = scene_mod.intersect_batch(scene, o_cam, d_cam, "cluster_jax")
    u = jax.random.uniform(jax.random.key(0), (n, 2))
    nrm = hit.normal
    tang = jnp.where(jnp.abs(nrm[:, 0:1]) > 0.9,
                     jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    tx = tang - nrm * jnp.sum(tang * nrm, axis=1, keepdims=True)
    tx = tx / jnp.linalg.norm(tx, axis=1, keepdims=True)
    ty = jnp.cross(nrm, tx)
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    z = jnp.sqrt(jnp.maximum(1 - u[:, 0], 0))
    d_b = ((r * jnp.cos(phi))[:, None] * tx
           + (r * jnp.sin(phi))[:, None] * ty + z[:, None] * nrm)
    o_b = np.asarray(hit.position)
    t0_b = np.asarray(jnp.where(hit.valid, 3e38, 0.0))

    cl = jax.tree.map(np.asarray, scene.clusters)
    centers = (cl.aabb_min + cl.aabb_max) * 0.5
    slo = cl.aabb_min.min(axis=0)
    shi = cl.aabb_max.max(axis=0)

    waves = {
        "camera": (np.asarray(o_cam), np.asarray(d_cam),
                   np.full(n, 3e38, np.float32)),
        "bounce": (o_b, np.asarray(d_b), t0_b),
    }
    n_tiles = n // TILE
    print(f"# cornell_mesh({level}) {centers.shape[0]} clusters, {n} "
          f"rays, tile {TILE}, group {GROUP}, grid {grid_n}^3",
          file=sys.stderr)
    for wave, (o, d, t0) in waves.items():
        it_d = lv_t = sk_t = lv_c = sk_c = 0.0
        for i in range(n_tiles):
            sl = slice(i * TILE, (i + 1) * TILE)
            ot, dt, tt = o[sl], d[sl], t0[sl]
            it_d += dnf_iters(cl, ot, dt, tt, GROUP)
            olo, ohi = ot.min(axis=0), ot.max(axis=0)
            # Exact per-tile order (upper bound on SDOS quality).
            cen = (olo + ohi) * 0.5
            order_t = np.argsort(((centers - cen) ** 2).sum(axis=1))
            lv, sk, _ = sdos_tile(cl, ot, dt, tt, GROUP, order_t,
                                  centers, olo, ohi)
            lv_t += lv
            sk_t += sk
            # Coarse-cell order (kernel reality): cell of the centroid
            # on a grid_n^3 grid over the scene bounds.
            cell = np.clip(((cen - slo) / (shi - slo + 1e-9)
                            * grid_n).astype(int), 0, grid_n - 1)
            ccen = slo + (cell + 0.5) * (shi - slo) / grid_n
            order_c = np.argsort(((centers - ccen) ** 2).sum(axis=1))
            lv, sk, _ = sdos_tile(cl, ot, dt, tt, GROUP, order_c,
                                  centers, olo, ohi)
            lv_c += lv
            sk_c += sk
        it_d /= n_tiles
        lv_t /= n_tiles
        sk_t /= n_tiles
        lv_c /= n_tiles
        sk_c /= n_tiles
        dyn = it_d * (US_SCALAR + US_EVAL)
        st = lv_t * US_EVAL + sk_t * US_BRANCH
        sc = lv_c * US_EVAL + sk_c * US_BRANCH
        print(f"{wave:7s} dyn: iter={it_d:5.1f} -> {dyn:5.1f}us | "
              f"sdos(tile): live={lv_t:5.1f} skip={sk_t:5.1f} -> "
              f"{st:5.1f}us ({dyn / st:4.2f}x) | "
              f"sdos(cell): live={lv_c:5.1f} skip={sk_c:5.1f} -> "
              f"{sc:5.1f}us ({dyn / sc:4.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
