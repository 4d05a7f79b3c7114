"""Host-side traversal simulator: visits/evals per tile by kernel policy.

Answers "where does the kernel's time go" without touching the TPU: for a
given wave (camera / bounce / shadow) and binning, simulate the tile-
uniform threaded walk and count tree-node visits and dense leaf evals per
256-ray tile, for the unordered (area-first) and octant-ordered link
tables. Also reports the per-tile cluster-footprint lower bound (clusters
any ray in the tile actually needs = those overlapping [0, t_hit]),
which no tile-uniform traversal can beat.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/walk_stats.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T_MIN = 1e-4
TILE = int(os.environ.get("WS_TILE", "256"))


def slab(o, inv_d, lo, hi, cap):
    """(R,) rays vs one AABB; returns (hit mask, tn)."""
    t0 = (lo[None, :] - o) * inv_d
    t1 = (hi[None, :] - o) * inv_d
    tn = np.minimum(t0, t1).max(axis=1)
    tf = np.maximum(t0, t1).min(axis=1)
    return (tn <= tf) & (tf > T_MIN) & (tn < cap), tn


def eval_cluster(cl, c, o, d, cap):
    """Best-t update for one cluster (vectorized Woop eval, numpy)."""
    w = cl.woop[c]  # (4, 384)
    o4 = np.concatenate([o, np.ones((o.shape[0], 1), np.float32)], axis=1)
    d4 = np.concatenate([d, np.zeros((d.shape[0], 1), np.float32)], axis=1)
    op = o4 @ w
    dp = d4 @ w
    k = 128
    t = -op[:, 2 * k:] / np.where(
        np.abs(dp[:, 2 * k:]) < 1e-30, 1e-30, dp[:, 2 * k:]
    )
    u = op[:, :k] + t * dp[:, :k]
    v = op[:, k:2 * k] + t * dp[:, k:2 * k]
    ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > T_MIN) & (t < cap[:, None])
    return np.where(ok, t, np.inf).min(axis=1)


def walk_tile(cl, o, d, t0, ordered: bool, oct: int):
    nb = cl.node_box  # (6, N)
    nm = cl.node_meta
    links = cl.oct_links
    n = nm.shape[1]
    inv_d = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    cap = t0.copy()
    idx, visits, evals = 0, 0, 0
    lo_all, hi_all = nb[0:3].T, nb[3:6].T
    while idx < n:
        visits += 1
        hit, _ = slab(o, inv_d, lo_all[idx], hi_all[idx], cap)
        any_hit = hit.any()
        cid = nm[1, idx]
        if any_hit and cid >= 0:
            evals += 1
            t = eval_cluster(cl, cid, o, d, cap)
            cap = np.minimum(cap, t.astype(np.float32))
        if ordered:
            idx = links[0 if any_hit else 1, oct, idx]
        else:
            idx = idx + 1 if any_hit else nm[0, idx]
    return visits, evals


def dnf_tile(cl, o, d, t0):
    """Dense nearest-first policy: evals until per-ray culling kills all.

    Returns (pierced clusters, evals) per tile — 'pierced' is the
    phase-1 hit-column count (what a no-culling dense pass would eval),
    'evals' the actual nearest-first loop trips (the scalar-sync count
    of the DNF kernel)."""
    inv_d = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    cap = t0.copy()
    lo_all, hi_all = cl.aabb_min, cl.aabb_max  # (C, 3)
    t0a = (lo_all[None] - o[:, None]) * inv_d[:, None]
    t1a = (hi_all[None] - o[:, None]) * inv_d[:, None]
    tn = np.minimum(t0a, t1a).max(axis=2)      # (R, C)
    tf = np.maximum(t0a, t1a).min(axis=2)
    hit = (tn <= tf) & (tf > T_MIN) & (tn < cap[:, None])
    tn = np.where(hit, np.maximum(tn, 0.0), np.inf)
    pierced = int(np.any(np.isfinite(tn), axis=0).sum())
    evals = 0
    while True:
        alive = tn < cap[:, None]
        if not alive.any():
            return pierced, evals
        c = int(np.unravel_index(
            np.argmin(np.where(alive, tn, np.inf)), tn.shape
        )[1])
        evals += 1
        t = eval_cluster(cl, c, o, d, cap)
        cap = np.minimum(cap, t.astype(np.float32))
        tn[:, c] = np.inf


def dnf_tile_banded(cl, o, d, t0, band: int):
    """Banded-cull DNF policy: phase-1 keys reduced ONCE to per-band
    minima over ``band``-ray row bands; each iteration culls the
    (tile/band, C) band matrix against the band's max live cap instead
    of the full per-ray matrix. Conservative (a pair live per-ray is
    live per-band, so nothing real is ever culled) — the simulation
    counts how many EXTRA idempotent evals the coarser cull admits.
    ``band == tile`` degenerates to a static row + global max-cap stop.
    Returns evals per tile."""
    r = o.shape[0]
    nb = r // band
    inv_d = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    cap = t0.copy()
    lo_all, hi_all = cl.aabb_min, cl.aabb_max
    t0a = (lo_all[None] - o[:, None]) * inv_d[:, None]
    t1a = (hi_all[None] - o[:, None]) * inv_d[:, None]
    tn = np.minimum(t0a, t1a).max(axis=2)
    tf = np.maximum(t0a, t1a).min(axis=2)
    hit = (tn <= tf) & (tf > T_MIN) & (tn < cap[:, None]) & (cap[:, None] > 0)
    tn = np.where(hit, np.maximum(tn, 0.0), np.inf)
    # One-time band reduction — the (nb, C) matrix is ALL later
    # iterations touch; the (R, C) matrix is never re-read.
    tnb = tn.reshape(nb, band, -1).min(axis=1)        # (nb, C)
    evals = 0
    while True:
        capb = np.where(cap > 0, cap, 0.0).reshape(nb, band).max(axis=1)
        alive = tnb < capb[:, None]
        if not alive.any():
            return evals
        c = int(np.unravel_index(
            np.argmin(np.where(alive, tnb, np.inf)), tnb.shape
        )[1])
        evals += 1
        t = eval_cluster(cl, c, o, d, cap)
        cap = np.minimum(cap, t.astype(np.float32))
        tnb[:, c] = np.inf


def main():
    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.models import scenes, scene as scene_mod
    from pathtracing_tpu.ops import binning
    from pathtracing_tpu.ops.camera import build_camera, generate_ray

    level = int(os.environ.get("WS_SCENE", "6"))
    res = int(os.environ.get("WS_RES", "128"))  # rays = res^2
    bands = [int(b) for b in
             os.environ.get("WS_BANDS", "").split(",") if b]
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
    key = jax.random.key(0)
    u = jax.random.uniform(key, (n, 2))
    nrm = hit.normal
    tang = jnp.where(jnp.abs(nrm[:, 0:1]) > 0.9,
                     jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    tx = tang - nrm * jnp.sum(tang * nrm, axis=1, keepdims=True)
    tx = tx / jnp.linalg.norm(tx, axis=1, keepdims=True)
    ty = jnp.cross(nrm, tx)
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    z = jnp.sqrt(jnp.maximum(1 - u[:, 0], 0))
    d_b = (r * jnp.cos(phi))[:, None] * tx + (r * jnp.sin(phi))[:, None] * ty \
        + z[:, None] * nrm
    o_b, t0_b = hit.position, jnp.where(hit.valid, 3e38, 0.0)

    cl = jax.tree.map(np.asarray, scene.clusters)
    lo = cl.aabb_min.min(axis=0)
    hi = cl.aabb_max.max(axis=0)

    for wave, (o, d, t0) in {
        "camera": (o_cam, d_cam, jnp.full(n, 3e38, jnp.float32)),
        "bounce": (o_b, d_b, t0_b),
    }.items():
        for bins in (0, 216):
            if bins:
                perm, _ = binning.sort_rays(
                    o, d, jnp.asarray(lo), jnp.asarray(hi), t0 > 0, bins
                )
                o_s, d_s, t0_s = o[perm], d[perm], t0[perm]
            else:
                o_s, d_s, t0_s = o, d, t0
            o_np, d_np = np.asarray(o_s), np.asarray(d_s)
            t0_np = np.asarray(t0_s)
            rows = {False: [], True: []}
            for i in range(n // TILE):
                sl = slice(i * TILE, (i + 1) * TILE)
                oct = (int(d_np[sl][0, 0] > 0) * 4
                       + int(d_np[sl][0, 1] > 0) * 2
                       + int(d_np[sl][0, 2] > 0))
                for ordered in (False, True):
                    rows[ordered].append(
                        walk_tile(cl, o_np[sl], d_np[sl], t0_np[sl],
                                  ordered, oct)
                    )
            dnf_rows = [
                dnf_tile(cl, o_np[i * TILE:(i + 1) * TILE],
                         d_np[i * TILE:(i + 1) * TILE],
                         t0_np[i * TILE:(i + 1) * TILE])
                for i in range(n // TILE)
            ]
            for ordered in (False, True):
                v = np.array(rows[ordered])
                print(f"{wave:7s} bins={bins:4d} ordered={int(ordered)}: "
                      f"visits/tile={v[:, 0].mean():7.1f}  "
                      f"evals/tile={v[:, 1].mean():6.1f}", flush=True)
            dv = np.array(dnf_rows)
            print(f"{wave:7s} bins={bins:4d} DNF:       "
                  f"pierced/tile={dv[:, 0].mean():6.1f}  "
                  f"evals/tile={dv[:, 1].mean():6.1f}", flush=True)
            for band in bands:
                if band > TILE:
                    continue
                bv = np.array([
                    dnf_tile_banded(cl, o_np[i * TILE:(i + 1) * TILE],
                                    d_np[i * TILE:(i + 1) * TILE],
                                    t0_np[i * TILE:(i + 1) * TILE], band)
                    for i in range(n // TILE)
                ])
                print(f"{wave:7s} bins={bins:4d} DNF band={band:3d}: "
                      f"evals/tile={bv.mean():6.1f}", flush=True)


if __name__ == "__main__":
    main()
