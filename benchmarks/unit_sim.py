"""Host sim: coarser DNF pop units (merge m SAH-adjacent clusters).

The r3 measurements pin the DNF floor on the per-iteration scalar phase
(~2.07 us: window-min extraction + tournament + syncs) which neither
batching (pops), branch removal (eval_always), nor independent-chain ILP
(chains) can shrink — Mosaic serializes it. The remaining dial is the
WORK PER POP: pop units of m adjacent clusters (merged AABB), shifting
cost from the unfixable scalar phase into the dense vector eval. This
sim prices that trade before any kernel work: per 128-ray bounce tile,

    units_evaled(m)  — scalar pops needed (drives iterations)
    cluster_evals(m) — 128-lane eval blocks (drives vector cost)

vs the m=1 baseline (43.7 evals, ~11 iterations at g6 windowed).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/unit_sim.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from benchmarks.walk_stats import eval_cluster  # noqa: E402

T_MIN = 1e-4
TILE = int(os.environ.get("US_TILE", "128"))
GROUP = int(os.environ.get("US_GROUP", "6"))


def unit_tile(cl, o, d, t0, m: int):
    """Nearest-first over units of m adjacent clusters; per-ray culling
    at unit granularity. Returns (units evaled, iterations at GROUP
    pops, i.e. ceil(units/GROUP) if pops were perfect)."""
    n_cl = cl.aabb_min.shape[0]
    n_u = -(-n_cl // m)
    lo = np.full((n_u, 3), np.inf, np.float32)
    hi = np.full((n_u, 3), -np.inf, np.float32)
    for u in range(n_u):
        s = slice(u * m, min((u + 1) * m, n_cl))
        lo[u] = cl.aabb_min[s].min(axis=0)
        hi[u] = cl.aabb_max[s].max(axis=0)
    inv_d = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    cap = t0.copy()
    t0a = (lo[None] - o[:, None]) * inv_d[:, None]
    t1a = (hi[None] - o[:, None]) * inv_d[:, None]
    tn = np.minimum(t0a, t1a).max(axis=2)
    tf = np.maximum(t0a, t1a).min(axis=2)
    hit = (tn <= tf) & (tf > T_MIN) & (tn < cap[:, None])
    tn = np.where(hit, np.maximum(tn, 0.0), np.inf)
    units = 0
    while True:
        alive = tn < cap[:, None]
        if not alive.any():
            break
        u = int(np.unravel_index(
            np.argmin(np.where(alive, tn, np.inf)), tn.shape
        )[1])
        units += 1
        for c in range(u * m, min((u + 1) * m, n_cl)):
            t = eval_cluster(cl, c, o, d, cap)
            cap = np.minimum(cap, t.astype(np.float32))
        tn[:, u] = np.inf
    return units


def main() -> int:
    import jax
    import jax.numpy as jnp

    from pathtracing_tpu.models import scenes, scene as scene_mod
    from pathtracing_tpu.ops.camera import build_camera, generate_ray

    level = int(os.environ.get("US_SCENE", "6"))
    res = int(os.environ.get("US_RES", "128"))
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
    o_b = hit.position
    t0_b = jnp.where(hit.valid, 3e38, 0.0)

    cl = jax.tree.map(np.asarray, scene.clusters)
    waves = {
        "camera": (np.asarray(o_cam), np.asarray(d_cam),
                   np.full(n, 3e38, np.float32)),
        "bounce": (np.asarray(o_b), np.asarray(d_b), np.asarray(t0_b)),
    }
    n_tiles = n // TILE
    print(f"# cornell_mesh({level}) {cl.aabb_min.shape[0]} clusters, "
          f"{n} rays, tile {TILE}, group {GROUP}", file=sys.stderr)
    for wave, (o, d, t0) in waves.items():
        for m in (1, 2, 4, 8):
            units = 0
            for i in range(n_tiles):
                sl = slice(i * TILE, (i + 1) * TILE)
                units += unit_tile(cl, o[sl], d[sl], t0[sl], m)
            upt = units / n_tiles
            # Ideal iterations at GROUP pops/iteration; vector evals in
            # 128-lane cluster blocks per tile.
            print(f"{wave:7s} m={m}  units/tile={upt:6.1f}  "
                  f"iter_ideal={upt / GROUP:5.2f}  "
                  f"cluster_evals/tile={upt * m:6.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
