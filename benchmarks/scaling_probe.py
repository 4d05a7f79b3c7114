"""Virtual-mesh scaling probe: sharded-step throughput on 1 vs N
virtual CPU devices (VERDICT r1 item 7).

Without multi-chip hardware this cannot measure real ICI speedup, but it
CAN catch sharding pathologies — accidental full-image broadcasts,
replicated traversal state, per-step host sync — which show up as the
N-device step running no faster (or slower) than the 1-device step on
the same total workload. Run in a fresh process (the TPU plugin claims
the chip exclusively; this probe must own the backend):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling_probe.py

Prints one JSON line: per-mesh seconds + the parallel efficiency of the
N-device mesh vs 1 device at FIXED TOTAL WORK (weak-scaling efficiency
over the sample axis; 1.0 = perfect).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )


def time_mesh(n_tiles: int, n_samples: int, spp: int) -> float:
    import jax

    from pathtracing_tpu.models import scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.parallel import mesh as mesh_mod
    from pathtracing_tpu.parallel import render as prender
    from pathtracing_tpu.utils.config import RenderConfig

    n_dev = n_tiles * n_samples
    mesh = mesh_mod.make_mesh(n_tiles, n_samples,
                              devices=jax.devices()[:n_dev])
    config = RenderConfig(
        width=64, height=64, samples_per_pixel=spp, max_depth=4,
        samples_per_step=n_samples, seed=0,
    )
    scene, cam_cfg = scenes.cornell_sphere()
    camera = build_camera(cam_cfg, 1.0)
    step = prender.make_sharded_step(mesh, config)
    state = prender.init_sharded_state(mesh, config)
    state = step(state, scene, camera)          # compile + warm
    jax.block_until_ready(state.accum)
    state = prender.init_sharded_state(mesh, config)
    t0 = time.perf_counter()
    while int(state.spp) < spp:
        state = step(state, scene, camera)
    jax.block_until_ready(state.accum)
    return time.perf_counter() - t0


def tile_axis_flops(n_tiles: int) -> float:
    """Per-device HLO flops of one sharded step on an (n_tiles, 1) mesh
    at FIXED total image size — the tile-axis work-replication detector
    (VERDICT r2 item 6). Timing on virtual CPU devices is noisy and
    serialized; compile-time cost analysis is deterministic: with honest
    row sharding the per-device module renders H/n_tiles rows, so flops
    must scale ~1/n_tiles. A regression that renders the full image per
    device behind a correct-looking output sharding (e.g. replicated
    traversal + slice) keeps results bit-identical — ONLY this gate sees
    it."""
    import jax

    from pathtracing_tpu.models import scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.parallel import mesh as mesh_mod
    from pathtracing_tpu.parallel import render as prender
    from pathtracing_tpu.utils.config import RenderConfig

    if os.environ.get("PROBE_BREAK") == "1":
        prender._PROBE_FULL_BLOCK = True
    mesh = mesh_mod.make_mesh(n_tiles, 1,
                              devices=jax.devices()[:n_tiles])
    config = RenderConfig(
        width=64, height=64, samples_per_pixel=4, max_depth=4,
        samples_per_step=1, seed=0,
    )
    scene, cam_cfg = scenes.cornell_sphere()
    camera = build_camera(cam_cfg, 1.0)
    step = prender.make_sharded_step(mesh, config)
    state = prender.init_sharded_state(mesh, config)
    compiled = step.lower(state, scene, camera).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", -1.0))


def main() -> int:
    import jax

    n_dev = len(jax.devices())
    spp = int(os.environ.get("PROBE_SPP", "8"))
    # Same TOTAL work: 1 device does `spp` 1-sample steps; the N-device
    # sample-sharded mesh does spp/N steps of N samples each.
    t1 = time_mesh(1, 1, spp)
    tn = time_mesh(1, min(n_dev, spp), spp)
    # Weak-scaling efficiency: perfect sharding gives tn == t1 / N.
    eff = t1 / (min(n_dev, spp) * max(tn, 1e-9))

    # Tile axis: per-device flops at 8 tiles vs 1 must scale ~1/8.
    n_tiles = min(n_dev, 8)
    flops_1 = tile_axis_flops(1)
    flops_n = tile_axis_flops(n_tiles)
    # Slack 2x over the ideal 1/n: per-device fixed overheads (camera
    # setup, RNG streams) don't shrink with the stripe. A replicated-
    # traversal regression lands at ratio ~1.0 — far above the gate.
    tile_ratio = flops_n / max(flops_1, 1.0)
    tile_gate = 2.0 / n_tiles
    tile_ok = 0 < flops_n and tile_ratio <= tile_gate

    print(json.dumps({
        "devices": n_dev,
        "spp": spp,
        "sec_1dev": round(t1, 3),
        "sec_ndev": round(tn, 3),
        "parallel_efficiency": round(eff, 3),
        "tile_flops_1": flops_1,
        "tile_flops_n": flops_n,
        "tile_flops_ratio": round(tile_ratio, 4),
        "tile_gate": f"<= {tile_gate:.3f}",
        "tile_ok": tile_ok,
    }))
    rc = 0
    # On virtual CPU devices, XLA:CPU serializes device computations, so
    # efficiency ~1/N is EXPECTED; what this probe must catch is
    # efficiency << 1/N (e.g. full-image broadcasts making the N-device
    # step superlinearly slower).
    floor = 0.5 / min(n_dev, spp)
    if eff < floor:
        print(f"FAIL: efficiency {eff:.3f} below sanity floor "
              f"{floor:.3f} — look for sharding pathologies",
              file=sys.stderr)
        rc = 1
    if not tile_ok:
        print(f"FAIL: tile-axis per-device flops ratio {tile_ratio:.3f} "
              f"exceeds {tile_gate:.3f} — work is replicated across the "
              "tile axis", file=sys.stderr)
        rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
