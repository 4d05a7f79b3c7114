"""Volume-walk ledger + coarse-majorant cost probe (VERDICT r4 item 4).

Two parts:

1. WALK LEDGER (any backend; counts are RNG-determined, so CPU counts
   are the TPU counts): instruments the delta-tracking and
   ratio-tracking walks on smoke_demo's camera wave and a light-ward
   shadow wave, reporting per-lane while_loop iterations (mean / p99 /
   max — the MAX is what a lockstep wave pays) and the null-collision
   fraction, for the committed coarse-majorant grid vs the global-max
   walk (``coarse=None``). This is the decomposition VERDICT r4 weak
   #5 demanded for the 6g row (0.189 Mrays/s, 15x below flagship).

2. TIMED STEP (ledger-style, like probe_sss.py): one 160x120 suite-6g
   render step of smoke_demo, committed grid vs global-majorant grid,
   min of 3 warm reps.

Run on TPU: python benchmarks/probe_volume.py
CPU counts: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PROBE_QUICK=1 ...
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def walk_counts(vol, o, d, t_max, seed=0):
    """Per-lane iteration counts + null fraction for the distance walk,
    mirroring ops.volume.sample_distance_seq step for step (shares
    _coarse_step/density_at so it tracks the SEQUENTIAL walk; the
    production batched walk — PERF.md r5f — replaces per-step gathers
    with per-round fused gathers, so its cost ledger is wall-clock in
    part 2, not an iteration count)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracing_tpu.ops import rng, volume

    r = o.shape[0]
    t0, t1 = volume._ray_box(o, d, vol.bbox_min, vol.bbox_max)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    sig_scale = vol.sigma_s + vol.sigma_a
    inv_maj = 1.0 / jnp.maximum(vol.majorant, 1e-20)
    keys = jax.vmap(
        lambda p: rng.pixel_sample_key(jnp.uint32(seed), p, 0)
    )(jnp.arange(r, dtype=jnp.int32))
    k_vol = jax.vmap(
        lambda k: rng.stream_key(k, jnp.int32(0), rng.STREAM_VOL)
    )(keys)
    coarse = vol.coarse is not None
    if coarse:
        csize, chi, cflat, t_eps = volume._coarse_geom(vol)

    t = t0
    done = t0 >= t1
    iters = jnp.zeros(r, jnp.int32)
    nulls = jnp.zeros(r, jnp.int32)
    flights = jnp.zeros(r, jnp.int32)
    for i in range(vol.n_steps):
        if bool(jnp.all(done)):
            break
        u = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, i), (2,), dtype=jnp.float32
            )
        )(k_vol)
        if coarse:
            t_new, advance, inv_lm = volume._coarse_step(
                vol, csize, chi, cflat, t_eps, o, d, t, u[:, 0]
            )
        else:
            t_new = t + volume._flight(u[:, 0], inv_maj)
            advance = jnp.zeros(r, bool)
            inv_lm = inv_maj
        esc = t_new >= t1
        x = o + t_new[:, None] * d
        p_real = volume.density_at(vol, x) * sig_scale * inv_lm
        real = jnp.logical_not(advance) & (u[:, 1] < p_real)
        live = jnp.logical_not(done)
        iters = iters + live
        flights = flights + (live & jnp.logical_not(advance))
        nulls = nulls + (live & jnp.logical_not(advance)
                         & jnp.logical_not(esc)
                         & jnp.logical_not(real))
        t = jnp.where(done, t, t_new)
        done = done | esc | real
    import numpy as np

    it = np.asarray(iters)
    crossed = np.asarray(t1 > t0)
    return {
        "iters_mean": round(float(it[crossed].mean()), 1),
        "iters_p99": int(np.percentile(it[crossed], 99)),
        "iters_max": int(it.max()),
        "null_fraction": round(
            float(np.asarray(nulls).sum())
            / max(float(np.asarray(flights).sum()), 1.0), 3),
    }


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass

    from pathtracing_tpu.models import progressive, scenes, shading
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    scene, cam_cfg = scenes.smoke_demo()
    vol = scene.vol
    vol_global = dataclasses.replace(vol, coarse=None, coarse_ray=None,
                                     ray_samples=0)
    w, h = 160, 120
    camera = build_camera(cam_cfg, w / h)

    # --- Part 1: walk ledger on the camera wave + a shadow wave -------
    pix = jnp.arange(w * h, dtype=jnp.int32)
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=4,
                       max_depth=8, samples_per_step=4, seed=0,
                       background="black")
    _, o, d = jax.vmap(
        lambda p: shading.camera_sample(camera, cfg, jnp.uint32(0), p,
                                        jnp.int32(0))
    )(pix)
    t_cam = jnp.full(w * h, 1.0e7, jnp.float32)
    # Light-ward shadow wave: from points along the plume axis to the
    # Cornell ceiling light (the in-medium NEE arm's geometry).
    r2 = 4096
    zz = np.linspace(-0.9, 0.6, r2, dtype=np.float32)
    o2 = jnp.asarray(np.stack([np.full(r2, -0.1, np.float32), zz,
                               np.full(r2, 0.0, np.float32)], axis=1))
    d2 = jnp.asarray(np.tile(np.array([0.0, 1.0, 0.0], np.float32),
                             (r2, 1)))
    t2 = jnp.full(r2, 2.0, jnp.float32)

    ledger = {}
    for tag, v in (("coarse", vol), ("global", vol_global)):
        ledger[f"camera_{tag}"] = walk_counts(v, o, d, t_cam)
        ledger[f"shadow_{tag}"] = walk_counts(v, o2, d2, t2)
    for k in sorted(ledger):
        print(json.dumps({k: ledger[k]}), flush=True)

    # --- Part 2: timed render step, coarse vs global ------------------
    def timed(s):
        state = progressive.init_state(cfg)
        state = progressive.render_step(state, s, camera, cfg)
        float(jnp.sum(state.accum))
        best = 1e30
        for _ in range(3):
            state = progressive.init_state(cfg)
            t0 = time.perf_counter()
            state = progressive.render_step(state, s, camera, cfg)
            float(jnp.sum(state.accum))
            best = min(best, time.perf_counter() - t0)
        return best

    if not os.environ.get("PROBE_COUNTS_ONLY"):
        t_coarse = timed(scene)
        t_global = timed(scene._replace(vol=vol_global))
        print(json.dumps({
            "workload": f"smoke_demo {w}x{h} 4spp d8 megakernel, "
                        "min of 3 warm reps",
            "global_majorant_s": round(t_global, 4),
            "coarse_majorant_s": round(t_coarse, 4),
            "speedup": round(t_global / t_coarse, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
