"""Time-to-quality: per-pixel adaptive sampling vs uniform (VERDICT r3 #2).

For each scene, renders a converged reference once (independent seed,
cached to benchmarks/adq_ref_<scene>_<size>.npz), then sweeps sample
budgets rendering the SAME budget uniformly (progressive engine) and
adaptively (models/adaptive.render_adaptive), timing each on the device
and recording RMSE vs the reference.  Prints one JSON line per
(scene, method, budget) plus a summary line per scene with the
uniform/adaptive wall-clock ratio to reach the target RMSE
(interpolated on the measured curves).

Run on the TPU (one process at a time):   python benchmarks/adaptive_quality.py
CPU smoke:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu ADQ_QUICK=1 python ...

Env knobs: ADQ_SCENES (comma list), ADQ_SIZE, ADQ_BUDGETS, ADQ_REF_SPP,
ADQ_TARGET (RMSE; default 0.01), ADQ_QUICK=1 (tiny sizes).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def sync(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x))


def converged_reference(scene, cam, config, scene_name: str,
                        size: int, ref_spp: int) -> np.ndarray:
    """High-spp independent-seed reference, cached on disk."""
    import dataclasses

    import jax.numpy as jnp

    from pathtracing_tpu.models import progressive

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"adq_ref_{scene_name}_{size}.npz")
    if os.path.exists(path):
        with np.load(path) as d:
            if int(d["spp"]) == ref_spp:
                return d["img"]
    cfg = dataclasses.replace(config, seed=997, samples_per_pixel=ref_spp,
                              samples_per_step=8)
    state = progressive.init_state(cfg)
    steps = ref_spp // cfg.samples_per_step
    for i in range(steps):
        state = progressive.render_step(state, scene, cam, cfg)
        if (i + 1) % 32 == 0:
            sync(state.spp)     # keep single dispatch windows bounded
    img = np.asarray(progressive.resolve(state))
    np.savez(path, img=img, spp=ref_spp)
    return img


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((a - b) ** 2)))


def run_uniform(scene, cam, config, budget: int):
    import dataclasses

    from pathtracing_tpu.models import progressive

    step_spp = min(4, budget)
    cfg = dataclasses.replace(config, samples_per_pixel=budget,
                              samples_per_step=step_spp)
    state = progressive.init_state(cfg)
    # Warm the compile outside the timed window (both methods get this).
    state = progressive.render_step(state, scene, cam, cfg)
    sync(state.accum)
    state = progressive.init_state(cfg)
    t0 = time.perf_counter()
    for _ in range(budget // step_spp):
        state = progressive.render_step(state, scene, cam, cfg)
    sync(state.accum)
    dt = time.perf_counter() - t0
    return np.asarray(progressive.resolve(state)), dt


def run_adaptive(scene, cam, config, budget: int, band_rows: int,
                 k: int):
    import dataclasses

    from pathtracing_tpu.models import adaptive

    spr = int(os.environ.get("ADQ_SPR", 1))
    cfg = dataclasses.replace(config, samples_per_pixel=budget,
                              samples_per_step=1)
    # Warm with the FULL budget: the fused-round graphs are static in
    # n_rounds, so a smaller warm run would leave the timed run paying
    # compiles (measured on the CPU smoke: 0.3 s -> 8 s).
    adaptive.render_adaptive(scene, cam, cfg, band_rows=band_rows,
                             bands_per_round=k, spp_per_round=spr)
    t0 = time.perf_counter()
    state, _ = adaptive.render_adaptive(scene, cam, cfg,
                                        band_rows=band_rows,
                                        bands_per_round=k,
                                        spp_per_round=spr)
    sync(state.accum)
    dt = time.perf_counter() - t0
    return np.asarray(adaptive.resolve(state, band_rows)), dt


def run_tiles(scene, cam, config, budget: int, tile: int):
    import dataclasses

    from pathtracing_tpu.models import adaptive

    spr = int(os.environ.get("ADQ_SPR", 2))
    cfg = dataclasses.replace(config, samples_per_pixel=budget,
                              samples_per_step=1)
    adaptive.render_adaptive_tiles(scene, cam, cfg, tile=tile,
                                   spp_per_round=spr)
    t0 = time.perf_counter()
    state, _ = adaptive.render_adaptive_tiles(scene, cam, cfg,
                                              tile=tile,
                                              spp_per_round=spr)
    sync(state.accum)
    dt = time.perf_counter() - t0
    return np.asarray(adaptive.resolve_tiles(state, cfg, tile)), dt


def time_to_target(budgets, times, errs, target: float):
    """First wall-clock at which the RMSE curve crosses target
    (log-linear interpolation); None if never reached."""
    for i in range(len(budgets)):
        if errs[i] <= target:
            if i == 0:
                return times[0]
            # interpolate in log(err) vs time
            e0, e1 = np.log(errs[i - 1]), np.log(errs[i])
            t0, t1 = times[i - 1], times[i]
            f = (np.log(target) - e0) / (e1 - e0)
            return float(t0 + f * (t1 - t0))
    return None


def main() -> int:
    quick = os.environ.get("ADQ_QUICK") == "1"
    size = int(os.environ.get("ADQ_SIZE", 64 if quick else 256))
    scene_names = os.environ.get(
        "ADQ_SCENES", "cornell_bsdf,spotlight_demo"
    ).split(",")
    budgets = [int(b) for b in os.environ.get(
        "ADQ_BUDGETS", "4,8" if quick else "8,16,32,64,128"
    ).split(",")]
    ref_spp = int(os.environ.get("ADQ_REF_SPP", 64 if quick else 4096))
    target = float(os.environ.get("ADQ_TARGET", 0.01))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        if jax.default_backend() == "tpu"
        else os.path.join(REPO, ".jax_cache_cpu"),
    )

    from pathtracing_tpu.models import scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    summary_ok = True
    for name in scene_names:
        scene, cam_cfg = scenes.get_scene(name)
        config = RenderConfig(
            width=size, height=size, samples_per_pixel=1, max_depth=6,
            seed=0, samples_per_step=1,
            background=scenes.preferred_background(name),
        )
        cam = build_camera(cam_cfg, 1.0)
        ref = converged_reference(scene, cam, config, name, size,
                                  ref_spp)

        band_rows = int(os.environ.get(
            "ADQ_BAND_ROWS", max(r for r in range(1, 5) if size % r == 0)
        ))
        n_bands = size // band_rows
        k = int(os.environ.get("ADQ_K", max(1, n_bands // 8)))

        tile = int(os.environ.get("ADQ_TILE", 0))    # 0 = band mode only
        rows = {"uniform": ([], []), "adaptive": ([], [])}
        if tile:
            rows["tiles"] = ([], [])
        for budget in budgets:
            img_u, dt_u = run_uniform(scene, cam, config, budget)
            img_a, dt_a = run_adaptive(scene, cam, config, budget,
                                       band_rows, k)
            pairs = [("uniform", (img_u, dt_u)),
                     ("adaptive", (img_a, dt_a))]
            if tile:
                pairs.append(("tiles",
                              run_tiles(scene, cam, config, budget,
                                        tile)))
            for method, (img, dt) in pairs:
                e = rmse(img, ref)
                rows[method][0].append(dt)
                rows[method][1].append(e)
                print(json.dumps({
                    "scene": name, "method": method, "budget": budget,
                    "seconds": round(dt, 3), "rmse": round(e, 5),
                }))
        if tile:
            tt_u = time_to_target(budgets, *rows["uniform"], target)
            tt_t = time_to_target(budgets, *rows["tiles"], target)
            anchor_t = rows["uniform"][1][-1] * 1.0001
            at_u = time_to_target(budgets, *rows["uniform"], anchor_t)
            at_t = time_to_target(budgets, *rows["tiles"], anchor_t)
            print(json.dumps({
                "scene": name, "method": "tiles-summary",
                "target_rmse": target,
                "uniform_s": None if tt_u is None else round(tt_u, 2),
                "tiles_s": None if tt_t is None else round(tt_t, 2),
                "speedup": (None if not (tt_u and tt_t)
                            else round(tt_u / tt_t, 2)),
                "anchor_rmse": round(anchor_t, 5),
                "anchor_speedup": (None if not (at_u and at_t)
                                   else round(at_u / at_t, 2)),
            }))
        t_u = time_to_target(budgets, *rows["uniform"], target)
        t_a = time_to_target(budgets, *rows["adaptive"], target)
        ratio = (t_u / t_a) if (t_u and t_a) else None
        # The fixed target may sit below both curves at these budgets;
        # the ANCHORED speedup uses the uniform curve's own final RMSE —
        # always reachable by uniform (at its last point) and the
        # honest wall-clock ratio at matched quality.
        anchor = rows["uniform"][1][-1] * 1.0001
        ta_u = time_to_target(budgets, *rows["uniform"], anchor)
        ta_a = time_to_target(budgets, *rows["adaptive"], anchor)
        ratio_a = (ta_u / ta_a) if (ta_u and ta_a) else None
        print(json.dumps({
            "scene": name, "target_rmse": target,
            "uniform_s": None if t_u is None else round(t_u, 2),
            "adaptive_s": None if t_a is None else round(t_a, 2),
            "speedup": None if ratio is None else round(ratio, 2),
            "anchor_rmse": round(anchor, 5),
            "anchor_speedup": (None if ratio_a is None
                               else round(ratio_a, 2)),
        }))
        if ratio_a is not None and ratio_a < 1.0:
            summary_ok = False
    return 0 if summary_ok else 1


if __name__ == "__main__":
    sys.exit(main())
