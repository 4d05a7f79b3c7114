"""Benchmark harness: Mrays/s on the triangle-mesh Cornell scene (1 chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 200 Mrays/s/chip (BASELINE.json:5 north-star target) — rays
counted honestly as path segments actually traced (measured average path
length × pixels × spp), not max_depth × pixels.

Env knobs:
  BENCH_SCENE     (default cornell_mesh)   one of models.scenes.SCENES
  BENCH_WIDTH/HEIGHT (default 1920/1080)
  BENCH_SPP       (default 8)   samples accumulated during timing
  BENCH_DEPTH     (default 8)
  BENCH_ENGINE    (default megakernel)
  BENCH_QUICK=1   tiny config for CI smoke runs
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    import jax

    from pathtracing_tpu.models import megakernel, progressive, scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    quick = os.environ.get("BENCH_QUICK") == "1"
    scene_name = os.environ.get("BENCH_SCENE", "cornell_mesh")
    width = int(os.environ.get("BENCH_WIDTH", 256 if quick else 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 256 if quick else 1080))
    spp = int(os.environ.get("BENCH_SPP", 2 if quick else 8))
    depth = int(os.environ.get("BENCH_DEPTH", 4 if quick else 8))
    engine = os.environ.get("BENCH_ENGINE", "megakernel")
    spp_per_step = 1

    config = RenderConfig(
        width=width, height=height, samples_per_pixel=spp,
        max_depth=depth, samples_per_step=spp_per_step, seed=0,
        engine=engine,
    )
    if scene_name == "cornell_mesh":
        scene, cam_cfg = scenes.cornell_mesh(4 if quick else 6)
    else:
        scene, cam_cfg = scenes.get_scene(scene_name)
    camera = build_camera(cam_cfg, width / height)

    if engine == "wavefront":
        from pathtracing_tpu.models import wavefront as engine_mod

        step_fn = engine_mod.render_step
    else:
        step_fn = progressive.render_step

    # Measure the honest average path length (segments per camera sample).
    stats_cfg = RenderConfig(
        width=min(width, 256), height=min(height, 256),
        samples_per_pixel=1, max_depth=depth, seed=0,
    )
    stats_cam = build_camera(cam_cfg, stats_cfg.width / stats_cfg.height)
    avg_len = float(
        jax.jit(
            lambda: megakernel.measure_path_stats(
                scene, stats_cam, stats_cfg, 0
            )
        )()
    )

    state = progressive.init_state(config)
    # Warmup: compile + one step.
    state = step_fn(state, scene, camera, config)
    jax.block_until_ready(state.accum)

    n_steps = spp - 1
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step_fn(state, scene, camera, config)
    jax.block_until_ready(state.accum)
    dt = time.perf_counter() - t0

    rays = width * height * spp_per_step * n_steps * avg_len
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"Mrays/s/chip ({scene_name} {width}x{height} "
                          f"depth{depth} {engine}, avg_path={avg_len:.2f})",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 200.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
