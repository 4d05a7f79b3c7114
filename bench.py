"""Benchmark harness: Mrays/s on the triangle-mesh Cornell scene (1 chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 200 Mrays/s/chip (BASELINE.json:5 north-star target) — rays
counted honestly as path segments actually traced (the wavefront engine's
segment counter), not max_depth × pixels.

Flagship configuration: megakernel engine (chunked image-order waves +
depth-3 live-first compaction) + dense nearest-first Pallas traversal,
1080p, 82k-triangle Cornell mesh, depth 8. (The wavefront engine's pool
order decays over refills — measured slower since the DNF kernels made
unsorted image-order waves the fast path; BENCH_ENGINE=wavefront still
selects it.)

Env knobs:
  BENCH_SCENE     (default cornell_mesh)   one of models.scenes.SCENES
  BENCH_WIDTH/HEIGHT (default 1920/1080)
  BENCH_STEPS     (default 4)   timed 1-spp steps after warmup
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
    import numpy as np

    from pathtracing_tpu.models import progressive, scenes, wavefront
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    if os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"),
            )
        except Exception:
            pass

    quick = os.environ.get("BENCH_QUICK") == "1"
    scene_name = os.environ.get("BENCH_SCENE", "cornell_mesh")
    width = int(os.environ.get("BENCH_WIDTH", 256 if quick else 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 256 if quick else 1080))
    n_steps = int(os.environ.get("BENCH_STEPS", 1 if quick else 4))
    depth = int(os.environ.get("BENCH_DEPTH", 4 if quick else 8))
    engine = os.environ.get("BENCH_ENGINE", "megakernel")

    config = RenderConfig(
        width=width, height=height, samples_per_pixel=n_steps + 1,
        max_depth=depth, samples_per_step=1, seed=0, engine=engine,
    )
    if scene_name == "cornell_mesh":
        scene, cam_cfg = scenes.cornell_mesh(4 if quick else 6)
    else:
        scene, cam_cfg = scenes.get_scene(scene_name)
    camera = build_camera(cam_cfg, width / height)

    if engine == "megakernel":
        step_fn = progressive.render_step
    else:
        step_fn = wavefront.render_step

    state = progressive.init_state(config)
    # Warmup: compile + one step.
    state = step_fn(state, scene, camera, config)
    np.asarray(state.accum)  # hard sync (block_until_ready is a no-op on
    #                          the axon tunnel platform)

    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step_fn(state, scene, camera, config)
    np.asarray(state.accum)
    dt = time.perf_counter() - t0

    # Honest ray count: segments actually traced for one 1-spp step
    # (engine-independent — both engines follow identical paths).
    segments = int(
        wavefront.count_segments(scene, camera, config, config.seed)
    )

    rays = segments * n_steps
    mrays = rays / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"Mrays/s/chip ({scene_name} {width}x{height} "
                          f"depth{depth} {engine}, "
                          f"avg_path={segments / (width * height):.2f})",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 200.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
