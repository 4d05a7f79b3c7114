"""Full-step decomposition: where one render step spends its time.

Times render-step variants (feature toggles, same workload) so
step-level changes can be attributed: wavefront full, NEE off, and the
megakernel engine (with/without NEE). Mrays/s uses the honest segment
counter of the FULL config for every row, so rows are comparable as
"same work, different feature cost" — a row that traces fewer segments
(no-nee) shows up FASTER than its own honest rate, deliberately.

(A ray_sort toggle used to live here; since the DNF sort policy it
compiles to the identical program on DNF-routed scenes and was dropped —
sort effects are measured per-wave in kernel_micro.py instead.)

Usage: python benchmarks/step_decomp.py      (TPU; ~minutes warm cache)
Env: DECOMP_RES (default 768), DECOMP_DEPTH (8), DECOMP_SCENE level (6).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )

    from pathtracing_tpu.models import progressive, scenes, wavefront
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    res = int(os.environ.get("DECOMP_RES", "768"))
    depth = int(os.environ.get("DECOMP_DEPTH", "8"))
    level = int(os.environ.get("DECOMP_SCENE", "6"))

    scene, cam_cfg = scenes.cornell_mesh(level)
    camera = build_camera(cam_cfg, 1.0)

    base = RenderConfig(
        width=res, height=res, samples_per_pixel=4, max_depth=depth,
        samples_per_step=1, seed=0, engine="wavefront",
    )
    segments = float(wavefront.count_segments(scene, camera, base, 0))

    variants = {
        "full": base,
        "no_nee": dataclasses.replace(base, nee=False),
        "megakernel": dataclasses.replace(base, engine="megakernel"),
        "megakernel_no_nee": dataclasses.replace(
            base, engine="megakernel", nee=False
        ),
    }

    for name, config in variants.items():
        step = (progressive.render_step if config.engine == "megakernel"
                else wavefront.render_step)
        state = progressive.init_state(config)
        state = step(state, scene, camera, config)
        float(jnp.sum(state.accum))  # hard sync (axon: block_until_ready no-op)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            state = step(state, scene, camera, config)
        float(jnp.sum(state.accum))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 1),
            "mrays_vs_full_segments": round(segments / dt / 1e6, 2),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
