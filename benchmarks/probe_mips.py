"""Mip/LOD feature-cost probe (the r3n ledger style).

Measures the step-level cost of ray-cone trilinear mip sampling on a
textured scene: the SAME scene built without mips (bilinear atlas) and
with mips (pyramid atlas + per-path cone state + trilinear lookups),
megakernel step at 512x512, min of 3 warm reps. Grid-free/mip-free
scenes pay zero by the gating contract (graph-hash checked); this
probe prices the feature WHEN USED.

Run on TPU: python benchmarks/probe_mips.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass

    from pathtracing_tpu.models import progressive, scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    def timed(scene, cam, config):
        state = progressive.init_state(config)
        state = progressive.render_step(state, scene, cam, config)
        float(jnp.sum(state.accum))          # warm/compile
        best = 1e30
        for _ in range(3):
            state = progressive.init_state(config)
            t0 = time.perf_counter()
            state = progressive.render_step(state, scene, cam, config)
            float(jnp.sum(state.accum))
            best = min(best, time.perf_counter() - t0)
        return best

    size, spp, depth = 512, 4, 4
    config = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                          max_depth=depth, samples_per_step=spp, seed=0,
                          background="black")

    # textured_demo builds WITHOUT mips by default; the retrofit adds
    # the pyramid to the same scene.
    scene_plain, cam_cfg = scenes.textured_demo()
    cam = build_camera(cam_cfg, 1.0)
    from pathtracing_tpu.ops import texture as texture_ops

    scene_mips = scene_plain._replace(
        textures=texture_ops.add_mips(scene_plain.textures)
    )

    t_plain = timed(scene_plain, cam, config)
    t_mips = timed(scene_mips, cam, config)
    print(json.dumps({
        "workload": f"textured_demo {size}x{size} {spp}spp d{depth} "
                    "megakernel, min of 3 warm reps",
        "bilinear_s": round(t_plain, 4),
        "mips_s": round(t_mips, 4),
        "cost_pct": round(100.0 * (t_mips / t_plain - 1.0), 1),
    }, ), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
