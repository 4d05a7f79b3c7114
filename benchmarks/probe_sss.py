"""Subsurface-scattering feature-cost probe (the r3n ledger style).

Prices the interior random-walk WHEN USED: the sss_demo scene as
committed (milk/jade/wax spheres with ``scattering`` columns) vs the
SAME geometry with scattering stripped (plain absorbing dielectrics) —
the delta is the per-bounce interior flight sampling + HG phase +
the extra interior path length the walk adds. Scatter-free scenes pay
exactly zero by the gating contract (flagship graph hash unchanged,
tests/test_sss.py); this probe measures the used cost.

Run on TPU: python benchmarks/probe_sss.py
CPU smoke:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PROBE_QUICK=1 python ...
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

    quick = bool(os.environ.get("PROBE_QUICK"))
    size, spp, depth = (64, 1, 4) if quick else (512, 4, 8)
    config = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                          max_depth=depth, samples_per_step=spp, seed=0,
                          background="gradient")

    scene_sss, cam_cfg = scenes.sss_demo()
    cam = build_camera(cam_cfg, 1.0)
    assert scene_sss.mat_interior is not None

    # Same geometry/materials with the scattering column zeroed at the
    # pytree level (None = the feature gate): plain absorbing glass.
    scene_plain = scene_sss._replace(mat_interior=None)

    t_plain = timed(scene_plain, cam, config)
    t_sss = timed(scene_sss, cam, config)
    print(json.dumps({
        "workload": f"sss_demo {size}x{size} {spp}spp d{depth} "
                    "megakernel, min of 3 warm reps",
        "plain_dielectric_s": round(t_plain, 4),
        "sss_s": round(t_sss, 4),
        "cost_pct": round(100.0 * (t_sss / t_plain - 1.0), 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
