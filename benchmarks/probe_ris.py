"""RIS + many-light selection feature-cost probe (the r3n ledger style).

Prices the two round-4 NEE levers WHEN USED, step-level on the chip:

  * RIS (--nee-candidates M): M power-CDF candidates scored by the
    unshadowed full-BSDF target, one resampled -> still ONE shadow ray.
    Cost = the extra candidate scoring (M light points + M BSDF evals
    per NEE vertex); measured at M=1 (legacy graph), 4, 8.
  * many-light gather (PT_LIGHT_GATHER_MIN): searchsorted CDF + one
    packed row gather instead of the masked sum over all L lights.
    Measured on many_lights_demo (288 emitters) in both modes at M=1.

M=1 with a small table keeps the bit-identical legacy graph (gating
contract) -- this probe prices the levers, tests/test_ris.py +
tests/test_many_lights.py lock the values.

Run on TPU: python benchmarks/probe_ris.py
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
    size, spp, depth = (64, 1, 3) if quick else (512, 4, 4)

    def cfg(m):
        return RenderConfig(width=size, height=size, samples_per_pixel=spp,
                            max_depth=depth, samples_per_step=spp, seed=0,
                            background="black", nee_candidates=m)

    # The gather switch is decided at scene BUILD time; the 288-row demo
    # sits below the retuned default _GATHER_MIN (r4e), so force ONE
    # build per mode by monkeypatching the threshold.
    from pathtracing_tpu.ops import lights as lights_ops

    saved = lights_ops._GATHER_MIN
    try:
        lights_ops._GATHER_MIN = 1                   # force gather
        scene, cam_cfg = scenes.many_lights_demo()
        lights_ops._GATHER_MIN = 10 ** 9             # force masked-sum
        scene_masked, _ = scenes.many_lights_demo()
    finally:
        lights_ops._GATHER_MIN = saved
    cam = build_camera(cam_cfg, 1.0)
    n_lights = int(scene.lights.v0.shape[0])
    assert scene_masked.lights.packed is None
    assert scene.lights.packed is not None

    t_gather = timed(scene, cam, cfg(1))
    t_masked = timed(scene_masked, cam, cfg(1))
    print(json.dumps({
        "workload": f"many_lights_demo ({n_lights} emitters) {size}x{size} "
                    f"{spp}spp d{depth} megakernel, min of 3 warm reps",
        "masked_sum_s": round(t_masked, 4),
        "gather_s": round(t_gather, 4),
        "gather_vs_masked_pct": round(
            100.0 * (t_gather / t_masked - 1.0), 1),
    }), flush=True)

    # -- RIS candidate count (gather mode) ------------------------------
    base = None
    for m in (1, 4, 8):
        t = timed(scene, cam, cfg(m))
        base = t if base is None else base
        print(json.dumps({
            "workload": "same scene, RIS sweep",
            "M": m,
            "seconds": round(t, 4),
            "cost_vs_M1_pct": round(100.0 * (t / base - 1.0), 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
