"""Full benchmark suite over the BASELINE.json eval configs.

Emits one JSON line per config plus a Markdown table
(benchmarks/RESULTS.md). The driver-facing single-number benchmark stays
in /bench.py; this suite is the §6 metric table from SURVEY.md — staged
configs 1-5 with throughput and convergence (RMSE vs a converged render
of the same scene; per-pixel RMSE is the BASELINE.json quality metric).

Usage:
    python benchmarks/suite.py            # full (TPU, ~10 min warm-cache)
    SUITE_QUICK=1 python benchmarks/suite.py   # smoke (CI / CPU)

Config 5 (multi-chip) runs on whatever mesh the process can build; with
one real chip it degenerates to a 1x1 mesh and is reported as such (the
virtual 8-device CPU mesh path is exercised by tests/test_parallel.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x))


def run_progressive(scene, camera, config, engine="megakernel"):
    """Render to config.samples_per_pixel; returns (image, seconds,
    segments/step)."""
    import numpy as np

    from pathtracing_tpu.models import progressive, wavefront

    step_fn = (wavefront.render_step if engine == "wavefront"
               else progressive.render_step)
    state = progressive.init_state(config)
    state = step_fn(state, scene, camera, config)  # warmup/compile
    sync(state.accum)
    state = progressive.init_state(config)
    t0 = time.perf_counter()
    while int(state.spp) < config.samples_per_pixel:
        state = step_fn(state, scene, camera, config)
    sync(state.accum)
    dt = time.perf_counter() - t0
    segments = int(
        __import__("pathtracing_tpu.models.wavefront",
                   fromlist=["count_segments"]).count_segments(
            scene, camera, config, config.seed
        )
    )
    img = np.asarray(state.accum) / max(int(state.spp), 1)
    return img, dt, segments


def main() -> int:
    quick = os.environ.get("SUITE_QUICK") == "1"

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
    except Exception:
        pass

    from pathtracing_tpu.models import scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig
    from pathtracing_tpu.utils.image import rmse

    scale = 4 if quick else 1
    rows = []

    def report(name, desc, mrays, seconds, rmse_val=None):
        row = {
            "config": name, "description": desc,
            "mrays_per_s": round(mrays, 3),
            "seconds": round(seconds, 2),
            "rmse_vs_converged": (round(rmse_val, 5)
                                  if rmse_val is not None else None),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- Config 1: Cornell sphere, 256x256, 4 spp, Lambertian ----------
    res = 256 // scale
    scene, cam_cfg = scenes.cornell_sphere()
    camera = build_camera(cam_cfg, 1.0)
    cfg = RenderConfig(width=res, height=res, samples_per_pixel=4,
                       max_depth=5, samples_per_step=4, seed=0)
    img, dt, segs = run_progressive(scene, camera, cfg)
    ref_cfg = RenderConfig(width=res, height=res,
                           samples_per_pixel=64 if quick else 512,
                           max_depth=5,
                           samples_per_step=32 if quick else 64, seed=1)
    ref_img, _, _ = run_progressive(scene, camera, ref_cfg)
    report("1-cornell-sphere", f"{res}x{res} 4spp Lambertian+NEE",
           segs / dt / 1e6, dt, rmse(img, ref_img))

    # ---- Config 2: full BSDF set, 512x512 progressive ------------------
    res = 512 // scale
    scene, cam_cfg = scenes.cornell_bsdf()
    camera = build_camera(cam_cfg, 1.0)
    cfg = RenderConfig(width=res, height=res, samples_per_pixel=16,
                       max_depth=6, samples_per_step=4, seed=0)
    img, dt, segs = run_progressive(scene, camera, cfg)
    ref_cfg = RenderConfig(width=res, height=res,
                           samples_per_pixel=64 if quick else 256,
                           max_depth=6, samples_per_step=32, seed=1)
    ref_img, _, _ = run_progressive(scene, camera, ref_cfg)
    report("2-cornell-bsdf", f"{res}x{res} 16spp diffuse+metal+glass",
           segs * (16 // 4) / dt / 1e6, dt, rmse(img, ref_img))

    # ---- Config 3: triangle mesh + BVH/clusters ------------------------
    scene, cam_cfg = scenes.cornell_mesh(4 if quick else 6)
    res = 512 // scale
    camera = build_camera(cam_cfg, 1.0)
    cfg = RenderConfig(width=res, height=res, samples_per_pixel=4,
                       max_depth=6, samples_per_step=1, seed=0)
    _, dt, segs = run_progressive(scene, camera, cfg)
    ntri = int(scene.tri_v0.shape[0])
    report("3-cornell-mesh", f"{res}x{res} 4spp {ntri}-tri mesh",
           segs * 4 / dt / 1e6, dt)

    # ---- Config 4: wavefront, 1080p, RR at depth 8 (headline) ----------
    w, h = (480, 270) if quick else (1920, 1080)
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=2,
                       max_depth=8, samples_per_step=1, seed=0,
                       engine="wavefront")
    camera = build_camera(cam_cfg, w / h)
    _, dt, segs = run_progressive(scene, camera, cfg, engine="wavefront")
    report("4-wavefront-1080p", f"{w}x{h} wavefront depth8 {ntri}-tri",
           segs * 2 / dt / 1e6, dt)

    # ---- Config 5: multi-chip tile mesh --------------------------------
    import jax as _jax

    n_dev = len(_jax.devices())
    from pathtracing_tpu.parallel import mesh as mesh_mod
    from pathtracing_tpu.parallel import render as prender
    from pathtracing_tpu.models import progressive as prog

    mesh = mesh_mod.make_mesh(n_dev, 1)
    res = 256 // scale
    scene5, cam5 = scenes.cornell_sphere()
    cfg5 = RenderConfig(width=res, height=res, samples_per_pixel=8,
                        max_depth=5, samples_per_step=4, seed=0)
    cam = build_camera(cam5, 1.0)
    step = prender.make_sharded_step(mesh, cfg5)
    st = prender.init_sharded_state(mesh, cfg5)
    st = step(st, scene5, cam)
    sync(st.accum)
    t0 = time.perf_counter()
    st = step(st, scene5, cam)
    sync(st.accum)
    dt = time.perf_counter() - t0
    # Honest segment count for the same config on one device (the sharded
    # step follows identical paths; segments are engine-independent).
    from pathtracing_tpu.models import wavefront as wf

    segs5 = int(wf.count_segments(scene5, cam, cfg5, cfg5.seed))
    report("5-multichip", f"{n_dev}-device tile mesh {res}x{res}",
           segs5 / dt / 1e6, dt)

    # ---- Emit the table ------------------------------------------------
    out = os.path.join(REPO, "benchmarks", "RESULTS.md")
    with open(out, "w") as f:
        f.write("# Benchmark suite results\n\n")
        f.write(f"Backend: {_jax.default_backend()}, "
                f"{n_dev} device(s)\n\n")
        f.write("| config | description | Mrays/s | seconds | RMSE |\n")
        f.write("|---|---|---|---|---|\n")
        for r in rows:
            f.write(
                f"| {r['config']} | {r['description']} | "
                f"{r['mrays_per_s']} | {r['seconds']} | "
                f"{r['rmse_vs_converged']} |\n"
            )
    print(f"wrote {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
