"""The composed time-to-quality artifact (VERDICT r4 item 3).

With the raw ray rate earned-capped at ~1.4% of the 200 Mrays/s north
star (PERF.md r3e roofline), the repo's competitive performance story
is seconds-to-RMSE-X. r3/r4 measured the individual levers in separate
tables (LD ~2.25x, tile-adaptive 3.1x, denoiser ~10x effective spp);
this script measures the COMPOSED story in one committed table:

    {cornell_bsdf, spotlight_demo, cornell_mesh}
  x {uniform(iid), +LD, +LD+adaptive, +LD+adaptive+denoise}
  -> wall-clock seconds to reach RMSE 0.05 and 0.02 vs a converged
     independent-seed reference, interpolated on measured
     (seconds, RMSE) curves over a budget sweep, on the chip.

Temporal reuse composes on ORBIT sequences only (frame N reuses frame
N-1); its measured anchored win is 1.48x on the orbit workload
(PERF.md r4d, benchmarks/temporal_quality.py) and multiplies the
denoised column there — cited in the table footer rather than
re-measured here.

Output: one JSON line per (scene, method) + benchmarks/TIME_TO_QUALITY.md.
References are cached as benchmarks/adq_ref_<scene>_<size>.npz (shared
with adaptive_quality.py).

Run on TPU:  python benchmarks/time_to_quality.py
CPU smoke:   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu TTQ_QUICK=1 python ...
Env: TTQ_SCENES, TTQ_SIZE (256), TTQ_BUDGETS, TTQ_REF_SPP (4096),
     TTQ_TARGETS (0.05,0.02), TTQ_QUICK=1
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def sync(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(x))


def rmse(a, b) -> float:
    return float(np.sqrt(((np.asarray(a, np.float64)
                           - np.asarray(b, np.float64)) ** 2).mean()))


def reference(scene, cam, config, name, size, ref_spp):
    from pathtracing_tpu.models import progressive

    path = os.path.join(HERE, f"adq_ref_{name}_{size}.npz")
    if os.path.exists(path):
        with np.load(path) as d:
            if int(d["spp"]) >= ref_spp:
                return d["img"]
    cfg = dataclasses.replace(config, seed=997,
                              samples_per_pixel=ref_spp,
                              samples_per_step=8)
    state = progressive.init_state(cfg)
    for i in range(ref_spp // cfg.samples_per_step):
        state = progressive.render_step(state, scene, cam, cfg)
        if (i + 1) % 32 == 0:
            sync(state.spp)
    sync(state.accum)
    img = np.asarray(state.accum) / ref_spp
    np.savez_compressed(path, img=img, spp=ref_spp)
    return img


def run_uniform(scene, cam, config, budget):
    """Progressive uniform render to ``budget`` spp; returns
    (seconds, image)."""
    from pathtracing_tpu.models import progressive

    cfg = dataclasses.replace(config, samples_per_pixel=budget,
                              samples_per_step=min(4, budget))
    state = progressive.init_state(cfg)
    state = progressive.render_step(state, scene, cam, cfg)   # compile
    sync(state.accum)
    state = progressive.init_state(cfg)
    t0 = time.perf_counter()
    while int(state.spp) < budget:
        state = progressive.render_step(state, scene, cam, cfg)
    sync(state.accum)
    dt = time.perf_counter() - t0
    return dt, np.asarray(state.accum) / budget


def run_adaptive(scene, cam, config, budget, tile=8):
    from pathtracing_tpu.models import adaptive

    cfg = dataclasses.replace(config, samples_per_pixel=budget)
    tile = adaptive.pick_tile(cfg, tile)
    # Warm/compile pass at the SAME budget: tile_rounds jits on static
    # n_rounds, so a different warm budget leaves the timed region to
    # pay a ~30 s tunnel compile (the non-monotone adaptive timings in
    # the first r5 run).
    st, _ = adaptive.render_adaptive_tiles(scene, cam, cfg, tile=tile,
                                           budget_spp=budget,
                                           auto_uniform=1.5)
    sync(st.accum)
    t0 = time.perf_counter()
    # auto_uniform=1.5 = the CLI production default (--adaptive-auto):
    # the Neyman never-lose guard falls back to uniform waves on
    # variance-uniform scenes, so this column measures what a user of
    # --adaptive actually gets, not always-greedy.
    st, _ = adaptive.render_adaptive_tiles(scene, cam, cfg, tile=tile,
                                           budget_spp=budget,
                                           auto_uniform=1.5)
    sync(st.accum)
    dt = time.perf_counter() - t0
    return dt, np.asarray(adaptive.resolve_tiles(st, cfg, tile))


def main() -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass

    from pathtracing_tpu.models import scenes as scenes_mod
    from pathtracing_tpu.ops import denoise as denoise_mod
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    quick = bool(os.environ.get("TTQ_QUICK"))
    size = int(os.environ.get("TTQ_SIZE", 64 if quick else 256))
    ref_spp = int(os.environ.get("TTQ_REF_SPP",
                                 256 if quick else 4096))
    budgets = [int(b) for b in os.environ.get(
        "TTQ_BUDGETS", "4,16,64" if quick else "4,16,64,256,1024"
    ).split(",")]
    targets = [float(t) for t in os.environ.get(
        "TTQ_TARGETS", "0.05,0.02").split(",")]
    scene_names = os.environ.get(
        "TTQ_SCENES", "cornell_bsdf,spotlight_demo,cornell_mesh"
    ).split(",")

    rows = []
    for name in scene_names:
        if name == "cornell_mesh":
            scene, cam_cfg = scenes_mod.cornell_mesh(4 if quick else 6)
        else:
            scene, cam_cfg = scenes_mod.get_scene(name)
        cam = build_camera(cam_cfg, 1.0)
        # Must match adaptive_quality.py's reference config exactly —
        # the adq_ref_* caches are shared.
        base = RenderConfig(width=size, height=size,
                            samples_per_pixel=4, max_depth=6, seed=0,
                            samples_per_step=4,
                            background=scenes_mod.preferred_background(
                                name))
        ref = reference(scene, cam, base, name, size, ref_spp)

        methods = {
            "uniform": lambda b, cfg: run_uniform(scene, cam, cfg, b),
            "+LD": lambda b, cfg: run_uniform(scene, cam, cfg, b),
            "+LD+adaptive": lambda b, cfg: run_adaptive(
                scene, cam, cfg, b),
            "+LD+adaptive+denoise": None,   # derived below
        }
        wanted = os.environ.get(
            "TTQ_METHODS", "uniform,+LD,+LD+adaptive").split(",")
        curves = {}
        for method in ("uniform", "+LD", "+LD+adaptive"):
            if method not in wanted:
                continue
            cfg = dataclasses.replace(
                base, sampler="uniform" if method == "uniform" else "ld"
            )
            pts = []
            for b in budgets:
                dt, img = methods[method](b, cfg)
                e = rmse(img, ref)
                pts.append((dt, e, b))
                print(json.dumps({
                    "scene": name, "method": method, "budget_spp": b,
                    "seconds": round(dt, 3), "rmse": round(e, 5),
                }), flush=True)
                if method == "+LD+adaptive":
                    # Denoise composes on the adaptive result: fixed
                    # post-pass cost, measured once per budget (warm —
                    # the first call pays the jit compile, which is
                    # cache amortization, not per-frame cost).
                    cfgb = dataclasses.replace(cfg,
                                               samples_per_pixel=b)
                    den = np.asarray(denoise_mod.denoise_render(
                        scene, cam, cfgb, img, spp=b))
                    t0 = time.perf_counter()
                    den = np.asarray(denoise_mod.denoise_render(
                        scene, cam, cfgb, img, spp=b))
                    t_den = time.perf_counter() - t0
                    ed = rmse(den, ref)
                    curves.setdefault("+LD+adaptive+denoise",
                                      []).append((dt + t_den, ed, b))
                    print(json.dumps({
                        "scene": name,
                        "method": "+LD+adaptive+denoise",
                        "budget_spp": b,
                        "seconds": round(dt + t_den, 3),
                        "rmse": round(ed, 5),
                    }), flush=True)
            curves[method] = pts

        for method, pts in curves.items():
            row = {"scene": name, "method": method}
            for tgt in targets:
                row[f"s_to_{tgt}"] = seconds_to_target(pts, tgt)
            rows.append(row)
            print(json.dumps(row), flush=True)

    write_table(rows, targets, size, budgets)
    return 0


def seconds_to_target(pts, target):
    """Interpolate wall-clock to reach ``target`` RMSE on the measured
    curve (log-log, RMSE decreasing in time); None if never reached."""
    pts = sorted(pts)
    below = [(t, e) for t, e, *_ in pts if e <= target]
    if not below:
        return None
    t_hi, e_hi = below[0]
    above = [(t, e) for t, e, *_ in pts if t < t_hi and e > target]
    if not above:
        return round(t_hi, 2)
    t_lo, e_lo = above[-1]
    # log-linear interpolation in (log t, log e)
    f = (np.log(e_lo) - np.log(target)) / max(
        np.log(e_lo) - np.log(e_hi), 1e-9)
    return round(float(np.exp(
        np.log(t_lo) + f * (np.log(t_hi) - np.log(t_lo)))), 2)


def write_table(rows, targets, size, budgets):
    import jax

    out = os.path.join(HERE, "TIME_TO_QUALITY.md")
    with open(out, "w") as f:
        f.write("# Composed time-to-quality (seconds to RMSE target)\n\n")
        f.write(f"Backend: {jax.default_backend()}; {size}x{size}, "
                f"budgets {budgets} spp; converged independent-seed "
                "references; curves interpolated log-log. Methods "
                "stack: LD = stratified first-vertex sampler, adaptive "
                "= tile-granular variance-driven allocation, denoise = "
                "guided a-trous post-pass (biased — it can FLOOR above "
                "tight targets; '—' = target not reached).\n\n")
        hdr = "| scene | method |" + "".join(
            f" s@RMSE {t} |" for t in targets)
        f.write(hdr + "\n")
        f.write("|---|---|" + "---|" * len(targets) + "\n")
        for r in rows:
            cells = "".join(
                f" {r[f's_to_{t}'] if r[f's_to_{t}'] is not None else '—'} |"
                for t in targets)
            f.write(f"| {r['scene']} | {r['method']} |{cells}\n")
        f.write(
            "\nTemporal reuse (orbit sequences only) multiplies the "
            "denoised column a further **1.48x** on the measured orbit "
            "workload (PERF.md r4d; benchmarks/temporal_quality.py).\n"
        )
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
