"""Temporal-reuse quality: orbit frames with/without reprojection.

VERDICT r3 item 3's done-criterion: an orbit sequence at LOW spp whose
temporally-blended frames match (or beat) the RMSE of today's
higher-spp from-scratch frames. For each orbit pose this sweeps:

  raw-N:       N spp rendered from scratch (the reference's model —
               its windowed loop re-renders every frame,
               /root/reference/RayTracing/App.cs:39-42)
  temporal-N:  N spp + reprojected history blend (models/temporal.py)

against a per-pose converged reference, scoring the SECOND half of the
sequence (history warmed). Prints one JSON line per method with the
mean RMSE and per-frame seconds, plus a summary with the effective
sample multiplier (what raw spp the temporal frames are worth).

Run on the TPU (one process at a time): python benchmarks/temporal_quality.py
CPU smoke: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu TQ_QUICK=1 python ...
Env: TQ_SIZE (256), TQ_FRAMES (16), TQ_ARC (60), TQ_SPP (4),
     TQ_RAW_SPP (4,16), TQ_REF_SPP (512), TQ_SCENE (cornell_bsdf).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    cache = ".jax_cache" if backend != "cpu" else ".jax_cache_cpu"
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, cache))
    except Exception:
        pass

    from pathtracing_tpu.models import megakernel, scenes, temporal
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    quick = os.environ.get("TQ_QUICK") == "1"
    size = int(os.environ.get("TQ_SIZE", 64 if quick else 256))
    n_frames = int(os.environ.get("TQ_FRAMES", 8 if quick else 16))
    arc_deg = float(os.environ.get("TQ_ARC", 60.0))
    spp = int(os.environ.get("TQ_SPP", 4))
    raw_spps = tuple(
        int(x) for x in os.environ.get("TQ_RAW_SPP", "4,16").split(",")
    )
    ref_spp = int(os.environ.get("TQ_REF_SPP", 32 if quick else 512))
    scene_name = os.environ.get("TQ_SCENE", "cornell_bsdf")
    depth = 6

    scene, cam_cfg = scenes.get_scene(scene_name)
    config = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                          max_depth=depth, samples_per_step=spp, seed=0)

    base = np.asarray(cam_cfg.position, np.float32)
    target = np.asarray(cam_cfg.look_at, np.float32)
    rel = base - target
    r_xz = math.hypot(float(rel[0]), float(rel[2]))
    phi0 = math.atan2(float(rel[0]), float(rel[2]))
    arc = math.radians(arc_deg)

    def pose(i):
        phi = phi0 + arc * (i / (n_frames - 1) - 0.5)
        pos = target + np.array(
            [r_xz * math.sin(phi), float(rel[1]), r_xz * math.cos(phi)],
            np.float32,
        )
        cc = dataclasses.replace(cam_cfg, position=tuple(map(float, pos)))
        return build_camera(cc, 1.0)

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def frame(camera, seed, n):
        # render_samples returns the SUM over n samples; frames are means.
        return megakernel.render_samples(
            scene, camera, config, jnp.int32(0), n, seed
        ) / jnp.float32(n)

    def sync(x):
        return float(jnp.sum(x))

    score_from = n_frames // 2
    cams = [pose(i) for i in range(n_frames)]

    # Converged per-pose references (cached on disk; seed disjoint).
    ref_path = os.path.join(
        REPO, "benchmarks",
        # The arc is part of the key: the cached refs are PER-POSE.
        f"tq_ref_{scene_name}_{size}_{n_frames}_{ref_spp}"
        + ("" if arc_deg == 60.0 else f"_a{arc_deg:g}") + ".npz",
    )
    if os.path.exists(ref_path):
        refs = np.load(ref_path)["refs"]
    else:
        refs = []
        for i in range(score_from, n_frames):
            acc = np.zeros((size, size, 3), np.float64)
            chunk = 64
            for s0 in range(0, ref_spp, chunk):
                n = min(chunk, ref_spp - s0)
                img = frame(cams[i], jnp.uint32(90000 + s0), n)
                acc += np.asarray(img, np.float64) * n
            refs.append(acc / ref_spp)
            print(f"ref frame {i} done", file=sys.stderr, flush=True)
        refs = np.stack(refs).astype(np.float32)
        np.savez_compressed(ref_path, refs=refs)

    def rmse(a, i):
        return float(np.sqrt(((np.asarray(a, np.float64)
                               - refs[i - score_from]) ** 2).mean()))

    results = {}
    # --- raw from-scratch frames at each budget ----------------------
    for rspp in raw_spps:
        errs, secs = [], []
        sync(frame(cams[0], jnp.uint32(0), rspp))  # warm
        for i in range(n_frames):
            t0 = time.perf_counter()
            img = frame(cams[i], jnp.uint32(1000 + i), rspp)
            sync(img)
            secs.append(time.perf_counter() - t0)
            if i >= score_from:
                errs.append(rmse(img, i))
        row = {"method": f"raw-{rspp}", "spp": rspp,
               "rmse_mean": round(float(np.mean(errs)), 6),
               "sec_per_frame": round(float(np.median(secs)), 4)}
        results[f"raw-{rspp}"] = row
        print(json.dumps(row), flush=True)

    # --- temporal sequence at the low budget --------------------------
    tstate = temporal.init_state(config)
    cam_prev = None
    errs, secs = [], []
    for i in range(n_frames):
        t0 = time.perf_counter()
        cur = frame(cams[i], jnp.uint32(1000 + i), spp)
        out_dev, tstate = temporal.advance(
            tstate, cur, scene, cams[i],
            cams[i] if cam_prev is None else cam_prev, config,
        )
        cam_prev = cams[i]
        sync(out_dev)
        if i == 0:
            t0 = time.perf_counter()  # exclude compile from timing
            continue
        secs.append(time.perf_counter() - t0)
        if i >= score_from:
            errs.append(rmse(out_dev, i))
    row = {"method": f"temporal-{spp}", "spp": spp,
           "rmse_mean": round(float(np.mean(errs)), 6),
           "sec_per_frame": round(float(np.median(secs)), 4)}
    results[f"temporal-{spp}"] = row
    print(json.dumps(row), flush=True)

    # --- the shipped pipeline: temporal + a-trous denoise --------------
    # (what `--orbit --temporal --denoise` produces; the SVGF pairing —
    # temporal accumulation feeds the spatial filter, sigma narrowed by
    # the per-pixel history's effective spp).
    from pathtracing_tpu.ops import denoise as denoise_mod

    tstate = temporal.init_state(config)
    cam_prev = None
    errs, secs = [], []
    for i in range(n_frames):
        t0 = time.perf_counter()
        cur = frame(cams[i], jnp.uint32(1000 + i), spp)
        out_dev, tstate = temporal.advance(
            tstate, cur, scene, cams[i],
            cams[i] if cam_prev is None else cam_prev, config,
        )
        cam_prev = cams[i]
        # Quantize the effective spp to power-of-2 buckets: it is a
        # static jit arg of the denoiser, and the history mean drifts
        # every frame — buckets keep it to a handful of compiles.
        hist = max(1.0, float(jnp.mean(tstate.hist_len)))
        spp_eff = spp * (2 ** int(round(math.log2(hist))) if hist > 1
                         else 1)
        den = denoise_mod.denoise_render(
            scene, cams[i], config, out_dev, spp=spp_eff
        )
        sync(den)
        if i == 0:
            t0 = time.perf_counter()
            continue
        secs.append(time.perf_counter() - t0)
        if i >= score_from:
            errs.append(rmse(den, i))
    row = {"method": f"temporal+denoise-{spp}", "spp": spp,
           "rmse_mean": round(float(np.mean(errs)), 6),
           "sec_per_frame": round(float(np.median(secs)), 4)}
    results[f"temporal+denoise-{spp}"] = row
    print(json.dumps(row), flush=True)

    # --- summary: effective-spp multiplier ----------------------------
    # MC noise scales 1/sqrt(spp): effective spp of the temporal frames
    # = spp * (rmse_raw(spp) / rmse_temporal)^2.
    r_raw = results[f"raw-{spp}"]["rmse_mean"]
    r_tmp = results[f"temporal-{spp}"]["rmse_mean"]
    summary = {
        "scene": scene_name, "size": size, "frames": n_frames,
        "arc_deg": arc_deg,
        "rmse_improvement": round(r_raw / r_tmp, 3),
        "effective_spp": round(spp * (r_raw / r_tmp) ** 2, 1),
        "beats_raw": [
            r["method"] for k, r in results.items()
            if k.startswith("raw-") and r["rmse_mean"] >= r_tmp
        ],
    }
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
