"""BASELINE quality metric: 1080p Cornell at 1024 spp, RMSE recorded.

BASELINE.json:2 defines the quality target as per-pixel RMSE parity "vs
reference at 1024 spp". The reference cannot render this workload at all
(it is a 0-bounce ray caster — SURVEY.md §0), so "truth" is the converged
estimate itself and the honest metric is the per-pixel RMSE of the
1024-spp render **against the fully converged image**, which Monte Carlo
theory gives exactly from the sample variance: for per-step 1-spp images
x_1..x_n (independent, identically distributed, unbiased — the estimator
is unbiased and steps use disjoint counter-based RNG streams),

    Var[mean] = Var[x] / n          (per pixel/channel)
    E[RMSE(mean, truth)^2] = mean_pixels(Var[mean])

so RMSE_est = sqrt(mean(var_steps / n)). Bias is gated separately by the
suite's config-3 kernel-vs-oracle check (near-bitwise at matched seeds),
so variance is the only error term left.

The run is checkpointed (sum + sum-of-squares + step count, atomic npz
replace) and resumes exactly — per-step RNG is counter-based, so a crash
of the tunneled TPU worker costs at most QC_CKPT steps. Respects the
~2-minute dispatch limit by batching QC_STEP 1-spp samples per dispatch
in-graph (an inner scan over global sample ids — identical streams, far
fewer tunnel round-trips than the r3 one-dispatch-per-spp loop).
Checkpoints carry the sampler version (a sampler change restarts
rather than mixing streams — PERF.md r5a changed every LD stream).

Usage:  python benchmarks/quality_1024.py            (~25 min warm on one v5e)
        QC_SPP=64 python benchmarks/quality_1024.py  (quick variant)
Env:    QC_SPP (1024), QC_STEP (4), QC_CKPT (32, in spp),
        QC_WIDTH/HEIGHT (1920/1080), QC_DEPTH (8),
        QC_OUT (benchmarks/quality_1024.npz)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLER_VERSION = 2     # keep in lockstep with quality_ab.py


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )
    except Exception:
        pass

    from pathtracing_tpu.models import megakernel, scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    spp = int(os.environ.get("QC_SPP", 1024))
    step_n = max(1, int(os.environ.get("QC_STEP", 4)))
    if spp % step_n:
        raise SystemExit("QC_SPP must be divisible by QC_STEP")
    ckpt_every = int(os.environ.get("QC_CKPT", 32))
    ckpt_every = max(step_n, ckpt_every - ckpt_every % step_n)
    width = int(os.environ.get("QC_WIDTH", 1920))
    height = int(os.environ.get("QC_HEIGHT", 1080))
    depth = int(os.environ.get("QC_DEPTH", 8))
    out = os.environ.get(
        "QC_OUT", os.path.join(REPO, "benchmarks", "quality_1024.npz")
    )

    config = RenderConfig(
        width=width, height=height, samples_per_pixel=spp,
        max_depth=depth, samples_per_step=1, seed=0,
    )
    scene, cam_cfg = scenes.cornell_mesh(6)
    camera = build_camera(cam_cfg, width / height)
    seed = jnp.uint32(config.seed)

    @jax.jit
    def accum_step(m1, m2, first_sample):
        def body(carry, s):
            m1, m2 = carry
            img = megakernel.render_samples(
                scene, camera, config, s, 1, seed
            )
            return (m1 + img, m2 + img * img), None

        (m1, m2), _ = jax.lax.scan(
            body, (m1, m2), first_sample + jnp.arange(step_n)
        )
        return m1, m2

    start = 0
    if os.path.exists(out):
        data = np.load(out)
        if (int(data["width"]) == width and int(data["height"]) == height
                and int(data["depth"]) == depth
                and int(data.get("sampler_v", 1)) == SAMPLER_VERSION
                and int(data["n"]) % step_n == 0):
            start = int(data["n"])
            m1 = jnp.asarray(data["m1"])
            m2 = jnp.asarray(data["m2"])
            print(f"resuming at step {start} from {out}", file=sys.stderr)
        else:
            print("stale checkpoint (config/sampler mismatch) — "
                  "restarting", file=sys.stderr)
    if start == 0:
        m1 = jnp.zeros((height, width, 3), jnp.float32)
        m2 = jnp.zeros((height, width, 3), jnp.float32)

    def checkpoint(n):
        t = time.perf_counter()
        m1_np, m2_np = np.asarray(m1), np.asarray(m2)
        tmp = out + ".tmp.npz"
        np.savez(tmp, m1=m1_np, m2=m2_np, n=n, width=width,
                 height=height, depth=depth, sampler_v=SAMPLER_VERSION)
        os.replace(tmp, out)
        print(f"  ckpt @ {n} spp ({time.perf_counter() - t:.1f}s)",
              file=sys.stderr, flush=True)

    t_run = time.perf_counter()
    for n in range(start, spp, step_n):
        t0 = time.perf_counter()
        m1, m2 = accum_step(m1, m2, jnp.int32(n))
        done = n + step_n
        if done % ckpt_every == 0 or done >= spp:
            checkpoint(done)    # the fetch is also the step-batch sync
        elif n == start:
            float(jnp.sum(m1))  # surface compile errors on step one
            print(f"  step time ~{time.perf_counter() - t0:.1f}s "
                  f"(first, incl. compile)", file=sys.stderr, flush=True)

    n = spp
    m1_np, m2_np = np.asarray(m1, np.float64), np.asarray(m2, np.float64)
    mean = m1_np / n
    # Unbiased per-pixel variance of ONE 1-spp sample, then of the mean.
    var = np.maximum(m2_np / n - mean**2, 0.0) * (n / (n - 1))
    var_mean = var / n
    rmse_est = float(np.sqrt(var_mean.mean()))
    lum = float(mean.mean())
    result = {
        "metric": f"RMSE vs converged, {width}x{height} cornell_mesh "
                  f"depth{depth} @ {n} spp (variance-derived)",
        "rmse": round(rmse_est, 6),
        "rmse_rel_mean": round(rmse_est / max(lum, 1e-9), 6),
        "mean_radiance": round(lum, 6),
        "spp": n,
        "minutes": round((time.perf_counter() - t_run) / 60, 1),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "benchmarks", "QUALITY.md"), "w") as f:
        f.write("# BASELINE quality metric (BASELINE.json:2)\n\n")
        f.write(
            "Per-pixel RMSE of the 1024-spp render vs the converged "
            "image,\nderived from the per-step sample variance (see "
            "benchmarks/quality_1024.py\ndocstring for why this equals "
            "the BASELINE metric; bias is gated\nseparately by the "
            "suite's config-3 kernel-vs-oracle check).\n\n```json\n"
            + json.dumps(result, indent=2) + "\n```\n"
        )

    # Also write the render itself for eyeballing.
    from pathtracing_tpu.utils import image as image_mod

    png_path = os.path.join(REPO, "benchmarks", "quality_1024.png")
    image_mod.write_png(png_path, np.asarray(mean, np.float32))
    print(f"wrote {png_path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
