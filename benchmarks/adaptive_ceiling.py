"""Adaptive-sampling ceiling: the Neyman-allocation bound per scene.

Band-level adaptive sampling can at best allocate samples ∝ per-band
noise sigma (Neyman allocation). Against uniform allocation the image
MSE improves by exactly

    gain = mean_b(sigma_b^2) / (mean_b(sigma_b))^2     (>= 1, Cauchy-Schwarz)

so the wall-clock time-to-quality win is bounded by ``gain`` times the
per-sample overhead ratio — a property of the SCENE's variance
concentration, not of the scheduler. This probe measures sigma_b from a
uniform N-spp run (per-pixel luminance second moments, the same
statistic the scheduler scores) and prints the bound next to the pixel-
level bound (band_rows = 1 row granularity) for context.

Run on TPU: python benchmarks/adaptive_ceiling.py
Env: ACL_SCENES (cornell_bsdf,spotlight_demo), ACL_SIZE (256),
     ACL_SPP (32), ACL_BAND_ROWS (4).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    cache = (".jax_cache" if jax.default_backend() != "cpu"
             else ".jax_cache_cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, cache))
    except Exception:
        pass

    from pathtracing_tpu.models import megakernel, scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    size = int(os.environ.get("ACL_SIZE", 256))
    spp = int(os.environ.get("ACL_SPP", 32))
    band_rows = int(os.environ.get("ACL_BAND_ROWS", 4))
    names = os.environ.get(
        "ACL_SCENES", "cornell_bsdf,spotlight_demo"
    ).split(",")

    lum_w = np.asarray([0.2126, 0.7152, 0.0722], np.float32)

    for name in names:
        scene, cam_cfg = scenes.get_scene(name)
        config = RenderConfig(
            width=size, height=size, samples_per_pixel=spp, max_depth=6,
            seed=0, samples_per_step=1,
            background=scenes.preferred_background(name),
        )
        cam = build_camera(cam_cfg, 1.0)

        @jax.jit
        def step(m1, m2, i):
            img = megakernel.render_samples(
                scene, cam, config, i, 1, jnp.uint32(0)
            )
            lum = img @ jnp.asarray(lum_w)
            return m1 + lum, m2 + lum * lum

        m1 = jnp.zeros((size, size), jnp.float32)
        m2 = jnp.zeros_like(m1)
        for i in range(spp):
            m1, m2 = step(m1, m2, jnp.int32(i))
        m1, m2 = np.asarray(m1, np.float64), np.asarray(m2, np.float64)
        mean = m1 / spp
        var = np.maximum(m2 / spp - mean**2, 0.0) * spp / (spp - 1)

        def bound(rows):
            v_b = var.reshape(size // rows, rows * size).mean(axis=1)
            s_b = np.sqrt(v_b)
            return float(v_b.mean() / max(s_b.mean() ** 2, 1e-30))

        def bound_tile(t):
            v_b = var.reshape(size // t, t, size // t, t).mean(
                axis=(1, 3)
            )
            s_b = np.sqrt(v_b)
            return float(v_b.mean() / max(s_b.mean() ** 2, 1e-30))

        print(json.dumps({
            "scene": name, "size": size, "spp": spp,
            "neyman_gain_band": round(bound(band_rows), 3),
            "neyman_gain_row": round(bound(1), 3),
            "neyman_gain_tile16": round(bound_tile(16), 3),
            "neyman_gain_tile8": round(bound_tile(8), 3),
            "neyman_gain_tile4": round(bound_tile(4), 3),
            "neyman_gain_pixel": round(
                float(var.mean() / max(np.sqrt(var).mean() ** 2, 1e-30)),
                3,
            ),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
