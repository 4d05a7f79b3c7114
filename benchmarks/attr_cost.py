"""Measure the per-step cost of the surface-attribute resolve (PERF.md
r3g/r3m): cornell_mesh(6)-shaped scene rendered flat vs with smooth
normals, 768x512 depth-8 megakernel, 3-step warm average on the current
backend. The smooth build exercises the attribute path every bounce
wave; the flat build is the attribute-free baseline."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))

from pathtracing_tpu.models import scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.models import progressive
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import RenderConfig


def build(smooth: bool):
    b = SceneBuilder()
    scenes._cornell_walls(b)
    body = b.lambertian((0.6, 0.55, 0.45))
    verts, faces = scenes.icosphere(6, radius=0.5)
    verts = verts + np.array([0.0, -0.5, 0.0])
    b.add_mesh(verts, faces, body, smooth=smooth)
    return b.build(), scenes.CORNELL_CAMERA


def time_steps(sc, cam_cfg, reps=3):
    cfg = RenderConfig(width=768, height=512, samples_per_pixel=64,
                       max_depth=8, samples_per_step=1, seed=0)
    cam = build_camera(cam_cfg, 768 / 512)
    state = progressive.init_state(cfg)
    step = progressive.render_step
    state = step(state, sc, cam, config=cfg)          # compile + warm
    float(jnp.sum(state.accum))                       # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        state = step(state, sc, cam, config=cfg)
        float(jnp.sum(state.accum))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    for smooth in (False, True):
        sc, cam = build(smooth)
        ms = time_steps(sc, cam)
        print(f"smooth={smooth}: {ms:.0f} ms/step "
              f"(attr_pack={'yes' if sc.attr_pack is not None else 'no'})",
              flush=True)


if __name__ == "__main__":
    main()
