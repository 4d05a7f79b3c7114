"""Geometry-scaling demo: flat-VMEM kernel vs HBM-paged streaming.

Measures traversal-wave throughput across scene sizes, including one
past the whole-in-VMEM budget (the round-1 hard cap at ~1.5M tris):

  level 6        82k tris   5.6 MB Woop   flat kernel
  level 7       328k tris    22 MB Woop   flat kernel
  pair@8       2.62M tris   201 MB Woop   HBM-paged (10+ pages)

Prints one JSON line per scene. Run on the TPU (serialize — PERF.md):
    python benchmarks/scale_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_pair_scene(level: int):
    """Two offset icospheres in the Cornell box — 2x the tris of
    cornell_mesh(level) with distinct spatial extents per page."""
    import numpy as np

    from pathtracing_tpu.models.scenes import (_cornell_walls, icosphere,
                                               CORNELL_CAMERA)
    from pathtracing_tpu.models.scene import SceneBuilder

    b = SceneBuilder()
    _cornell_walls(b)
    verts, faces = icosphere(level, radius=0.35)
    m1 = b.lambertian((0.6, 0.55, 0.45))
    m2 = b.metal((0.8, 0.7, 0.6), 0.05)
    b.add_mesh(verts + np.array([-0.35, -0.6, -0.1]), faces, m1)
    b.add_mesh(verts + np.array([0.35, -0.55, 0.25]), faces, m2)
    return b.build(), CORNELL_CAMERA


def main() -> int:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp

    from pathtracing_tpu.models import progressive, scenes, wavefront
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    res = int(os.environ.get("SCALE_RES", "256"))
    cases = os.environ.get("SCALE_CASES", "6,7,pair8").split(",")

    for case in cases:
        t_build = time.perf_counter()
        if case.startswith("pair"):
            scene, cam_cfg = build_pair_scene(int(case[4:]))
        else:
            scene, cam_cfg = scenes.cornell_mesh(int(case))
        build_s = time.perf_counter() - t_build
        camera = build_camera(cam_cfg, 1.0)
        ntri = int(scene.tri_v0.shape[0])
        paged = scene.pages is not None
        config = RenderConfig(
            width=res, height=res, samples_per_pixel=3, max_depth=4,
            samples_per_step=1, seed=0, engine="wavefront",
        )
        state = progressive.init_state(config)
        state = wavefront.render_step(state, scene, camera, config)
        float(jnp.sum(state.accum))  # warm/compile
        t0 = time.perf_counter()
        for _ in range(2):
            state = wavefront.render_step(state, scene, camera, config)
        float(jnp.sum(state.accum))
        dt = (time.perf_counter() - t0) / 2
        segs = float(wavefront.count_segments(scene, camera, config, 0))
        print(json.dumps({
            "case": case, "tris": ntri,
            "woop_mb": round(scene.clusters.woop.size * 4 / 1e6, 1),
            "paged": paged,
            "pages": (int(scene.pages.node_box.shape[0]) if paged
                      else 1),
            "build_s": round(build_s, 1),
            "step_s": round(dt, 2),
            "mrays": round(segs / dt / 1e6, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
