"""Flagship-graph fingerprint: sha256 of the traced jaxpr of one bench step.

The zero-cost feature-gating contract says scenes that don't use a
feature keep a bit-identical jit graph.  This prints a stable hash of
the closed jaxpr for the flagship benchmark step (cornell_mesh,
1080p-shaped, depth 8, megakernel, cluster_pallas traversal) so the
contract can be checked per COMMIT on CPU — tracing is
backend-independent and needs no chip.  Used to bisect the round-3
2.76→2.47 headline regression (VERDICT r4 item 1).

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/graph_hash.py [repo_root] [width height]
"""

from __future__ import annotations

import hashlib
import os
import sys

root = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, root)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

width = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
height = int(sys.argv[3]) if len(sys.argv) > 3 else 1080


def main() -> int:
    import jax

    from pathtracing_tpu.models import progressive, scenes
    from pathtracing_tpu.ops.camera import build_camera
    from pathtracing_tpu.utils.config import RenderConfig

    config = RenderConfig(
        width=width, height=height, samples_per_pixel=2, max_depth=8,
        samples_per_step=1, seed=0, engine="megakernel",
        traversal="cluster_pallas",
    )
    scene, cam_cfg = scenes.cornell_mesh(6)
    camera = build_camera(cam_cfg, width / height)
    state = progressive.init_state(config)

    jaxpr = jax.make_jaxpr(
        lambda st, sc, cam: progressive.render_step(st, sc, cam, config)
    )(state, scene, camera)
    text = str(jaxpr)
    digest = hashlib.sha256(text.encode()).hexdigest()
    print(f"{digest[:16]}  eqns={text.count(chr(10))}  "
          f"{os.path.basename(root)} {width}x{height}")
    return 0


if __name__ == "__main__":
    main()
