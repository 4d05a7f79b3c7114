"""pathtracing_tpu — a TPU-native progressive path-tracing framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
C#/Vulkan compute ray tracer (chairclr/PathTracing, see SURVEY.md): ray
generation, intersection, shading, and progressive accumulation expressed as
pure functions over SoA arrays, jit-compiled by XLA, with Pallas kernels on
the hot paths and multi-chip image/sample sharding via `jax.sharding.Mesh` +
`shard_map`.

Layer map (vs reference, SURVEY.md §1):
  ops/       — the "GPU kernel" layer (reference L0: Assets/Shaders/Source/)
  models/    — scenes + render engines (reference L2: Graphics/Renderer.cs)
  parallel/  — device mesh + sharded rendering (no reference analogue; the
               TPU-native replacement for queues/fences/semaphores)
  utils/     — logging, config, image IO, checkpointing, metrics
               (reference X1: Logging/, plus the missing aux subsystems)
"""

__version__ = "0.1.0"

from pathtracing_tpu.utils.config import (  # noqa: F401
    CameraConfig,
    DeviceConfig,
    RenderConfig,
)


def __getattr__(name):
    """Lazy top-level API (keeps `import pathtracing_tpu` light — no jax
    import until something real is touched)."""
    lazy = {
        "Scene": ("pathtracing_tpu.models.scene", "Scene"),
        "SceneBuilder": ("pathtracing_tpu.models.scene", "SceneBuilder"),
        "build_camera": ("pathtracing_tpu.ops.camera", "build_camera"),
        "render_step": ("pathtracing_tpu.models.progressive",
                        "render_step"),
        "render_once": ("pathtracing_tpu.models.progressive",
                        "render_once"),
        "init_state": ("pathtracing_tpu.models.progressive", "init_state"),
        "resolve": ("pathtracing_tpu.models.progressive", "resolve"),
        "get_scene": ("pathtracing_tpu.models.scenes", "get_scene"),
        "load_scene": ("pathtracing_tpu.models.scene_io", "load_scene"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
