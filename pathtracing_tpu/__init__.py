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
