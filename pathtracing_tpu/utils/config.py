"""Configuration tree for the renderer.

The reference hard-codes every knob (window size `App.cs:27`, kernel
resolution `Test.hlsl:6`, camera/sphere `Test.hlsl:8-13`, DEBUG toggles via
`#if DEBUG`). Here configuration is first-class: dataclasses consumed by the
CLI (`pathtracing_tpu.render`) and by `jit`-ed render functions as *static*
arguments (all fields are hashable Python scalars/tuples so a config change
triggers a deliberate recompile — the analogue of the reference's
swapchain/pipeline recreation on resize, `Renderer.cs:497-520`).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera with optional thin-lens defocus.

    Defaults reproduce the reference camera (`Test.hlsl:8-10`): eye at
    (0,0,1) looking down -z with a 90° square frustum.
    """

    position: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    look_at: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    vfov_degrees: float = 90.0
    aperture: float = 0.0       # 0 => ideal pinhole
    focus_distance: float = 1.0
    projection: str = "pinhole"  # "pinhole" | "ortho" | "fisheye" |
                                 # "equirect" (ops/camera.py PROJECTIONS)
    # Motion blur: pose at shutter close (None => static camera). A
    # motion camera renders as a (open, close) pair with per-sample
    # shutter times (ops/camera.lerp; models/shading.camera_sample).
    motion_position: "Tuple[float, float, float] | None" = None
    motion_look_at: "Tuple[float, float, float] | None" = None

    def motion_pair(self) -> "Tuple[CameraConfig, CameraConfig] | None":
        """The (open, close) config pair, or None for a static camera."""
        if self.motion_position is None and self.motion_look_at is None:
            return None
        close = dataclasses.replace(
            self,
            position=(self.motion_position if self.motion_position
                      is not None else self.position),
            look_at=(self.motion_look_at if self.motion_look_at
                     is not None else self.look_at),
            motion_position=None, motion_look_at=None,
        )
        opened = dataclasses.replace(
            self, motion_position=None, motion_look_at=None
        )
        return opened, close


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Per-render settings (resolution / sampling / integrator)."""

    width: int = 512
    height: int = 512
    samples_per_pixel: int = 64
    max_depth: int = 8              # bounce limit
    rr_start_depth: int = 8         # Russian roulette kicks in at this depth
    seed: int = 0
    samples_per_step: int = 4       # spp added per progressive step
    engine: str = "megakernel"      # "megakernel" | "wavefront" | "reference"
    background: str = "black"       # "black" | "gradient" | "uv"
    wavefront_pool: int = 0         # wavefront ray-pool slots (0 = auto)
    traversal: str = "auto"         # "auto" | "bvh" | "cluster_jax" |
                                    # "cluster_pallas" | "cluster_interpret"
    nee: bool = True                # next-event estimation (direct light
                                    # sampling w/ MIS at diffuse vertices)
    nee_candidates: int = 1         # RIS candidate count M for the NEE
                                    # light pick: M power-CDF candidates
                                    # are resampled by their unshadowed
                                    # contribution (Le·G target) down to
                                    # ONE shadow ray (Talbot-style RIS,
                                    # the ReSTIR building block). 1 =
                                    # the plain power-weighted estimator
                                    # (bit-identical legacy graph); >1
                                    # pays M cheap light samples per
                                    # vertex, worth it for many-light
                                    # scenes (many_lights_demo)
    sampler: str = "ld"             # "ld": Halton(2,3) + per-pixel
                                    # Cranley-Patterson rotation for the
                                    # variance-dominant first-vertex
                                    # draws (pixel jitter, first NEE,
                                    # first scatter); "independent":
                                    # pure threefry streams
    clamp: float = 0.0              # per-sample radiance clamp (0 = off);
                                    # trades a little bias for firefly
                                    # suppression at low spp
    ray_sort: bool = True           # group rays by (origin cell,
                                    # direction octant) per wave via the
                                    # scatter/sort-free counting sort
                                    # (ops.binning). Applies only to the
                                    # tree/paged traversal (big scenes):
                                    # scenes on the dense nearest-first
                                    # kernels measure FASTER unsorted on
                                    # every wave type and skip the sort
                                    # regardless (PERF.md r2c,
                                    # shading.bounce_batch policy).
    dtype: str = "float32"
    debug: bool = False             # NaN checks + interpret-mode kernels
                                    # (reference DEBUG validation-layer analogue,
                                    #  GraphicsDevice.cs:62-67)

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.height, self.width)

    def resolve_traversal(self, scene=None) -> str:
        """Pick the concrete traversal for "auto": the Pallas cluster
        sweep on TPU, the threaded-BVH walk elsewhere (CPU tests). Debug
        mode forces the interpreted kernel — the reference's
        validation-layer analogue for the traversal path
        (GraphicsDevice.cs:62-67). Instanced scenes (shared-geometry
        instancing, ``scene.instances``) never resolve to the BVH — it
        only indexes base triangles — so CPU auto falls back to the
        pure-XLA instanced oracle."""
        if self.traversal != "auto":
            return self.traversal
        import jax

        instanced = scene is not None and getattr(
            scene, "instances", None
        ) is not None
        if jax.default_backend() != "tpu":
            # Interpreted instanced kernel, not the cluster_jax oracle:
            # the oracle brute-forces every expanded cluster (O(Ce) per
            # ray); the nearest-first kernel pops only what the rays
            # reach.
            return "cluster_interpret" if instanced else "bvh"
        return "cluster_interpret" if self.debug else "cluster_pallas"


@dataclasses.dataclass(frozen=True)
class DeviceConfig:
    """Device-mesh layout for multi-chip rendering.

    The reference is single-GPU (SURVEY.md §2.1); here the mesh shape is a
    first-class knob. ``tile_axis`` shards image rows, ``sample_axis`` shards
    samples-per-pixel (merged with a psum over ICI).
    """

    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axes: Tuple[str, ...] = ("tiles",)
    donate_state: bool = True


def render_config_from_json(path: str) -> RenderConfig:
    with open(path) as f:
        raw = json.load(f)
    return RenderConfig(**raw)
