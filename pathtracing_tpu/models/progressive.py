"""Progressive render engine: the TPU-native frame loop.

Replaces the reference's per-frame orchestration (`Renderer.Render`,
`Renderer.cs:933-1004`: acquire → fences → compute dispatch → draw →
present) with a single donated-state jitted step: each call adds
``samples_per_step`` samples to the accumulation buffer in place. There are
no fences or semaphores to manage — XLA's dataflow ordering subsumes them
(SURVEY.md §2.2) — and "present" is a tonemapped device→host transfer
(``to_image``), the TPU's swapchain equivalent (SURVEY.md §1 layer map).

State is the (accum, spp, seed) pytree identified in SURVEY.md §5.4 as *the*
core render state; it checkpoints/resumes exactly because the RNG is counter
based (``ops.rng``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import megakernel
from pathtracing_tpu.ops.camera import Camera
from pathtracing_tpu.utils.config import RenderConfig


class RenderState(NamedTuple):
    accum: jnp.ndarray       # (H, W, 3) f32 — radiance sum (not mean)
    spp: jnp.ndarray         # () i32 — samples accumulated so far
    seed: jnp.ndarray        # () u32 — base seed (constant across steps)


def init_state(config: RenderConfig) -> RenderState:
    return RenderState(
        accum=jnp.zeros((config.height, config.width, 3), jnp.float32),
        spp=jnp.int32(0),
        seed=jnp.uint32(config.seed),
    )


@functools.partial(
    jax.jit, static_argnames=("config",), donate_argnames=("state",)
)
def render_step(state: RenderState, scene, camera: Camera,
                config: RenderConfig) -> RenderState:
    """One progressive step: accumulate ``config.samples_per_step`` samples.

    The accumulation buffer is donated — XLA updates it in place in HBM,
    the analogue of the reference's persistent storage image
    (`Renderer.cs:105-196`) but without any layout transitions.
    """
    sample = megakernel.render_samples(
        scene, camera, config,
        sample_start=state.spp,
        n_samples=config.samples_per_step,
        seed=state.seed,
    )
    return RenderState(
        accum=state.accum + sample,
        spp=state.spp + config.samples_per_step,
        seed=state.seed,
    )


def resolve(state: RenderState) -> jnp.ndarray:
    """Mean radiance image from the running sum, (H, W, 3) f32 linear."""
    n = jnp.maximum(state.spp, 1).astype(jnp.float32)
    return state.accum / n


@functools.partial(jax.jit, static_argnames=("factor",))
def resolve_preview(state: RenderState, factor: int) -> jnp.ndarray:
    """``resolve`` mean-pooled by ``factor`` ON DEVICE — the live-preview
    fetch path. A 1080p linear frame is ~24 MB; over the ~30 MB/s
    tunnel that is a ~0.8 s stall per step, so the preview ships a
    factor^2-smaller image instead (factor 4 → 1.5 MB, <5% of a step).
    Edge rows/cols short of a full pool window are cropped (the preview
    is a monitor, not the output — PNG writes always use ``resolve``)."""
    img = resolve(state)
    h, w, _ = img.shape
    hc, wc = (h // factor) * factor, (w // factor) * factor
    pooled = img[:hc, :wc, :].reshape(
        hc // factor, factor, wc // factor, factor, 3
    )
    return jnp.mean(pooled, axis=(1, 3))


@functools.partial(jax.jit, static_argnames=("config",))
def render_once(scene, camera: Camera, config: RenderConfig) -> jnp.ndarray:
    """Single-shot render at ``config.samples_per_pixel`` (mean radiance)."""
    sample = megakernel.render_samples(
        scene, camera, config,
        sample_start=jnp.int32(0),
        n_samples=config.samples_per_pixel,
        seed=jnp.uint32(config.seed),
    )
    return sample / jnp.float32(config.samples_per_pixel)
