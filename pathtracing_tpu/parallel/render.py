"""Multi-chip progressive rendering: image-tile × sample sharding.

BASELINE config 5 ("multi-chip tile-parallel render: image-space sharding
with per-tile accumulation merge over ICI"). Design per SURVEY.md §2.1 P4:

  * The accumulation buffer is sharded by image rows over the ``tiles``
    mesh axis — each chip keeps its stripe resident in HBM across steps
    (donated state, no host round-trips, no re-gather between steps).
  * The ``samples`` axis computes interleaved global sample indices for the
    SAME pixels and merges with one ``psum`` over ICI per step.
  * Pixel ids and sample ids are global (``megakernel.render_samples``'s
    sharding hooks), so any mesh shape produces bit-identical images to a
    single chip — the property tests/test_parallel.py locks in.

There are no fences/semaphores/NCCL calls to manage (the reference's
per-frame sync machinery, `Renderer.cs:897-931`): XLA inserts the psum and
schedules it on ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pathtracing_tpu.models import megakernel
from pathtracing_tpu.models.progressive import RenderState, init_state
from pathtracing_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS
from pathtracing_tpu.utils.config import RenderConfig


# Probe-test hook (benchmarks/scaling_probe.py, tests/test_parallel.py):
# when True, every device renders the FULL image and slices out its own
# stripe — the exact work-replication pathology the tile axis can hide
# behind a correct-looking output sharding. Results stay bit-identical;
# per-device flops blow up by n_tiles, which the probe's cost_analysis
# gate must catch. Never enable outside the probe/tests.
_PROBE_FULL_BLOCK = False


def state_sharding(mesh: Mesh) -> RenderState:
    """NamedShardings for a RenderState on this mesh (rows sharded)."""
    return RenderState(
        accum=NamedSharding(mesh, P(TILE_AXIS, None, None)),
        spp=NamedSharding(mesh, P()),
        seed=NamedSharding(mesh, P()),
    )


def init_sharded_state(mesh: Mesh, config: RenderConfig) -> RenderState:
    state = init_state(config)
    return jax.device_put(state, state_sharding(mesh))


def make_sharded_step(mesh: Mesh, config: RenderConfig):
    """Build the jitted multi-chip render step for this mesh.

    Returns step(state, scene, camera) -> state with the accumulation
    stripe resident per chip. Requires H % n_tiles == 0 and
    samples_per_step % n_samples == 0 (static checks).
    """
    n_tiles = mesh.shape[TILE_AXIS]
    n_sample_shards = mesh.shape[SAMPLE_AXIS]
    if config.height % n_tiles:
        raise ValueError(
            f"height {config.height} not divisible by tiles axis {n_tiles}"
        )
    if config.samples_per_step % n_sample_shards:
        raise ValueError(
            f"samples_per_step {config.samples_per_step} not divisible by "
            f"samples axis {n_sample_shards}"
        )
    block_rows = config.height // n_tiles
    local_samples = config.samples_per_step // n_sample_shards

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(TILE_AXIS, None, None),  # accum stripe
            P(),                       # spp
            P(),                       # seed
            P(),                       # scene (replicated)
            P(),                       # camera (replicated)
        ),
        out_specs=P(TILE_AXIS, None, None),
        # The traversal loops initialize carries from literals (replicated);
        # outputs become shard-varying. Disable the static VMA check rather
        # than threading pvary through generic kernel code.
        check_vma=False,
    )
    def step_block(accum, spp, seed, scene, camera):
        tile = jax.lax.axis_index(TILE_AXIS)
        sample_shard = jax.lax.axis_index(SAMPLE_AXIS)
        if _PROBE_FULL_BLOCK:   # work-replication pathology (probe only)
            full = megakernel.render_samples(
                scene, camera, config,
                sample_start=spp + sample_shard,
                n_samples=local_samples, seed=seed,
                row_start=0, block_rows=config.height,
                sample_stride=n_sample_shards,
            )
            block = jax.lax.dynamic_slice_in_dim(
                full, tile * block_rows, block_rows, 0
            )
        else:
            block = megakernel.render_samples(
                scene, camera, config,
                sample_start=spp + sample_shard,
                n_samples=local_samples,
                seed=seed,
                row_start=tile * block_rows,
                block_rows=block_rows,
                sample_stride=n_sample_shards,
            )
        # Merge the sample-shard partial sums over ICI.
        block = jax.lax.psum(block, SAMPLE_AXIS)
        return accum + block

    @functools.partial(jax.jit, donate_argnames=("state",))
    def step(state: RenderState, scene, camera) -> RenderState:
        accum = step_block(
            state.accum, state.spp, state.seed, scene, camera
        )
        return RenderState(
            accum=accum,
            spp=state.spp + config.samples_per_step,
            seed=state.seed,
        )

    return step


def gather_image(state: RenderState) -> jnp.ndarray:
    """Assemble the full mean-radiance image on the host (the multi-chip
    "present": one all-gather of row stripes, then device→host)."""
    n = jnp.maximum(state.spp, 1).astype(jnp.float32)
    return jax.device_get(state.accum / n)
