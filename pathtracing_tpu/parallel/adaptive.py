"""Multi-chip tile-granular adaptive sampling.

Extends the image-stripe sharding of ``parallel/render.py`` to the
variance-driven tile scheduler (``models/adaptive.py``): the tile-major
state (accum/m2/tile_spp) is sharded over the mesh's ``tiles`` axis —
each chip owns a contiguous stripe of 8x8 tiles and keeps it resident
across rounds — and every greedy round runs ONE fused dispatch per
chip with no host round-trips, exactly like the single-chip
``adaptive_rounds`` scan.

Scheduling under sharding (the one design decision): each chip ranks
ITS OWN tiles and renders its local top-(k/n) every round — per-shard
greedy, not global greedy. Why:

  * Static shapes. A global top-k round would hand each chip a
    data-dependent number of its tiles to render (0..k), which XLA
    cannot compile; per-shard top-(k/n) keeps every chip's wave the
    same fixed size.
  * Load balance by construction: the noisy region can cluster inside
    one stripe, and global greedy would then serialize the whole round
    onto one chip while the others idle. Per-shard greedy spends the
    same per-chip ray budget every round, riding the ICI-free path
    (zero collectives inside the scan — scores, top-k, render, and
    scatter-add are all shard-local).

The RNG identity makes this sound rather than approximate: sample ids
are global ``(pixel, sample)`` counters, so ANY schedule — single-chip
greedy, per-shard greedy, uniform — computes bit-identical per-sample
estimates and an unbiased per-pixel mean; schedules differ only in
WHERE the budget lands (tests/test_parallel_adaptive.py pins the
sharded schedule bitwise against a single-chip simulation of the same
per-shard policy, and the uniform-equal-spp case bitwise against the
plain progressive engine). The variance-allocation quality of
per-shard greedy trails global greedy only when variance concentrates
inside a single stripe AND the stripe's own budget saturates — the
never-lose Neyman guard (``models/adaptive.tile_neyman_gain``) applies
per shard the same way.

No reference analogue: the reference is single-GPU, one dispatch per
frame (`/root/reference/RayTracing/Graphics/Renderer.cs:1020`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pathtracing_tpu.models import adaptive, megakernel
from pathtracing_tpu.models.adaptive import TileState
from pathtracing_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS
from pathtracing_tpu.utils.config import RenderConfig

_STATE_SPECS = (
    P(TILE_AXIS, None, None, None),   # accum
    P(TILE_AXIS, None, None, None),   # m2 (per-channel, ADVICE r4)
    P(TILE_AXIS),                     # tile_spp
)


def tile_state_sharding(mesh: Mesh) -> TileState:
    """NamedShardings for a TileState on this mesh (tiles sharded)."""
    return TileState(
        accum=NamedSharding(mesh, _STATE_SPECS[0]),
        m2=NamedSharding(mesh, _STATE_SPECS[1]),
        tile_spp=NamedSharding(mesh, _STATE_SPECS[2]),
        seed=NamedSharding(mesh, P()),
    )


def init_sharded_tile_state(mesh: Mesh, config: RenderConfig,
                            tile: int) -> TileState:
    state = adaptive.init_tile_state(config, tile)
    return jax.device_put(state, tile_state_sharding(mesh))


def _check(mesh: Mesh, config: RenderConfig, tile: int,
           k: int) -> Tuple[int, int, int]:
    n_dev = mesh.shape[TILE_AXIS]
    if mesh.shape[SAMPLE_AXIS] != 1:
        raise ValueError(
            "sharded adaptive uses the tiles mesh axis only; build the "
            "mesh with n_samples=1"
        )
    if config.height % tile or config.width % tile:
        raise ValueError(
            f"image {config.width}x{config.height} not divisible by "
            f"tile {tile}"
        )
    n_tiles = (config.height // tile) * (config.width // tile)
    if n_tiles % n_dev:
        raise ValueError(
            f"{n_tiles} tiles not divisible by tiles axis {n_dev}"
        )
    if k % n_dev:
        raise ValueError(
            f"tiles-per-round k={k} not divisible by tiles axis {n_dev} "
            "(each chip renders k/n per round)"
        )
    return n_dev, n_tiles, k // n_dev


def _local_samples(st: TileState, scene, camera, config: RenderConfig,
                   tile: int, ids_local, ids_global,
                   spp_per_round: int) -> TileState:
    """Render ``spp_per_round`` samples for the given LOCAL tile ids
    (global ids drive the pixel/sample counters — the RNG identity) and
    scatter-add into the local shard."""
    pix = adaptive._tile_pixel_ids(ids_global, config, tile)
    acc, m2, spp = st.accum, st.m2, st.tile_spp
    kk = ids_local.shape[0]
    for s in range(spp_per_round):
        blocks = megakernel.render_samples(
            scene, camera, config,
            sample_start=jnp.int32(0),
            n_samples=1,
            seed=st.seed,
            pixels=pix,
            pixels_sample_start=jnp.repeat(spp[ids_local] + s,
                                           tile * tile),
        ).reshape(kk, tile, tile, 3)
        acc = acc.at[ids_local].add(blocks, unique_indices=True)
        m2 = m2.at[ids_local].add(blocks * blocks, unique_indices=True)
    spp = spp.at[ids_local].add(spp_per_round, unique_indices=True)
    return TileState(accum=acc, m2=m2, tile_spp=spp, seed=st.seed)


def make_sharded_tile_rounds(mesh: Mesh, config: RenderConfig,
                             tile: int, k: int,
                             spp_per_round: int = 1):
    """Build the jitted sharded greedy-rounds dispatch.

    Returns ``rounds(state, scene, camera, n_rounds) -> state`` with
    static ``n_rounds``; each round every chip re-scores its local
    tiles, top-(k/n)s them, and renders ``spp_per_round`` samples per
    picked tile — one fused scan per chip, zero collectives, state
    resident.
    """
    n_dev, n_tiles, k_local = _check(mesh, config, tile, k)
    t_local = n_tiles // n_dev

    @functools.partial(jax.jit, static_argnames=("n_rounds",),
                       donate_argnames=("state",))
    def rounds(state: TileState, scene, camera,
               n_rounds: int) -> TileState:

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=_STATE_SPECS + (P(), P(), P()),
            out_specs=_STATE_SPECS,
            check_vma=False,
        )
        def block(accum, m2, tile_spp, seed, scene, camera):
            shard = jax.lax.axis_index(TILE_AXIS)
            local = TileState(accum=accum, m2=m2, tile_spp=tile_spp,
                              seed=seed)

            def body(st, _):
                scores = adaptive._tile_scores(st, config, tile)
                _, ids_local = jax.lax.top_k(scores, k_local)
                st = _local_samples(st, scene, camera, config, tile,
                                    ids_local,
                                    ids_local + shard * t_local,
                                    spp_per_round)
                return st, None

            local, _ = jax.lax.scan(body, local, None, length=n_rounds)
            return local.accum, local.m2, local.tile_spp

        accum, m2, tile_spp = block(
            state.accum, state.m2, state.tile_spp, state.seed,
            scene, camera,
        )
        return TileState(accum=accum, m2=m2, tile_spp=tile_spp,
                         seed=state.seed)

    return rounds


def make_sharded_uniform_step(mesh: Mesh, config: RenderConfig,
                              tile: int):
    """Uniform warmup/fallback: every chip renders ALL of its tiles for
    ``n_samples`` consecutive global sample ids — the sharded
    equivalent of ``adaptive.uniform_tile_rounds`` (bitwise-equal to
    the single-chip uniform engines at equal spp)."""
    n_dev, n_tiles, _ = _check(mesh, config, tile,
                               mesh.shape[TILE_AXIS])
    t_local = n_tiles // n_dev

    @functools.partial(jax.jit, static_argnames=("n_samples",),
                       donate_argnames=("state",))
    def step(state: TileState, scene, camera,
             n_samples: int) -> TileState:

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=_STATE_SPECS + (P(), P(), P()),
            out_specs=_STATE_SPECS,
            check_vma=False,
        )
        def block(accum, m2, tile_spp, seed, scene, camera):
            shard = jax.lax.axis_index(TILE_AXIS)
            ids_local = jnp.arange(t_local, dtype=jnp.int32)
            st = TileState(accum=accum, m2=m2, tile_spp=tile_spp,
                           seed=seed)
            st = _local_samples(st, scene, camera, config, tile,
                                ids_local, ids_local + shard * t_local,
                                n_samples)
            return st.accum, st.m2, st.tile_spp

        accum, m2, tile_spp = block(
            state.accum, state.m2, state.tile_spp, state.seed,
            scene, camera,
        )
        return TileState(accum=accum, m2=m2, tile_spp=tile_spp,
                         seed=state.seed)

    return step


def render_adaptive_sharded(mesh: Mesh, scene, camera,
                            config: RenderConfig, tile: int = 8,
                            tiles_per_round: int = 0,
                            warmup_spp: int = 2,
                            budget_spp: Optional[int] = None,
                            spp_per_round: int = 2,
                            target_rmse: float = 0.0,
                            ) -> Tuple[TileState, int]:
    """Drive sharded adaptive sampling to an average ``budget_spp``
    (default ``config.samples_per_pixel``): uniform warmup, then fused
    per-shard greedy rounds — the multi-chip ``render_adaptive_tiles``.

    ``target_rmse`` > 0 is the render-until-quality stop: the live
    standard-error estimate (``adaptive.predicted_rmse`` — a global
    mean, jitted over the sharded state so the reduction rides the
    mesh) gates every fused dispatch group; the budget becomes a cap.
    """
    n_dev = mesh.shape[TILE_AXIS]
    n_tiles = (config.height // tile) * (config.width // tile)
    k = tiles_per_round or max(n_dev, (n_tiles // 8) // n_dev * n_dev)
    k = min(k, n_tiles)
    _check(mesh, config, tile, k)

    state = init_sharded_tile_state(mesh, config, tile)
    uniform = make_sharded_uniform_step(mesh, config, tile)
    greedy = make_sharded_tile_rounds(mesh, config, tile, k,
                                      spp_per_round)

    target = budget_spp if budget_spp is not None else (
        config.samples_per_pixel
    )
    budget = n_tiles * target
    spent = 0
    rounds = 0
    if target_rmse > 0.0 and min(warmup_spp, target) < 2:
        # Same guard as render_adaptive_tiles (ADVICE r4): an n<=1
        # variance estimate is identically zero and would stop the
        # schedule immediately.
        from pathtracing_tpu.utils import logging as ptlog

        ptlog.log_warning(
            "target_rmse needs warmup_spp >= 2 (got %d) — stopping "
            "rule disabled, rendering the full budget", warmup_spp,
        )
        target_rmse = 0.0

    def hit_target(st: TileState) -> bool:
        return (target_rmse > 0.0 and float(
            adaptive.predicted_rmse(st, config, tile)) <= target_rmse)

    warm = min(warmup_spp, target)
    if warm:
        state = uniform(state, scene, camera, warm)
        spent += warm * n_tiles
        rounds += warm
    if warm >= 2 and hit_target(state):
        return state, rounds

    spr = max(1, spp_per_round)
    samples_per_round = k * tile * tile * spr
    per_dispatch = max(
        1, adaptive.MAX_DISPATCH_SAMPLES // samples_per_round
    )
    if target_rmse > 0.0:
        # Check the stopping rule about every 2 average spp.
        per_dispatch = min(per_dispatch,
                           max(1, (n_tiles * 2) // (k * spr)))
    while spent + k * spr <= budget:
        n_r = min(per_dispatch, (budget - spent) // (k * spr))
        state = greedy(state, scene, camera, n_r)
        spent += n_r * k * spr
        rounds += n_r
        if hit_target(state):
            break
    return state, rounds


def gather_tile_image(state: TileState, config: RenderConfig,
                      tile: int) -> np.ndarray:
    """Assemble the full mean-radiance image on the host."""
    return np.asarray(adaptive.resolve_tiles(
        jax.device_get(state), config, tile
    ))
