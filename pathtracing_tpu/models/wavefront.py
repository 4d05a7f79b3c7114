"""Wavefront path-tracing engine: persistent ray pool with regeneration.

BASELINE config 4 ("branchy megakernel bounces are restructured into a
wavefront loop with scan-based stream compaction of live rays"). The GPU
formulation keeps SIMD lanes full with explicit ray queues and compaction
passes; the TPU-native formulation is *in-place path regeneration*:

  * A fixed-size SoA pool of N paths lives in HBM. Every iteration of one
    ``lax.while_loop``: (1) dead slots are refilled with fresh camera
    samples pulled from a global (pixel, sample) stream — their rank among
    dead slots comes from a cumsum (the scan-based compaction, but applied
    to the *free list* so live rays never move); (2) all slots take one
    shared-``models.shading`` bounce; (3) newly terminated paths scatter-add
    their radiance into the flat accumulation image.

  * Utilization: the megakernel traces ``max_depth`` wavefronts per sample
    even though the average path dies after 2-3 bounces; here every
    iteration traces a ~full pool of live rays, so total traversal work is
    proportional to *actual* path segments. The loop runs until the stream
    is exhausted and the pool drains.

  * Reproducibility: paths are keyed by (seed, pixel, sample) exactly like
    the megakernel (``shading.camera_sample``), so per-path estimates are
    bit-identical across engines; only the floating-point accumulation
    order differs.

The reference has no analogue (one primary ray per pixel, `Test.hlsl:4-10`);
its SIMT dispatch (`Renderer.cs:1020`) corresponds to the vmapped bounce.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import shading
from pathtracing_tpu.models.progressive import RenderState
from pathtracing_tpu.utils.config import RenderConfig


class PathPool(NamedTuple):
    """SoA state for N in-flight paths (all arrays length N)."""

    origin: jnp.ndarray      # (N, 3) f32
    direction: jnp.ndarray   # (N, 3) f32
    radiance: jnp.ndarray    # (N, 3) f32 — per-path running estimate
    throughput: jnp.ndarray  # (N, 3) f32
    pixel: jnp.ndarray       # (N,) i32 flat pixel id
    sample: jnp.ndarray      # (N,) i32 global sample index
    depth: jnp.ndarray       # (N,) i32 bounce counter
    active: jnp.ndarray      # (N,) bool
    prev_pdf: jnp.ndarray    # (N,) f32 BSDF pdf at the previous vertex
    prev_nee: jnp.ndarray  # (N,) bool previous vertex was diffuse
    # (N, 3) f32 interior absorption sigma_a carried across bounces;
    # None (an empty pytree leaf) for absorption-free scenes so their
    # pool pytree — and therefore every compiled graph — is unchanged.
    medium: jnp.ndarray = None
    # (N, 2) f32 interior-scattering row [sigma_s, g] carried across
    # bounces (shading.bounce_batch sss docs); None for scatter-free
    # scenes.
    sss: jnp.ndarray = None
    # (N,) f32 ray-cone accumulated distance (texture mip/LOD selection,
    # shading.bounce_batch cone docs); None for mip-free scenes.
    cone: jnp.ndarray = None


def _empty_pool(n: int, has_media: bool = False, has_sss: bool = False,
                has_mips: bool = False) -> PathPool:
    return PathPool(
        origin=jnp.zeros((n, 3), jnp.float32),
        direction=jnp.zeros((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),
        throughput=jnp.ones((n, 3), jnp.float32),
        pixel=jnp.zeros(n, jnp.int32),
        sample=jnp.zeros(n, jnp.int32),
        depth=jnp.zeros(n, jnp.int32),
        active=jnp.zeros(n, jnp.bool_),
        prev_pdf=jnp.zeros(n, jnp.float32),
        prev_nee=jnp.zeros(n, jnp.bool_),
        medium=jnp.zeros((n, 3), jnp.float32) if has_media else None,
        sss=jnp.zeros((n, 2), jnp.float32) if has_sss else None,
        cone=jnp.zeros(n, jnp.float32) if has_mips else None,
    )


def pool_size(config: RenderConfig) -> int:
    """Pool capacity: explicit config knob, else one slot per pixel capped
    at 2^20 (a full 1080p wave is ~2.07M paths × 64 B ≈ 133 MB of HBM —
    fine, but past ~1M slots the VPU is saturated and smaller pools just
    drain faster)."""
    if getattr(config, "wavefront_pool", 0):
        return int(config.wavefront_pool)
    return min(config.width * config.height, 1 << 20)


def render_wave(scene, camera, config: RenderConfig, accum_flat,
                sample_start, n_samples: int, seed):
    """Trace ``n_samples`` spp through the pool, accumulating into
    ``accum_flat`` (H*W, 3). Returns (accum_flat, segments_traced).

    ``sample_start`` (traced) continues the progressive RNG sequence;
    stream order is pixel-major (all pixels at sample k before k+1).
    """
    npix = config.width * config.height
    n = pool_size(config)
    total = npix * n_samples

    def refill(pool: PathPool, next_path):
        """Fill dead slots from the global path stream (cumsum ranking)."""
        dead = jnp.logical_not(pool.active)
        # Exclusive cumsum = rank of each dead slot in the free list.
        rank = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
        stream = next_path + rank
        take = dead & (stream < total)

        pixel = (stream % npix).astype(jnp.int32)
        sample_idx = sample_start + (stream // npix).astype(jnp.int32)
        key, o, d = jax.vmap(
            lambda p, s: shading.camera_sample(camera, config, seed, p, s)
        )(pixel, sample_idx)
        del key  # recomputed per bounce from (pixel, sample)

        take3 = take[:, None]
        return PathPool(
            origin=jnp.where(take3, o, pool.origin),
            direction=jnp.where(take3, d, pool.direction),
            radiance=jnp.where(take3, 0.0, pool.radiance),
            throughput=jnp.where(take3, 1.0, pool.throughput),
            pixel=jnp.where(take, pixel, pool.pixel),
            sample=jnp.where(take, sample_idx, pool.sample),
            depth=jnp.where(take, 0, pool.depth),
            active=pool.active | take,
            prev_pdf=jnp.where(take, 0.0, pool.prev_pdf),
            prev_nee=jnp.where(take, False, pool.prev_nee),
            medium=(None if pool.medium is None
                    else jnp.where(take3, 0.0, pool.medium)),
            sss=(None if pool.sss is None
                 else jnp.where(take3, 0.0, pool.sss)),
            cone=(None if pool.cone is None
                  else jnp.where(take, 0.0, pool.cone)),
        ), jnp.minimum(next_path + jnp.sum(dead.astype(jnp.int32)), total)

    traversal = config.resolve_traversal(scene)

    def bounce_all(pool: PathPool):
        """One shared-shading bounce over the whole pool (batched)."""
        from pathtracing_tpu.ops import rng

        keys = jax.vmap(
            lambda p, s: rng.pixel_sample_key(seed, p, s)
        )(pool.pixel, pool.sample)
        if config.sampler == "ld":
            # Depth-0 slots are this wave's fresh refills; their
            # stratified first-vertex pairs are recomputed per wave
            # (the wavefront pool mixes depths, so there is no
            # loop-invariant hoist like the megakernel's).
            def pairs(tag):
                a, b = jax.vmap(
                    lambda p, si: rng.ld_pair(seed, p, si, tag)
                )(pool.pixel, pool.sample)
                return jnp.stack([a, b], axis=-1)

            pick = jax.vmap(
                lambda p, si: rng.ld_scalar(seed, p, si, rng.STREAM_NEE)
            )(pool.pixel, pool.sample)[:, None]
            ld_nee = jnp.concatenate([pick, pairs(rng.STREAM_NEE)],
                                     axis=1)
            ld_scatter = pairs(rng.STREAM_SCATTER)
        else:
            ld_nee = ld_scatter = None
        times = None
        from pathtracing_tpu.models import scene as scene_mod

        if scene_mod.has_motion(scene):
            # Per-path shutter time — a pure function of the slot's
            # (pixel, sample) identity (the camera-motion stream), so
            # the pool carries no extra state and refills stay cheap.
            if config.sampler == "ld":
                times = jax.vmap(
                    lambda p, si: rng.ld_scalar(
                        seed, p, si, rng.STREAM_TIME
                    )
                )(pool.pixel, pool.sample)
            else:
                times = jax.vmap(
                    lambda p, si: jax.random.uniform(
                        rng.stream_key(
                            rng.pixel_sample_key(seed, p, si), 0,
                            rng.STREAM_TIME,
                        ), (), dtype=jnp.float32,
                    )
                )(pool.pixel, pool.sample)
        spread = (shading.cone_spread_of(camera, config)
                  if pool.cone is not None else None)
        out = shading.bounce_batch(
            scene, pool.origin, pool.direction, keys, pool.depth,
            pool.radiance, pool.throughput, pool.active,
            config.rr_start_depth, config.background, traversal,
            nee=config.nee, prev_pdf=pool.prev_pdf,
            prev_nee=pool.prev_nee, bin_rays=config.ray_sort,
            return_shadow_count=True, ld_nee=ld_nee,
            ld_scatter=ld_scatter, medium=pool.medium, sss=pool.sss,
            time=times, cone=pool.cone, cone_spread=spread,
            nee_candidates=config.nee_candidates,
        )
        radiance, throughput, o, d, active, pdf, pdiff = out[:7]
        rest = 7
        medium = out[rest] if scene.mat_absorb is not None else None
        rest += 1 if scene.mat_absorb is not None else 0
        sss = out[rest] if pool.sss is not None else None
        rest += 1 if pool.sss is not None else 0
        cone = out[rest] if pool.cone is not None else None
        n_shadow = out[-1]
        depth = pool.depth + 1
        active = active & (depth < config.max_depth)
        return PathPool(
            origin=o, direction=d, radiance=radiance,
            throughput=throughput, pixel=pool.pixel, sample=pool.sample,
            depth=depth, active=active, prev_pdf=pdf, prev_nee=pdiff,
            medium=medium, sss=sss, cone=cone,
        ), n_shadow

    def body(carry):
        pool, accum, next_path, segments = carry
        pool, next_path = refill(pool, next_path)
        # f32 accumulation: int32 would overflow past ~2.1e9 traced
        # segments in one call (large res × spp); f32 keeps exact counts
        # to 2^24 per-iteration increments and ~0.5% at the extreme end.
        segments = segments + jnp.sum(pool.active.astype(jnp.int32)).astype(
            jnp.float32
        )

        was_active = pool.active
        pool, n_shadow = bounce_all(pool)
        if config.nee and scene.lights is not None:
            # Shadow rays are real traversal work — counted EXACTLY as
            # the lanes that traced one (shading's `cand`: live NEE-lobe
            # vertices actually facing the sampled light point), not
            # every NEE-lobe vertex.
            segments = segments + n_shadow

        # Newly terminated paths deposit and zero their slot estimate so a
        # slot that stays dead (stream exhausted) deposits exactly once.
        finished = was_active & jnp.logical_not(pool.active)
        deposit = jnp.where(finished[:, None], pool.radiance, 0.0)
        if config.clamp > 0.0:
            deposit = jnp.minimum(deposit, config.clamp)
        accum = accum.at[pool.pixel].add(
            deposit, mode="drop", unique_indices=False
        )
        pool = pool._replace(
            radiance=jnp.where(finished[:, None], 0.0, pool.radiance)
        )
        return pool, accum, next_path, segments

    def cond(carry):
        pool, _, next_path, _ = carry
        return (next_path < total) | jnp.any(pool.active)

    from pathtracing_tpu.models import scene as scene_mod2

    pool0 = _empty_pool(n, has_media=scene.mat_absorb is not None,
                        has_sss=scene.mat_interior is not None,
                        has_mips=scene_mod2.uses_mips(scene))
    accum_flat, segments = jax.lax.while_loop(
        cond, body, (pool0, accum_flat, jnp.int32(0), jnp.float32(0))
    )[1::2]
    return accum_flat, segments


@functools.partial(
    jax.jit, static_argnames=("config",), donate_argnames=("state",)
)
def render_step(state: RenderState, scene, camera,
                config: RenderConfig) -> RenderState:
    """One progressive step via the wavefront engine (drop-in replacement
    for ``progressive.render_step``; same RenderState semantics)."""
    h, w = config.height, config.width
    accum_flat, _ = render_wave(
        scene, camera, config, state.accum.reshape(h * w, 3),
        sample_start=state.spp, n_samples=config.samples_per_step,
        seed=state.seed,
    )
    return RenderState(
        accum=accum_flat.reshape(h, w, 3),
        spp=state.spp + config.samples_per_step,
        seed=state.seed,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def count_segments(scene, camera, config: RenderConfig, seed):
    """Segments actually traced for one step (honest Mrays/s numerator)."""
    h, w = config.height, config.width
    _, segments = render_wave(
        scene, camera, config, jnp.zeros((h * w, 3), jnp.float32),
        sample_start=jnp.int32(0), n_samples=config.samples_per_step,
        seed=jnp.uint32(seed),
    )
    return segments
