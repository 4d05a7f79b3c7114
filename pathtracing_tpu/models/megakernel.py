"""Megakernel path-tracing integrator: one fused jit over all bounces.

This is the flagship single-pass engine. Where a GPU megakernel suffers from
warp divergence, on TPU the whole bounce loop is a ``lax.fori_loop`` of
branchless VPU work over the full ray batch — XLA fuses ray-gen, traversal,
shading, and accumulation into one executable with zero host round-trips
(the reference needs 3 CPU↔GPU submissions per frame, SURVEY.md §3.2; we
need 0 per step). The wavefront engine (``models.wavefront``) restructures
this loop with compaction for deep-bounce workloads.

Radiance estimator: forward path tracing with emissive-surface lighting,
cosine-weighted BSDF importance sampling, and Russian roulette from
``rr_start_depth``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.models import shading
from pathtracing_tpu.ops import materials, rng
from pathtracing_tpu.utils.config import RenderConfig

# Back-compat re-export; the implementation moved to models.shading.
background_radiance = shading.background_radiance


def trace_path(scene: scene_mod.Scene, origin, direction, key,
               max_depth: int, rr_start_depth: int, background: str):
    """Monte Carlo radiance estimate along ONE path (vmap over batches).

    ``key`` is the per-(pixel, sample) threefry key from ``ops.rng``; all
    per-bounce randomness is derived from it by counter folding, so the
    estimate is independent of batch shape and sharding. The bounce body
    lives in ``models.shading`` (shared with the wavefront engine).
    """

    def bounce(depth, state):
        radiance, throughput, o, d, active = state
        return shading.bounce(
            scene, o, d, key, depth, radiance, throughput, active,
            rr_start_depth, background,
        )

    init = (
        jnp.zeros(3, jnp.float32),   # radiance
        jnp.ones(3, jnp.float32),    # throughput
        origin,
        direction,
        jnp.bool_(True),
    )
    radiance, *_ = jax.lax.fori_loop(0, max_depth, bounce, init)
    return radiance


def render_samples(scene, camera, config: RenderConfig, sample_start,
                   n_samples: int, seed, row_start=0, block_rows=None,
                   sample_stride: int = 1):
    """Sum of ``n_samples`` radiance samples per pixel over an image block.

    Returns shape (block_rows, W, 3) — by default the full (H, W, 3) image.

    ``sample_start`` is the global sample counter (traced scalar) so
    progressive steps continue the exact RNG sequence; ``n_samples`` is
    static (a `lax.scan` over samples, each a full vmapped bounce loop over
    the block's pixels).

    Sharding hooks (used by ``parallel.render``): ``row_start`` (traced)
    selects an image-row block, ``sample_stride`` (static) makes this
    instance compute global sample indices ``sample_start + i*stride`` —
    pixel ids and sample ids stay *global*, so any (tiles × samples)
    sharding reproduces the single-chip image bit for bit.
    """
    h, w = config.height, config.width
    block_rows = h if block_rows is None else block_rows
    dys, xs = jnp.mgrid[0:block_rows, 0:w]
    ys = dys + row_start
    pixel_index = (ys * w + xs).reshape(-1)
    n_rays = block_rows * w
    traversal = config.resolve_traversal()

    def one_sample(carry, sample_ofs):
        accum = carry
        sample_idx = sample_start + sample_ofs * sample_stride

        keys, origin, direction = jax.vmap(
            lambda p: shading.camera_sample(camera, config, seed, p,
                                            sample_idx)
        )(pixel_index)

        def bounce(depth, state):
            radiance, throughput, o, d, active = state
            return shading.bounce_batch(
                scene, o, d, keys, depth, radiance, throughput, active,
                config.rr_start_depth, config.background, traversal,
            )

        init = (
            jnp.zeros((n_rays, 3), jnp.float32),
            jnp.ones((n_rays, 3), jnp.float32),
            origin,
            direction,
            jnp.ones(n_rays, jnp.bool_),
        )
        radiance, *_ = jax.lax.fori_loop(
            0, config.max_depth, bounce, init
        )
        return accum + radiance.reshape(block_rows, w, 3), None

    accum0 = jnp.zeros((block_rows, w, 3), jnp.float32)
    accum, _ = jax.lax.scan(
        one_sample, accum0, jnp.arange(n_samples, dtype=jnp.int32)
    )
    return accum


def measure_path_stats(scene, camera, config: RenderConfig, seed,
                       n_samples: int = 1):
    """Average path length (segments traced per camera sample).

    Used by the benchmark harness to report *honest* Mrays/s — rays that
    were actually traced, not max_depth × pixels.
    """
    h, w = config.height, config.width
    ys, xs = jnp.mgrid[0:h, 0:w]
    pixel_index = (ys * w + xs).reshape(-1)
    px = xs.reshape(-1).astype(jnp.float32)
    py = (h - 1 - ys).reshape(-1).astype(jnp.float32)

    from pathtracing_tpu.ops import camera as camera_ops

    def per_pixel(pidx, x, y, sample_idx):
        k = rng.pixel_sample_key(seed, pidx, sample_idx)
        ju = jax.random.uniform(
            rng.stream_key(k, 0, rng.STREAM_PIXEL_JITTER), (2,),
            dtype=jnp.float32,
        )
        o, d = camera_ops.generate_ray(
            camera, (x + ju[0]) / w, (y + ju[1]) / h,
            jnp.float32(0), jnp.float32(0),
        )

        def bounce(depth, state):
            segments, o, d, active, key_ = state
            segments = segments + jnp.where(active, 1, 0)
            hit = scene_mod.intersect_scene(scene, o, d)
            mtype, alb, par, emit = materials.gather(
                scene.material_table, hit.mat_id
            )
            u = jax.random.uniform(
                rng.stream_key(key_, depth, rng.STREAM_SCATTER), (5,),
                dtype=jnp.float32,
            )
            d_out, _, scattered, _ = materials.scatter(
                mtype, alb, par, emit, hit.normal, d, hit.front, u
            )
            active = active & hit.valid & scattered
            return segments, hit.position, d_out, active, key_

        segments, *_ = jax.lax.fori_loop(
            0, config.max_depth, bounce,
            (jnp.int32(0), o, d, jnp.bool_(True), k),
        )
        return segments

    total = jnp.int64(0) if jax.config.jax_enable_x64 else jnp.float32(0)
    for s in range(n_samples):
        segs = jax.vmap(
            lambda p, x, y: per_pixel(p, x, y, jnp.int32(s))
        )(pixel_index, px, py)
        total = total + jnp.sum(segs.astype(jnp.float32))
    return total / (h * w * n_samples)
