"""Shared per-bounce shading core used by every integrator.

One bounce = closest-hit query -> environment/emissive accumulation ->
branchless BSDF scatter -> Russian roulette. The megakernel engine runs this
in a ``fori_loop`` over a fixed depth; the wavefront engine vmaps it over a
persistent ray pool with per-slot depth counters. Keeping the body in one
place guarantees both engines draw the *same* RNG streams for the same
(pixel, sample, bounce) counters and therefore produce bit-identical
per-path radiance estimates (only the accumulation order differs).

No reference analogue beyond the single normal-shade in `Test.hlsl:26-32`;
this implements the BASELINE north-star estimator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.ops import materials, rng


def background_radiance(direction, mode: str):
    """Environment lookup for escaped rays (static mode → fused constant)."""
    if mode == "black":
        return jnp.zeros(direction.shape[:-1] + (3,), jnp.float32)
    if mode == "white":
        # Uniform unit environment (furnace-test mode).
        return jnp.ones(direction.shape[:-1] + (3,), jnp.float32)
    if mode == "gradient":
        # The classic white→sky-blue vertical gradient.
        t = 0.5 * (direction[..., 1] + 1.0)
        white = jnp.array([1.0, 1.0, 1.0], jnp.float32)
        blue = jnp.array([0.5, 0.7, 1.0], jnp.float32)
        return (1.0 - t)[..., None] * white + t[..., None] * blue
    if mode == "uv":
        # Reference miss shading (`Test.hlsl:36`): color = (uv, 0). Only
        # meaningful for the parity model where uv is the ray's film coord;
        # approximated here by the direction's xy (documented difference).
        return jnp.stack(
            [direction[..., 0], direction[..., 1],
             jnp.zeros_like(direction[..., 0])], axis=-1,
        )
    raise ValueError(f"unknown background mode: {mode}")


def bounce(scene, o, d, key, depth, radiance, throughput, active,
           rr_start_depth, background: str):
    """One path-tracing bounce for ONE ray (vmap over pools/batches).

    Args:
      scene: Scene pytree.
      o, d: (3,) ray origin/direction.
      key: the per-(pixel, sample) threefry key from ``ops.rng``.
      depth: i32 bounce counter (0-based; selects the RNG streams).
      radiance, throughput: (3,) running estimates.
      active: bool — path still alive.
      rr_start_depth: static int — Russian roulette start.
      background: static str — environment mode.

    Returns (radiance, throughput, o, d, active) updated. Dead lanes pass
    through unchanged except that their state may hold garbage guarded by
    ``active`` — callers must mask on it.
    """
    hit = scene_mod.intersect_scene(scene, o, d)

    # Escaped rays pick up the environment and terminate. NOTE: masked
    # with where (not an indicator multiply) — dead lanes carry NaN
    # positions/directions by design and 0*NaN would poison the sum.
    env = background_radiance(d, background)
    escaped = active & jnp.logical_not(hit.valid)
    radiance = radiance + jnp.where(escaped, throughput * env, 0.0)

    # Surface interaction (branchless BSDF table).
    mtype, alb, par, emit = materials.gather(scene.material_table, hit.mat_id)
    live = active & hit.valid
    radiance = radiance + jnp.where(live, throughput * emit, 0.0)

    k = rng.stream_key(key, depth, rng.STREAM_SCATTER)
    u = jax.random.uniform(k, (5,), dtype=jnp.float32)
    d_out, atten, scattered, _ = materials.scatter(
        mtype, alb, par, emit, hit.normal, d, hit.front, u
    )

    throughput = throughput * jnp.where(live, atten, 1.0)
    active = live & scattered

    # Russian roulette: kill low-throughput paths unbiasedly.
    tp_max = jnp.max(throughput)
    rr_u = jax.random.uniform(
        rng.stream_key(key, depth, rng.STREAM_RR), (), dtype=jnp.float32
    )
    p_continue = jnp.clip(tp_max, 0.05, 1.0)
    do_rr = depth >= rr_start_depth
    survive = jnp.logical_not(do_rr) | (rr_u < p_continue)
    throughput = jnp.where(
        do_rr & survive, throughput / p_continue, throughput
    )
    active = active & survive

    o = hit.position
    d = jnp.where(active, d_out, d)
    return radiance, throughput, o, d, active


def bounce_batch(scene, o, d, keys, depth, radiance, throughput, active,
                 rr_start_depth, background: str, traversal: str):
    """One bounce for a whole (R,) ray batch — the production path.

    Identical math and RNG streams to the scalar ``bounce`` (the random
    draws are vmapped over per-ray keys), but the closest-hit query runs
    as ONE batched ``scene.intersect_batch`` call so the cluster-sweep /
    Pallas traversal sees the full ray front instead of being trapped
    under vmap. ``depth`` may be a scalar (megakernel) or (R,) per-slot
    counters (wavefront).
    """
    from pathtracing_tpu.models import scene as scene_mod

    r = o.shape[0]
    depth = jnp.broadcast_to(depth, (r,))
    hit = scene_mod.intersect_batch(scene, o, d, traversal)

    env = background_radiance(d, background)
    escaped = active & jnp.logical_not(hit.valid)
    radiance = radiance + jnp.where(escaped[:, None], throughput * env, 0.0)

    mtype, alb, par, emit = materials.gather(scene.material_table, hit.mat_id)
    live = active & hit.valid
    radiance = radiance + jnp.where(live[:, None], throughput * emit, 0.0)

    u = jax.vmap(
        lambda k, dp: jax.random.uniform(
            rng.stream_key(k, dp, rng.STREAM_SCATTER), (5,),
            dtype=jnp.float32,
        )
    )(keys, depth)
    d_out, atten, scattered, _ = materials.scatter(
        mtype, alb, par, emit, hit.normal, d, hit.front, u
    )

    throughput = throughput * jnp.where(live[:, None], atten, 1.0)
    active = live & scattered

    tp_max = jnp.max(throughput, axis=-1)
    rr_u = jax.vmap(
        lambda k, dp: jax.random.uniform(
            rng.stream_key(k, dp, rng.STREAM_RR), (), dtype=jnp.float32
        )
    )(keys, depth)
    p_continue = jnp.clip(tp_max, 0.05, 1.0)
    do_rr = depth >= rr_start_depth
    survive = jnp.logical_not(do_rr) | (rr_u < p_continue)
    throughput = jnp.where(
        (do_rr & survive)[:, None], throughput / p_continue[:, None],
        throughput,
    )
    active = active & survive

    o = hit.position
    d = jnp.where(active[:, None], d_out, d)
    return radiance, throughput, o, d, active


def camera_sample(camera, config, seed, pixel_index, sample_index):
    """Primary-ray generation for one (pixel, sample) pair.

    Returns (key, origin, direction). The key is the per-path base key both
    engines derive every bounce stream from — identical counters mean
    identical paths regardless of engine or sharding.
    """
    from pathtracing_tpu.ops import camera as camera_ops

    h, w = config.height, config.width
    x = (pixel_index % w).astype(jnp.float32)
    # Film t runs bottom→top; image row 0 is the top.
    y = (h - 1 - pixel_index // w).astype(jnp.float32)
    k = rng.pixel_sample_key(seed, pixel_index, sample_index)
    ju = jax.random.uniform(
        rng.stream_key(k, 0, rng.STREAM_PIXEL_JITTER), (2,),
        dtype=jnp.float32,
    )
    lu = jax.random.uniform(
        rng.stream_key(k, 0, rng.STREAM_LENS), (2,), dtype=jnp.float32
    )
    s = (x + ju[0]) / w
    t = (y + ju[1]) / h
    o, d = camera_ops.generate_ray(camera, s, t, lu[0], lu[1])
    return k, o, d
