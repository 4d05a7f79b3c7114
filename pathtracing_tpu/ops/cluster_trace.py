"""Cluster-sweep closest-hit traversal: pure-JAX oracle + Pallas TPU kernel.

See ``ops.clusters`` for the data layout and the design rationale (dense
regular compute instead of per-lane pointer chasing). Two implementations
of the same contract:

  trace_jax    — fori over clusters, every cluster evaluated masked for the
                 whole ray batch. Correct everywhere; the CPU/test path.
  trace_pallas — grid over 1024-ray tiles; per tile, clusters whose AABB no
                 ray in the tile can improve on are SKIPPED with @pl.when,
                 so work scales with rays' actual cluster footprints
                 (coherent tiles touch a handful of the C clusters). The
                 two (R,4)x(4,384) Woop matmuls run on the MXU.

Contract: trace(clusters, origin, direction, t_init) -> (t, slot) where
``t_init`` is the per-ray closest hit found so far (e.g. from the sphere
set — used for culling), ``t`` improves on it or passes it through, and
``slot = cluster*128 + lane`` indexes the padded cluster slots (-1 = no
triangle hit). ``lookup_hit`` resolves (normal, material) from slots with
one batched gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracing_tpu.ops.clusters import CLUSTER_SIZE
from pathtracing_tpu.ops.intersect import T_MIN

RAY_TILE = 1024
_BIG = 3.0e38  # plain float: jnp scalars would be captured kernel consts


def _augment(origin, direction):
    """(R,3) rays -> (R,4) homogeneous [o,1] / [d,0] for the Woop matmuls."""
    r = origin.shape[0]
    o_aug = jnp.concatenate(
        [origin, jnp.ones((r, 1), jnp.float32)], axis=1
    )
    d_aug = jnp.concatenate(
        [direction, jnp.zeros((r, 1), jnp.float32)], axis=1
    )
    return o_aug, d_aug


def _safe_inv(d3):
    return 1.0 / jnp.where(
        jnp.abs(d3) < 1e-12, jnp.where(d3 >= 0, 1e-12, -1e-12), d3
    )


def _pair_eval(o_aug, d_aug, woop_c, best_t):
    """Dense ray-tile × 128-triangle Woop evaluation for one cluster.

    o_aug/d_aug: (R, 4); woop_c: (4, 3*128); best_t: (R, 1).
    Returns t_pair (R, 128) with misses at _BIG.
    """
    op = jnp.dot(o_aug, woop_c, preferred_element_type=jnp.float32)
    dp = jnp.dot(d_aug, woop_c, preferred_element_type=jnp.float32)
    k = CLUSTER_SIZE
    op_u, op_v, op_w = op[:, :k], op[:, k:2 * k], op[:, 2 * k:]
    dp_u, dp_v, dp_w = dp[:, :k], dp[:, k:2 * k], dp[:, 2 * k:]

    dw = jnp.where(jnp.abs(dp_w) < 1e-30, 1e-30, dp_w)
    t = -op_w / dw
    u = op_u + t * dp_u
    v = op_v + t * dp_v
    ok = (
        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > T_MIN) & (t < best_t)
    )
    return jnp.where(ok, t, _BIG)


def _slab6(o_aug, inv_d, b, best_t):
    """Ray-tile × one-AABB slab test with the box as 6 scalars
    ``b = (x0, y0, z0, x1, y1, z1)``. Returns hit mask (R, 1)."""
    tn = jnp.full_like(best_t, -_BIG)
    tf = jnp.full_like(best_t, _BIG)
    for ax in range(3):
        o = o_aug[:, ax:ax + 1]
        iv = inv_d[:, ax:ax + 1]
        t0 = (b[ax] - o) * iv
        t1 = (b[3 + ax] - o) * iv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return (tn <= tf) & (tf > T_MIN) & (tn < best_t)


def trace_jax(clusters, origin, direction, t_init):
    """Reference sweep: all clusters, masked. (R,) f32 t, (R,) i32 slot."""
    n_clusters = clusters.aabb_min.shape[0]
    o_aug, d_aug = _augment(origin, direction)
    inv_d = _safe_inv(direction)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (origin.shape[0], CLUSTER_SIZE), 1
    )

    def body(c, carry):
        best_t, best_slot = carry
        bt = best_t[:, None]
        b = tuple(clusters.aabb_min[c]) + tuple(clusters.aabb_max[c])
        hit = _slab6(o_aug, inv_d, b, bt)
        t_pair = _pair_eval(o_aug, d_aug, clusters.woop[c], bt)
        t_pair = jnp.where(hit, t_pair, _BIG)
        t_min = jnp.min(t_pair, axis=1)
        slot = jnp.min(
            jnp.where(t_pair <= t_min[:, None], lane, CLUSTER_SIZE), axis=1
        )
        upd = t_min < best_t
        best_t = jnp.where(upd, t_min, best_t)
        best_slot = jnp.where(upd, c * CLUSTER_SIZE + slot, best_slot)
        return best_t, best_slot

    return jax.lax.fori_loop(
        0, n_clusters, body,
        (t_init, jnp.full(origin.shape[0], -1, jnp.int32)),
    )


def _tile_kernel(o_ref, d_ref, t0_ref, bmin_ref, bmax_ref, woop_ref,
                 t_ref, slot_ref, *, n_clusters: int):
    """One 1024-ray tile against all clusters, with per-cluster skip.

    bmin_ref/bmax_ref are (3, C) in SMEM (scalar reads drive the skip
    decision); woop lives whole in VMEM (v1 — DMA streaming is the
    follow-up for scenes whose cluster data exceeds VMEM).
    """
    o_aug = o_ref[:]          # (RAY_TILE, 4)
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    t_ref[:] = t0_ref[:]
    slot_ref[:] = jnp.full((RAY_TILE, 1), -1, jnp.int32)
    lane = jax.lax.broadcasted_iota(
        jnp.int32, (RAY_TILE, CLUSTER_SIZE), 1
    )

    def body(c, _):
        best_t = t_ref[:]     # (RAY_TILE, 1)
        b = (bmin_ref[0, c], bmin_ref[1, c], bmin_ref[2, c],
             bmax_ref[0, c], bmax_ref[1, c], bmax_ref[2, c])
        hit = _slab6(o_aug, inv_d, b, best_t)

        @pl.when(jnp.any(hit))
        def _():
            t_pair = _pair_eval(o_aug, d_aug, woop_ref[c], best_t)
            t_min = jnp.min(t_pair, axis=1, keepdims=True)
            slot = jnp.min(
                jnp.where(t_pair <= t_min, lane, CLUSTER_SIZE),
                axis=1, keepdims=True,
            )
            upd = t_min < best_t
            t_ref[:] = jnp.where(upd, t_min, best_t)
            slot_ref[:] = jnp.where(
                upd, c * CLUSTER_SIZE + slot, slot_ref[:]
            )

        return 0

    jax.lax.fori_loop(0, n_clusters, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_pallas(clusters, origin, direction, t_init, interpret=False):
    """Pallas cluster sweep. Pads the ray batch to RAY_TILE internally."""
    r = origin.shape[0]
    r_pad = -(-r // RAY_TILE) * RAY_TILE
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        # Padding rays get t_init 0: `tn < best_t` is then always false,
        # so they can never mark a cluster hit nor record a triangle.
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_init = jnp.pad(t_init, (0, pad))

    o_aug, d_aug = _augment(origin, direction)
    n_clusters = clusters.aabb_min.shape[0]
    bmin_t = clusters.aabb_min.T  # (3, C) — scalar-friendly layout
    bmax_t = clusters.aabb_max.T

    grid = r_pad // RAY_TILE
    t, slot = pl.pallas_call(
        functools.partial(_tile_kernel, n_clusters=n_clusters),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bmin (3, C)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bmax (3, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # woop (C, 4, 384)
        ],
        out_specs=(
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_aug, d_aug, t_init[:, None], bmin_t, bmax_t, clusters.woop)
    return t[:r, 0], slot[:r, 0]


def lookup_hit(clusters, slot):
    """Resolve (normal (R,3), mat (R,)) from padded slot ids (one gather).
    Slot -1 (miss) returns normal 0 / mat 0 — callers mask by validity."""
    safe = jnp.maximum(slot, 0)
    c_idx = safe // CLUSTER_SIZE
    lane = safe % CLUSTER_SIZE
    normal = clusters.normal[c_idx, :, lane]     # (R, 3)
    mat = clusters.mat[c_idx, lane]
    return normal, mat
