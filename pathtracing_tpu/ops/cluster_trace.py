"""Cluster-sweep closest-hit traversal: pure-JAX oracle + Pallas TPU kernel.

See ``ops.clusters`` for the data layout and the design rationale (dense
regular compute instead of per-lane pointer chasing). Two implementations
of the same contract:

  trace_jax    — fori over clusters, every cluster evaluated masked for the
                 whole ray batch. Correct everywhere; the CPU/test path.
  trace_pallas — grid over RAY_TILE-ray tiles; each tile walks the
                 threaded cluster tree with one scalar register, and
                 subtrees no ray in the tile can improve on are skipped,
                 so work scales with rays' actual cluster footprints
                 (coherent tiles touch a handful of the C clusters). The
                 two (R,4)x(4,384) Woop matmuls run on the MXU at full
                 f32 precision (see the bf16 gotcha in PERF.md).

Contract: trace(clusters, origin, direction, t_init) -> (t, slot,
normal, mat) where ``t_init`` is the per-ray closest hit found so far
(e.g. from the sphere set — used for culling; 0 marks a dead lane that
short-circuits), ``t`` improves on it or passes it through, and
``slot = cluster*128 + lane`` indexes the padded cluster slots (-1 = no
triangle hit). Shading data is selected in-kernel (Pallas) or via one
batched gather (``lookup_hit``, CPU oracle path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracing_tpu.ops.clusters import CLUSTER_SIZE
from pathtracing_tpu.ops.intersect import T_MIN

RAY_TILE = 256  # rays per kernel program; best measured skip selectivity
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


def _pair_eval(o_aug, d_aug, woop_c, best_t, bf16: bool = False):
    """Dense ray-tile × 128-triangle Woop evaluation for one cluster.

    o_aug/d_aug: (R, 4); woop_c: (4, 3*128); best_t: (R, 1).
    Returns t_pair (R, 128) with misses at _BIG. ``bf16`` runs the two
    matmuls with bfloat16 inputs (f32 accumulation) — ~2x MXU rate for
    ~1e-3 relative coordinate error; the t/u/v arithmetic stays f32.
    """
    if bf16:
        o_aug = o_aug.astype(jnp.bfloat16)
        d_aug = d_aug.astype(jnp.bfloat16)
        woop_c = woop_c.astype(jnp.bfloat16)
    # Precision.HIGHEST is load-bearing: TPU f32 dots default to ONE
    # bf16x bf16 pass (~4e-3 relative t error), which shifts hit points
    # enough to self-intersect on secondary rays — rendered as concentric
    # shadow rings on large flat surfaces. The matmuls are far from the
    # kernel's bottleneck (PERF.md), so full f32 costs ~nothing here.
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    op = jnp.dot(o_aug, woop_c, preferred_element_type=jnp.float32,
                 precision=prec)
    dp = jnp.dot(d_aug, woop_c, preferred_element_type=jnp.float32,
                 precision=prec)
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
    """Reference sweep: all clusters, masked. Returns (t, slot, normal,
    mat) like ``trace_pallas`` (shading data via one gather — fine on
    CPU, where this path runs)."""
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

    best_t, best_slot = jax.lax.fori_loop(
        0, n_clusters, body,
        (t_init, jnp.full(origin.shape[0], -1, jnp.int32)),
    )
    normal, mat = lookup_hit(clusters, best_slot)
    miss = best_slot < 0
    normal = jnp.where(miss[:, None], 0.0, normal)
    mat = jnp.where(miss, 0, mat)
    return best_t, best_slot, normal, mat


def _tile_kernel(o_ref, d_ref, t0_ref, nbox_ref, nmeta_ref, woop_ref,
                 mat_ref, t_ref, slot_ref, normal_ref, hitmat_ref,
                 *, n_nodes: int, tile: int, bf16: bool):
    """One ray tile walking the threaded cluster tree.

    The walk is tile-uniform: ONE scalar node index for the whole tile
    (node boxes/meta in SMEM), while the vector lanes evaluate the
    tile-vs-AABB slab test. Descend on any-lane-hit, else jump the skip
    link; leaf clusters run the dense Woop evaluation under ``@pl.when``.
    Coherent tiles therefore visit only the clusters their frustum
    touches, and closing ``best_t`` culls subtrees behind the nearest
    hits. Woop data lives whole in VMEM (v1 — DMA streaming is the
    follow-up for scenes whose cluster data exceeds VMEM).
    """
    o_aug = o_ref[:]          # (tile, 4)
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    t_ref[:] = t0_ref[:]
    slot_ref[:] = jnp.full((tile, 1), -1, jnp.int32)
    normal_ref[:] = jnp.zeros((tile, 4), jnp.float32)
    hitmat_ref[:] = jnp.zeros((tile, 1), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, CLUSTER_SIZE), 1)

    def cond(idx):
        return idx < n_nodes

    def body(idx):
        best_t = t_ref[:]     # (tile, 1)
        b = (nbox_ref[0, idx], nbox_ref[1, idx], nbox_ref[2, idx],
             nbox_ref[3, idx], nbox_ref[4, idx], nbox_ref[5, idx])
        hit = _slab6(o_aug, inv_d, b, best_t)
        any_hit = jnp.any(hit)
        cid = nmeta_ref[1, idx]

        @pl.when(any_hit & (cid >= 0))
        def _():
            woop_c = woop_ref[cid]
            t_pair = _pair_eval(o_aug, d_aug, woop_c, best_t, bf16)
            t_min = jnp.min(t_pair, axis=1, keepdims=True)
            upd = t_min < best_t
            pick = t_pair <= t_min   # winning lane(s); ties -> min lane
            slot = jnp.min(
                jnp.where(pick, lane, CLUSTER_SIZE), axis=1, keepdims=True
            )
            first = pick & (lane == slot)

            # Shading data selected in-kernel — NO post-hit HBM gathers
            # (XLA TPU scatters/gathers with computed indices measure
            # orders of magnitude off; everything rides reductions).
            # Geometric normal ∝ the Woop w-row (M^-T column for n).
            k = CLUSTER_SIZE
            zeros = jnp.zeros((tile, k), jnp.float32)
            nx = jnp.sum(
                jnp.where(first, woop_c[0:1, 2 * k:], zeros),
                axis=1, keepdims=True,
            )
            ny = jnp.sum(
                jnp.where(first, woop_c[1:2, 2 * k:], zeros),
                axis=1, keepdims=True,
            )
            nz = jnp.sum(
                jnp.where(first, woop_c[2:3, 2 * k:], zeros),
                axis=1, keepdims=True,
            )
            inv_len = jax.lax.rsqrt(
                jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
            )
            mat_row = mat_ref[cid]  # (1, 128) i32
            mat_sel = jnp.max(
                jnp.where(first, mat_row, 0), axis=1, keepdims=True
            )

            t_ref[:] = jnp.where(upd, t_min, best_t)
            slot_ref[:] = jnp.where(
                upd, cid * CLUSTER_SIZE + slot, slot_ref[:]
            )
            n_new = jnp.concatenate(
                [nx * inv_len, ny * inv_len, nz * inv_len,
                 jnp.zeros((tile, 1), jnp.float32)], axis=1
            )
            normal_ref[:] = jnp.where(upd, n_new, normal_ref[:])
            hitmat_ref[:] = jnp.where(upd, mat_sel, hitmat_ref[:])

        return jnp.where(any_hit, idx + 1, nmeta_ref[0, idx])

    jax.lax.while_loop(cond, body, jnp.int32(0))


STACK_CAP = 256
LEAFQ_CAP = 2048


def _tile_kernel8(o_ref, d_ref, t0_ref, wbox_ref, wmeta_ref, woop_ref,
                  mat_ref, t_ref, slot_ref, normal_ref, hitmat_ref,
                  stack_ref, leafq_ref, *, tile: int, bf16: bool):
    """8-wide stack-based tile walk — the production traversal.

    Per-iteration cost on this hardware is dominated by scalar syncs
    (each vector→scalar reduction or branch ≈ 200-500 ns — PERF.md), so
    the loop is engineered to exactly ONE reduction and ONE branch per
    iteration: pop one wide node, slab-test its 8 child AABBs in a
    single vector block, collapse per-child any-ray-hit bits into one
    packed scalar, then push internal children / enqueue leaf clusters
    with fully branchless scalar stores (disabled stores land in
    reserved garbage slots). One queued leaf cluster is dense-evaluated
    per iteration under the single ``pl.when``. Children are ordered
    largest-area-first at build so best_t tightens early.
    """
    o_aug = o_ref[:]          # (tile, 4)
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    t_ref[:] = t0_ref[:]
    slot_ref[:] = jnp.full((tile, 1), -1, jnp.int32)
    normal_ref[:] = jnp.zeros((tile, 4), jnp.float32)
    hitmat_ref[:] = jnp.zeros((tile, 1), jnp.int32)
    stack_ref[0] = 0          # root
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, CLUSTER_SIZE), 1)

    def eval_cluster(cid):
        best_t = t_ref[:]
        woop_c = woop_ref[cid]
        t_pair = _pair_eval(o_aug, d_aug, woop_c, best_t, bf16)
        t_min = jnp.min(t_pair, axis=1, keepdims=True)
        upd = t_min < best_t
        pick = t_pair <= t_min
        slot = jnp.min(
            jnp.where(pick, lane, CLUSTER_SIZE), axis=1, keepdims=True
        )
        first = pick & (lane == slot)
        k = CLUSTER_SIZE
        zeros = jnp.zeros((tile, k), jnp.float32)
        nx = jnp.sum(jnp.where(first, woop_c[0:1, 2 * k:], zeros),
                     axis=1, keepdims=True)
        ny = jnp.sum(jnp.where(first, woop_c[1:2, 2 * k:], zeros),
                     axis=1, keepdims=True)
        nz = jnp.sum(jnp.where(first, woop_c[2:3, 2 * k:], zeros),
                     axis=1, keepdims=True)
        inv_len = jax.lax.rsqrt(
            jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
        )
        mat_sel = jnp.max(
            jnp.where(first, mat_ref[cid], 0), axis=1, keepdims=True
        )
        t_ref[:] = jnp.where(upd, t_min, best_t)
        slot_ref[:] = jnp.where(
            upd, cid * CLUSTER_SIZE + slot, slot_ref[:]
        )
        n_new = jnp.concatenate(
            [nx * inv_len, ny * inv_len, nz * inv_len,
             jnp.zeros((tile, 1), jnp.float32)], axis=1
        )
        normal_ref[:] = jnp.where(upd, n_new, normal_ref[:])
        hitmat_ref[:] = jnp.where(upd, mat_sel, hitmat_ref[:])

    def cond(carry):
        sp, lq = carry
        return (sp > 0) | (lq > 0)

    def body(carry):
        sp, lq = carry

        # Drain ONE queued leaf cluster — the only branch per iteration.
        @pl.when(lq > 0)
        def _():
            eval_cluster(leafq_ref[lq - 1])

        lq = jnp.maximum(lq - 1, 0)

        # Pop + expand one wide node (fully branchless scalar logic:
        # disabled stores land in reserved garbage slots).
        do_node = sp > 0
        node = stack_ref[jnp.maximum(sp - 1, 0)]
        sp = jnp.where(do_node, sp - 1, sp)
        boxes = wbox_ref[jnp.where(do_node, node, 0)]  # (6, 128)
        best_t = t_ref[:]

        tn = jnp.full((tile, 128), -_BIG)
        tf = jnp.full((tile, 128), _BIG)
        for ax in range(3):
            o = o_aug[:, ax:ax + 1]
            iv = inv_d[:, ax:ax + 1]
            t0 = (boxes[ax:ax + 1, :] - o) * iv
            t1 = (boxes[3 + ax:4 + ax, :] - o) * iv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > T_MIN) & (tn < best_t) & do_node

        # ONE vector→scalar reduction: OR over rays per child slot packed
        # into 8 bits (padding slots have inverted boxes and never hit;
        # exp2 of the lane id doubles as the 2^c weight).
        w = jnp.exp2(jnp.minimum(lane, 30).astype(jnp.float32))
        bits = jnp.sum(jnp.max(jnp.where(hit, w, 0.0), axis=0)).astype(
            jnp.int32
        )

        # Reverse order: LIFO pop visits the largest-area child first.
        for c in range(7, -1, -1):
            child = wmeta_ref[node, c]
            take = ((bits >> c) & 1) == 1
            is_node = take & (child >= 0)
            is_leaf = take & (child <= -2)
            stack_ref[jnp.where(is_node, sp, STACK_CAP - 1)] = child
            sp = sp + jnp.where(is_node, 1, 0)
            leafq_ref[jnp.where(is_leaf, lq, LEAFQ_CAP - 1)] = -child - 2
            lq = lq + jnp.where(is_leaf, 1, 0)

        return sp, lq

    jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "bf16", "wide"))
def trace_pallas(clusters, origin, direction, t_init, interpret=False,
                 tile=RAY_TILE, bf16=False, wide=False):
    """Pallas cluster-tree walk; returns (t, slot, normal, mat).

    Pads the ray batch to ``tile`` internally. Shading data comes out of
    the kernel (in-kernel argmin selection) so the caller never gathers.
    Rays with ``t_init <= 0`` (dead lanes) short-circuit: a tile whose
    rays are all dead walks exactly one node.
    """
    woop_bytes = clusters.woop.size * 4
    if woop_bytes > 96 * 1024 * 1024:
        raise ValueError(
            f"cluster data ({woop_bytes / 1e6:.0f} MB of Woop tensors) "
            "exceeds the whole-in-VMEM budget of this kernel "
            "(~1.5M triangles). Split the scene or use traversal="
            "'cluster_jax'; HBM->VMEM double-buffered streaming is the "
            "planned extension (PERF.md)."
        )
    r = origin.shape[0]
    r_pad = -(-r // tile) * tile
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        # Padding rays get t_init 0: `tn < best_t` is then always false,
        # so they can never mark a node hit nor record a triangle.
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_init = jnp.pad(t_init, (0, pad))

    o_aug, d_aug = _augment(origin, direction)
    n_nodes = clusters.node_meta.shape[1]

    grid = r_pad // tile
    ray_specs = [
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    data_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),   # woop (C, 4, 384)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # mat (C, 1, 128)
    ]
    common = dict(
        grid=(grid,),
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    if wide:
        t, slot, normal, mat = pl.pallas_call(
            functools.partial(_tile_kernel8, tile=tile, bf16=bf16),
            in_specs=ray_specs + [
                pl.BlockSpec(memory_space=pltpu.VMEM),  # wide_box (M,6,8)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # wide_meta (M,8)
            ] + data_specs,
            scratch_shapes=[
                pltpu.SMEM((STACK_CAP,), jnp.int32),   # node stack
                pltpu.SMEM((LEAFQ_CAP,), jnp.int32),   # leaf cluster queue
            ],
            **common,
        )(o_aug, d_aug, t_init[:, None], clusters.wide_box,
          clusters.wide_meta, clusters.woop, clusters.mat[:, None, :])
    else:
        t, slot, normal, mat = pl.pallas_call(
            functools.partial(_tile_kernel, n_nodes=n_nodes, tile=tile,
                              bf16=bf16),
            in_specs=ray_specs + [
                pl.BlockSpec(memory_space=pltpu.SMEM),  # node_box (6, N)
                pl.BlockSpec(memory_space=pltpu.SMEM),  # node_meta (2, N)
            ] + data_specs,
            **common,
        )(o_aug, d_aug, t_init[:, None], clusters.node_box,
          clusters.node_meta, clusters.woop, clusters.mat[:, None, :])
    return t[:r, 0], slot[:r, 0], normal[:r, 0:3], mat[:r, 0]


def lookup_hit(clusters, slot):
    """Resolve (normal (R,3), mat (R,)) from padded slot ids (one gather).
    Slot -1 (miss) returns normal 0 / mat 0 — callers mask by validity."""
    safe = jnp.maximum(slot, 0)
    c_idx = safe // CLUSTER_SIZE
    lane = safe % CLUSTER_SIZE
    normal = clusters.normal[c_idx, :, lane]     # (R, 3)
    mat = clusters.mat[c_idx, lane]
    return normal, mat
