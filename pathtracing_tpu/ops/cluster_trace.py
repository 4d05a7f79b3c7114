"""Cluster-sweep closest-hit traversal: pure-JAX oracle + Pallas kernels.

See ``ops.clusters`` for the data layout and the design rationale (dense
regular compute instead of per-lane pointer chasing). One contract,
several implementations:

  trace_jax      — fori over clusters, every cluster evaluated masked
                   for the whole ray batch. Correct everywhere; the
                   CPU/test oracle.
  trace_pallas   — grid over RAY_TILE-ray tiles; each tile walks the
                   cluster tree with scalar registers while the vector
                   lanes do the geometry. Production configuration:
                   octant-ordered links (front-to-back per tile) and
                   the K-step lookahead kernel (_tile_kernel_la: one
                   packed-bits sync per K tree steps, cand_box vector
                   blocks, FIFO leaf-queue drain). ``lookahead=0``
                   selects the simple one-node-per-iteration walk. The
                   (R,4)x(4,384) Woop matmuls run on the MXU at full
                   f32 precision (see the bf16 gotcha in PERF.md).
  occluded_pallas — any-hit shadow query: same walk, no shading
                   epilogue, occluded lanes short-circuit.
  trace_pallas_paged — HBM page streaming for scenes past the
                   whole-in-VMEM budget (grid pages × tiles, per-ray
                   state in persistent VMEM scratch).

Contract: trace(clusters, origin, direction, t_init) -> (t, slot,
normal, mat) where ``t_init`` is the per-ray closest hit found so far
(e.g. from the sphere set — used for culling; 0 marks a dead lane that
short-circuits), ``t`` improves on it or passes it through, and
``slot = cluster*128 + lane`` indexes the padded cluster slots (-1 = no
triangle hit). Shading data is selected in-kernel (Pallas) or via one
batched gather (``lookup_hit``, CPU oracle path). Kernel-variant and
paged-path equivalence to the oracle is locked by tests/test_clusters;
perf history and negative results live in PERF.md.
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
# The dense nearest-first kernels prefer narrower tiles: the per-tile
# cluster footprint (union over rays) drives iteration count, and 128
# rays measure ~30% faster than 256 on bounce waves (PERF.md r2) — and
# make every wave fastest UNSORTED (image/pool order beats octant bins).
DNF_TILE = 128
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
        # bf16 mode keeps the MXU matmul formulation (one bf16 pass).
        o_aug = o_aug.astype(jnp.bfloat16)
        d_aug = d_aug.astype(jnp.bfloat16)
        woop_c = woop_c.astype(jnp.bfloat16)
        op = jnp.dot(o_aug, woop_c, preferred_element_type=jnp.float32)
        dp = jnp.dot(d_aug, woop_c, preferred_element_type=jnp.float32)
    else:
        # VPU broadcast FMAs, NOT an MXU matmul: the contraction dim is
        # 4, which wastes 97% of the systolic array — and exact f32
        # (load-bearing: one default bf16 pass gives ~4e-3 relative t
        # error → self-intersections rendered as concentric shadow
        # rings) would need a 6-pass emulation on top. Four broadcast
        # FMAs are bit-exact f32 at ~4x the measured speed (PERF.md r2);
        # o_aug[3] = 1 and d_aug[3] = 0 drop one term from each.
        op = woop_c[3:4, :] + o_aug[:, 0:1] * woop_c[0:1, :]
        op = op + o_aug[:, 1:2] * woop_c[1:2, :]
        op = op + o_aug[:, 2:3] * woop_c[2:3, :]
        dp = d_aug[:, 0:1] * woop_c[0:1, :]
        dp = dp + d_aug[:, 1:2] * woop_c[1:2, :]
        dp = dp + d_aug[:, 2:3] * woop_c[2:3, :]
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


def _tile_kernel(o_ref, d_ref, t0_ref, oct_ref, nbox_ref, nmeta_ref,
                 links_ref, woop_ref, mat_ref, t_ref, slot_ref,
                 normal_ref, hitmat_ref,
                 *, n_nodes: int, tile: int, bf16: bool, ordered: bool):
    """One ray tile walking the threaded cluster tree.

    The walk is tile-uniform: ONE scalar node index for the whole tile
    (node boxes/meta in SMEM), while the vector lanes evaluate the
    tile-vs-AABB slab test. Descend on any-lane-hit, else jump the skip
    link; leaf clusters run the dense Woop evaluation under ``@pl.when``.
    Coherent tiles therefore visit only the clusters their frustum
    touches, and closing ``best_t`` culls subtrees behind the nearest
    hits. Woop data lives whole in VMEM (``trace_pallas_paged`` streams
    HBM pages for scenes past that budget).

    With ``ordered`` the walk follows the tile's direction-octant links
    (``ClusterSet.oct_links``): true front-to-back descent, so best_t
    snaps to the nearest geometry after the first leaf evals and the
    ``tn < best_t`` test culls everything behind — the big win on
    binned secondary waves whose cluster footprint is otherwise huge.
    """
    o_aug = o_ref[:]          # (tile, 4)
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    t_ref[:] = t0_ref[:]
    slot_ref[:] = jnp.full((tile, 1), -1, jnp.int32)
    normal_ref[:] = jnp.zeros((tile, 4), jnp.float32)
    hitmat_ref[:] = jnp.zeros((tile, 1), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, CLUSTER_SIZE), 1)
    oct = oct_ref[0, pl.program_id(0)]

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

        if ordered:
            return jnp.where(
                any_hit, links_ref[oct, idx], links_ref[8 + oct, idx]
            )
        return jnp.where(any_hit, idx + 1, nmeta_ref[0, idx])

    jax.lax.while_loop(cond, body, jnp.int32(0))


LEAFQ_CAP = 2048


def _tile_kernel_la(o_ref, d_ref, t0_ref, oct_ref, nbox_ref, nmeta_ref,
                    links_ref, cbox_ref, woop_ref, mat_ref, t_ref,
                    slot_ref, normal_ref, hitmat_ref, leafq_ref, *,
                    n_nodes: int, tile: int, bf16: bool, lookahead: int,
                    drain: int, drain_always: bool, leafq_cap: int):
    """Octant-ordered walk advancing K = ``lookahead`` nodes/iteration.

    PERF.md's round-1 numbers said the wall was per-iteration scalar
    sync cost (~264 ns loop + ~200 ns/reduction + ~500 ns/branch);
    round-2 measurement added a second wall: EVERY scalar op counts —
    speculative meta loads and O(2^K) select-tree decodes cost ~3 µs an
    iteration on their own. This kernel amortizes the syncs over K tree
    steps while keeping the scalar work O(K):

      * All 2^K - 1 nodes the next K octant-ordered steps COULD visit
        are slab-tested in ONE (tile, 128) vector block fed by ONE
        dynamic VMEM load (``ClusterSet.cand_box`` precomputes each
        node's candidate heap per octant), and their any-ray-hit bits
        collapse into a single packed scalar — one reduction per K
        steps.
      * Only the REALIZED path is decoded: heap position ci doubles as
        the packed-bit index (one dynamic shift per step), and one SMEM
        link load follows the realized edge — ~8 scalar ops per tree
        step, no speculative loads, no select trees, no extra branches.
      * Hit leaves push their cluster id into an SMEM queue (branchless
        clamped stores); up to ``drain`` queued clusters are
        dense-evaluated per iteration under the single ``pl.when``
        (or unconditionally with ``drain_always`` — duplicates are
        idempotent). Short queues re-evaluate the tail cluster.

    Speculation is conservative: candidates are tested against the
    best_t at iteration start, so a subtree the sequential walk would
    have culled by a mid-window leaf eval may still be entered — extra
    visits, never wrong answers. Drains run at the top of the iteration
    so culling uses the freshest best_t available.
    """
    o_aug = o_ref[:]          # (tile, 4)
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    t_ref[:] = t0_ref[:]
    slot_ref[:] = jnp.full((tile, 1), -1, jnp.int32)
    normal_ref[:] = jnp.zeros((tile, 4), jnp.float32)
    hitmat_ref[:] = jnp.zeros((tile, 1), jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, CLUSTER_SIZE), 1)

    n_cand = 2 ** lookahead - 1  # speculative heap size
    oct = oct_ref[0, pl.program_id(0)]
    if drain_always:
        leafq_ref[0] = 0  # empty-queue drains read a valid cluster id

    # Loop-invariant packed-bit weights: exp2 of the lane's position
    # inside ITS 16-lane window (transcendentals inside the loop cost
    # ~0.5 µs/iteration on a (tile, 128) block). The per-iteration
    # window select is a single integer compare against win // 16.
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    lane_win = lane128 // 16
    w_fixed = jnp.where(
        (lane128 % 16) < n_cand,
        jnp.exp2((lane128 % 16).astype(jnp.float32)), 0.0,
    )

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
        idx, head, tail = carry
        return (idx < n_nodes) | (head < tail)

    def body(carry):
        idx, head, tail = carry

        # Drain up to ``drain`` queued leaf clusters first (freshest
        # best_t for this iteration's culling) — FIFO: with front-to-
        # back pushes the OLDEST queued leaf is the nearest one, and
        # evaluating it first is what snaps best_t shut (a LIFO drain
        # evaluates far leaves first and measured ~3x extra node visits
        # from the stale best_t). ``drain_always`` trades the ~500 ns
        # pl.when branch for an occasional duplicate eval (closest-hit
        # updates are idempotent; leafq[0] is pre-initialized so an
        # empty queue reads a valid id).
        if drain == 0:
            pass  # timing mode: pure walk, NO leaf evals (wrong results)
        elif drain_always:
            for j in range(drain):
                eval_cluster(
                    leafq_ref[jnp.minimum(head + j, jnp.maximum(tail - 1, 0))]
                )
        else:
            @pl.when(head < tail)
            def _():
                for j in range(drain):
                    eval_cluster(
                        leafq_ref[
                            jnp.minimum(head + j, jnp.maximum(tail - 1, 0))
                        ]
                    )

        head = jnp.minimum(head + max(drain, 1), tail)

        # ONE dynamic VMEM load fetches the precomputed candidate-heap
        # AABB block for this (octant, node): every node reachable in
        # the next K octant-ordered steps, slab-tested in one (tile,
        # 128) vector block (the row packs 8 nodes × 16-lane windows).
        valid0 = idx < n_nodes
        base = jnp.where(valid0, idx, 0)
        best_t = t_ref[:]
        row = cbox_ref[oct, base // 8]   # (6, 128)
        tn = jnp.full((tile, 128), -_BIG)
        tf = jnp.full((tile, 128), _BIG)
        for ax in range(3):
            o = o_aug[:, ax:ax + 1]
            iv = inv_d[:, ax:ax + 1]
            t0 = (row[ax:ax + 1, :] - o) * iv
            t1 = (row[3 + ax:4 + ax, :] - o) * iv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > T_MIN) & (tn < best_t)
        hit = hit & (lane_win == base % 8)

        # THE one vector→scalar reduction: P any-bits in one packed sum
        # (only this node's 16-lane window survives the mask above).
        bits = jnp.sum(
            jnp.max(jnp.where(hit, w_fixed, 0.0), axis=0)
        ).astype(jnp.int32)

        # Decode ONLY the realized path — no speculative meta loads, no
        # per-slot select trees (the round-2 scalar wall: O(2^K) selects
        # measured ~3 µs/iteration at K=4). Heap position ci tracks
        # which packed bit belongs to the realized node; one dynamic
        # shift extracts it, one SMEM load follows the realized link.
        def push(ok, cid):
            nonlocal tail
            ok = ok & (cid >= 0) & (tail < leafq_cap)
            leafq_ref[jnp.where(ok, tail, leafq_cap - 1)] = cid
            tail = tail + jnp.where(ok, 1, 0)

        ci = jnp.int32(0)              # realized heap position
        node = base
        hitb = (bits & 1) == 1
        ended = jnp.logical_not(valid0)
        push(jnp.logical_not(ended) & hitb, nmeta_ref[1, node])

        def succ(node_c, take_hit):
            return links_ref[jnp.where(take_hit, oct, 8 + oct), node_c]

        for _ in range(1, lookahead):
            node_n = succ(node, hitb)
            ended = ended | (node_n >= n_nodes)
            live = jnp.logical_not(ended)
            node = jnp.where(live, node_n, node)
            ci = 2 * ci + jnp.where(hitb, 1, 2)
            hitb = ((bits >> ci) & 1) == 1
            push(live & hitb, nmeta_ref[1, node])

        nxt = jnp.where(
            ended, jnp.int32(n_nodes), succ(node, hitb)
        )
        return nxt, head, tail

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )


def _tile_kernel_occ_la(o_ref, d_ref, t0_ref, oct_ref, nbox_ref,
                        nmeta_ref, links_ref, cbox_ref, woop_ref, occ_ref,
                        leafq_ref, *, n_nodes: int, tile: int,
                        lookahead: int, drain: int, leafq_cap: int):
    """Any-hit occlusion walk with the K-step lookahead structure of
    ``_tile_kernel_la`` (same cand_box blocks, same packed-bits decode)
    but a far lighter leaf evaluation: flip the per-lane occlusion bit,
    no slot/normal/material bookkeeping. Occluded lanes drop their
    t-cap to 0 and vanish from every later slab test."""
    o_aug = o_ref[:]
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    occ_ref[:] = jnp.zeros((tile, 1), jnp.float32)
    t_cap0 = t0_ref[:]
    oct = oct_ref[0, pl.program_id(0)]
    n_cand = 2 ** lookahead - 1

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    lane_win = lane128 // 16
    w_fixed = jnp.where(
        (lane128 % 16) < n_cand,
        jnp.exp2((lane128 % 16).astype(jnp.float32)), 0.0,
    )

    def eval_cluster(cid, cap):
        t_pair = _pair_eval(o_aug, d_aug, woop_ref[cid], cap)
        t_min = jnp.min(t_pair, axis=1, keepdims=True)
        occ_ref[:] = jnp.where(t_min < cap, 1.0, occ_ref[:])

    def cond(carry):
        idx, head, tail = carry
        return (idx < n_nodes) | (head < tail)

    def body(carry):
        idx, head, tail = carry
        cap = jnp.where(occ_ref[:] > 0.0, 0.0, t_cap0)

        @pl.when(head < tail)
        def _():
            for j in range(drain):
                eval_cluster(
                    leafq_ref[
                        jnp.minimum(head + j, jnp.maximum(tail - 1, 0))
                    ], cap,
                )

        head = jnp.minimum(head + drain, tail)
        cap = jnp.where(occ_ref[:] > 0.0, 0.0, t_cap0)

        valid0 = idx < n_nodes
        base = jnp.where(valid0, idx, 0)
        row = cbox_ref[oct, base // 8]
        tn = jnp.full((tile, 128), -_BIG)
        tf = jnp.full((tile, 128), _BIG)
        for ax in range(3):
            o = o_aug[:, ax:ax + 1]
            iv = inv_d[:, ax:ax + 1]
            t0 = (row[ax:ax + 1, :] - o) * iv
            t1 = (row[3 + ax:4 + ax, :] - o) * iv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > T_MIN) & (tn < cap)
        hit = hit & (lane_win == base % 8)
        bits = jnp.sum(
            jnp.max(jnp.where(hit, w_fixed, 0.0), axis=0)
        ).astype(jnp.int32)

        def push(ok, cid):
            nonlocal tail
            ok = ok & (cid >= 0) & (tail < leafq_cap)
            leafq_ref[jnp.where(ok, tail, leafq_cap - 1)] = cid
            tail = tail + jnp.where(ok, 1, 0)

        ci = jnp.int32(0)
        node = base
        hitb = (bits & 1) == 1
        ended = jnp.logical_not(valid0)
        push(jnp.logical_not(ended) & hitb, nmeta_ref[1, node])

        def succ(node_c, take_hit):
            return links_ref[jnp.where(take_hit, oct, 8 + oct), node_c]

        for _ in range(1, lookahead):
            node_n = succ(node, hitb)
            ended = ended | (node_n >= n_nodes)
            live = jnp.logical_not(ended)
            node = jnp.where(live, node_n, node)
            ci = 2 * ci + jnp.where(hitb, 1, 2)
            hitb = ((bits >> ci) & 1) == 1
            push(live & hitb, nmeta_ref[1, node])

        nxt = jnp.where(ended, jnp.int32(n_nodes), succ(node, hitb))
        return nxt, head, tail

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )


_INT_MAX = 2147483647


def _dnf_phase1(o_aug, inv_d, cb_ref, best0, tile: int, c_pad: int,
                idx_bits: int, n_clusters: int, interleave: int = 0):
    """Dense slab test of the whole tile against ALL cluster AABBs.

    Returns keys (tile, c_pad) i32 packing each (ray, cluster) pair's
    clamped entry distance's high bits with the cluster index — positive
    f32s order identically as i32 bit patterns, so ONE min-reduction
    over the whole block finds the tile-globally-nearest alive pair AND
    its cluster id, and comparing a key against a (+1 quantum inflated)
    bit-cast best_t is a CONSERVATIVE aliveness test (may keep a pair
    whose tn just reached best_t — an extra eval, never a wrong cull).
    Stealing ``idx_bits`` mantissa bits only coarsens near-tie ordering.
    Misses — and the padding columns, whose "inverted" boxes degenerate
    to always-hit slabs — read _INT_MAX.
    """
    tn = jnp.full((tile, c_pad), -_BIG)
    tf = jnp.full((tile, c_pad), _BIG)
    for ax in range(3):
        o = o_aug[:, ax:ax + 1]
        iv = inv_d[:, ax:ax + 1]
        t0a = (cb_ref[ax:ax + 1, :] - o) * iv
        t1a = (cb_ref[3 + ax:4 + ax, :] - o) * iv
        tn = jnp.maximum(tn, jnp.minimum(t0a, t1a))
        tf = jnp.minimum(tf, jnp.maximum(t0a, t1a))
    cidx = jax.lax.broadcasted_iota(jnp.int32, (tile, c_pad), 1)
    if interleave:
        # Windowed layout: the caller permuted the bounds columns so
        # column j holds cluster id (j % 128)*nw + j//128 — adjacent
        # cluster ids (spatial SAH neighbors) land in DIFFERENT 128-lane
        # windows. Keys must carry the TRUE id.
        cidx = (cidx % 128) * interleave + cidx // 128
    # ``best0 > 0.0`` kills dead lanes (t_init = 0) outright: without
    # it, an origin-enclosing cluster has tn < 0 < any clamp, so its
    # clamped key (tnc = 0) would survive every cull and all-dead tiles
    # would still pop/evaluate each enclosing cluster once (harmless —
    # evals are idempotent — but it broke the "all-dead tiles cost
    # ~phase1 only" compaction win; ADVICE r2).
    hit = ((tn <= tf) & (tf > T_MIN) & (tn < best0) & (best0 > 0.0)
           & (cidx < n_clusters))
    tnc = jnp.maximum(tn, 0.0)
    keys = (
        jax.lax.bitcast_convert_type(tnc, jnp.int32)
        & jnp.int32(~((1 << idx_bits) - 1))
    ) | cidx
    return jnp.where(hit, keys, _INT_MAX)


def _bt_inflate(best_t, idx_bits: int):
    """Bit-cast best_t (+1 key quantum) for conservative int-space
    culling: key(tn) < inflate(bt) is implied by tn < bt (keys round tn
    DOWN by idx_bits bits then add an index < one quantum)."""
    return jax.lax.bitcast_convert_type(
        jnp.maximum(best_t, 0.0), jnp.int32
    ) + jnp.int32(1 << idx_bits)


def _dnf_pop_group(row, rowc, n_clusters: int, idx_bits: int, p: int):
    """Pop the ``p`` smallest keys from a (1, c_pad) row. Returns
    (cluster ids, valid flags, row with popped columns killed). Invalid
    pops clamp to a real cluster id (idempotent duplicate evals)."""
    ids, valids = [], []
    for _ in range(p):
        kmin = jnp.min(row)
        valid = kmin < _INT_MAX
        c = jnp.minimum(kmin & ((1 << idx_bits) - 1), n_clusters - 1)
        ids.append(c)
        valids.append(valid)
        row = jnp.where(rowc == c, _INT_MAX, row)
    return ids, valids, row


def _dnf_pop_window(row, rowc, n_clusters: int, idx_bits: int, p: int,
                    win2: bool = False):
    """Windowed pop: ONE vector min per 128-lane window of the row, then
    a scalar-core insertion tournament keeps the ``p`` smallest window
    minima — replacing ``p`` SERIAL min-reduce→scalar syncs with nw
    INDEPENDENT (pipelineable) extractions plus cheap scalar compares.
    Requires the interleaved column layout (``_dnf_phase1`` with
    ``interleave=nw``): spatially adjacent cluster ids sit in different
    windows, so the p nearest clusters usually occupy distinct windows;
    when they do not, the runner-up pops one iteration later (extra
    iterations, never wrong answers — evals are idempotent).
    ``win2`` also extracts each window's SECOND-smallest key (mask the
    min's lane — keys are unique, every column carries a distinct
    cluster id — and reduce again): 2nw tournament candidates, so a
    collision among the p nearest costs a runner-up pop THIS iteration
    instead of a whole extra iteration. Measurement variant for the
    windowed pop's ~1.35x collision-waste term (PERF.md r3e).
    Returns (ids, valids, any_valid, retire column mask). ``any_valid``
    is the loop-continuation signal: with the p >= n_cands shortcut the
    group is NOT sorted, so ``valids[0]`` alone would terminate early
    when window 0 happens to be empty."""
    nw = row.shape[1] // 128
    r = row.reshape(nw, 128)
    wmin = jnp.min(r, axis=1)                      # (nw,)
    cands = [wmin[i] for i in range(nw)]
    if win2:
        r2 = jnp.where(r == wmin[:, None], _INT_MAX, r)
        wmin2 = jnp.min(r2, axis=1)                # (nw,)
        cands += [wmin2[i] for i in range(nw)]
    if p >= len(cands):
        # One pop per candidate — no tournament needed (order within the
        # group is irrelevant: evals are idempotent and the conservative
        # cull only needs the true nearest to be IN the group).
        best = cands + [jnp.int32(_INT_MAX)] * (p - len(cands))
    else:
        best = [jnp.int32(_INT_MAX)] * p
        for v in cands:
            for j in range(p):
                lo = jnp.minimum(best[j], v)
                v = jnp.maximum(best[j], v)
                best[j] = lo
    ids, valids = [], []
    retire = jnp.zeros(row.shape, jnp.bool_)
    any_valid = jnp.bool_(False)
    for b in best:
        valid = b < _INT_MAX
        c = jnp.minimum(b & ((1 << idx_bits) - 1), n_clusters - 1)
        pos = (c % nw) * 128 + c // nw   # column of id c (interleaved)
        ids.append(c)
        valids.append(valid)
        any_valid = any_valid | valid
        retire = retire | ((rowc == pos) & valid)
    return ids, valids, any_valid, retire


def _dnf_gather_group(woop_ref, ids, k: int):
    """Concatenate ``len(ids)`` clusters' Woop tensors into one grouped
    (4, 3*P*k) block ordered u-block | v-block | w-block, so the dense
    pair evaluation runs once over P*k lanes instead of P times over k."""
    blocks = [woop_ref[c] for c in ids]   # each (4, 3k)
    parts = []
    for comp in range(3):
        parts += [b[:, comp * k:(comp + 1) * k] for b in blocks]
    return jnp.concatenate(parts, axis=1)


def _pair_eval_wide(o_aug, d_aug, w_cat, best_t, kp: int,
                    bf16: bool = False):
    """_pair_eval over a grouped Woop block (4, 3*kp), on the VPU.

    The contraction dim is 4 (homogeneous coords), so an MXU matmul
    wastes 97% of the systolic array — and exact f32 needs a 6-pass
    bf16 emulation on top (measured ~0.9 µs per 128-triangle cluster).
    Four broadcast FMAs per operand on the VPU are bit-exact f32 at ~4x
    the speed; d_aug[3] = 0 and o_aug[3] = 1 drop a term from each.
    ``bf16`` (measurement-only, PERF.md r3) swaps in the single-pass
    bf16 MXU matmul — ~1e-3 relative t error, never production."""
    if bf16:
        o16 = o_aug.astype(jnp.bfloat16)
        d16 = d_aug.astype(jnp.bfloat16)
        w16 = w_cat.astype(jnp.bfloat16)
        op = jnp.dot(o16, w16, preferred_element_type=jnp.float32)
        dp = jnp.dot(d16, w16, preferred_element_type=jnp.float32)
        op_u, op_v, op_w = op[:, :kp], op[:, kp:2 * kp], op[:, 2 * kp:]
        dp_u, dp_v, dp_w = dp[:, :kp], dp[:, kp:2 * kp], dp[:, 2 * kp:]
        dw = jnp.where(jnp.abs(dp_w) < 1e-30, 1e-30, dp_w)
        t = -op_w / dw
        u = op_u + t * dp_u
        v = op_v + t * dp_v
        ok = (
            (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > T_MIN) & (t < best_t)
        )
        return jnp.where(ok, t, _BIG)
    op = w_cat[3:4, :] + o_aug[:, 0:1] * w_cat[0:1, :]
    op = op + o_aug[:, 1:2] * w_cat[1:2, :]
    op = op + o_aug[:, 2:3] * w_cat[2:3, :]
    dp = d_aug[:, 0:1] * w_cat[0:1, :]
    dp = dp + d_aug[:, 1:2] * w_cat[1:2, :]
    dp = dp + d_aug[:, 2:3] * w_cat[2:3, :]
    op_u, op_v, op_w = op[:, :kp], op[:, kp:2 * kp], op[:, 2 * kp:]
    dp_u, dp_v, dp_w = dp[:, :kp], dp[:, kp:2 * kp], dp[:, 2 * kp:]
    dw = jnp.where(jnp.abs(dp_w) < 1e-30, 1e-30, dp_w)
    t = -op_w / dw
    u = op_u + t * dp_u
    v = op_v + t * dp_v
    ok = (
        (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > T_MIN) & (t < best_t)
    )
    return jnp.where(ok, t, _BIG)


def _dnf_eval_group(o_aug, d_aug, w_cat, mat_cat, ids, id_base, group,
                    tile, t_ref, slot_ref, normal_ref, hitmat_ref,
                    debug_mode=0, bf16=False, seg=None):
    """Dense group evaluation + shading epilogue shared by the flat and
    paged DNF kernels. ``w_cat`` (4, 3*kp) / ``mat_cat`` (1, kp) are the
    caller-gathered group blocks (the gather differs: flat vs page-local
    refs); ``id_base`` offsets page-local cluster ids to global ids for
    the slot encoding (0 for the flat kernel). ``seg`` = (cs, ce) when
    the output refs cover a multi-chain block and this eval updates only
    rows [cs, ce): the refs are loaded/stored WHOLE with value-level
    slicing — Mosaic rejects row-slices of lane-narrow (N, 1)/(N, 4)
    refs (memref_slice must be 128-lane aligned)."""
    k = CLUSTER_SIZE
    kp = k * group
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, kp), 1)

    def load(ref):
        full = ref[:]
        if seg is None:
            return full, full
        return full, full[seg[0]:seg[1]]

    def store(ref, full, new_seg):
        if seg is None:
            ref[:] = new_seg
            return
        cs, ce = seg
        parts = ([full[:cs]] if cs else []) + [new_seg] \
            + ([full[ce:]] if ce < full.shape[0] else [])
        ref[:] = parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=0
        )

    t_full, best_t = load(t_ref)
    t_pair = _pair_eval_wide(o_aug, d_aug, w_cat, best_t, kp, bf16)
    t_min = jnp.min(t_pair, axis=1, keepdims=True)
    upd = t_min < best_t
    if debug_mode == 2:   # timing bisection: no shading epilogue
        store(t_ref, t_full, jnp.where(upd, t_min, best_t))
        return
    pick = t_pair <= t_min
    slot = jnp.min(
        jnp.where(pick, lane, kp), axis=1, keepdims=True
    )
    first = pick & (lane == slot)
    zeros = jnp.zeros((tile, kp), jnp.float32)
    # Normal rows: the w-block of the grouped tensor IS the stacked
    # M w-rows of all `group` clusters, already lane-aligned with
    # t_pair.
    wb = w_cat[:, 2 * kp:]
    nx = jnp.sum(jnp.where(first, wb[0:1], zeros),
                 axis=1, keepdims=True)
    ny = jnp.sum(jnp.where(first, wb[1:2], zeros),
                 axis=1, keepdims=True)
    nz = jnp.sum(jnp.where(first, wb[2:3], zeros),
                 axis=1, keepdims=True)
    inv_len = jax.lax.rsqrt(
        jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30)
    )
    mat_sel = jnp.max(
        jnp.where(first, mat_cat, 0), axis=1, keepdims=True
    )
    # Winning lane -> (cluster id, lane within cluster).
    cwin = ids[0]
    for j in range(1, group):
        cwin = jnp.where(slot >= j * k, ids[j], cwin)
    gslot = (id_base + cwin) * k + (slot & (k - 1))
    store(t_ref, t_full, jnp.where(upd, t_min, best_t))
    slot_full, slot_cur = load(slot_ref)
    store(slot_ref, slot_full, jnp.where(upd, gslot, slot_cur))
    n_new = jnp.concatenate(
        [nx * inv_len, ny * inv_len, nz * inv_len,
         jnp.zeros((tile, 1), jnp.float32)], axis=1
    )
    normal_full, normal_cur = load(normal_ref)
    store(normal_ref, normal_full, jnp.where(upd, n_new, normal_cur))
    hm_full, hm_cur = load(hitmat_ref)
    store(hitmat_ref, hm_full, jnp.where(upd, mat_sel, hm_cur))


def _tile_kernel_dnf(o_ref, d_ref, t0_ref, cb_ref, woop_ref, mat_ref,
                     t_ref, slot_ref, normal_ref, hitmat_ref,
                     key_ref, dead_ref, *, n_clusters: int,
                     tile: int, c_pad: int, idx_bits: int, group: int,
                     windowed: bool = False, debug_mode: int = 0,
                     band: int = 0, bf16: bool = False,
                     pops: int = 1, eval_always: bool = False,
                     chains: int = 1, win2: bool = False):
    """Dense nearest-first closest-hit: NO tree, NO scalar walk.

    The round-2 lookahead kernel sits near the scalar-op floor (~0.4 µs
    per visited tree node) but incoherent tiles still visit ~480 nodes
    for ~83 leaf evaluations (walk_stats) — scalar syncs scale with
    VISITS. This kernel makes them scale with EVALS (walk_stats: 13.5
    camera / 65 bounce evals per 256-ray tile at 216 bins — and DNF's
    exact per-ray front-to-back culling needs ~25% fewer evals than the
    threaded walk): one dense vector pass slab-tests the tile against
    every cluster AABB at once, then each loop iteration

      1. re-culls the packed-key matrix against the freshly tightened
         per-ray best_t (conservative int-space compare — no float tn
         matrix to maintain) and min-reduces it over rays to a
         (1, c_pad) row,
      2. pops the ``group`` nearest not-yet-evaluated clusters from the
         row with cheap row-width ops (one scalar sync per pop),
      3. dense-evaluates all ``group`` clusters in ONE widened Woop
         pass — same op count as a single-cluster eval on blocks
         ``group``x wider, so the expensive full-matrix cull pass and
         the per-eval epilogue both amortize.

    Within a group best_t is one step stale — extra (idempotent) evals,
    never wrong answers. Evaluated clusters are retired via a (1, c_pad)
    dead-row (the key matrix itself is written once and never touched).

    Two measured negative variants were reverted (PERF.md r2c): a
    ``recull``-stride that amortized the full-matrix re-cull (the matrix
    pass is VMEM-bandwidth-cheap; no gain) and an aligned-quad pop that
    popped one cluster per sync but evaluated its whole SAH-neighbor
    block via one contiguous pre-transposed load (superset evals cost
    more than the saved syncs: 2.12 vs 3.16 Mrays/s on bounce waves).
    """
    nrows = tile * chains
    o_aug = o_ref[:]          # (tile*chains, 4)
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    t_ref[:] = t0_ref[:]
    slot_ref[:] = jnp.full((nrows, 1), -1, jnp.int32)
    normal_ref[:] = jnp.zeros((nrows, 4), jnp.float32)
    hitmat_ref[:] = jnp.zeros((nrows, 1), jnp.int32)
    k = CLUSTER_SIZE
    rowc = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)

    keys0 = _dnf_phase1(o_aug, inv_d, cb_ref, t0_ref[:], nrows,
                        c_pad, idx_bits, n_clusters,
                        interleave=c_pad // 128 if windowed else 0)
    if band:
        # Banded cull (measured experiment, PERF.md r3): reduce the key
        # matrix ONCE to per-band minima over contiguous ``band``-ray
        # row bands; each iteration then culls the (tile/band, c_pad)
        # band matrix against the band's max live cap instead of the
        # full per-ray matrix. Conservative — a pair live per-ray is
        # live per-band — so results stay exact; the coarser cull only
        # admits extra idempotent evals.
        nbands = tile // band
        key_ref[:] = jnp.concatenate(
            [jnp.min(keys0[b * band:(b + 1) * band, :], axis=0,
                     keepdims=True) for b in range(nbands)], axis=0
        )
    else:
        key_ref[:] = keys0
    dead_ref[:] = jnp.zeros((chains, c_pad), jnp.int32)

    def eval_group(ids, ch):
        cs, ce = ch * tile, (ch + 1) * tile
        w_cat = _dnf_gather_group(woop_ref, ids, k)   # (4, 3*kp)
        mat_cat = jnp.concatenate([mat_ref[c] for c in ids], axis=1)
        _dnf_eval_group(o_aug[cs:ce], d_aug[cs:ce], w_cat, mat_cat, ids,
                        0, group * pops, tile, t_ref, slot_ref,
                        normal_ref, hitmat_ref, debug_mode, bf16,
                        seg=None if chains == 1 else (cs, ce))

    def chain_step(ch):
        """One pop+eval iteration of chain ``ch`` (rows
        [ch*tile, (ch+1)*tile)). Chains share NO state, so Mosaic's
        static scheduler is free to overlap one chain's scalar phase
        (window-min extraction, tournament) with another's vector
        phase (re-cull, dense eval) — the single-chain kernel
        serializes them on the scalar<->vector sync chain. Narrow
        (N, 1) refs are loaded whole and value-sliced; only the
        lane-wide key matrix uses direct (128-aligned) ref slices."""
        cs, ce = ch * tile, (ch + 1) * tile
        best_t = t_ref[:] if chains == 1 else t_ref[:][cs:ce, :]
        if band:
            nbands = tile // band
            bt = _bt_inflate(jnp.concatenate(
                [jnp.max(best_t[b * band:(b + 1) * band, :], axis=0,
                         keepdims=True) for b in range(nbands)], axis=0
            ), idx_bits)                              # (nbands, 1)
            keys = key_ref[:]
        else:
            bt = _bt_inflate(best_t, idx_bits)        # (tile, 1)
            keys = (key_ref[:] if chains == 1
                    else key_ref[cs:ce, :])
        live = jnp.where(keys < bt, keys, _INT_MAX)   # conservative cull
        row = jnp.min(live, axis=0, keepdims=True)    # (1, c_pad)
        dead_row = (dead_ref[:] if chains == 1
                    else dead_ref[:][ch:ch + 1, :])
        row = jnp.where(dead_row > 0, _INT_MAX, row)
        # ``pops`` > 1 runs several pop rounds per loop iteration (each
        # sees the previous round's kills, so all ids are distinct —
        # unlike a single wider group, which pads with clamp-duplicates
        # past one pop per window) and dense-evaluates them in ONE
        # widened pass: the per-iteration fixed costs (while-loop sync,
        # branch, cull) amortize over pops*group clusters. best_t is
        # one iteration stale for the whole batch — extra idempotent
        # evals, never wrong answers. (Measured NEGATIVE on the bounce
        # wave — 3.74 -> 3.54 Mrays/s at pops=2, PERF.md r3b — the
        # tournament, not the loop sync, is the floor; kept as a
        # measurement variant.)
        all_ids = []
        any_valid = jnp.bool_(False)
        dead_new = jnp.zeros((1, c_pad), jnp.bool_)
        for _ in range(pops):
            if windowed:
                ids, valids, av, retire = _dnf_pop_window(
                    row, rowc, n_clusters, idx_bits, group, win2
                )
            else:
                ids, valids, _ = _dnf_pop_group(
                    row, rowc, n_clusters, idx_bits, group
                )
                av = valids[0]   # pop 0 is the global min
                retire = jnp.zeros((1, c_pad), jnp.bool_)
                for c, v in zip(ids, valids):
                    retire = retire | ((rowc == c) & v)
            all_ids += ids
            any_valid = any_valid | av
            dead_new = dead_new | retire
            if pops > 1:
                row = jnp.where(retire, _INT_MAX, row)
        if chains == 1:
            dead_ref[:] = dead_ref[:] | dead_new.astype(jnp.int32)
        else:
            # Row-masked RMW: (chains, c_pad) is lane-narrow in rows, so
            # a [ch:ch+1] ref slice would be an unaligned memref_slice.
            cur = dead_ref[:]
            ri = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0)
            dead_ref[:] = jnp.where(
                ri == ch, cur | dead_new.astype(jnp.int32), cur
            )

        # debug_mode (timing bisection only — wrong results): 1 = skip
        # the dense eval (measures loop + cull + extraction; iterations
        # become pierced/group), 2 = eval but skip the shading epilogue.
        # ``eval_always`` drops the pl.when branch: invalid pops clamp
        # to real cluster ids whose evals are idempotent no-ops, so the
        # only cost is one garbage eval on the final iteration.
        if debug_mode != 1:
            if eval_always:
                eval_group(all_ids, ch)
            else:
                @pl.when(any_valid)
                def _():
                    eval_group(all_ids, ch)

        return any_valid

    def cond(found):
        return found

    def body(found):
        # A finished chain is self-stabilizing (best_t and the dead row
        # are monotone, so its any_valid stays False and its eval is
        # branch-skipped); it costs one cull+tournament per surplus
        # iteration of its partners — cycles the scheduler overlaps
        # with the live chains' vector work anyway.
        any_valid = jnp.bool_(False)
        for ch in range(chains):
            any_valid = any_valid | chain_step(ch)
        return any_valid

    jax.lax.while_loop(cond, body, jnp.bool_(True))


def _tile_kernel_occ_dnf(o_ref, d_ref, t0_ref, cb_ref, woop_ref,
                         occ_ref, key_ref, dead_ref, *, n_clusters: int,
                         tile: int, c_pad: int, idx_bits: int,
                         group: int, windowed: bool = False,
                         pops: int = 1, eval_always: bool = False,
                         chains: int = 1, win2: bool = False):
    """Dense nearest-first any-hit: the _tile_kernel_dnf structure with
    the light occlusion epilogue (flip the lane's bit, drop its t-cap to
    0). Nearest-first ordering still pays — near geometry occludes most
    rays fastest, and each flipped lane vanishes from the next re-cull.
    ``chains`` as in _tile_kernel_dnf: independent tile-sized chains per
    program whose scalar/vector phases the scheduler can overlap."""
    nrows = tile * chains
    o_aug = o_ref[:]
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    occ_ref[:] = jnp.zeros((nrows, 1), jnp.float32)
    t_cap0 = t0_ref[:]
    k = CLUSTER_SIZE
    kp = k * group
    rowc = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)

    key_ref[:] = _dnf_phase1(o_aug, inv_d, cb_ref, t_cap0, nrows, c_pad,
                             idx_bits, n_clusters,
                             interleave=c_pad // 128 if windowed else 0)
    dead_ref[:] = jnp.zeros((chains, c_pad), jnp.int32)

    def chain_step(ch):
        cs, ce = ch * tile, (ch + 1) * tile
        occ_full = occ_ref[:]
        occ_cur = occ_full if chains == 1 else occ_full[cs:ce, :]
        cap = jnp.where(occ_cur > 0.0, 0.0, t_cap0[cs:ce, :])
        bt = _bt_inflate(cap, idx_bits)
        keys = key_ref[:] if chains == 1 else key_ref[cs:ce, :]
        live = jnp.where(keys < bt, keys, _INT_MAX)
        row = jnp.min(live, axis=0, keepdims=True)
        dead_row = (dead_ref[:] if chains == 1
                    else dead_ref[:][ch:ch + 1, :])
        row = jnp.where(dead_row > 0, _INT_MAX, row)
        all_ids = []
        any_valid = jnp.bool_(False)
        dead_new = jnp.zeros((1, c_pad), jnp.bool_)
        for _ in range(pops):
            if windowed:
                ids, valids, av, retire = _dnf_pop_window(
                    row, rowc, n_clusters, idx_bits, group, win2
                )
            else:
                ids, valids, _ = _dnf_pop_group(
                    row, rowc, n_clusters, idx_bits, group
                )
                av = valids[0]
                retire = jnp.zeros((1, c_pad), jnp.bool_)
                for c, v in zip(ids, valids):
                    retire = retire | ((rowc == c) & v)
            all_ids += ids
            any_valid = any_valid | av
            dead_new = dead_new | retire
            if pops > 1:
                row = jnp.where(retire, _INT_MAX, row)
        if chains == 1:
            dead_ref[:] = dead_ref[:] | dead_new.astype(jnp.int32)
        else:
            cur = dead_ref[:]
            ri = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0)
            dead_ref[:] = jnp.where(
                ri == ch, cur | dead_new.astype(jnp.int32), cur
            )

        def do_eval():
            w_cat = _dnf_gather_group(woop_ref, all_ids, k)
            t_pair = _pair_eval_wide(o_aug[cs:ce], d_aug[cs:ce], w_cat,
                                     cap, kp * pops)
            t_min = jnp.min(t_pair, axis=1, keepdims=True)
            occ_new = jnp.where(t_min < cap, 1.0, occ_ref[:][cs:ce, :])
            if chains == 1:
                occ_ref[:] = occ_new
            else:
                full = occ_ref[:]
                parts = ([full[:cs]] if cs else []) + [occ_new] \
                    + ([full[ce:]] if ce < full.shape[0] else [])
                occ_ref[:] = (parts[0] if len(parts) == 1
                              else jnp.concatenate(parts, axis=0))

        if eval_always:
            do_eval()
        else:
            @pl.when(any_valid)
            def _():
                do_eval()

        return any_valid

    def cond(found):
        return found

    def body(found):
        any_valid = jnp.bool_(False)
        for ch in range(chains):
            any_valid = any_valid | chain_step(ch)
        return any_valid

    jax.lax.while_loop(cond, body, jnp.bool_(True))


DNF_MAX_CLUSTERS = 8192  # (tile, c_pad) scratch ceiling (~16 MB at cap)


def _dnf_bounds(clusters, c_pad: int):
    """(6, c_pad) f32 cluster AABBs, vector-row layout, padded with
    inverted never-hit boxes."""
    c = clusters.aabb_min.shape[0]
    cb = jnp.concatenate(
        [clusters.aabb_min.T, clusters.aabb_max.T], axis=0
    ).astype(jnp.float32)
    pad = c_pad - c
    if pad:
        fill = jnp.concatenate(
            [jnp.full((3, pad), _BIG, jnp.float32),
             jnp.full((3, pad), -_BIG, jnp.float32)], axis=0
        )
        cb = jnp.concatenate([cb, fill], axis=1)
    return cb


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "group",
                                    "windowed", "debug_mode", "band",
                                    "bf16", "pops", "eval_always",
                                    "chains", "win2"))
def trace_pallas_dnf(clusters, origin, direction, t_init,
                     interpret=False, tile=DNF_TILE, group=None,
                     windowed=None, debug_mode=0, band=0, bf16=False,
                     pops=1, eval_always=False, chains=1, win2=False):
    """Dense nearest-first cluster trace; same contract as trace_pallas.

    Flat scenes only (cluster count <= DNF_MAX_CLUSTERS and Woop data
    whole-in-VMEM); callers fall back to the tree kernels past that.
    ``band`` (experimental, must divide ``tile``) switches the
    per-iteration re-cull to per-band key minima — exact results,
    coarser culling; see _tile_kernel_dnf. ``chains`` runs that many
    INDEPENDENT tile-sized ray chains per Pallas program so their
    scalar and vector phases can overlap (see chain_step).
    """
    c = clusters.woop.shape[0]
    r = origin.shape[0]
    if c == 0:
        z = jnp.zeros(r, jnp.float32)
        return (t_init, jnp.full(r, -1, jnp.int32),
                jnp.zeros((r, 3), jnp.float32), z.astype(jnp.int32))
    if c > DNF_MAX_CLUSTERS:
        raise ValueError(
            f"{c} clusters exceeds the DNF kernel's scratch budget "
            f"({DNF_MAX_CLUSTERS}); use trace_pallas / trace_pallas_paged."
        )
    c_pad = -(-c // 128) * 128
    idx_bits = max((c_pad - 1).bit_length(), 1)
    # Auto policy (PERF.md r2f): the windowed pop needs >= 4 lane
    # windows to beat the serial 4-pop (tiny scenes would waste eval
    # width on one pop per iteration); group 6 measured best windowed.
    if windowed is None:
        windowed = c_pad >= 512
    if group is None:
        # Windowed: one pop per window up to 6 (eval width tracks the
        # actual pops — group > nw only pads the eval with clamp-dups).
        group = min(6, c_pad // 128) if windowed else 4
    block = tile * chains
    r_pad = -(-r // block) * block
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_init = jnp.pad(t_init, (0, pad))

    o_aug, d_aug = _augment(origin, direction)
    cb = _dnf_bounds(clusters, c_pad)
    if windowed:
        # Interleaved column layout for the windowed pop: column j holds
        # cluster id (j % 128)*nw + j//128 (see _dnf_pop_window).
        nw = c_pad // 128
        col = jnp.arange(c_pad, dtype=jnp.int32)
        cb = cb[:, (col % 128) * nw + col // 128]
    grid = r_pad // block

    if band and tile % band:
        raise ValueError(f"band {band} must divide tile {tile}")
    if band and chains > 1:
        raise ValueError("band and chains are mutually exclusive")
    t, slot, normal, mat = pl.pallas_call(
        functools.partial(_tile_kernel_dnf, n_clusters=c, tile=tile,
                          c_pad=c_pad, idx_bits=idx_bits, group=group,
                          windowed=windowed, debug_mode=debug_mode,
                          band=band, bf16=bf16, pops=pops,
                          eval_always=eval_always, chains=chains,
                          win2=win2),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cluster bounds
            pl.BlockSpec(memory_space=pltpu.VMEM),   # woop
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mat
        ],
        out_specs=(
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile // band if band else block, c_pad),
                       jnp.int32),                    # packed keys
            pltpu.VMEM((chains, c_pad), jnp.int32),   # retired clusters
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_aug, d_aug, t_init[:, None], cb, clusters.woop,
      clusters.mat[:, None, :])
    return t[:r, 0], slot[:r, 0], normal[:r, 0:3], mat[:r, 0]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "group",
                                    "windowed", "pops", "eval_always",
                                    "chains", "win2"))
def occluded_pallas_dnf(clusters, origin, direction, t_max,
                        interpret=False, tile=DNF_TILE, group=None,
                        windowed=None, pops=1, eval_always=False,
                        chains=1, win2=False):
    """Dense nearest-first any-hit occlusion; contract of occluded_pallas."""
    c = clusters.woop.shape[0]
    r = origin.shape[0]
    if c == 0:
        return jnp.zeros(r, bool)
    if c > DNF_MAX_CLUSTERS:
        raise ValueError(
            f"{c} clusters exceeds the DNF kernel's scratch budget "
            f"({DNF_MAX_CLUSTERS}); use occluded_pallas."
        )
    c_pad = -(-c // 128) * 128
    idx_bits = max((c_pad - 1).bit_length(), 1)
    # Auto policy (PERF.md r2f): the windowed pop needs >= 4 lane
    # windows to beat the serial 4-pop (tiny scenes would waste eval
    # width on one pop per iteration); group 6 measured best windowed.
    if windowed is None:
        windowed = c_pad >= 512
    if group is None:
        # Windowed: one pop per window up to 6 (eval width tracks the
        # actual pops — group > nw only pads the eval with clamp-dups).
        group = min(6, c_pad // 128) if windowed else 4
    block = tile * chains
    r_pad = -(-r // block) * block
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_max = jnp.pad(t_max, (0, pad))

    o_aug, d_aug = _augment(origin, direction)
    cb = _dnf_bounds(clusters, c_pad)
    if windowed:
        nw = c_pad // 128
        col = jnp.arange(c_pad, dtype=jnp.int32)
        cb = cb[:, (col % 128) * nw + col // 128]
    grid = r_pad // block

    occ = pl.pallas_call(
        functools.partial(_tile_kernel_occ_dnf, n_clusters=c, tile=tile,
                          c_pad=c_pad, idx_bits=idx_bits, group=group,
                          windowed=windowed, pops=pops,
                          eval_always=eval_always, chains=chains,
                          win2=win2),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cluster bounds
            pl.BlockSpec(memory_space=pltpu.VMEM),   # woop
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, c_pad), jnp.int32),    # packed keys
            pltpu.VMEM((chains, c_pad), jnp.int32),   # retired clusters
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_aug, d_aug, t_max[:, None], cb, clusters.woop)
    return occ[:r, 0] > 0.0


# -- instanced traversal (shared prototype geometry) ----------------------
#
# True instancing the DNF way (see ops.clusters.InstanceSet): the dense
# nearest-first cull runs over EXPANDED world-space cluster AABBs — one
# column per (instance, prototype cluster) pair, so off-screen instances
# are never popped and nearest-first ordering is exact across instances —
# while the heavy Woop tensors stay PROTOTYPE-sized. At eval time the
# popped expanded cluster's 12 transform scalars (SMEM) map the ray tile
# into the prototype's object space: o' = L·o + tr, d' = L·d with
# L = A⁻¹ preserves the world t parameterization EXACTLY (in real
# arithmetic; the oracle below uses the identical f32 formula order so
# interpret-mode results match bitwise), and one shared Woop block serves
# every instance. Winning normals rotate back through L^T (the
# inverse-transpose of the object→world A — exact for any invertible
# affine, including non-uniform scale). The reference has no instancing
# (its whole scene is one triangle list uploaded per frame,
# RayTracing/Graphics/Renderer.cs); this is framework surface the TPU
# design gets almost for free because the cull matrix never stored
# geometry in the first place.


def _lerp_affine_inverse(fw0, fw1, tt):
    """Per-ray world→object transform for MOTION-BLURRED instances.

    fw0/fw1: 12 endpoint OBJECT→WORLD scalars/columns [A00..A22 row-
    major, t0..t2]; tt: the per-ray shutter time. The FORWARD affine is
    lerped (A(t) = fw0 + t·(fw1−fw0) — each prototype point travels a
    straight world segment, so endpoint-union AABBs bound the whole
    path exactly) and inverted by adjugate. Returns the 12
    ``_ray_to_object`` entries [L00..L22, tr0..tr2] with L = A(t)^-1,
    tr = −L·t(t). Shared VERBATIM by the Pallas kernel and the
    ``trace_jax_inst`` oracle so motion hits stay bitwise-comparable.
    ``fw0 + tt·(fw1−fw0)`` reproduces fw0's bits exactly at tt = 0.
    """
    a = [f0 + tt * (f1 - f0) for f0, f1 in zip(fw0, fw1)]
    a00, a01, a02, a10, a11, a12, a20, a21, a22, t0, t1, t2 = a
    c00 = a11 * a22 - a12 * a21
    c01 = a02 * a21 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c10 = a12 * a20 - a10 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a02 * a10 - a00 * a12
    c20 = a10 * a21 - a11 * a20
    c21 = a01 * a20 - a00 * a21
    c22 = a00 * a11 - a01 * a10
    det = a00 * c00 + a01 * c10 + a02 * c20
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-30,
                          jnp.where(det < 0, -1e-30, 1e-30), det)
    l_ = [c00 * inv, c01 * inv, c02 * inv,
          c10 * inv, c11 * inv, c12 * inv,
          c20 * inv, c21 * inv, c22 * inv]
    tr0 = -(l_[0] * t0 + l_[1] * t1 + l_[2] * t2)
    tr1 = -(l_[3] * t0 + l_[4] * t1 + l_[5] * t2)
    tr2 = -(l_[6] * t0 + l_[7] * t1 + l_[8] * t2)
    return l_ + [tr0, tr1, tr2]


def _ray_to_object(xf, o0, o1, o2, d0, d1, d2, ones, zeros):
    """Transform a ray tile by 12 world→object scalars
    [L00..L22 row-major, tr0..tr2]. Formula order is load-bearing: the
    oracle uses the same order, and identity transforms reduce to
    bit-exact pass-through (tr + 1·o + 0 + 0 = o)."""
    ox = xf[9] + xf[0] * o0 + xf[1] * o1 + xf[2] * o2
    oy = xf[10] + xf[3] * o0 + xf[4] * o1 + xf[5] * o2
    oz = xf[11] + xf[6] * o0 + xf[7] * o1 + xf[8] * o2
    dx = xf[0] * d0 + xf[1] * d1 + xf[2] * d2
    dy = xf[3] * d0 + xf[4] * d1 + xf[5] * d2
    dz = xf[6] * d0 + xf[7] * d1 + xf[8] * d2
    o_aug = jnp.concatenate([ox, oy, oz, ones], axis=1)
    d_aug = jnp.concatenate([dx, dy, dz, zeros], axis=1)
    return o_aug, d_aug


def trace_jax_inst(clusters, inst, origin, direction, t_init, time=None):
    """Instanced reference sweep: every expanded cluster, masked. Same
    contract as trace_jax; ``slot`` indexes PROTOTYPE cluster slots (all
    instances of a prototype share slot ids — attribute rows are shared
    by design), normals are world-space. ``time`` ((R,) in [0, 1]):
    per-ray shutter time for motion-blurred instance sets (``inst.fw0``
    present); ignored for static sets, defaults to mid-shutter."""
    ne = inst.cmap.shape[0]
    r = origin.shape[0]
    has_motion = inst.fw0 is not None
    if has_motion:
        tt = (jnp.full((r, 1), 0.5, jnp.float32) if time is None
              else jnp.asarray(time, jnp.float32)[:, None])
    o_aug, d_aug = _augment(origin, direction)
    inv_d = _safe_inv(direction)
    lane = jax.lax.broadcasted_iota(jnp.int32, (r, CLUSTER_SIZE), 1)
    ones = jnp.ones((r, 1), jnp.float32)
    zeros = jnp.zeros((r, 1), jnp.float32)
    o0, o1, o2 = origin[:, 0:1], origin[:, 1:2], origin[:, 2:3]
    d0, d1, d2 = direction[:, 0:1], direction[:, 1:2], direction[:, 2:3]
    k = CLUSTER_SIZE

    def body(e, carry):
        best_t, best_slot, best_e = carry
        bt = best_t[:, None]
        b = tuple(inst.aabb_min[e]) + tuple(inst.aabb_max[e])
        hit = _slab6(o_aug, inv_d, b, bt)
        if has_motion:
            cols = _lerp_affine_inverse(
                [inst.fw0[e][j] for j in range(12)],
                [inst.fw1[e][j] for j in range(12)], tt,
            )
        else:
            xf = inst.xform[e]
            cols = [xf[j] for j in range(12)]
        o_e, d_e = _ray_to_object(
            cols, o0, o1, o2, d0, d1, d2, ones, zeros,
        )
        p = inst.cmap[e]
        t_pair = _pair_eval(o_e, d_e, clusters.woop[p], bt)
        t_pair = jnp.where(hit, t_pair, _BIG)
        t_min = jnp.min(t_pair, axis=1)
        slot = jnp.min(
            jnp.where(t_pair <= t_min[:, None], lane, k), axis=1
        )
        upd = t_min < best_t
        best_t = jnp.where(upd, t_min, best_t)
        best_slot = jnp.where(upd, p * k + slot, best_slot)
        best_e = jnp.where(upd, e, best_e)
        return best_t, best_slot, best_e

    best_t, best_slot, best_e = jax.lax.fori_loop(
        0, ne, body,
        (t_init, jnp.full(r, -1, jnp.int32), jnp.zeros(r, jnp.int32)),
    )
    n_obj, mat = lookup_hit(clusters, best_slot)
    if has_motion:
        f0 = inst.fw0[jnp.maximum(best_e, 0)]         # (R, 12)
        f1 = inst.fw1[jnp.maximum(best_e, 0)]
        cols = _lerp_affine_inverse(
            [f0[:, j:j + 1] for j in range(12)],
            [f1[:, j:j + 1] for j in range(12)], tt,
        )
        xfw = jnp.concatenate(cols, axis=1)           # (R, 12)
    else:
        xfw = inst.xform[jnp.maximum(best_e, 0)]      # (R, 12)
    # World normal = L^T · n_obj (rows of L^T are COLUMNS of L).
    nw = jnp.stack([
        xfw[:, 0] * n_obj[:, 0] + xfw[:, 3] * n_obj[:, 1]
        + xfw[:, 6] * n_obj[:, 2],
        xfw[:, 1] * n_obj[:, 0] + xfw[:, 4] * n_obj[:, 1]
        + xfw[:, 7] * n_obj[:, 2],
        xfw[:, 2] * n_obj[:, 0] + xfw[:, 5] * n_obj[:, 1]
        + xfw[:, 8] * n_obj[:, 2],
    ], axis=-1)
    nw = nw * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(nw * nw, axis=-1, keepdims=True), 1e-30)
    )
    miss = best_slot < 0
    nw = jnp.where(miss[:, None], 0.0, nw)
    mat = jnp.where(miss, 0, mat)
    if inst.imat is not None:
        # Per-instance material override (same contract as the Pallas
        # kernel's imat_ref path; -1 keeps prototype mats).
        im = jnp.asarray(inst.imat, jnp.int32)[jnp.maximum(best_e, 0)]
        mat = jnp.where(jnp.logical_not(miss) & (im >= 0), im, mat)
    return best_t, best_slot, nw, mat


def _inst_eval_group(ids, cmap_ref, xf_ref, woop_ref, mat_ref,
                     o0, o1, o2, d0, d1, d2, ones, zeros, tile,
                     t_ref, slot_ref=None, normal_ref=None,
                     hitmat_ref=None, cap=None, occ_ref=None,
                     imat_ref=None, fw0_ref=None, fw1_ref=None,
                     tt=None):
    """Dense instanced group evaluation. Each popped expanded cluster
    gets its own object-space ray tile (the per-cluster transform breaks
    the shared-ray widened eval of _pair_eval_wide, but the total VPU
    FMA count is identical — `group` evals over (tile, 3k) blocks vs one
    over (tile, 3k·group)); the min/winner epilogue still runs once over
    the concatenated t_pair. Closest-hit mode updates
    t/slot/normal/hitmat; any-hit mode (``occ_ref`` given) flips the
    occlusion bit against ``cap``."""
    k = CLUSTER_SIZE
    best_t = cap if occ_ref is not None else t_ref[:]
    tps, wbs, mats, protos, xfs = [], [], [], [], []
    for e in ids:
        p = cmap_ref[0, e]
        w = woop_ref[p]
        if fw0_ref is not None:
            # Motion-blurred instances: per-ray shutter-time transform
            # (lerped forward affine, inverted in-register — ~40 flops
            # per ray vs the (tile, 3k) Woop pass; see
            # _lerp_affine_inverse).
            xf = _lerp_affine_inverse(
                [fw0_ref[j, e] for j in range(12)],
                [fw1_ref[j, e] for j in range(12)], tt,
            )
        else:
            xf = [xf_ref[j, e] for j in range(12)]
        o_e, d_e = _ray_to_object(xf, o0, o1, o2, d0, d1, d2,
                                  ones, zeros)
        tps.append(_pair_eval(o_e, d_e, w, best_t))
        if occ_ref is None:
            wbs.append(w[:, 2 * k:])
            m = mat_ref[p]
            if imat_ref is not None:
                # Per-instance material override: one scalar SMEM read
                # per popped cluster; -1 keeps the prototype's mats
                # (identity bits, so override-free rows are unchanged).
                im = imat_ref[0, e]
                m = jnp.where(im >= 0, im, m)
            mats.append(m)
            protos.append(p)
            xfs.append(xf)
    kp = k * len(ids)
    t_pair = jnp.concatenate(tps, axis=1) if len(tps) > 1 else tps[0]
    t_min = jnp.min(t_pair, axis=1, keepdims=True)
    if occ_ref is not None:
        occ_ref[:] = jnp.where(t_min < cap, 1.0, occ_ref[:])
        return
    upd = t_min < best_t
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, kp), 1)
    pick = t_pair <= t_min
    slot = jnp.min(jnp.where(pick, lane, kp), axis=1, keepdims=True)
    first = pick & (lane == slot)
    zeros_kp = jnp.zeros((tile, kp), jnp.float32)
    wb = jnp.concatenate(wbs, axis=1) if len(wbs) > 1 else wbs[0]
    nx = jnp.sum(jnp.where(first, wb[0:1], zeros_kp),
                 axis=1, keepdims=True)
    ny = jnp.sum(jnp.where(first, wb[1:2], zeros_kp),
                 axis=1, keepdims=True)
    nz = jnp.sum(jnp.where(first, wb[2:3], zeros_kp),
                 axis=1, keepdims=True)

    def sel(vals):
        acc = vals[0]
        for j in range(1, len(vals)):
            acc = jnp.where(slot >= j * k, vals[j], acc)
        return acc

    lw = [sel([xf[j] for xf in xfs]) for j in range(9)]
    nwx = lw[0] * nx + lw[3] * ny + lw[6] * nz
    nwy = lw[1] * nx + lw[4] * ny + lw[7] * nz
    nwz = lw[2] * nx + lw[5] * ny + lw[8] * nz
    inv_len = jax.lax.rsqrt(
        jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz, 1e-30)
    )
    mat_cat = jnp.concatenate(mats, axis=1) if len(mats) > 1 else mats[0]
    mat_sel = jnp.max(
        jnp.where(first, mat_cat, 0), axis=1, keepdims=True
    )
    gslot = sel(protos) * k + (slot & (k - 1))
    t_ref[:] = jnp.where(upd, t_min, best_t)
    slot_ref[:] = jnp.where(upd, gslot, slot_ref[:])
    n_new = jnp.concatenate(
        [nwx * inv_len, nwy * inv_len, nwz * inv_len,
         jnp.zeros((tile, 1), jnp.float32)], axis=1
    )
    normal_ref[:] = jnp.where(upd, n_new, normal_ref[:])
    hitmat_ref[:] = jnp.where(upd, mat_sel, hitmat_ref[:])


def _tile_kernel_dnf_inst(o_ref, d_ref, t0_ref, cb_ref, cmap_ref, xf_ref,
                          woop_ref, mat_ref, t_ref, slot_ref, normal_ref,
                          hitmat_ref, key_ref, dead_ref, imat_ref=None,
                          fw0_ref=None, fw1_ref=None, time_ref=None,
                          *, n_exp: int,
                          tile: int, c_pad: int, idx_bits: int,
                          group: int, windowed: bool, occ: bool = False):
    """Instanced dense nearest-first kernel: the _tile_kernel_dnf loop
    (phase-1 world-AABB cull → conservative int-space re-cull → windowed
    pop → dense group eval) over EXPANDED cluster columns, with the
    per-popped-cluster ray transform of _inst_eval_group. ``occ`` selects
    the any-hit epilogue (t_ref doubles as the occlusion output)."""
    o_aug = o_ref[:]
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    if occ:
        t_ref[:] = jnp.zeros((tile, 1), jnp.float32)
        t_cap0 = t0_ref[:]
    else:
        t_ref[:] = t0_ref[:]
        slot_ref[:] = jnp.full((tile, 1), -1, jnp.int32)
        normal_ref[:] = jnp.zeros((tile, 4), jnp.float32)
        hitmat_ref[:] = jnp.zeros((tile, 1), jnp.int32)
    rowc = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad), 1)
    key_ref[:] = _dnf_phase1(o_aug, inv_d, cb_ref, t0_ref[:], tile,
                             c_pad, idx_bits, n_exp,
                             interleave=c_pad // 128 if windowed else 0)
    dead_ref[:] = jnp.zeros((1, c_pad), jnp.int32)
    ones = jnp.ones((tile, 1), jnp.float32)
    zeros = jnp.zeros((tile, 1), jnp.float32)
    o0, o1, o2 = o_aug[:, 0:1], o_aug[:, 1:2], o_aug[:, 2:3]
    d0, d1, d2 = d_aug[:, 0:1], d_aug[:, 1:2], d_aug[:, 2:3]
    tt = time_ref[:] if time_ref is not None else None

    def body(_):
        if occ:
            cap = jnp.where(t_ref[:] > 0.0, 0.0, t_cap0)
            bt = _bt_inflate(cap, idx_bits)
        else:
            cap = None
            bt = _bt_inflate(t_ref[:], idx_bits)
        live = jnp.where(key_ref[:] < bt, key_ref[:], _INT_MAX)
        row = jnp.min(live, axis=0, keepdims=True)
        row = jnp.where(dead_ref[:] > 0, _INT_MAX, row)
        if windowed:
            ids, valids, any_valid, retire = _dnf_pop_window(
                row, rowc, n_exp, idx_bits, group
            )
        else:
            ids, valids, _ = _dnf_pop_group(
                row, rowc, n_exp, idx_bits, group
            )
            any_valid = valids[0]
            retire = jnp.zeros((1, c_pad), jnp.bool_)
            for c, v in zip(ids, valids):
                retire = retire | ((rowc == c) & v)
        dead_ref[:] = dead_ref[:] | retire.astype(jnp.int32)

        @pl.when(any_valid)
        def _():
            _inst_eval_group(
                ids, cmap_ref, xf_ref, woop_ref, mat_ref,
                o0, o1, o2, d0, d1, d2, ones, zeros, tile, t_ref,
                slot_ref, normal_ref, hitmat_ref,
                cap=cap, occ_ref=t_ref if occ else None,
                imat_ref=imat_ref, fw0_ref=fw0_ref, fw1_ref=fw1_ref,
                tt=tt,
            )

        return any_valid

    jax.lax.while_loop(lambda f: f, body, jnp.bool_(True))


def _inst_tables(inst, c_pad: int):
    """(6, c_pad) world bounds, (1, c_pad) i32 proto map, (12, c_pad)
    f32 transforms — SMEM-friendly long-lane layouts, never-hit pads."""
    ce = inst.cmap.shape[0]
    amin = jnp.asarray(inst.aabb_min)
    cb = jnp.concatenate(
        [amin.T, jnp.asarray(inst.aabb_max).T], axis=0
    ).astype(jnp.float32)
    cmap = jnp.asarray(inst.cmap, jnp.int32)[None, :]
    xf = jnp.asarray(inst.xform, jnp.float32).T
    imat = None
    if inst.imat is not None:
        imat = jnp.asarray(inst.imat, jnp.int32)[None, :]
    fw0 = fw1 = None
    if inst.fw0 is not None:
        fw0 = jnp.asarray(inst.fw0, jnp.float32).T
        fw1 = jnp.asarray(inst.fw1, jnp.float32).T
    pad = c_pad - ce
    if pad:
        fill = jnp.concatenate(
            [jnp.full((3, pad), _BIG, jnp.float32),
             jnp.full((3, pad), -_BIG, jnp.float32)], axis=0
        )
        cb = jnp.concatenate([cb, fill], axis=1)
        cmap = jnp.pad(cmap, ((0, 0), (0, pad)))
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
        if imat is not None:
            imat = jnp.pad(imat, ((0, 0), (0, pad)), constant_values=-1)
        if fw0 is not None:
            fw0 = jnp.pad(fw0, ((0, 0), (0, pad)))
            fw1 = jnp.pad(fw1, ((0, 0), (0, pad)))
    return cb, cmap, xf, imat, fw0, fw1


def _dnf_inst_call(clusters, inst, origin, direction, t_init, occ,
                   interpret, tile, group, windowed, time=None):
    ce = inst.cmap.shape[0]
    r = origin.shape[0]
    if ce > DNF_MAX_CLUSTERS:
        raise ValueError(
            f"{ce} expanded instance clusters exceed the DNF scratch "
            f"budget ({DNF_MAX_CLUSTERS}); split the scene or reduce "
            f"instance counts."
        )
    c_pad = -(-ce // 128) * 128
    idx_bits = max((c_pad - 1).bit_length(), 1)
    if windowed is None:
        windowed = c_pad >= 512
    if group is None:
        group = min(6, c_pad // 128) if windowed else 4
    has_motion = inst.fw0 is not None
    if has_motion and time is None:
        # Deterministic queries of a motion scene (AOVs, probes)
        # default to mid-shutter.
        time = jnp.full(r, 0.5, jnp.float32)
    r_pad = -(-r // tile) * tile
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_init = jnp.pad(t_init, (0, pad))
        if has_motion:
            time = jnp.pad(time, (0, pad))
    o_aug, d_aug = _augment(origin, direction)
    cb, cmap, xf, imat, fw0, fw1 = _inst_tables(inst, c_pad)
    # Any-hit never reads materials — keep the occlusion kernel's
    # signature (and compiled graph) independent of the override column.
    has_imat = imat is not None and not occ
    if windowed:
        nw = c_pad // 128
        col = jnp.arange(c_pad, dtype=jnp.int32)
        cb = cb[:, (col % 128) * nw + col // 128]
    grid = r_pad // tile

    ray_spec = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    in_specs = [
        ray_spec(4), ray_spec(4), ray_spec(1),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # expanded world bounds
        pl.BlockSpec(memory_space=pltpu.SMEM),   # cmap (1, c_pad)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # xform (12, c_pad)
        pl.BlockSpec(memory_space=pltpu.VMEM),   # proto woop
        pl.BlockSpec(memory_space=pltpu.VMEM),   # proto mat
    ]
    if has_imat:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)  # imat (1, c_pad)
        )
    if has_motion:
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)  # fw0 (12, c_pad)
        )
        in_specs.append(
            pl.BlockSpec(memory_space=pltpu.SMEM)  # fw1 (12, c_pad)
        )
        in_specs.append(ray_spec(1))               # per-ray time
    if occ:
        out_specs, out_shape = ray_spec(1), jax.ShapeDtypeStruct(
            (r_pad, 1), jnp.float32
        )
    else:
        out_specs = (ray_spec(1), ray_spec(1), ray_spec(4), ray_spec(1))
        out_shape = (
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        )

    n_in = len(in_specs)

    def kernel_flat(*refs):
        ins = refs[:n_in]
        outs = refs[n_in:-2]
        key_ref, dead_ref = refs[-2], refs[-1]
        o, d, t0, cb_, cmap_, xf_, woop_, mat_ = ins[:8]
        at = 8
        imat_ = ins[at] if has_imat else None
        at += 1 if has_imat else 0
        if has_motion:
            fw0_, fw1_, time_ = ins[at:at + 3]
        else:
            fw0_ = fw1_ = time_ = None
        if occ:
            t_ref, = outs
            slot_ref = normal_ref = hitmat_ref = None
        else:
            t_ref, slot_ref, normal_ref, hitmat_ref = outs
        _tile_kernel_dnf_inst(
            o, d, t0, cb_, cmap_, xf_, woop_, mat_, t_ref, slot_ref,
            normal_ref, hitmat_ref, key_ref, dead_ref, imat_ref=imat_,
            fw0_ref=fw0_, fw1_ref=fw1_, time_ref=time_,
            n_exp=ce,
            tile=tile, c_pad=c_pad, idx_bits=idx_bits, group=group,
            windowed=windowed, occ=occ,
        )

    out = pl.pallas_call(
        kernel_flat,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile, c_pad), jnp.int32),   # packed keys
            pltpu.VMEM((1, c_pad), jnp.int32),      # retired clusters
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_aug, d_aug, t_init[:, None], cb, cmap, xf, clusters.woop,
      clusters.mat[:, None, :],
      *((imat,) if has_imat else ()),
      *((fw0, fw1, time[:, None]) if has_motion else ()))
    if occ:
        return out[:r, 0] > 0.0
    t, slot, normal, mat = out
    return t[:r, 0], slot[:r, 0], normal[:r, 0:3], mat[:r, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "tile",
                                             "group", "windowed"))
def trace_pallas_dnf_inst(clusters, inst, origin, direction, t_init,
                          time=None,
                          interpret=False, tile=DNF_TILE, group=None,
                          windowed=None):
    """Instanced dense nearest-first closest hit; contract of
    trace_pallas with prototype-slot ids and world-space normals (see
    trace_jax_inst). ``time``: per-ray shutter time for motion-blurred
    instance sets (defaults to mid-shutter; ignored when static)."""
    r = origin.shape[0]
    if inst.cmap.shape[0] == 0:
        return (t_init, jnp.full(r, -1, jnp.int32),
                jnp.zeros((r, 3), jnp.float32), jnp.zeros(r, jnp.int32))
    return _dnf_inst_call(clusters, inst, origin, direction, t_init,
                          False, interpret, tile, group, windowed,
                          time=time)


@functools.partial(jax.jit, static_argnames=("interpret", "tile",
                                             "group", "windowed"))
def occluded_pallas_dnf_inst(clusters, inst, origin, direction, t_max,
                             time=None,
                             interpret=False, tile=DNF_TILE, group=None,
                             windowed=None):
    """Instanced dense nearest-first any-hit; contract of
    occluded_pallas. ``time``: per-ray shutter time (shadow rays move
    with the same scene time as their path)."""
    if inst.cmap.shape[0] == 0:
        return jnp.zeros(origin.shape[0], bool)
    return _dnf_inst_call(clusters, inst, origin, direction, t_max,
                          True, interpret, tile, group, windowed,
                          time=time)


def _tile_kernel_occ(o_ref, d_ref, t0_ref, oct_ref, nbox_ref, nmeta_ref,
                     links_ref, woop_ref, occ_ref,
                     *, n_nodes: int, tile: int, ordered: bool):
    """Any-hit occlusion walk (shadow rays): is there ANY triangle hit
    with T_MIN < t < t0? No closest-hit bookkeeping, no shading
    epilogue — a lane flips its occlusion bit and drops its t-cap to 0,
    which short-circuits it out of every later slab test; once every
    lane is occluded the walk degenerates to the miss-link chain
    (O(depth) hops to the terminator). t0 <= 0 marks dead lanes.
    """
    o_aug = o_ref[:]          # (tile, 4)
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    occ_ref[:] = jnp.zeros((tile, 1), jnp.float32)
    oct = oct_ref[0, pl.program_id(0)]
    t_cap0 = t0_ref[:]

    def cond(idx):
        return idx < n_nodes

    def body(idx):
        cap = jnp.where(occ_ref[:] > 0.0, 0.0, t_cap0)
        b = (nbox_ref[0, idx], nbox_ref[1, idx], nbox_ref[2, idx],
             nbox_ref[3, idx], nbox_ref[4, idx], nbox_ref[5, idx])
        hit = _slab6(o_aug, inv_d, b, cap)
        any_hit = jnp.any(hit)
        cid = nmeta_ref[1, idx]

        @pl.when(any_hit & (cid >= 0))
        def _():
            t_pair = _pair_eval(o_aug, d_aug, woop_ref[cid], cap)
            t_min = jnp.min(t_pair, axis=1, keepdims=True)
            occ_ref[:] = jnp.where(t_min < cap, 1.0, occ_ref[:])

        if ordered:
            return jnp.where(
                any_hit, links_ref[oct, idx], links_ref[8 + oct, idx]
            )
        return jnp.where(any_hit, idx + 1, nmeta_ref[0, idx])

    jax.lax.while_loop(cond, body, jnp.int32(0))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "ordered",
                                    "lookahead", "drain"))
def occluded_pallas(clusters, origin, direction, t_max, interpret=False,
                    tile=RAY_TILE, ordered=True, lookahead=4, drain=1):
    """Any-hit occlusion query: (R,) bool, True where some triangle lies
    strictly inside (T_MIN, t_max) along the ray. ``t_max <= 0`` marks
    dead lanes (always unoccluded). The shadow-ray fast path: ~half of a
    NEE render's traced segments need only this yes/no answer, not the
    closest hit with shading data (SURVEY.md north-star estimator)."""
    r = origin.shape[0]
    r_pad = -(-r // tile) * tile
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_max = jnp.pad(t_max, (0, pad))

    o_aug, d_aug = _augment(origin, direction)
    n_nodes = clusters.node_meta.shape[1]
    grid = r_pad // tile
    d0 = direction.reshape(grid, tile, 3)[:, 0, :]
    # (1, G) layout: SMEM windows pad the LAST dim to 128 lanes, so a
    # (G, 1) array would cost G*512 bytes of the 1 MB SMEM (measured:
    # a 4096-tile wave OOM'd SMEM at 2 MB).
    octs = (
        (d0[:, 0] > 0).astype(jnp.int32) * 4
        + (d0[:, 1] > 0).astype(jnp.int32) * 2
        + (d0[:, 2] > 0).astype(jnp.int32)
    )[None, :]
    links = clusters.oct_links.reshape(16, n_nodes)

    base_specs = [
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # per-tile octants
        pl.BlockSpec(memory_space=pltpu.SMEM),   # node_box
        pl.BlockSpec(memory_space=pltpu.SMEM),   # node_meta
        pl.BlockSpec(memory_space=pltpu.SMEM),   # oct_links
    ]
    common = dict(
        grid=(grid,),
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    if lookahead and not (ordered and lookahead <= 4
                          and clusters.cand_box.shape[1] * 8 >= n_nodes):
        lookahead = 0
    if lookahead:
        leafq_cap = max(LEAFQ_CAP, clusters.woop.shape[0] + 8)
        occ = pl.pallas_call(
            functools.partial(_tile_kernel_occ_la, n_nodes=n_nodes,
                              tile=tile, lookahead=lookahead, drain=drain,
                              leafq_cap=leafq_cap),
            in_specs=base_specs + [
                pl.BlockSpec(memory_space=pltpu.VMEM),   # cand_box
                pl.BlockSpec(memory_space=pltpu.VMEM),   # woop
            ],
            scratch_shapes=[pltpu.SMEM((leafq_cap,), jnp.int32)],
            **common,
        )(o_aug, d_aug, t_max[:, None], octs, clusters.node_box,
          clusters.node_meta, links, clusters.cand_box, clusters.woop)
    else:
        occ = pl.pallas_call(
            functools.partial(_tile_kernel_occ, n_nodes=n_nodes,
                              tile=tile, ordered=ordered),
            in_specs=base_specs + [
                pl.BlockSpec(memory_space=pltpu.VMEM),   # woop
            ],
            **common,
        )(o_aug, d_aug, t_max[:, None], octs, clusters.node_box,
          clusters.node_meta, links, clusters.woop)
    return occ[:r, 0] > 0.0


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "bf16",
                                    "lookahead", "drain", "ordered",
                                    "drain_always"))
def trace_pallas(clusters, origin, direction, t_init, interpret=False,
                 tile=RAY_TILE, bf16=False, lookahead=0, drain=2,
                 ordered=True, drain_always=False):
    """Pallas cluster-tree walk; returns (t, slot, normal, mat).

    Pads the ray batch to ``tile`` internally. Shading data comes out of
    the kernel (in-kernel argmin selection) so the caller never gathers.
    Rays with ``t_init <= 0`` (dead lanes) short-circuit: a tile whose
    rays are all dead walks exactly one node.

    ``ordered`` (default): each tile follows the threaded links for its
    direction octant (taken from the tile's first ray — exact for
    octant-binned waves, a harmless heuristic otherwise), giving
    front-to-back traversal. ``lookahead=K`` switches to the K-step
    speculative kernel with a ``drain``-wide leaf queue.
    """
    woop_bytes = clusters.woop.size * 4
    if woop_bytes > 96 * 1024 * 1024:
        raise ValueError(
            f"cluster data ({woop_bytes / 1e6:.0f} MB of Woop tensors) "
            "exceeds this kernel's whole-in-VMEM budget (~1.5M "
            "triangles). Build the scene with HBM paging "
            "(SceneBuilder.build pages it automatically past 64 MB) and "
            "trace via trace_pallas_paged."
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
    # Per-tile direction octant (from the tile's first ray; bit layout
    # matches ops.binning._dir_bin and ClusterSet.oct_links).
    d0 = direction.reshape(grid, tile, 3)[:, 0, :]
    # (1, G) layout: SMEM windows pad the LAST dim to 128 lanes, so a
    # (G, 1) array would cost G*512 bytes of the 1 MB SMEM (measured:
    # a 4096-tile wave OOM'd SMEM at 2 MB).
    octs = (
        (d0[:, 0] > 0).astype(jnp.int32) * 4
        + (d0[:, 1] > 0).astype(jnp.int32) * 2
        + (d0[:, 2] > 0).astype(jnp.int32)
    )[None, :]
    links = clusters.oct_links.reshape(16, n_nodes)

    ray_specs = [
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),   # per-tile octants (G, 1)
    ]
    tree_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),   # node_box (6, N)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # node_meta (2, N)
        pl.BlockSpec(memory_space=pltpu.SMEM),   # oct_links (16, N)
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
    # The lookahead kernel needs the precomputed cand_box blocks (built
    # only for ordered links and trees under CAND_MAX_NODES); fall back
    # to the plain ordered walk otherwise.
    if lookahead and not (ordered and lookahead <= 4
                          and clusters.cand_box.shape[1] * 8 >= n_nodes):
        lookahead = 0
    if lookahead:
        leafq_cap = max(LEAFQ_CAP, clusters.woop.shape[0] + 8)
        t, slot, normal, mat = pl.pallas_call(
            functools.partial(_tile_kernel_la, n_nodes=n_nodes, tile=tile,
                              bf16=bf16, lookahead=lookahead, drain=drain,
                              drain_always=drain_always,
                              leafq_cap=leafq_cap),
            in_specs=ray_specs + tree_specs + [
                pl.BlockSpec(memory_space=pltpu.VMEM),   # cand_box
            ] + data_specs,
            scratch_shapes=[
                # FIFO leaf queue, no wraparound: each leaf is visited
                # (hence pushed) at most once per tile walk, so cluster
                # count bounds the tail.
                pltpu.SMEM((leafq_cap,), jnp.int32),
            ],
            **common,
        )(o_aug, d_aug, t_init[:, None], octs, clusters.node_box,
          clusters.node_meta, links, clusters.cand_box, clusters.woop,
          clusters.mat[:, None, :])
    else:
        t, slot, normal, mat = pl.pallas_call(
            functools.partial(_tile_kernel, n_nodes=n_nodes, tile=tile,
                              bf16=bf16, ordered=ordered),
            in_specs=ray_specs + tree_specs + data_specs,
            **common,
        )(o_aug, d_aug, t_init[:, None], octs, clusters.node_box,
          clusters.node_meta, links, clusters.woop,
          clusters.mat[:, None, :])
    return t[:r, 0], slot[:r, 0], normal[:r, 0:3], mat[:r, 0]


def _tile_kernel_paged(o_ref, d_ref, t0_ref, oct_ref, nbox_ref, nmeta_ref,
                       links_ref, cbox_ref, woop_ref, mat_ref,
                       t_ref, slot_ref, normal_ref, hitmat_ref,
                       leafq_ref, ts_ref, slots_ref, norms_ref, hmats_ref,
                       *, n_nodes: int, tile: int, bf16: bool,
                       lookahead: int, drain: int, leafq_cap: int,
                       page_size: int):
    """One (page, ray-tile) step of the HBM-paged walk.

    Identical traversal structure to ``_tile_kernel_la`` but over ONE
    page's subtree with page-local cluster ids; per-ray state (best t /
    slot / normal / mat) rides along as aliased input/output blocks so
    it carries across pages (pages are the OUTER grid dim — each page's
    Woop block is DMA'd into VMEM once per wave and double-buffered by
    the Pallas pipeline). best_t tightening in earlier pages culls
    later pages: a page whose root box no live ray improves costs one
    loop iteration.
    """
    page = pl.program_id(0)
    tid = pl.program_id(1)
    oct = oct_ref[0, tid]
    sl = pl.ds(tid * tile, tile)

    # Per-ray state lives in persistent VMEM scratch for the whole wave
    # (Pallas scratch is allocated once per kernel, not per grid step):
    # restore this tile's slice into the fast output blocks, walk, then
    # save back at the end. No HBM round-trips, no aliasing semantics.
    @pl.when(page == 0)
    def _():
        t_ref[:] = t0_ref[:]
        slot_ref[:] = jnp.full((tile, 1), -1, jnp.int32)
        normal_ref[:] = jnp.zeros((tile, 4), jnp.float32)
        hitmat_ref[:] = jnp.zeros((tile, 1), jnp.int32)

    @pl.when(page > 0)
    def _():
        # State scratch is stored TRANSPOSED, (rows, r_pad): an
        # (r_pad, k<128) VMEM array lane-pads to x128 (measured 32 MB
        # per state column at a 64k-ray pool — 4x over the whole VMEM).
        t_ref[:] = ts_ref[0:1, sl].reshape(tile, 1)
        slot_ref[:] = slots_ref[0:1, sl].reshape(tile, 1)
        normal_ref[:] = norms_ref[:, sl].T.reshape(tile, 4)
        hitmat_ref[:] = hmats_ref[0:1, sl].reshape(tile, 1)

    o_aug = o_ref[:]
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, CLUSTER_SIZE), 1)
    n_cand = 2 ** lookahead - 1
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (tile, 128), 1)
    lane_win = lane128 // 16
    w_fixed = jnp.where(
        (lane128 % 16) < n_cand,
        jnp.exp2((lane128 % 16).astype(jnp.float32)), 0.0,
    )

    def eval_cluster(cid):
        best_t = t_ref[:]
        woop_c = woop_ref[0, cid]
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
            jnp.where(first, mat_ref[0, cid], 0), axis=1, keepdims=True
        )
        t_ref[:] = jnp.where(upd, t_min, best_t)
        gslot = (page * page_size + cid) * CLUSTER_SIZE + slot
        slot_ref[:] = jnp.where(upd, gslot, slot_ref[:])
        n_new = jnp.concatenate(
            [nx * inv_len, ny * inv_len, nz * inv_len,
             jnp.zeros((tile, 1), jnp.float32)], axis=1
        )
        normal_ref[:] = jnp.where(upd, n_new, normal_ref[:])
        hitmat_ref[:] = jnp.where(upd, mat_sel, hitmat_ref[:])

    def cond(carry):
        idx, head, tail = carry
        return (idx < n_nodes) | (head < tail)

    def body(carry):
        idx, head, tail = carry

        @pl.when(head < tail)
        def _():
            for j in range(drain):
                eval_cluster(
                    leafq_ref[
                        jnp.minimum(head + j, jnp.maximum(tail - 1, 0))
                    ]
                )

        head = jnp.minimum(head + drain, tail)

        valid0 = idx < n_nodes
        base = jnp.where(valid0, idx, 0)
        best_t = t_ref[:]
        row = cbox_ref[oct, base // 8]
        tn = jnp.full((tile, 128), -_BIG)
        tf = jnp.full((tile, 128), _BIG)
        for ax in range(3):
            o = o_aug[:, ax:ax + 1]
            iv = inv_d[:, ax:ax + 1]
            t0 = (row[ax:ax + 1, :] - o) * iv
            t1 = (row[3 + ax:4 + ax, :] - o) * iv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > T_MIN) & (tn < best_t)
        hit = hit & (lane_win == base % 8)
        bits = jnp.sum(
            jnp.max(jnp.where(hit, w_fixed, 0.0), axis=0)
        ).astype(jnp.int32)

        def push(ok, cid):
            nonlocal tail
            ok = ok & (cid >= 0) & (tail < leafq_cap)
            leafq_ref[jnp.where(ok, tail, leafq_cap - 1)] = cid
            tail = tail + jnp.where(ok, 1, 0)

        ci = jnp.int32(0)
        node = base
        hitb = (bits & 1) == 1
        ended = jnp.logical_not(valid0)
        push(jnp.logical_not(ended) & hitb, nmeta_ref[0, 1, node])

        def succ(node_c, take_hit):
            return links_ref[0, jnp.where(take_hit, oct, 8 + oct), node_c]

        for _ in range(1, lookahead):
            node_n = succ(node, hitb)
            ended = ended | (node_n >= n_nodes)
            live = jnp.logical_not(ended)
            node = jnp.where(live, node_n, node)
            ci = 2 * ci + jnp.where(hitb, 1, 2)
            hitb = ((bits >> ci) & 1) == 1
            push(live & hitb, nmeta_ref[0, 1, node])

        nxt = jnp.where(ended, jnp.int32(n_nodes), succ(node, hitb))
        return nxt, head, tail

    jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )

    ts_ref[0:1, sl] = t_ref[:].reshape(1, tile)
    slots_ref[0:1, sl] = slot_ref[:].reshape(1, tile)
    norms_ref[:, sl] = normal_ref[:].T.reshape(4, tile)
    hmats_ref[0:1, sl] = hitmat_ref[:].reshape(1, tile)


def _tile_kernel_paged_dnf(o_ref, d_ref, t0_ref, pb_ref, woop_ref,
                           mat_ref, t_ref, slot_ref, normal_ref,
                           hitmat_ref, key_ref, dead_ref, ts_ref,
                           slots_ref, norms_ref, hmats_ref, *,
                           n_clusters: int, tile: int, cp_pad: int,
                           idx_bits: int, group: int, page_size: int,
                           windowed: bool = False):
    """One (page, ray-tile) step of the HBM-paged DENSE NEAREST-FIRST
    sweep — the `_tile_kernel_dnf` structure over one page's clusters
    (page-local ids, small idx_bits) inside `_tile_kernel_paged`'s
    streaming skeleton (pages outer grid; per-ray best t / slot /
    normal / mat carried across pages in transposed VMEM scratch).
    Earlier pages' hits cull later pages through the carried best_t: a
    page no live ray improves costs one phase-1 pass + one empty pop.
    Replaces the per-page tree walk — on flat scenes the DNF sweep
    measured ~3x the lookahead walk on bounce waves (PERF.md r2c)."""
    page = pl.program_id(0)
    tid = pl.program_id(1)
    sl = pl.ds(tid * tile, tile)

    @pl.when(page == 0)
    def _():
        t_ref[:] = t0_ref[:]
        slot_ref[:] = jnp.full((tile, 1), -1, jnp.int32)
        normal_ref[:] = jnp.zeros((tile, 4), jnp.float32)
        hitmat_ref[:] = jnp.zeros((tile, 1), jnp.int32)

    @pl.when(page > 0)
    def _():
        t_ref[:] = ts_ref[0:1, sl].reshape(tile, 1)
        slot_ref[:] = slots_ref[0:1, sl].reshape(tile, 1)
        normal_ref[:] = norms_ref[:, sl].T.reshape(tile, 4)
        hitmat_ref[:] = hmats_ref[0:1, sl].reshape(tile, 1)

    o_aug = o_ref[:]
    d_aug = d_ref[:]
    inv_d = _safe_inv(d_aug[:, 0:3])
    k = CLUSTER_SIZE
    rowc = jax.lax.broadcasted_iota(jnp.int32, (1, cp_pad), 1)

    # Phase 1 against the CARRIED best_t: a page behind every ray's
    # current hit produces an all-miss key matrix and exits after one
    # empty pop. Scratch persists across grid steps — reset per step.
    key_ref[:] = _dnf_phase1(o_aug, inv_d, pb_ref[0], t_ref[:], tile,
                             cp_pad, idx_bits, n_clusters,
                             interleave=cp_pad // 128 if windowed else 0)
    dead_ref[:] = jnp.zeros((1, cp_pad), jnp.int32)

    def eval_group(ids):
        blocks = [woop_ref[0, c] for c in ids]
        parts = []
        for comp in range(3):
            parts += [b[:, comp * k:(comp + 1) * k] for b in blocks]
        w_cat = jnp.concatenate(parts, axis=1)        # (4, 3*kp)
        mat_cat = jnp.concatenate(
            [mat_ref[0, c] for c in ids], axis=1
        )
        _dnf_eval_group(o_aug, d_aug, w_cat, mat_cat, ids,
                        page * page_size, group, tile, t_ref, slot_ref,
                        normal_ref, hitmat_ref)

    def cond(found):
        return found

    def body(found):
        bt = _bt_inflate(t_ref[:], idx_bits)
        keys = key_ref[:]
        live = jnp.where(keys < bt, keys, _INT_MAX)
        row = jnp.min(live, axis=0, keepdims=True)
        row = jnp.where(dead_ref[:] > 0, _INT_MAX, row)
        if windowed:
            ids, valids, any_valid, retire = _dnf_pop_window(
                row, rowc, n_clusters, idx_bits, group
            )
        else:
            ids, valids, _ = _dnf_pop_group(
                row, rowc, n_clusters, idx_bits, group
            )
            any_valid = valids[0]
            retire = jnp.zeros((1, cp_pad), jnp.bool_)
            for c, v in zip(ids, valids):
                retire = retire | ((rowc == c) & v)
        dead_ref[:] = dead_ref[:] | retire.astype(jnp.int32)

        @pl.when(any_valid)
        def _():
            eval_group(ids)

        return any_valid

    jax.lax.while_loop(cond, body, jnp.bool_(True))

    ts_ref[0:1, sl] = t_ref[:].reshape(1, tile)
    slots_ref[0:1, sl] = slot_ref[:].reshape(1, tile)
    norms_ref[:, sl] = normal_ref[:].T.reshape(4, tile)
    hmats_ref[0:1, sl] = hitmat_ref[:].reshape(1, tile)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "bf16",
                                    "lookahead", "drain"))
def trace_pallas_paged(clusters, pages, origin, direction, t_init,
                       interpret=False, tile=RAY_TILE, bf16=False,
                       lookahead=4, drain=1):
    """HBM-paged cluster walk for scenes past the whole-in-VMEM budget.

    ``pages`` is the ``ClusterSet``-companion ``ops.clusters.PageSet``;
    the grid is (pages, ray tiles) with pages OUTERMOST, so each page's
    12 MB Woop block streams HBM→VMEM exactly once per wave (Pallas
    double-buffers the DMA against the previous page's walk — SURVEY §7
    hard-part 2's "HBM-resident node array" north star). Per-ray state
    carries across pages through aliased input/output blocks.
    """
    r = origin.shape[0]
    # At least 4 ray tiles: page i+1's aliased state-read of tile j must
    # land after page i's write of the same block — the T-step gap
    # between them is the safety margin against the pipeline's input
    # prefetch (interpret mode is sequential and needs none, but keep
    # the layout identical).
    r_pad = max(-(-r // tile), 4) * tile
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_init = jnp.pad(t_init, (0, pad))

    o_aug, d_aug = _augment(origin, direction)
    n_pages = pages.node_box.shape[0]
    n_nodes = pages.node_box.shape[2]
    c_pad = clusters.woop.shape[0]
    page_size = c_pad // n_pages
    grid_t = r_pad // tile
    leafq_cap = max(LEAFQ_CAP, page_size + 8)

    d0 = direction.reshape(grid_t, tile, 3)[:, 0, :]
    octs = (
        (d0[:, 0] > 0).astype(jnp.int32) * 4
        + (d0[:, 1] > 0).astype(jnp.int32) * 2
        + (d0[:, 2] > 0).astype(jnp.int32)
    )[None, :]

    woop_paged = clusters.woop.reshape(n_pages, page_size, 4,
                                       3 * CLUSTER_SIZE)
    mat_paged = clusters.mat.reshape(n_pages, page_size, 1, CLUSTER_SIZE)
    r8 = pages.cand_box.shape[1]

    state_specs = [
        pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 4), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    t, slot, normal, mat = pl.pallas_call(
        functools.partial(
            _tile_kernel_paged, n_nodes=n_nodes, tile=tile, bf16=bf16,
            lookahead=lookahead, drain=drain, leafq_cap=leafq_cap,
            page_size=page_size,
        ),
        grid=(n_pages, grid_t),
        in_specs=[
            pl.BlockSpec((tile, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),        # octants (1, T)
            pl.BlockSpec((1, 6, n_nodes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),        # page tree boxes
            pl.BlockSpec((1, 2, n_nodes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),        # page tree meta
            pl.BlockSpec((1, 16, n_nodes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),        # page oct links
            pl.BlockSpec((8, r8, 6, 128), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # page cand_box
            pl.BlockSpec((1, page_size, 4, 3 * CLUSTER_SIZE),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # page woop
            pl.BlockSpec((1, page_size, 1, CLUSTER_SIZE),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # page mat
        ],
        out_specs=tuple(state_specs),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((leafq_cap,), jnp.int32),
            # Transposed (rows, r_pad) so the minor dim is lane-dense.
            pltpu.VMEM((1, r_pad), jnp.float32),   # best-t carry
            pltpu.VMEM((1, r_pad), jnp.int32),     # slot carry
            pltpu.VMEM((4, r_pad), jnp.float32),   # normal carry
            pltpu.VMEM((1, r_pad), jnp.int32),     # mat carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_aug, d_aug, t_init[:, None], octs, pages.node_box,
      pages.node_meta, pages.oct_links, pages.cand_box, woop_paged,
      mat_paged)
    return t[:r, 0], slot[:r, 0], normal[:r, 0:3], mat[:r, 0]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "group",
                                    "windowed"))
def trace_pallas_paged_dnf(clusters, pages, origin, direction, t_init,
                           interpret=False, tile=DNF_TILE, group=None,
                           windowed=None):
    """HBM-paged dense nearest-first sweep: contract of
    ``trace_pallas_paged`` with ``trace_pallas_dnf``'s per-page kernel.
    The page grid/streaming/state-carry skeleton is identical; only the
    per-page traversal changes (no trees, no cand_box — just the page's
    cluster AABBs in vector-row layout)."""
    r = origin.shape[0]
    r_pad = max(-(-r // tile), 4) * tile
    pad = r_pad - r
    if pad:
        origin = jnp.pad(origin, ((0, pad), (0, 0)))
        direction = jnp.pad(
            direction, ((0, pad), (0, 0)), constant_values=1.0
        )
        t_init = jnp.pad(t_init, (0, pad))

    o_aug, d_aug = _augment(origin, direction)
    n_pages = pages.node_box.shape[0]
    c_tot = clusters.woop.shape[0]
    page_size = c_tot // n_pages
    grid_t = r_pad // tile

    # Per-page cluster bounds, (P, 6, cp_pad) vector-row layout. Page
    # padding clusters carry inverted (always-hit) AABBs in the flat
    # set — rewrite them (and the lane-padding columns) as point boxes
    # at +BIG, which no ray with best_t <= _BIG can hit.
    cp_pad = -(-page_size // 128) * 128
    amin, amax = clusters.aabb_min, clusters.aabb_max
    is_pad = (amin[:, 0] > amax[:, 0])[:, None]
    amin = jnp.where(is_pad, _BIG, amin).astype(jnp.float32)
    amax = jnp.where(is_pad, _BIG, amax).astype(jnp.float32)
    pb = jnp.concatenate(
        [amin.reshape(n_pages, page_size, 3).transpose(0, 2, 1),
         amax.reshape(n_pages, page_size, 3).transpose(0, 2, 1)], axis=1
    )
    lane_pad = cp_pad - page_size
    if lane_pad:
        pb = jnp.pad(pb, ((0, 0), (0, 0), (0, lane_pad)),
                     constant_values=_BIG)
    idx_bits = max((cp_pad - 1).bit_length(), 1)
    if windowed is None:
        windowed = cp_pad >= 512
    if group is None:
        group = min(6, cp_pad // 128) if windowed else 4
    if windowed:
        nw = cp_pad // 128
        col = jnp.arange(cp_pad, dtype=jnp.int32)
        pb = pb[:, :, (col % 128) * nw + col // 128]

    woop_paged = clusters.woop.reshape(n_pages, page_size, 4,
                                       3 * CLUSTER_SIZE)
    mat_paged = clusters.mat.reshape(n_pages, page_size, 1, CLUSTER_SIZE)

    state_specs = [
        pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 4), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    t, slot, normal, mat = pl.pallas_call(
        functools.partial(
            _tile_kernel_paged_dnf, n_clusters=page_size, tile=tile,
            cp_pad=cp_pad, idx_bits=idx_bits, group=group,
            page_size=page_size, windowed=windowed,
        ),
        grid=(n_pages, grid_t),
        in_specs=[
            pl.BlockSpec((tile, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, cp_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),     # page bounds
            pl.BlockSpec((1, page_size, 4, 3 * CLUSTER_SIZE),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),     # page woop
            pl.BlockSpec((1, page_size, 1, CLUSTER_SIZE),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),     # page mat
        ],
        out_specs=tuple(state_specs),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_pad, 4), jnp.float32),
            jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, cp_pad), jnp.int32),    # packed keys
            pltpu.VMEM((1, cp_pad), jnp.int32),       # retired clusters
            pltpu.VMEM((1, r_pad), jnp.float32),      # best-t carry
            pltpu.VMEM((1, r_pad), jnp.int32),        # slot carry
            pltpu.VMEM((4, r_pad), jnp.float32),      # normal carry
            pltpu.VMEM((1, r_pad), jnp.int32),        # mat carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(o_aug, d_aug, t_init[:, None], pb, woop_paged, mat_paged)
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
