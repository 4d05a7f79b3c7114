"""Cluster-packed triangle acceleration structure (the TPU-native "BVH").

Why not a classic per-ray BVH walk: TPU vector lanes have no efficient
per-lane gather, so the textbook traversal (each ray chasing its own node
pointer through HBM) runs orders of magnitude below the VPU's throughput —
measured ~0.04 Mrays/s on a v5e for the threaded-BVH ``ops.bvh.traverse``.
The TPU-native formulation turns the irregular walk into dense regular
compute:

  * Triangles are packed into **clusters of up to 128** (the VPU lane
    width) by running the binned-SAH builder with a 128-prim leaf size;
    each leaf becomes a cluster with a contiguous, padded triangle range.
  * Each triangle is stored as a **Woop unit-triangle affine transform**:
    M = [e1 | e2 | n]^-1, b = -M v0, so a ray (o, d) hits where
    w(t) = (M o + b + t M d).z crosses 0, with barycentrics read straight
    off the transformed point. The per-cluster tensor P has shape
    (4, 3*128): column k holds [M_row; b_comp] for triangle k, grouped
    u | v | w — so o' and d' for ALL 128 triangles against a whole ray
    tile are TWO (R,4)x(4,384) matmuls (MXU work, no gathers).
  * Traversal = sweep: for each cluster, a broadcast ray-tile × AABB slab
    test culls, then the dense pair evaluation updates per-ray best-t.
    The Pallas kernel (``ops.cluster_trace``) walks a threaded tree over
    clusters per ray tile, skipping subtrees with ``@pl.when``; the
    pure-JAX fallback evaluates all clusters masked (oracle + CPU path).
  * Degenerate padding triangles use M = 0, b = (-1, -1, 1): barycentric
    u evaluates to -1 for every ray, an unconditional miss.

Shading data (geometric normal = normalize(M row w), material id) is
carried per cluster slot so closest-hit returns everything shading needs —
no post-hit gathers. Host-side build is NumPy (optionally the native C++
builder); no reference analogue (the reference intersects one hard-coded
sphere, `Test.hlsl:12-28`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

CLUSTER_SIZE = 128  # triangles per cluster == VPU lane width


class ClusterSet(NamedTuple):
    """Device arrays for the cluster sweep (all leading dim C = clusters).

    aabb_min/aabb_max: (C, 3) f32 cluster bounds.
    woop:   (C, 4, 3*128) f32 — [M | b] columns, grouped u | v | w.
    normal: (C, 3, 128) f32 — unit geometric normal per slot.
    mat:    (C, 128) i32 — material id per slot (0 for padding).
    node_box:  (6, N) f32 — threaded cluster-tree AABBs (xyz min, xyz max),
               SMEM-friendly transposed layout for per-tile traversal.
    node_meta: (2, N) i32 — [skip_link, cluster_id]; cluster_id == -1 for
               interior nodes. Preorder: hit-successor is node+1, miss
               (or after a leaf) jumps to skip_link; index N terminates.
    wide_box:  (M, 6, 128) f32 — 8-wide tree child AABBs, lane-padded (see
               ``build_wide_tree``; the production kernel's structure).
    wide_meta: (M, 8) i32 — 8-wide child encoding.
    """

    aabb_min: np.ndarray
    aabb_max: np.ndarray
    woop: np.ndarray
    normal: np.ndarray
    mat: np.ndarray
    node_box: np.ndarray
    node_meta: np.ndarray
    wide_box: np.ndarray
    wide_meta: np.ndarray


def build_cluster_tree(
    aabb_min: np.ndarray, aabb_max: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded binary tree over cluster AABBs (median split, leaf = 1).

    Returns (node_box (6, N) f32, node_meta (2, N) i32). The per-tile
    kernel walks this with ONE scalar register (node index) while the
    vector lanes evaluate the tile-vs-AABB test — the tile-uniform
    analogue of the per-ray stackless walk the VPU can't do.
    """
    c = aabb_min.shape[0]
    centroid = (aabb_min + aabb_max) * 0.5
    max_nodes = 2 * c - 1 if c else 1
    box = np.empty((max_nodes, 6), np.float32)
    meta = np.empty((max_nodes, 2), np.int32)
    count = 0

    def emit(ids):
        nonlocal count
        my = count
        count += 1
        box[my, :3] = aabb_min[ids].min(axis=0)
        box[my, 3:] = aabb_max[ids].max(axis=0)
        if len(ids) == 1:
            meta[my] = (count, ids[0])
            return
        ext = centroid[ids].max(axis=0) - centroid[ids].min(axis=0)
        axis = int(np.argmax(ext))
        order = np.argsort(centroid[ids, axis], kind="stable")
        half = len(ids) // 2
        meta[my, 1] = -1
        left, right = ids[order[:half]], ids[order[half:]]

        def area(sel):
            d = np.maximum(
                aabb_max[sel].max(axis=0) - aabb_min[sel].min(axis=0), 0.0
            )
            return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

        # Visit the larger-area child first: big clusters (walls, floors)
        # are hit by almost every ray, so establishing their best_t early
        # lets the tn < best_t test cull the small-cluster subtrees behind
        # them — the direction-independent stand-in for front-to-back
        # ordering, which a tile-uniform walk cannot do per ray.
        if area(right) > area(left):
            left, right = right, left
        emit(left)
        emit(right)
        meta[my, 0] = count  # skip = end of subtree

    if c == 0:
        box[0] = 0.0
        meta[0] = (1, -1)
        count = 1
    else:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 100_000))
        try:
            emit(np.arange(c))
        finally:
            sys.setrecursionlimit(old)

    return box[:count].T.copy(), meta[:count].T.copy()


def build_clusters(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, tri_mat: np.ndarray
) -> Tuple[ClusterSet, np.ndarray]:
    """Pack triangles into SAH clusters; returns (ClusterSet-as-numpy, perm).

    ``perm`` maps new (cluster-contiguous, unpadded) order to input order;
    the padded global slot id of a hit is ``cluster*128 + lane`` and maps
    back through the (C*128,) ``slot_to_tri`` array embedded in mat/normal
    ordering (padding slots have mat 0 and never hit).
    """
    from pathtracing_tpu.ops import bvh as bvh_ops

    n = v0.shape[0]
    (node_min, node_max, node_meta), perm = bvh_ops.build_bvh(
        v0, e1, e2, leaf_size=CLUSTER_SIZE
    )
    v0p, e1p, e2p = v0[perm], e1[perm], e2[perm]
    matp = tri_mat[perm]

    # Leaves of the coarse BVH are the clusters (contiguous prim ranges).
    leaves = node_meta[node_meta[:, 2] > 0]
    order = np.argsort(leaves[:, 1], kind="stable")
    leaves = leaves[order]
    c = leaves.shape[0]

    aabb_min = np.empty((c, 3), np.float32)
    aabb_max = np.empty((c, 3), np.float32)
    woop = np.zeros((c, 4, 3 * CLUSTER_SIZE), np.float32)
    normal = np.zeros((c, 3, CLUSTER_SIZE), np.float32)
    mat = np.zeros((c, CLUSTER_SIZE), np.int32)

    # Degenerate-pad defaults: M = 0, b = (-1, -1, 1) → u = -1, miss.
    woop[:, 3, 0 * CLUSTER_SIZE: 1 * CLUSTER_SIZE] = -1.0
    woop[:, 3, 1 * CLUSTER_SIZE: 2 * CLUSTER_SIZE] = -1.0
    woop[:, 3, 2 * CLUSTER_SIZE: 3 * CLUSTER_SIZE] = 1.0

    for ci, (_, start, count) in enumerate(leaves):
        sl = slice(start, start + count)
        tv0, te1, te2 = v0p[sl], e1p[sl], e2p[sl]
        verts = np.stack([tv0, tv0 + te1, tv0 + te2], axis=1)
        aabb_min[ci] = verts.min(axis=(0, 1))
        aabb_max[ci] = verts.max(axis=(0, 1))

        n_geo = np.cross(te1, te2)
        norm = np.linalg.norm(n_geo, axis=1, keepdims=True)
        ok = norm[:, 0] > 1e-20
        n_unit = np.where(ok[:, None], n_geo / np.maximum(norm, 1e-20), 0.0)

        # M = [e1 | e2 | n]^-1 per triangle (n unnormalized keeps M finite
        # for thin tris); b = -M v0.
        basis = np.stack([te1, te2, n_geo], axis=-1)  # (k, 3, 3)
        # Guard singular (degenerate) triangles: replace by identity and
        # mark the slot as padding (b stays the always-miss default).
        dets = np.linalg.det(basis)
        sing = np.abs(dets) < 1e-30
        basis[sing] = np.eye(3)
        m = np.linalg.inv(basis).astype(np.float32)  # rows map p -> (u,v,w)
        b = -np.einsum("kij,kj->ki", m, tv0.astype(np.float32))

        k = count
        dead = sing | ~ok
        for comp in range(3):  # u, v, w rows of M
            colsl = slice(comp * CLUSTER_SIZE, comp * CLUSTER_SIZE + k)
            woop[ci, 0:3, colsl] = np.where(dead[None, :], 0.0, m[:, comp, :].T)
            woop[ci, 3, colsl] = np.where(
                dead, (-1.0, -1.0, 1.0)[comp], b[:, comp]
            )
        normal[ci, :, :k] = n_unit.T
        mat[ci, :k] = np.where(dead, 0, matp[sl])

    node_box, node_meta = build_cluster_tree(aabb_min, aabb_max)
    wide_box, wide_meta = build_wide_tree(aabb_min, aabb_max)
    return (
        ClusterSet(
            aabb_min=aabb_min, aabb_max=aabb_max,
            woop=woop, normal=normal, mat=mat,
            node_box=node_box, node_meta=node_meta,
            wide_box=wide_box, wide_meta=wide_meta,
        ),
        perm,
    )


WIDE_FANOUT = 8
WIDE_LANES = 128  # physical lane padding of the child axis


def build_wide_tree(
    aabb_min: np.ndarray, aabb_max: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """8-wide tree over cluster AABBs for the stack-based tile walk.

    Returns (wide_box (M, 6, 128) f32 — child slots lane-padded, slots
    >= 8 inverted — and wide_meta (M, 8) i32). Child
    encoding: -1 empty, >= 0 internal node index, <= -2 leaf with
    cluster id ``-(child + 2)``. Children are ordered by descending AABB
    area (big wall-like clusters first) so every ray acquires a finite
    best_t as early as possible; one vector→scalar reduction then tests
    all 8 children at once in the kernel — the per-iteration sync is the
    dominant traversal cost on TPU (PERF.md).
    """
    c = aabb_min.shape[0]
    centroid = (aabb_min + aabb_max) * 0.5

    boxes = []   # (6, 8) rows
    metas = []   # (8,) rows

    def area(sel):
        d = np.maximum(aabb_max[sel].max(axis=0) - aabb_min[sel].min(axis=0),
                       0.0)
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def split8(ids):
        """Partition into up to 8 parts via 3 rounds of median splits."""
        parts = [ids]
        for _ in range(3):
            nxt = []
            for p in parts:
                if len(p) <= 1:
                    nxt.append(p)
                    continue
                ext = centroid[p].max(axis=0) - centroid[p].min(axis=0)
                ax = int(np.argmax(ext))
                order = np.argsort(centroid[p, ax], kind="stable")
                half = len(p) // 2
                nxt.append(p[order[:half]])
                nxt.append(p[order[half:]])
            parts = nxt
        return [p for p in parts if len(p)]

    def empty_box():
        # Inverted bounds: the slab test can never pass for empty slots.
        # Lane-padded to 128 so the kernel's (tile, 128) vector ops map
        # 1:1 onto the physical VPU tile (slots 8..127 always miss).
        b = np.empty((6, WIDE_LANES), np.float32)
        b[0:3] = 3.0e38
        b[3:6] = -3.0e38
        return b

    def emit(ids) -> int:
        my = len(metas)
        boxes.append(empty_box())
        metas.append(np.full(WIDE_FANOUT, -1, np.int32))
        parts = split8(ids)
        parts.sort(key=area, reverse=True)
        for ci, p in enumerate(parts):
            boxes[my][0:3, ci] = aabb_min[p].min(axis=0)
            boxes[my][3:6, ci] = aabb_max[p].max(axis=0)
            if len(p) == 1:
                metas[my][ci] = -(int(p[0]) + 2)
            else:
                metas[my][ci] = emit(p)
        return my

    if c == 0:
        boxes.append(empty_box())
        metas.append(np.full(WIDE_FANOUT, -1, np.int32))
    else:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 100_000))
        try:
            emit(np.arange(c))
        finally:
            sys.setrecursionlimit(old)

    return np.stack(boxes), np.stack(metas)
