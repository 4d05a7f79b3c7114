"""Bounding-volume hierarchy: host-side SAH builder + stackless traversal.

No reference analogue yet (the reference intersects one hard-coded sphere,
`Test.hlsl:12-28`); this implements the BASELINE north-star requirement
("BVH traversal runs as a stack-in-registers while_loop over an HBM-resident
flattened node array").

Design — *threaded / skip-link* layout instead of a stack:
  Nodes are stored in DFS preorder. An interior node's "hit" successor is
  always ``i + 1`` (its left child), so it needs only a "miss"/skip link to
  the next subtree. A leaf stores a contiguous primitive range (triangles are
  permuted at build time) and always continues at its skip link. Traversal is
  then a single ``lax.while_loop`` over one int32 register per ray — no
  per-ray stack memory at all, which is exactly what the TPU's VPU wants
  (the 8×128 lanes each carry an independent node pointer; gathers fetch
  node/prim data). Termination: ``index == node_count``.

The builder is binned-SAH (16 bins) in NumPy, with an optional C++
implementation (``native/bvh_builder.cpp``) loaded via ctypes for large
meshes — the analogue of the reference's native build-time toolchain
(`RayTracing.csproj:38-105` driving dxc).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.ops import intersect

LEAF_SIZE = 4     # max primitives per leaf; traversal unrolls exactly this
SAH_BINS = 16
TRAVERSAL_COST = 1.0
INTERSECT_COST = 1.5


class FlatBVH(NamedTuple):
    """Flattened threaded BVH (device arrays; the scene pytree embeds these).

    node_min/node_max: (M, 3) float32 AABBs.
    node_meta: (M, 3) int32 — [skip_link, prim_start, prim_count];
      prim_count == 0 marks an interior node. skip_link == M terminates.
    """

    node_min: jnp.ndarray
    node_max: jnp.ndarray
    node_meta: jnp.ndarray


def build_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
              leaf_size: int = LEAF_SIZE):
    """Build a threaded BVH over triangles (v0, v0+e1, v0+e2).

    Returns (FlatBVH-as-numpy-tuple, permutation) where ``permutation``
    reorders the input triangles so each leaf covers a contiguous range.
    ``leaf_size`` defaults to the traversal unroll bound; the cluster
    packer (``ops.clusters``) rebuilds with leaf_size=128.
    Tries the native C++ builder first (same layout), falls back to NumPy.
    """
    try:
        from pathtracing_tpu.ops import bvh_native

        result = bvh_native.build(v0, e1, e2, leaf_size, SAH_BINS)
        if result is not None:
            return result
    except Exception:  # pragma: no cover - native lib genuinely optional
        pass
    return _build_bvh_numpy(v0, e1, e2, leaf_size)


def _build_bvh_numpy(v0, e1, e2, leaf_size=LEAF_SIZE):
    n = v0.shape[0]
    verts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (n, 3, 3)
    prim_min = verts.min(axis=1).astype(np.float32)
    prim_max = verts.max(axis=1).astype(np.float32)
    centroid = (prim_min + prim_max) * 0.5

    # Worst case 2n-1 nodes for leaf size 1; leaf size 4 needs fewer but
    # allocate the bound and trim.
    max_nodes = max(2 * n, 1)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_meta = np.empty((max_nodes, 3), np.int32)
    perm = np.arange(n, dtype=np.int64)

    node_count = 0
    # Explicit stack of (first, count) ranges into ``perm``; preorder
    # emission makes hit-links implicit (i+1).
    # Each stack entry also remembers the index of the parent slot whose
    # skip link must be patched once the subtree size is known — we instead
    # patch skips in a second pass from subtree extents.
    subtree_end = np.empty(max_nodes, np.int32)  # exclusive node index

    def emit(first, count):
        nonlocal node_count
        my = node_count
        node_count += 1
        idx = perm[first : first + count]
        node_min[my] = prim_min[idx].min(axis=0)
        node_max[my] = prim_max[idx].max(axis=0)

        if count <= leaf_size:
            node_meta[my] = (0, first, count)  # skip patched below
            subtree_end[my] = node_count
            return my

        idx_c = centroid[idx]
        ext = idx_c.max(axis=0) - idx_c.min(axis=0)
        axis = int(np.argmax(ext))

        split = None
        if ext[axis] > 1e-12:
            # Binned SAH along the widest centroid axis.
            lo = idx_c[:, axis].min()
            scale = SAH_BINS * (1.0 - 1e-6) / ext[axis]
            bins = np.minimum(
                ((idx_c[:, axis] - lo) * scale).astype(np.int32), SAH_BINS - 1
            )
            counts = np.bincount(bins, minlength=SAH_BINS)
            bmin = np.full((SAH_BINS, 3), np.inf, np.float32)
            bmax = np.full((SAH_BINS, 3), -np.inf, np.float32)
            for b in range(SAH_BINS):
                sel = bins == b
                if counts[b]:
                    bmin[b] = prim_min[idx[sel]].min(axis=0)
                    bmax[b] = prim_max[idx[sel]].max(axis=0)

            def area(mn, mx):
                d = np.maximum(mx - mn, 0.0)
                return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

            lmin = np.minimum.accumulate(bmin, axis=0)
            lmax = np.maximum.accumulate(bmax, axis=0)
            rmin = np.minimum.accumulate(bmin[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bmax[::-1], axis=0)[::-1]
            lcount = np.cumsum(counts)
            rcount = count - lcount
            cost = np.full(SAH_BINS - 1, np.inf)
            for b in range(SAH_BINS - 1):
                if lcount[b] and rcount[b]:
                    cost[b] = INTERSECT_COST * (
                        lcount[b] * area(lmin[b], lmax[b])
                        + rcount[b] * area(rmin[b + 1], rmax[b + 1])
                    )
            best = int(np.argmin(cost))
            if np.isfinite(cost[best]):
                left_sel = bins <= best
                split = int(left_sel.sum())
                order = np.argsort(~left_sel, kind="stable")
                perm[first : first + count] = idx[order]

        if split is None or split == 0 or split == count:
            # Degenerate centroids: median split keeps the tree balanced.
            order = np.argsort(idx_c[:, axis], kind="stable")
            perm[first : first + count] = idx[order]
            split = count // 2

        node_meta[my] = (0, 0, 0)  # interior
        emit(first, split)
        emit(first + split, count - split)
        subtree_end[my] = node_count
        return my

    if n == 0:
        # Single empty leaf so traversal code never special-cases T == 0.
        node_min[0] = np.zeros(3, np.float32)
        node_max[0] = np.zeros(3, np.float32)
        node_meta[0] = (1, 0, 0)
        node_count = 1
        subtree_end[0] = 1
    else:
        import sys

        old = sys.getrecursionlimit()
        sys.setrecursionlimit(max(old, 100_000))
        try:
            emit(0, n)
        finally:
            sys.setrecursionlimit(old)
        # Patch skip links: node i's miss-successor is the end of its subtree.
        node_meta[:node_count, 0] = subtree_end[:node_count]

    flat = (
        node_min[:node_count].copy(),
        node_max[:node_count].copy(),
        node_meta[:node_count].copy(),
    )
    return flat, perm


def traverse(bvh: FlatBVH, tri_v0, tri_e1, tri_e2, origin, direction, t_max):
    """Closest-hit traversal for ONE ray (vmap over batches).

    The per-ray state is three registers: (node_index, best_t, best_prim).
    Under ``vmap``, XLA batches the while_loop with an "any lane active"
    condition — the standard vectorized stackless traversal.

    Returns (t, prim_index) with t == +inf / prim_index == -1 on miss.
    """
    num_nodes = bvh.node_meta.shape[0]
    inv_d = 1.0 / jnp.where(jnp.abs(direction) < 1e-12,
                            jnp.where(direction >= 0, 1e-12, -1e-12),
                            direction)

    def cond(state):
        idx, _, _ = state
        return idx < num_nodes

    def body(state):
        idx, best_t, best_prim = state
        nmin = bvh.node_min[idx]
        nmax = bvh.node_max[idx]
        meta = bvh.node_meta[idx]
        skip, start, count = meta[0], meta[1], meta[2]

        box_hit, _ = intersect.ray_aabb(origin, inv_d, nmin, nmax, best_t)
        is_leaf = count > 0

        # Leaf: test up to LEAF_SIZE prims (builder guarantees the bound).
        def test_prim(j, carry):
            bt, bp = carry
            pid = jnp.minimum(start + j, tri_v0.shape[0] - 1)
            t = intersect.ray_triangle(
                origin, direction,
                tri_v0[pid], tri_e1[pid], tri_e2[pid],
                t_max=bt,
            )
            ok = (j < count) & is_leaf & box_hit & (t < bt)
            return jnp.where(ok, t, bt), jnp.where(ok, pid, bp)

        best_t, best_prim = jax.lax.fori_loop(
            0, LEAF_SIZE, test_prim, (best_t, best_prim)
        )

        descend = box_hit & jnp.logical_not(is_leaf)
        idx = jnp.where(descend, idx + 1, skip)
        return idx, best_t, best_prim

    _, t, prim = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t_max, jnp.int32(-1))
    )
    return t, prim


def bvh_depth_stats(flat) -> Tuple[int, float]:
    """Host-side diagnostics: (max leaf depth, mean leaf depth)."""
    node_meta = np.asarray(flat[2])
    if node_meta.shape[0] == 1:  # single leaf (possibly the empty sentinel)
        return 0, 0.0
    depths = []
    # Preorder walk: interior node i has left child i+1, and the left
    # child's skip link IS the right child's index.
    stack = [(0, 0)]
    while stack:
        i, d = stack.pop()
        _, _, count = node_meta[i]
        if count > 0:
            depths.append(d)
        else:
            left = i + 1
            right = int(node_meta[left][0])
            stack.append((left, d + 1))
            stack.append((right, d + 1))
    if not depths:
        return 0, 0.0
    return int(max(depths)), float(np.mean(depths))
