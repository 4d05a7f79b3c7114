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
    oct_links: (2, 8, N) i32 — per-direction-octant threaded links over
               the SAME node ids: [0] = hit_next (the octant's NEAR child
               first — true front-to-back descent), [1] = miss_next
               (continuation). Front-to-back order makes the kernel's
               ``tn < best_t`` test cull everything behind the first hits,
               which the static area-first order cannot (see
               ``build_octant_trees``).
    cand_box:  (8, ceil(N/8), 6, 128) f32 — per-octant speculative
               candidate-heap AABBs for the lookahead kernel: node n's
               15-node heap (itself + every node reachable in ≤ 3 more
               octant-ordered steps) lives in lanes [(n%8)*16, +15) of
               row n//8, so ONE dynamic vector load feeds the whole
               per-iteration slab block (scalar-assembled boxes measured
               ~2.5 µs/iteration — the round-2 wall after the round-1
               sync wall fell). Slot 15 and out-of-tree ids hold
               inverted boxes (never hit). Built only when N <=
               CAND_MAX_NODES; a (8, 1, 6, 128) dummy otherwise.
    """

    aabb_min: np.ndarray
    aabb_max: np.ndarray
    woop: np.ndarray
    normal: np.ndarray
    mat: np.ndarray
    node_box: np.ndarray
    node_meta: np.ndarray
    oct_links: np.ndarray
    cand_box: np.ndarray


def build_cluster_tree(
    aabb_min: np.ndarray, aabb_max: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Threaded binary tree over cluster AABBs (median split, leaf = 1).

    Returns (node_box (6, N) f32, node_meta (2, N) i32, child (N, 2) i32,
    axis (N,) i8, first_is_lower (N,) bool). The per-tile kernel walks
    the threaded links with ONE scalar register (node index) while the
    vector lanes evaluate the tile-vs-AABB test — the tile-uniform
    analogue of the per-ray stackless walk the VPU can't do. The extra
    topology arrays (children in emission order, split axis, whether the
    first-emitted child is the lower-centroid one) feed
    ``build_octant_trees``.
    """
    c = aabb_min.shape[0]
    centroid = (aabb_min + aabb_max) * 0.5
    max_nodes = 2 * c - 1 if c else 1
    box = np.empty((max_nodes, 6), np.float32)
    meta = np.empty((max_nodes, 2), np.int32)
    child = np.full((max_nodes, 2), -1, np.int32)
    axis_arr = np.zeros(max_nodes, np.int8)
    first_lower = np.zeros(max_nodes, np.bool_)
    count = 0

    def emit(ids):
        nonlocal count
        my = count
        count += 1
        box[my, :3] = aabb_min[ids].min(axis=0)
        box[my, 3:] = aabb_max[ids].max(axis=0)
        if len(ids) == 1:
            meta[my] = (count, ids[0])
            return my
        meta[my, 1] = -1
        # SAH sweep over all three axes: minimize A_l·n_l + A_r·n_r
        # using prefix/suffix box unions of the sorted order. Beats the
        # round-1 centroid-median split by tightening child boxes, which
        # is what the tile-uniform walk's slab culling feeds on.
        best = (np.inf, None, None, 0)
        k = len(ids)
        for ax in range(3):
            order = np.argsort(centroid[ids, ax], kind="stable")
            s = ids[order]
            lo, hi = aabb_min[s], aabb_max[s]
            pre_lo = np.minimum.accumulate(lo, axis=0)
            pre_hi = np.maximum.accumulate(hi, axis=0)
            suf_lo = np.minimum.accumulate(lo[::-1], axis=0)[::-1]
            suf_hi = np.maximum.accumulate(hi[::-1], axis=0)[::-1]

            def sa(lo_, hi_):
                d = np.maximum(hi_ - lo_, 0.0)
                return (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                        + d[:, 2] * d[:, 0])

            n_l = np.arange(1, k)
            cost = (sa(pre_lo[:-1], pre_hi[:-1]) * n_l
                    + sa(suf_lo[1:], suf_hi[1:]) * (k - n_l))
            j = int(np.argmin(cost))
            if cost[j] < best[0]:
                best = (float(cost[j]), s, j + 1, ax)
        _, s, cut, axis = best
        # ``left`` is the lower-centroid side along the winning axis by
        # construction — build_octant_trees relies on that.
        left, right = s[:cut], s[cut:]

        def area(sel):
            d = np.maximum(
                aabb_max[sel].max(axis=0) - aabb_min[sel].min(axis=0), 0.0
            )
            return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

        # Emit the larger-area child first: big clusters (walls, floors)
        # are hit by almost every ray, so establishing their best_t early
        # lets the tn < best_t test cull the small-cluster subtrees behind
        # them — the direction-independent stand-in for front-to-back
        # ordering (the per-octant links in oct_links do it properly).
        lower_first = area(left) >= area(right)
        if not lower_first:
            left, right = right, left
        child[my, 0] = emit(left)
        child[my, 1] = emit(right)
        axis_arr[my] = axis
        first_lower[my] = lower_first
        meta[my, 0] = count  # skip = end of subtree
        return my

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

    return (box[:count].T.copy(), meta[:count].T.copy(), child[:count],
            axis_arr[:count], first_lower[:count])


CAND_MAX_NODES = 16384  # cand_box VMEM ceiling (~100 MB at the cap / 8)
CAND_HEAP = 15          # binary heap of candidates: lookahead <= 4 steps

PAGE_CLUSTERS = 2048    # clusters per HBM page (12 MB of Woop data)


class InstanceSet(NamedTuple):
    """Instance-expanded traversal metadata over a shared prototype
    ClusterSet (true shared-geometry instancing).

    The heavy tensors (Woop/mat, ~6 KB/cluster) stay PROTOTYPE-sized in
    object space; only cheap per-cluster metadata expands per instance
    (~72 B/cluster), so a forest of N copies costs N × 72 B/cluster of
    extra memory instead of N × the geometry. The instanced DNF kernel
    (``cluster_trace.trace_pallas_dnf_inst``) culls EXPANDED world-space
    AABBs per ray exactly as the flat kernel does — off-screen instances
    are never popped — and at eval time transforms the ray tile into the
    popped cluster's object space (t is preserved: o' = L·o + tr,
    d' = L·d with L = A⁻¹ keeps the world parameterization exactly), so
    one shared Woop block serves every instance.

    cmap:     (Ce,) i32  expanded cluster -> prototype cluster index.
    xform:    (Ce, 12) f32 world->object transform per expanded cluster,
              row-major [L00..L22, tr0, tr1, tr2].
    aabb_min: (Ce, 3) f32 world-space bounds (conservatively widened for
              the f32 corner-transform rounding).
    aabb_max: (Ce, 3) f32.
    inst_id:  (Ce,) i32 instance index (diagnostics; attrs later).
    imat:     (Ce,) i32 per-instance MATERIAL OVERRIDE (-1 = keep the
              prototype's per-triangle mats) — feature-gated: None when
              no placement overrides, keeping override-free instanced
              scenes' pytrees and jit graphs identical.
    fw0/fw1:  (Ce, 12) f32 OBJECT→WORLD endpoint affines
              [A00..A22 row-major, t0..t2] for motion-blurred instances
              (shutter open / close) — feature-gated: None for static
              instance sets. The motion path lerps the FORWARD affine
              (every prototype point then travels a straight world-space
              segment, so the endpoint-corner union AABB is an exact
              bound) and inverts per ray at eval time; static rows
              simply carry fw0 == fw1.
    """

    cmap: np.ndarray
    xform: np.ndarray
    aabb_min: np.ndarray
    aabb_max: np.ndarray
    inst_id: np.ndarray
    imat: np.ndarray = None
    fw0: np.ndarray = None
    fw1: np.ndarray = None


def expand_instances(proto: ClusterSet, placements) -> InstanceSet:
    """Expand per-instance placements into an InstanceSet.

    ``placements``: sequence of (first_cluster, n_clusters, M[, imat[,
    M1]]) where M is the (3, 4) or (4, 4) OBJECT→WORLD affine transform
    of one instance over the prototype cluster range [first_cluster,
    first_cluster + n_clusters). Transforms may rotate, translate, and
    scale (uniform or not — normals go through L^T which is exact for
    any invertible A). Optional 4th element: a per-instance material-id
    override (-1/absent = keep the prototype's mats); the ``imat``
    column is attached only when some placement overrides. Optional 5th
    element: the SHUTTER-CLOSE transform M1 (same shape; None/absent =
    static) — any present M1 attaches the ``fw0``/``fw1`` endpoint
    columns and union world bounds (see the class docstring).
    """
    cmaps, xforms, mins, maxs, iids, imats = [], [], [], [], [], []
    fw0s, fw1s = [], []
    any_motion = any(len(p) > 4 and p[4] is not None for p in placements)

    def norm_affine(m):
        m = np.asarray(m, np.float64)
        if m.shape == (4, 4):
            m = m[:3]
        if m.shape != (3, 4):
            raise ValueError(
                f"instance transform must be (3,4) or (4,4); got {m.shape}"
            )
        return m

    def corner_bounds(ids, a, t):
        # Transform the 8 corners of each proto AABB (exact for affine).
        lo = proto.aabb_min[ids].astype(np.float64)
        hi = proto.aabb_max[ids].astype(np.float64)
        corners = np.stack([
            np.where(np.array(mask)[None, :], hi, lo)
            for mask in ((0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                         (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1))
        ], axis=1)                                    # (count, 8, 3)
        wc = corners @ a.T + t                        # (count, 8, 3)
        return wc.min(axis=1), wc.max(axis=1)

    for iid, placement in enumerate(placements):
        first, count, m = placement[:3]
        imats.append(np.full(
            count,
            placement[3] if len(placement) > 3 else -1,
            np.int32,
        ))
        m = norm_affine(m)
        a, t = m[:, :3], m[:, 3]
        li = np.linalg.inv(a)
        tr = -li @ t
        ids = np.arange(first, first + count)
        cmaps.append(ids.astype(np.int32))
        xf = np.concatenate([li.reshape(9), tr]).astype(np.float32)
        xforms.append(np.tile(xf, (count, 1)))
        wmin, wmax = corner_bounds(ids, a, t)
        if any_motion:
            m1 = (norm_affine(placement[4])
                  if len(placement) > 4 and placement[4] is not None
                  else m)
            if abs(np.linalg.det(m1[:, :3])) < 1e-12:
                raise ValueError("motion transform is singular")
            fw0 = np.concatenate(
                [a.reshape(9), t]
            ).astype(np.float32)
            fw1 = np.concatenate(
                [m1[:, :3].reshape(9), m1[:, 3]]
            ).astype(np.float32)
            fw0s.append(np.tile(fw0, (count, 1)))
            fw1s.append(np.tile(fw1, (count, 1)))
            # Forward-lerped motion: every prototype point travels a
            # straight world segment, so the union of the ENDPOINT
            # corner bounds is exact.
            w1min, w1max = corner_bounds(ids, m1[:, :3], m1[:, 3])
            wmin = np.minimum(wmin, w1min)
            wmax = np.maximum(wmax, w1max)
        margin = (wmax - wmin) * 1e-6 + 1e-30
        mins.append((wmin - margin).astype(np.float32))
        maxs.append((wmax + margin).astype(np.float32))
        iids.append(np.full(count, iid, np.int32))
    imat_all = np.concatenate(imats)
    return InstanceSet(
        cmap=np.concatenate(cmaps),
        xform=np.concatenate(xforms),
        aabb_min=np.concatenate(mins),
        aabb_max=np.concatenate(maxs),
        inst_id=np.concatenate(iids),
        imat=imat_all if (imat_all >= 0).any() else None,
        fw0=np.concatenate(fw0s) if any_motion else None,
        fw1=np.concatenate(fw1s) if any_motion else None,
    )


class PageSet(NamedTuple):
    """Per-page traversal structures for HBM-resident scenes.

    Scenes whose Woop tensors exceed VMEM stream through the Pallas
    pipeline page by page (grid = pages × ray tiles, pages outermost →
    each page's Woop block is DMA'd into VMEM exactly once per wave and
    double-buffered against compute). Clusters are renumbered
    page-contiguously at build time, so the paged Woop/mat views are
    free reshapes of the flat ClusterSet arrays — no HBM duplication.

    node_box:  (G, 6, Np) f32 per-page threaded-tree AABBs (trees padded
               to the max page-node count with inverted never-hit nodes
               whose links all point at the terminator).
    node_meta: (G, 2, Np) i32 [skip, PAGE-LOCAL cluster id].
    oct_links: (G, 16, Np) i32 per-octant hit/miss links (flattened 2x8).
    cand_box:  (G*8, R8, 6, 128) f32 stacked per-page candidate blocks.
    """

    node_box: np.ndarray
    node_meta: np.ndarray
    oct_links: np.ndarray
    cand_box: np.ndarray


def partition_pages(aabb_min: np.ndarray, aabb_max: np.ndarray,
                    page_size: int):
    """Spatial median partition of clusters into lists of <= page_size
    ids (recursion order keeps pages spatially coherent)."""
    centroid = (aabb_min + aabb_max) * 0.5
    pages = []
    stack = [np.arange(aabb_min.shape[0])]
    while stack:
        ids = stack.pop()
        if len(ids) <= page_size:
            pages.append(ids)
            continue
        ext = centroid[ids].max(axis=0) - centroid[ids].min(axis=0)
        ax = int(np.argmax(ext))
        order = np.argsort(centroid[ids, ax], kind="stable")
        # Cut at a page_size multiple near the median: keeps the split
        # spatial while making every page (except possibly the last)
        # completely full — median halving alone leaves pages ~60% full
        # and pads the rest with dead clusters (measured VMEM waste).
        half_pages = max(1, round(len(ids) / 2 / page_size))
        cut = min(half_pages * page_size, len(ids) - 1)
        stack.append(ids[order[cut:]])
        stack.append(ids[order[:cut]])
    return pages


def build_pages(cs: ClusterSet, page_size: int = PAGE_CLUSTERS):
    """Repack a ClusterSet page-contiguously and build per-page trees.

    Returns (flat ClusterSet in page order — padded to G*page_size
    clusters, slot ids shift accordingly — and the PageSet). The flat
    set's global tree (node_*/oct_links/cand_box) is rebuilt over the
    padded cluster list so non-paged kernels keep working on the same
    object.
    """
    pages = partition_pages(cs.aabb_min, cs.aabb_max, page_size)
    g = len(pages)
    c_pad = g * page_size

    def pad_rows(arr, miss_fill):
        out = np.empty((c_pad,) + arr.shape[1:], arr.dtype)
        out[:] = miss_fill
        for p, ids in enumerate(pages):
            out[p * page_size: p * page_size + len(ids)] = arr[ids]
        return out

    aabb_min = pad_rows(cs.aabb_min, 3.0e38)
    aabb_max = pad_rows(cs.aabb_max, -3.0e38)
    woop = np.zeros((c_pad, 4, 3 * CLUSTER_SIZE), np.float32)
    # Degenerate always-miss Woop pattern for padding clusters.
    woop[:, 3, 0 * CLUSTER_SIZE: 1 * CLUSTER_SIZE] = -1.0
    woop[:, 3, 1 * CLUSTER_SIZE: 2 * CLUSTER_SIZE] = -1.0
    woop[:, 3, 2 * CLUSTER_SIZE: 3 * CLUSTER_SIZE] = 1.0
    normal = np.zeros((c_pad, 3, CLUSTER_SIZE), np.float32)
    mat = np.zeros((c_pad, CLUSTER_SIZE), np.int32)
    for p, ids in enumerate(pages):
        sl = slice(p * page_size, p * page_size + len(ids))
        woop[sl] = cs.woop[ids]
        normal[sl] = cs.normal[ids]
        mat[sl] = cs.mat[ids]

    # Per-page trees over the REAL clusters (page-local ids 0..len-1).
    boxes, metas, links_l, cands = [], [], [], []
    np_max = max(2 * max(len(ids) for ids in pages) - 1, 1)
    for p, ids in enumerate(pages):
        nb, nm, child, axis, flo = build_cluster_tree(
            cs.aabb_min[ids], cs.aabb_max[ids]
        )
        ol = build_octant_trees(child, axis, flo)
        n = nb.shape[1]
        pad = np_max - n
        if pad:
            nb_pad = np.empty((6, pad), np.float32)
            nb_pad[0:3] = 3.0e38
            nb_pad[3:6] = -3.0e38
            nb = np.concatenate([nb, nb_pad], axis=1)
            nm_pad = np.empty((2, pad), np.int32)
            nm_pad[0] = np_max
            nm_pad[1] = -1
            nm = np.concatenate([nm, nm_pad], axis=1)
            ol = np.concatenate(
                [ol, np.full((2, 8, pad), np_max, np.int32)], axis=2
            )
        # Real links that pointed at the page terminator (n) must point
        # past the padded tree too; any id >= n terminates at np_max.
        nm[0] = np.where(nm[0] >= n, np_max, nm[0])
        ol = np.where(ol >= n, np_max, ol)
        boxes.append(nb)
        metas.append(nm)
        links_l.append(ol.reshape(16, np_max))
        cands.append(build_candidate_blocks(nb, ol))

    flat = ClusterSet(
        aabb_min=aabb_min, aabb_max=aabb_max, woop=woop, normal=normal,
        mat=mat, node_box=None, node_meta=None, oct_links=None,
        cand_box=None,
    )
    # Rebuild the global tree over real clusters only (padded clusters
    # are unreachable: their ids never appear in any tree).
    nb, nm, child, axis, flo = build_cluster_tree(
        cs.aabb_min, cs.aabb_max
    )
    # Remap global cluster ids to the new page order.
    remap = np.full(cs.aabb_min.shape[0], -1, np.int64)
    for p, ids in enumerate(pages):
        remap[ids] = p * page_size + np.arange(len(ids))
    cid = nm[1]
    nm = nm.copy()
    nm[1] = np.where(cid >= 0, remap[np.maximum(cid, 0)], -1)
    ol = build_octant_trees(child, axis, flo)
    flat = flat._replace(
        node_box=nb, node_meta=nm, oct_links=ol,
        cand_box=build_candidate_blocks(nb, ol),
    )
    pageset = PageSet(
        node_box=np.stack(boxes),
        node_meta=np.stack(metas),
        oct_links=np.stack(links_l),
        cand_box=np.concatenate(cands, axis=0),
    )
    return flat, pageset, remap


def remap_slot_to_tri(slot_to_tri: np.ndarray, remap: np.ndarray,
                      c_pad: int) -> np.ndarray:
    """Reindex a (C*128,) slot→triangle map after ``build_pages``
    renumbered clusters page-contiguously (``remap``: old cluster id →
    new). Padding clusters map every slot to -1 (they never hit)."""
    rows = slot_to_tri.reshape(-1, CLUSTER_SIZE)
    out = np.full((c_pad, CLUSTER_SIZE), -1, np.int32)
    out[remap] = rows
    return out.ravel()


def build_candidate_blocks(
    node_box: np.ndarray, oct_links: np.ndarray
) -> np.ndarray:
    """(8, ceil(N/8), 6, 128) f32 candidate-heap AABB blocks (see
    ClusterSet.cand_box). Heap layout per (octant o, node n): slot 0 is
    n; slot 2j+1 = hit_next[o, slot j], slot 2j+2 = miss_next[o, slot j]
    (ids >= N — the terminator — yield inverted never-hit boxes).
    Vectorized numpy; O(8 * 15 * N) gathers.
    """
    n = node_box.shape[1]
    if n > CAND_MAX_NODES:
        out = np.empty((8, 1, 6, 128), np.float32)
        out[:, :, 0:3] = 3.0e38
        out[:, :, 3:6] = -3.0e38
        return out
    # Pad column N with an inverted box so terminator ids gather a miss.
    nb = np.concatenate(
        [node_box,
         np.array([[3e38], [3e38], [3e38], [-3e38], [-3e38], [-3e38]],
                  np.float32)], axis=1,
    )  # (6, N+1)
    heap = np.empty((8, CAND_HEAP, n), np.int64)
    heap[:, 0] = np.arange(n)
    for o in range(8):
        hn = np.append(oct_links[0, o], n)  # hit_next with terminator row
        mn = np.append(oct_links[1, o], n)
        for j in range((CAND_HEAP - 1) // 2):
            heap[o, 2 * j + 1] = hn[heap[o, j]]
            heap[o, 2 * j + 2] = mn[heap[o, j]]
    heap = np.minimum(heap, n)  # terminator children stay at the pad col
    boxes = nb[:, heap]                       # (6, 8, 15, N)
    r8 = -(-n // 8)
    pad_n = r8 * 8 - n
    boxes = np.transpose(boxes, (1, 3, 0, 2))  # (8, N, 6, 15)
    if pad_n:
        fill = np.empty((8, pad_n, 6, CAND_HEAP), np.float32)
        fill[:, :, 0:3] = 3.0e38
        fill[:, :, 3:6] = -3.0e38
        boxes = np.concatenate([boxes, fill], axis=1)
    # Slot 15 (window padding) also inverted.
    slot_pad = np.empty((8, r8 * 8, 6, 1), np.float32)
    slot_pad[:, :, 0:3] = 3.0e38
    slot_pad[:, :, 3:6] = -3.0e38
    boxes = np.concatenate(
        [boxes.astype(np.float32), slot_pad], axis=3
    )  # (8, r8*8, 6, 16)
    boxes = boxes.reshape(8, r8, 8, 6, 16)
    boxes = np.transpose(boxes, (0, 1, 3, 2, 4))  # (8, r8, 6, 8, 16)
    return np.ascontiguousarray(boxes.reshape(8, r8, 6, 128))


def build_octant_trees(
    child: np.ndarray, axis: np.ndarray, first_lower: np.ndarray
) -> np.ndarray:
    """Per-direction-octant threaded links: (2, 8, N) i32.

    ``[0, o, n]`` = hit_next (descend into the octant's NEAR child — the
    lower-coordinate child along the node's split axis when the octant's
    direction is positive on that axis, else the upper), ``[1, o, n]`` =
    miss_next (the continuation after skipping/finishing ``n``'s
    subtree). All eight orderings share node ids (and therefore
    node_box / cluster ids); index N terminates. A tile whose rays share
    a direction octant (guaranteed by ray binning up to tile-boundary
    mixing, which costs order quality but never correctness) therefore
    walks the cluster tree truly front-to-back: the first leaf
    evaluations tighten best_t to the nearest geometry and the
    ``tn < best_t`` slab test culls every subtree behind it.
    """
    n = child.shape[0]
    links = np.empty((2, 8, n), np.int32)
    # Octant bit layout matches ops.binning._dir_bin: x>0 → +4, y>0 → +2,
    # z>0 → +1.
    for o in range(8):
        pos = ((o >> 2) & 1, (o >> 1) & 1, o & 1)
        # Iterative DFS carrying the continuation (explicit stack; the
        # tree is ~2C nodes and Python recursion limits are a footgun).
        stack = [(0, n)]
        while stack:
            m, cont = stack.pop()
            a, b = int(child[m, 0]), int(child[m, 1])
            if a < 0:
                links[0, o, m] = cont
                links[1, o, m] = cont
                continue
            lower, upper = (a, b) if first_lower[m] else (b, a)
            near, far = (lower, upper) if pos[axis[m]] else (upper, lower)
            links[0, o, m] = near
            links[1, o, m] = cont
            stack.append((near, far))
            stack.append((far, cont))
    return links


def build_clusters(
    v0: np.ndarray, e1: np.ndarray, e2: np.ndarray, tri_mat: np.ndarray
) -> Tuple[ClusterSet, np.ndarray, np.ndarray]:
    """Pack triangles into SAH clusters; returns (ClusterSet-as-numpy,
    perm, slot_to_tri).

    ``perm`` maps new (cluster-contiguous, unpadded) order to input order;
    the padded global slot id of a hit is ``cluster*128 + lane`` and maps
    back to the INPUT triangle index through the (C*128,) i32
    ``slot_to_tri`` array (-1 for padding slots, which have mat 0 and
    never hit). Surface-attribute lookups (UVs, shading normals) resolve
    hits through it.
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

    # Fully vectorized packing (a per-leaf Python loop measured ~7 s at
    # 655k tris): every (cluster, lane) slot maps to a triangle index
    # via starts + lane; invalid/degenerate slots keep the always-miss
    # Woop pattern M = 0, b = (-1, -1, 1) → u = -1.
    ksz = CLUSTER_SIZE
    starts = leaves[:, 1].astype(np.int64)
    counts = leaves[:, 2].astype(np.int64)
    lane = np.arange(ksz)
    valid = lane[None, :] < counts[:, None]          # (C, 128)
    tri = np.minimum(starts[:, None] + lane[None, :], n - 1)
    tv0 = v0p[tri].astype(np.float64)                # (C, 128, 3)
    te1 = e1p[tri].astype(np.float64)
    te2 = e2p[tri].astype(np.float64)

    big = 3.0e38
    verts = np.stack([tv0, tv0 + te1, tv0 + te2], axis=2)  # (C,128,3,3)
    vmask = valid[:, :, None, None]
    aabb_min[:] = np.where(vmask, verts, big).min(axis=(1, 2))
    aabb_max[:] = np.where(vmask, verts, -big).max(axis=(1, 2))

    n_geo = np.cross(te1, te2)                       # (C, 128, 3)
    norm = np.linalg.norm(n_geo, axis=-1, keepdims=True)
    ok = norm[..., 0] > 1e-20
    n_unit = np.where(ok[..., None], n_geo / np.maximum(norm, 1e-20), 0.0)

    # M = [e1 | e2 | n]^-1 per triangle (n unnormalized keeps M finite
    # for thin tris); b = -M v0. Singular/degenerate slots become
    # padding (identity basis, always-miss b).
    basis = np.stack([te1, te2, n_geo], axis=-1)     # (C, 128, 3, 3)
    dets = np.linalg.det(basis)
    dead = (np.abs(dets) < 1e-30) | ~ok | ~valid
    basis[dead] = np.eye(3)
    m = np.linalg.inv(basis).astype(np.float32)      # (C, 128, 3, 3)
    b = -np.einsum("ckij,ckj->cki", m,
                   tv0.astype(np.float32))           # (C, 128, 3)
    miss_b = np.array([-1.0, -1.0, 1.0], np.float32)
    for comp in range(3):  # u, v, w rows of M
        colsl = slice(comp * ksz, (comp + 1) * ksz)
        woop[:, 0:3, colsl] = np.where(
            dead[:, None, :], 0.0, np.swapaxes(m[:, :, comp, :], 1, 2)
        )
        woop[:, 3, colsl] = np.where(dead, miss_b[comp], b[:, :, comp])
    normal[:] = np.where(
        dead[:, None, :], 0.0,
        np.swapaxes(n_unit, 1, 2).astype(np.float32),
    )
    mat[:] = np.where(dead | ~valid, 0, matp[tri])
    slot_to_tri = np.where(valid, perm[tri], -1).astype(np.int32).ravel()

    node_box, node_meta, child, axis, first_lower = build_cluster_tree(
        aabb_min, aabb_max
    )
    oct_links = build_octant_trees(child, axis, first_lower)
    cand_box = build_candidate_blocks(node_box, oct_links)
    return (
        ClusterSet(
            aabb_min=aabb_min, aabb_max=aabb_max,
            woop=woop, normal=normal, mat=mat,
            node_box=node_box, node_meta=node_meta, oct_links=oct_links,
            cand_box=cand_box,
        ),
        perm,
        slot_to_tri,
    )
