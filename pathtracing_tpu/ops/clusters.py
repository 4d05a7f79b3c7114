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
    The Pallas kernel (``ops.cluster_trace``) skips whole clusters per
    1024-ray tile with ``@pl.when``; the pure-JAX fallback evaluates all
    clusters masked (correctness oracle + CPU path).
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
    """

    aabb_min: np.ndarray
    aabb_max: np.ndarray
    woop: np.ndarray
    normal: np.ndarray
    mat: np.ndarray


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

    return (
        ClusterSet(
            aabb_min=aabb_min, aabb_max=aabb_max,
            woop=woop, normal=normal, mat=mat,
        ),
        perm,
    )
