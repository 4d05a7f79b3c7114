"""BVH builder + traversal tests: structure invariants and brute-force parity."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.ops import bvh as bvh_ops
from pathtracing_tpu.ops import intersect


def random_triangles(n, seed=0, spread=4.0):
    r = np.random.default_rng(seed)
    v0 = (r.uniform(-1, 1, (n, 3)) * spread).astype(np.float32)
    e1 = r.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    e2 = r.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    return v0, e1, e2


def brute_force(v0, e1, e2, o, d):
    ts = intersect.ray_triangle(
        o[None, :], d[None, :], jnp.asarray(v0), jnp.asarray(e1),
        jnp.asarray(e2),
    )
    i = jnp.argmin(ts)
    return ts[i], jnp.where(jnp.isfinite(ts[i]), i, -1)


class TestBuilder:
    def test_structure_invariants(self):
        v0, e1, e2 = random_triangles(500)
        (nmin, nmax, meta), perm = bvh_ops._build_bvh_numpy(v0, e1, e2)
        m = meta.shape[0]
        assert sorted(perm.tolist()) == list(range(500))
        # Skip links strictly advance and stay in [i+1, m].
        for i in range(m):
            skip, start, count = meta[i]
            assert i < skip <= m
            if count > 0:
                assert 1 <= count <= bvh_ops.LEAF_SIZE
                assert 0 <= start and start + count <= 500
        # Leaves partition [0, n) exactly.
        covered = []
        for i in range(m):
            skip, start, count = meta[i]
            if count > 0:
                covered += list(range(start, start + count))
        assert sorted(covered) == list(range(500))
        # Child boxes nest inside parents (preorder: parent at i, left i+1).
        for i in range(m):
            skip, start, count = meta[i]
            if count == 0:
                left, right = i + 1, int(meta[i + 1][0])
                for ch in (left, right):
                    assert (nmin[i] <= nmin[ch] + 1e-6).all()
                    assert (nmax[i] >= nmax[ch] - 1e-6).all()

    def test_empty_and_single(self):
        (nmin, nmax, meta), perm = bvh_ops._build_bvh_numpy(
            np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.float32),
        )
        assert meta.shape[0] == 1
        v0, e1, e2 = random_triangles(1)
        (nmin, nmax, meta), perm = bvh_ops._build_bvh_numpy(v0, e1, e2)
        assert meta.shape[0] == 1 and meta[0][2] == 1


class TestTraversal:
    def test_matches_brute_force(self):
        v0, e1, e2 = random_triangles(300, seed=3)
        flat, perm = bvh_ops._build_bvh_numpy(v0, e1, e2)
        v0p, e1p, e2p = v0[perm], e1[perm], e2[perm]
        bvh = bvh_ops.FlatBVH(*(jnp.asarray(a) for a in flat))

        r = np.random.default_rng(7)
        origins = r.uniform(-6, 6, (256, 3)).astype(np.float32)
        dirs = r.normal(size=(256, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

        trav = jax.jit(
            jax.vmap(
                lambda o, d: bvh_ops.traverse(
                    bvh, jnp.asarray(v0p), jnp.asarray(e1p),
                    jnp.asarray(e2p), o, d, jnp.float32(np.inf),
                )
            )
        )
        t_bvh, _ = trav(jnp.asarray(origins), jnp.asarray(dirs))

        for i in range(256):
            t_ref, _ = brute_force(
                v0p, e1p, e2p, jnp.asarray(origins[i]), jnp.asarray(dirs[i])
            )
            a, b = float(t_bvh[i]), float(t_ref)
            if np.isfinite(b):
                assert abs(a - b) < 1e-3, f"ray {i}: bvh {a} vs brute {b}"
            else:
                assert not np.isfinite(a), f"ray {i}: bvh {a} vs miss"

    def test_t_max_culling(self):
        v0, e1, e2 = random_triangles(100, seed=5)
        flat, perm = bvh_ops._build_bvh_numpy(v0, e1, e2)
        v0p, e1p, e2p = (jnp.asarray(v0[perm]), jnp.asarray(e1[perm]),
                         jnp.asarray(e2[perm]))
        bvh = bvh_ops.FlatBVH(*(jnp.asarray(a) for a in flat))
        o = jnp.array([0.0, 0.0, 10.0])
        d = jnp.array([0.0, 0.0, -1.0])
        t_full, _ = bvh_ops.traverse(bvh, v0p, e1p, e2p, o, d,
                                     jnp.float32(np.inf))
        if np.isfinite(float(t_full)):
            # Capping below the closest hit must report a miss.
            t_capped, prim = bvh_ops.traverse(
                bvh, v0p, e1p, e2p, o, d, jnp.float32(float(t_full) - 0.01)
            )
            assert not np.isfinite(float(t_capped)) or float(
                t_capped
            ) <= float(t_full) - 0.01
