"""On-chip bitwise probe: instanced DNF kernel with per-instance
material overrides vs the trace_jax_inst oracle (PERF.md rule: never
judge a TPU kernel change by interpret mode alone)."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pathtracing_tpu.ops import clusters as cl_ops  # noqa: E402
from pathtracing_tpu.ops import cluster_trace as ct

print("backend:", jax.default_backend())

rng = np.random.default_rng(0)
n = 1200
v0 = rng.uniform(-1, 1, (n, 3))
e1 = rng.uniform(-0.3, 0.3, (n, 3))
e2 = rng.uniform(-0.3, 0.3, (n, 3))
mat = rng.integers(0, 4, n).astype(np.int32)
cl, _, _ = cl_ops.build_clusters(v0, e1, e2, mat)
nc = cl.aabb_min.shape[0]


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


pls = []
for i in range(12):
    a = rot_y(0.37 * i) @ np.diag([1.0 + 0.1 * (i % 4), 0.8, 1.2])
    t = np.array([2.5 * (i % 8) - 8.0, 0.2 * i, 3.0 + 2.0 * (i // 8)])
    p = (0, nc, np.concatenate([a, t[:, None]], axis=1))
    if i % 3 == 1:
        p = p + (20 + i,)
    pls.append(p)

inst = cl_ops.expand_instances(cl, pls)
assert inst.imat is not None
clj = jax.tree.map(jnp.asarray, cl)
instj = jax.tree.map(jnp.asarray, inst)

r = 1024
o = np.tile([0.0, 0.0, -12.0], (r, 1)) + rng.uniform(-1, 1, (r, 3))
tgt = rng.uniform(-9, 9, (r, 3)) * [1, 0.25, 0.4] + [0, 0, 5.0]
d = tgt - o
d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(o, jnp.float32)
d = jnp.asarray(d, jnp.float32)
t0 = jnp.full(r, 3.0e38, jnp.float32)

tj, sj, nj, mj = jax.jit(ct.trace_jax_inst)(clj, instj, o, d, t0)
tp, sp, npk, mp = ct.trace_pallas_dnf_inst(clj, instj, o, d, t0)
tj, sj, mj = np.asarray(tj), np.asarray(sj), np.asarray(mj)
tp, sp, mp = np.asarray(tp), np.asarray(sp), np.asarray(mp)
hits = int((sj >= 0).sum())
ov = int(((mj >= 20).sum()))
print(f"hits {hits}/{r}, overridden-mat hits {ov}")
assert hits > 100 and ov > 10
assert (tj == tp).all(), "t mismatch"
assert (sj == sp).all(), "slot mismatch"
assert (mj == mp).all(), "mat mismatch"
nd = np.abs(np.asarray(nj) - np.asarray(npk)).max()
print("normal max abs diff:", nd)
assert nd < 1e-5

# Any-hit variant (no imat input): unchanged contract.
cap = jnp.full(r, 20.0, jnp.float32)
occ = np.asarray(ct.occluded_pallas_dnf_inst(clj, instj, o, d, cap))
tj2, sj2, _, _ = jax.jit(ct.trace_jax_inst)(clj, instj, o, d, cap)
assert (occ == (np.asarray(sj2) >= 0)).all()
print("TPU bitwise probe: PASS")
