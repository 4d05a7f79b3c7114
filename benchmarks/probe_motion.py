"""On-chip bitwise probe: motion-blurred instanced DNF kernel vs the
trace_jax_inst oracle (PERF.md rule: never judge a TPU kernel change by
interpret mode alone)."""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pathtracing_tpu.ops import clusters as cl_ops
from pathtracing_tpu.ops import cluster_trace as ct
print("backend:", jax.default_backend())

rng = np.random.default_rng(0)
n = 1200
v0 = rng.uniform(-1, 1, (n, 3)); e1 = rng.uniform(-0.3, 0.3, (n, 3))
e2 = rng.uniform(-0.3, 0.3, (n, 3))
mat = rng.integers(0, 4, n).astype(np.int32)
cl, _, _ = cl_ops.build_clusters(v0, e1, e2, mat)
nc = cl.aabb_min.shape[0]

def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c,0,s],[0,1,0],[-s,0,c]])
def aff(a, t):
    return np.concatenate([a, np.asarray(t, np.float64)[:, None]], 1)

pls = []
for i in range(8):
    m0 = aff(rot_y(0.37*i) @ np.diag([1+0.1*(i%3), 0.8, 1.2]),
             [2.5*(i%4)-4.0, 0.2*i, 3.0+2.0*(i//4)])
    m1 = (aff(rot_y(0.37*i+0.6), [2.5*(i%4)-3.0, 0.2*i+0.4,
                                  3.5+2.0*(i//4)])
          if i % 2 == 0 else None)
    pls.append((0, nc, m0, (20 + i) if i % 3 == 1 else -1, m1))
inst = cl_ops.expand_instances(cl, pls)
assert inst.fw0 is not None and inst.imat is not None
clj = jax.tree.map(jnp.asarray, cl)
instj = jax.tree.map(jnp.asarray, inst)

r = 1024
o = np.tile([0.0, 0.0, -10.0], (r, 1)) + rng.uniform(-1, 1, (r, 3))
tgt = rng.uniform(-6, 6, (r, 3)) * [1, 0.3, 0.4] + [0, 0, 4.0]
d = tgt - o; d /= np.linalg.norm(d, axis=1, keepdims=True)
o = jnp.asarray(o, jnp.float32); d = jnp.asarray(d, jnp.float32)
t0 = jnp.full(r, 3.0e38, jnp.float32)
times = jnp.asarray(rng.uniform(0, 1, r).astype(np.float32))

tj, sj, nj, mj = jax.jit(ct.trace_jax_inst)(clj, instj, o, d, t0,
                                            time=times)
tp, sp, npk, mp = ct.trace_pallas_dnf_inst(clj, instj, o, d, t0,
                                           time=times)
tj, sj, mj = map(np.asarray, (tj, sj, mj))
tp, sp, mp = map(np.asarray, (tp, sp, mp))
hits = int((sj >= 0).sum())
print(f"hits {hits}/{r}, override hits {int((mj >= 20).sum())}")
assert hits > 100
assert (tj == tp).all(), "t mismatch"
assert (sj == sp).all(), "slot mismatch"
assert (mj == mp).all(), "mat mismatch"
print("normal max abs diff:",
      float(np.abs(np.asarray(nj) - np.asarray(npk)).max()))
assert np.abs(np.asarray(nj) - np.asarray(npk)).max() < 1e-5

cap = jnp.full(r, 18.0, jnp.float32)
occ = np.asarray(ct.occluded_pallas_dnf_inst(clj, instj, o, d, cap,
                                             time=times))
_, sj2, _, _ = jax.jit(ct.trace_jax_inst)(clj, instj, o, d, cap,
                                          time=times)
assert (occ == (np.asarray(sj2) >= 0)).all()
print("TPU motion probe: PASS")
