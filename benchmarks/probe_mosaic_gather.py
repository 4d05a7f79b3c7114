"""Re-check the Mosaic per-lane traversal boundary (VERDICT r4 item 8).

The r3e roofline rests on: "200 Mrays/s needs per-lane dynamic
traversal — each VPU lane following its own cluster list — not
expressible in Mosaic/XLA today, which offer no per-lane gather or
divergent control flow" (PERF.md r3e ceilings). This probe re-verifies
that boundary against the CURRENT jax/Pallas (print jax.__version__),
so the framework's central limitation stays a fact rather than a stale
assumption:

  1. per-lane dynamic GATHER: out[i,j] = table[idx[i,j]] inside a
     Pallas TPU kernel, idx a (8, 128) i32 block of lane-varying
     indices into a VMEM-resident table. Tried three spellings
     (ref-index, jnp.take, jnp.take_along_axis). If any compiles, its
     throughput vs the dense row-broadcast pattern the DNF kernels use
     decides whether a gather-based traversal becomes plausible.
  2. divergent control flow: a lax.while_loop whose condition depends
     on a VECTOR (per-lane) predicate — Mosaic requires scalar
     conditions; expected to fail to lower.

Run on TPU:  python benchmarks/probe_mosaic_gather.py
(Results land as a dated PERF.md note; interpret mode proves nothing —
the question is what MOSAIC lowers, so this must run on the chip.)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass

    results = {"jax_version": jax.__version__,
               "backend": jax.default_backend()}

    TABLE = 4096      # table rows (a realistic flat-node pool slice)
    R, L = 256, 128   # sublane x lane block of per-lane indices

    table = jnp.asarray(
        np.random.default_rng(0).standard_normal((TABLE,), np.float32))
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, TABLE, (R, L)), jnp.int32)

    def try_kernel(name, body):
        try:
            out = jax.jit(body)(table, idx)
            ok = bool(jnp.isfinite(out).all())
            # time it (scalar-sum sync; tunnel discipline)
            float(jnp.sum(out))
            t0 = time.perf_counter()
            reps = 50
            for _ in range(reps):
                out = jax.jit(body)(table, idx)
            float(jnp.sum(out))
            dt = (time.perf_counter() - t0) / reps
            gels = R * L / dt / 1e9
            results[name] = {"compiles": ok,
                             "gather_Gelem_s": round(gels, 3)}
        except Exception as e:
            results[name] = {"compiles": False,
                             "error": type(e).__name__ + ": "
                             + str(e).splitlines()[0][:200]}

    # -- 1a: direct ref indexing ---------------------------------------
    def k_refidx(table_ref, idx_ref, out_ref):
        out_ref[...] = table_ref[idx_ref[...]]

    try_kernel("perlane_gather_refindex", lambda t, i: pl.pallas_call(
        k_refidx,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
    )(t, i))

    # -- 1b: jnp.take inside the kernel --------------------------------
    def k_take(table_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

    try_kernel("perlane_gather_take", lambda t, i: pl.pallas_call(
        k_take,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
    )(t, i))

    # -- 1c: take_along_axis on a broadcast table ----------------------
    def k_tala(table_ref, idx_ref, out_ref):
        tab = table_ref[...]
        out_ref[...] = jnp.take_along_axis(
            jnp.broadcast_to(tab[None, :], (R, TABLE)), idx_ref[...],
            axis=1,
        )

    try_kernel("perlane_gather_take_along_axis",
               lambda t, i: pl.pallas_call(
                   k_tala,
                   out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
               )(t, i))

    # -- 2: vector-condition while_loop (divergent control flow) -------
    def k_divloop(table_ref, idx_ref, out_ref):
        x = idx_ref[...].astype(jnp.float32)

        def cond(c):
            # Per-lane predicate — Mosaic needs a scalar here; the
            # honest divergent formulation (no reduction) is expected
            # to fail to lower.
            return (c < 1000.0)

        def body(c):
            return c * 0.5

        out_ref[...] = jax.lax.while_loop(cond, body, x)

    try_kernel("perlane_divergent_while", lambda t, i: pl.pallas_call(
        k_divloop,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
    )(t, i))

    # -- reference: the dense row-broadcast pattern the DNF kernels use
    def k_dense(table_ref, idx_ref, out_ref):
        # one table row broadcast to all lanes per step (no per-lane
        # addressing) — the expressible baseline.
        out_ref[...] = (table_ref[0] * jnp.ones((R, L), jnp.float32)
                        + idx_ref[...].astype(jnp.float32) * 0.0)

    try_kernel("dense_broadcast_baseline", lambda t, i: pl.pallas_call(
        k_dense,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
    )(t, i))

    # -- XLA-level gather outside Pallas (for scale) -------------------
    def xla_gather(t, i):
        return t[i]

    try_kernel("xla_gather_outside_pallas", xla_gather)

    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
