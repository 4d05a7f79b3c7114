"""Re-check the Mosaic per-lane gather boundary (VERDICT r4 item 8).

The r3e roofline's 200-Mrays/s gap rests on the claim (dated
2026-08-17) that Mosaic/XLA offer no per-lane dynamic gather. Against
jax 0.9.0 that claim is now PARTIALLY FALSE: Mosaic's
`_gather_lowering_rule` lowers `lax.gather` to `tpu.dynamic_gather`
for exactly two forms, both requiring ``idx.shape == table.shape``
(jax/_src/pallas/mosaic/lowering.py:2464-2525):

  * axis=0 (lane-batched): out[s, l] = table[idx[s, l], l] — each lane
    gathers within its own column.
  * axis=1 (sublane-batched): out[s, l] = table[s, idx[s, l]] — each
    sublane row gathers within itself; with the table row broadcast
    across sublanes this is a SHARED 128-entry table gathered per-lane,
    the building block the traversal's one-hot selects emulate at
    O(table) cost.

Anything else (differently-shaped take_along_axis, fancy indexing,
int-array ref indexing) still fails to lower (AssertionError /
"Cannot do int indexing on TPU"). This probe compiles and times the
two supported forms against the one-hot/masked-sum emulation at the
same shapes, on the chip:

    python benchmarks/probe_mosaic_lane_gather.py

One process at a time (axon tunnel rule). Prints a table; the recorded
verdict lives in PERF.md r5d.
"""

from __future__ import annotations

import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

S = 512      # sublane rows (table and index shape must match for Mosaic)
LANES = 128


def _time(fn, *args, reps=50):
    out = fn(*args)
    float(jnp.sum(out))        # block (block_until_ready is a tunnel no-op)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


# ---- axis=0: each lane gathers within its own column --------------------

def kernel_dg_axis0(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(table_ref[...], idx_ref[...], axis=0)


def kernel_onehot_axis0(table_ref, idx_ref, out_ref):
    # Emulation: one (S, LANES) masked sum per output row, fori over rows
    # (live intermediate stays at S*LANES*4 B).
    tab = table_ref[...]
    idx = idx_ref[...]
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, LANES), 0)

    def body(t, acc):
        hit = rows == jax.lax.dynamic_slice(idx, (t, 0), (1, LANES))
        acc = jax.lax.dynamic_update_slice(
            acc, jnp.sum(jnp.where(hit, tab, 0.0), axis=0)[None, :], (t, 0))
        return acc

    out_ref[...] = jax.lax.fori_loop(
        0, S, body, jnp.zeros((S, LANES), jnp.float32))


# ---- axis=1: shared 128-entry table, gathered per lane ------------------

def kernel_dg_axis1(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(table_ref[...], idx_ref[...], axis=1)


def kernel_onehot_axis1(table_ref, idx_ref, out_ref):
    # Emulation of the same semantics with compare+select over the 128
    # lane slots — what the shipping kernels' shared-table selects do.
    tab = table_ref[...]                       # (S, LANES)
    idx = idx_ref[...]                         # (S, LANES) in [0, LANES)
    acc = jnp.zeros((S, LANES), jnp.float32)

    def body(k, acc):
        col = jax.lax.dynamic_slice(tab, (0, k), (S, 1))   # (S, 1)
        return acc + jnp.where(idx == k, col, 0.0)

    out_ref[...] = jax.lax.fori_loop(0, LANES, body, acc)


CASES = [
    ("dyn_gather ax0", kernel_dg_axis0, 0),
    ("onehot     ax0", kernel_onehot_axis0, 0),
    ("dyn_gather ax1", kernel_dg_axis1, 1),
    ("onehot     ax1", kernel_onehot_axis1, 1),
]


def run_case(name, kernel, axis):
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, LANES), jnp.float32),
    )
    fn = jax.jit(call)
    table = jax.random.normal(jax.random.PRNGKey(0), (S, LANES), jnp.float32)
    hi = S if axis == 0 else LANES
    idx = jax.random.randint(jax.random.PRNGKey(1), (S, LANES), 0, hi,
                             jnp.int32)
    try:
        out = fn(table, idx)
        ref = jnp.take_along_axis(table, idx, axis=axis)
        ok = bool(jnp.all(out == ref))
        us = _time(fn, table, idx) * 1e6
        print(f"  {name:16s} LOWERS  bitwise_ok={ok}  {us:8.1f} us/call")
        return us
    except Exception as e:  # noqa: BLE001 — fact-finding probe
        first = traceback.format_exception_only(type(e), e)[0].strip()
        tb = traceback.format_exc().splitlines()
        where = next((ln.strip() for ln in reversed(tb)
                      if "mosaic" in ln or "lowering" in ln), "")
        print(f"  {name:16s} FAILS   {first[:110]}  [{where[:110]}]")
        return None


def main():
    dev = jax.devices()[0]
    print(f"jax {jax.__version__}  device {dev.device_kind}  "
          f"platform {dev.platform}")
    print(f"shapes: table ({S},{LANES}) f32, idx ({S},{LANES}) i32")
    r = {}
    for name, kern, axis in CASES:
        r[name] = run_case(name, kern, axis)
    for ax in ("ax0", "ax1"):
        dg, oh = r.get(f"dyn_gather {ax}"), r.get(f"onehot     {ax}")
        if dg and oh:
            print(f"verdict {ax}: dynamic_gather {dg:.1f} us vs one-hot "
                  f"{oh:.1f} us — {oh / dg:.1f}x")
        elif oh:
            print(f"verdict {ax}: dynamic_gather does not lower; one-hot "
                  f"{oh:.1f} us stands")


if __name__ == "__main__":
    main()
