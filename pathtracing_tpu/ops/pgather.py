"""Fast row gather via Mosaic's ``tpu.dynamic_gather`` (PERF.md r5d/r5e).

``gather_rows(table, idx)`` fetches ``table[idx]`` — ``(L, W)`` f32
rows by an ``(N,)`` int32 index — exactly like ``jnp.take(table, idx,
axis=0)``, but through a Pallas kernel built on the per-lane
shared-table gather Mosaic now lowers (jax 0.9.0,
jax/_src/pallas/mosaic/lowering.py:2464: ``lax.gather`` →
``tpu.dynamic_gather`` when ``idx.shape == table.shape``, gathering
along lanes within each sublane row).

Why: XLA:TPU's own row gather moves ~1.5 Gelem/s at wave sizes
(measured, PERF.md r5d) and the one-hot masked-sum emulation costs
O(N·L·W) VPU selects. The kernel runs rays 128 to a program with the
transposed table resident in VMEM, and accumulates over ⌈L/128⌉
column chunks: per chunk ONE (W, 128) dynamic_gather at the in-chunk
index plus a mask-select — O(N·L·W/128) work, a 128x structural cut
over masked-sum, at ~600 GB/s gather throughput.

Semantics are exact copies (no arithmetic), so every backend returns
bit-identical rows: on CPU (and for tables too large for VMEM or too
small to matter) the function falls back to ``jnp.take``. Out-of-range
indices are clamped to ``[0, L)`` (same contract the light picker
already enforces).

The TPU path materializes ``(W, Npad)`` through the kernel boundary
instead of fusing into the surrounding XLA graph — measured worth it
from a few hundred rows of table (PERF.md r5e crossover sweep);
callers gate on table size, not here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128
# Largest transposed table kept resident in VMEM (f32 bytes). Past
# this, fall back to XLA take rather than page table chunks from HBM.
_VMEM_TABLE_BYTES = 8 * 1024 * 1024


# Index rows per program: Pallas TPU blocks need sublane counts in
# multiples of 8, so each program takes an (8, 128) index block =
# 1024 rays and emits (W, 1024).
_IDX_ROWS = 8


def _kernel(tab_ref, idx_ref, out_ref, *, chunks: int, width: int):
    for j in range(_IDX_ROWS):                   # static unroll
        idx = jnp.broadcast_to(idx_ref[j:j + 1, :], (width, _LANES))
        acc = jnp.zeros((width, _LANES), jnp.float32)
        for c in range(chunks):                  # static unroll
            tab_c = tab_ref[:, c * _LANES:(c + 1) * _LANES]   # (W, 128)
            local = idx - c * _LANES
            in_chunk = (local >= 0) & (local < _LANES)
            safe = jnp.where(in_chunk, local, 0)
            g = jnp.take_along_axis(tab_c, safe, axis=1)
            acc = jnp.where(in_chunk, g, acc)
        out_ref[:, j * _LANES:(j + 1) * _LANES] = acc


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """``table[idx]`` — (L, W) f32 rows picked by (N,) int indices.

    Bit-identical to ``jnp.take(table, jnp.clip(idx, 0, L-1), axis=0)``
    on every backend; routed through the Pallas dynamic_gather kernel
    on TPU when the table fits VMEM. ``interpret=True`` forces the
    kernel path in Pallas interpret mode on any backend (tests).
    """
    L, W = table.shape
    idx = jnp.clip(idx.astype(jnp.int32), 0, L - 1)
    if not interpret and (
            (not _on_tpu()) or table.dtype != jnp.float32
            or table.size * 4 > _VMEM_TABLE_BYTES):
        return jnp.take(table, idx, axis=0)

    (N,) = idx.shape
    block = _IDX_ROWS * _LANES
    n_pad = -N % block
    l_pad = -L % _LANES
    idx_p = jnp.pad(idx, (0, n_pad)).reshape(-1, _LANES)   # (G*8, 128)
    tab_t = jnp.pad(table.T, ((0, 0), (0, l_pad)))         # (W, Lp)
    grid = idx_p.shape[0] // _IDX_ROWS
    chunks = tab_t.shape[1] // _LANES

    out = pl.pallas_call(
        functools.partial(_kernel, chunks=chunks, width=W),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((W, tab_t.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((_IDX_ROWS, _LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((W, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((W, grid * block), jnp.float32),
        interpret=interpret,
    )(tab_t, idx_p)
    return out[:, :N].T
