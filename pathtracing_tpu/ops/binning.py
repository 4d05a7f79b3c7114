"""Ray binning without sort or scatter-add: counting-sort permutation.

XLA's TPU sort and scatter-add are unusable at pool sizes on this
platform (>5 min compile, see PERF.md), but gathers, reductions, and a
single unique-index scatter-SET are fast. A counting sort over a small
number of bins needs exactly those pieces:

    one-hot(bin)            (N, B)   — comparisons, no gather
    exclusive cumsum        (N, B)   — per-bin running rank
    take_along_axis         (N,)     — rank of each element in its bin
    offsets = cumsum(count) (B,)
    pos     = offset[bin] + rank     — destination of each element
    perm    = zeros.at[pos].set(iota, unique)   — ONE unique scatter-set

``perm`` then reorders the wavefront pool with plain takes so that every
traversal tile sees rays from one (coarse spatial cell, direction
octant) bin — restoring the coherence the per-tile cluster skip needs on
secondary bounces. Stability preserves pixel order within bins.
"""

from __future__ import annotations

import jax.numpy as jnp

# Tuned on the 82k-tri Cornell mesh (v5e): 3 cells/axis x 8 octants is
# the measured plateau (0.38 -> 0.64 Mrays/s unsorted vs sorted); finer
# spatial or direction bins add cost without visible gains.
N_CELLS = 3   # spatial cells per axis (coarse on purpose: B small)
N_BINS = (N_CELLS ** 3) * 8  # cells x direction octants = 216


def binning_perm(bins, n_bins: int):
    """Stable counting-sort permutation: ``x[perm]`` groups equal bins.

    bins: (N,) int32 in [0, n_bins). Memory: the (N, n_bins) one-hot —
    keep n_bins <= ~256 at 1M rays. Returns (perm, inv) with
    ``inv`` the inverse permutation (``y[inv]`` restores the original
    order of ``y = x[perm]``).
    """
    n = bins.shape[0]
    onehot = (
        bins[:, None] == jnp.arange(n_bins, dtype=bins.dtype)[None, :]
    ).astype(jnp.int32)
    within = jnp.cumsum(onehot, axis=0) - onehot
    rank_in_bin = jnp.take_along_axis(
        within, bins[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    counts = jnp.sum(onehot, axis=0)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32),
         jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    pos = offsets[bins] + rank_in_bin  # destination of element i == inv
    perm = jnp.zeros(n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32),
        unique_indices=True, mode="promise_in_bounds",
    )
    return perm, pos


def ray_bin(origin, direction, scene_lo, scene_hi, active):
    """(N,) bin ids: coarse spatial cell × direction octant; dead rays
    land in the last bin (stability keeps them contiguous at the back)."""
    q = jnp.clip(
        (origin - scene_lo) / jnp.maximum(scene_hi - scene_lo, 1e-6)
        * N_CELLS, 0.0, N_CELLS - 1e-3,
    ).astype(jnp.int32)
    cell = (q[:, 0] * N_CELLS + q[:, 1]) * N_CELLS + q[:, 2]
    octant = (
        (direction[:, 0] > 0).astype(jnp.int32) * 4
        + (direction[:, 1] > 0).astype(jnp.int32) * 2
        + (direction[:, 2] > 0).astype(jnp.int32)
    )
    bins = cell * 8 + octant
    return jnp.where(active, bins, N_BINS - 1)
