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

# Round-1 plateau was 3 cells/axis x 8 octants = 216 bins in ONE
# counting-sort pass — finer was blocked by the (N, B) one-hot cost, not
# by diminishing coherence. Round 2 adds the two-pass (LSD radix over
# composite keys) variant: B1 x B2 effective bins at O(N*(B1+B2)) cost,
# so e.g. 1728 bins cost LESS than the old single 216-pass.
N_CELLS = 3   # spatial cells per axis (single-pass default)
N_BINS = (N_CELLS ** 3) * 8  # cells x direction octants = 216

# n_bins -> (cells_per_axis, direction_bins) factorizations for
# sort_rays; direction bins are octant (8) or octant x dominant-axis (24).
BIN_CONFIGS = {
    216: (3, 8),
    512: (4, 8),
    648: (3, 24),
    1536: (4, 24),
    1728: (6, 8),
    3000: (5, 24),
    5184: (6, 24),
}


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


def _spatial_bin(origin, scene_lo, scene_hi, cells: int):
    q = jnp.clip(
        (origin - scene_lo) / jnp.maximum(scene_hi - scene_lo, 1e-6)
        * cells, 0.0, cells - 1e-3,
    ).astype(jnp.int32)
    return (q[:, 0] * cells + q[:, 1]) * cells + q[:, 2]


def _dir_bin(direction, dirs: int):
    octant = (
        (direction[:, 0] > 0).astype(jnp.int32) * 4
        + (direction[:, 1] > 0).astype(jnp.int32) * 2
        + (direction[:, 2] > 0).astype(jnp.int32)
    )
    if dirs == 8:
        return octant
    if dirs == 24:
        # Octant refined by the dominant |d| axis: splits each octant's
        # quarter-hemisphere into three ~equal cones.
        ax = jnp.argmax(jnp.abs(direction), axis=1).astype(jnp.int32)
        return octant * 3 + ax
    raise ValueError(f"unsupported direction bins: {dirs}")


def sort_rays(origin, direction, scene_lo, scene_hi, active,
              n_bins: int = N_BINS):
    """(perm, inv) grouping rays by (spatial cell, direction bin).

    ``n_bins`` must be a key of BIN_CONFIGS. Up to 256 bins this is one
    counting-sort pass; above, a stable two-pass LSD radix over the
    (cell, dir) composite key — pass 1 sorts by direction bin, pass 2 by
    cell — giving cells*dirs effective bins at O(N*(cells^3 + dirs))
    one-hot cost. Dead rays sort to the back of the last cell.
    """
    cells, dirs = BIN_CONFIGS[n_bins]
    cell = _spatial_bin(origin, scene_lo, scene_hi, cells)
    db = _dir_bin(direction, dirs)
    n_cell = cells ** 3
    if n_bins <= 256:
        bins = jnp.where(active, cell * dirs + db, n_bins - 1)
        return binning_perm(bins, n_bins)
    # Dead rays: force the maximum composite key in BOTH passes.
    cell = jnp.where(active, cell, n_cell - 1)
    db = jnp.where(active, db, dirs - 1)
    perm1, pos1 = binning_perm(db, dirs)
    perm2, pos2 = binning_perm(cell[perm1], n_cell)
    # Composition: element i lands at pos2[pos1[i]]; reading side is
    # perm1[perm2] (stable, so within-cell order remains dir-grouped).
    return perm1[perm2], pos2[pos1]


def ray_bin(origin, direction, scene_lo, scene_hi, active):
    """(N,) bin ids: coarse spatial cell × direction octant; dead rays
    land in the last bin (stability keeps them contiguous at the back)."""
    cell = _spatial_bin(origin, scene_lo, scene_hi, N_CELLS)
    octant = _dir_bin(direction, 8)
    bins = cell * 8 + octant
    return jnp.where(active, bins, N_BINS - 1)
