"""Per-pixel variance-driven adaptive sampling (band-granular waves).

With the raw ray rate structurally capped (PERF.md r3e roofline), the
open performance axis is time-to-target-quality: spend the proven ray
rate where the image variance actually is.  The reference renders every
pixel every frame unconditionally (`Renderer.cs:1020` dispatches the
full 1920x1080 grid; `Test.hlsl:39` overwrites each pixel) — this module
is the capability it never had.

Design (TPU-first):

* The image is split into row bands (``band_rows`` rows each).  Bands —
  not scattered pixels — are the scheduling unit so every traversal wave
  stays a dense, image-ordered 128-ray-tile grid (scattered pixel
  gathers would forfeit the unsorted image-order coherence the DNF
  kernels rely on, PERF.md r2c).
* State carries the usual radiance sum plus a per-pixel second moment
  of sample luminance (``m2``) and a per-band sample counter.  The
  per-pixel unbiased variance of the pixel MEAN is then
  ``s²/n = (m2 - lum(accum)²/n) / (n-1) / n``.
* One adaptive round = ONE jitted dispatch: score bands from (accum,
  m2, spp) → ``lax.top_k`` the K highest → ``lax.map`` a 1-spp
  ``megakernel.render_samples`` wave over each selected band →
  scatter-add the K blocks back (index-depth-1 scatter over unique band
  rows — the friendly scatter shape; per-element scatter-add is
  pathological on TPU, PERF.md round-1 fact #1).
* Greedy criterion: adding one sample to band b shrinks its expected
  total squared error by ``sum_pixels s² · (1/n - 1/(n+1))``, so bands
  are ranked by ``sum(s²) / (n (n+1))`` — steepest-descent on image MSE
  per sample spent.

Because the RNG is counter-based on GLOBAL (pixel, sample) ids — each
band passes its own spp as ``sample_start`` — a pixel's k-th sample is
bit-identical to the uniform engines' k-th sample.  Scheduling order
changes WHERE samples go, never WHAT any sample computes; driving every
band to equal spp reproduces ``progressive.render_step`` bitwise
(locked by tests/test_adaptive.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import megakernel
from pathtracing_tpu.utils.config import RenderConfig

_LUM = (0.2126, 0.7152, 0.0722)

# Pixel-samples per fused greedy dispatch (adaptive_rounds): ~4.2M
# samples ≈ 24M path segments ≈ 10 s of device time at the measured
# flagship rate — far under the tunneled worker's ~2-minute dispatch
# crash threshold, while amortizing the ~18 ms/dispatch tunnel floor
# over hundreds of rounds.
MAX_DISPATCH_SAMPLES = 1 << 22


class AdaptiveState(NamedTuple):
    accum: jnp.ndarray      # (H, W, 3) f32 — radiance sum
    m2: jnp.ndarray         # (H, W) f32 — sum of per-sample luminance²
    band_spp: jnp.ndarray   # (B,) i32 — samples accumulated per band
    seed: jnp.ndarray       # () u32


def pick_band_rows(config: RenderConfig, band_rows: int = 0) -> int:
    """Default band height: the largest divisor of H that is <= 8 rows
    (fine-grained scheduling) — explicit ``band_rows`` must divide H."""
    h = config.height
    if band_rows:
        if h % band_rows:
            raise ValueError(
                f"height {h} not divisible by band_rows {band_rows}"
            )
        return band_rows
    return max(r for r in range(1, min(8, h) + 1) if h % r == 0)


def init_state(config: RenderConfig, band_rows: int) -> AdaptiveState:
    h, w = config.height, config.width
    if h % band_rows:
        raise ValueError(f"height {h} not divisible by band_rows {band_rows}")
    return AdaptiveState(
        accum=jnp.zeros((h, w, 3), jnp.float32),
        m2=jnp.zeros((h, w), jnp.float32),
        band_spp=jnp.zeros(h // band_rows, jnp.int32),
        seed=jnp.uint32(config.seed),
    )


def _lum(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return _LUM[0] * r + _LUM[1] * g + _LUM[2] * b


def _band_scores(state: AdaptiveState, config: RenderConfig,
                 band_rows: int) -> jnp.ndarray:
    """(B,) expected-MSE-reduction-per-sample score (docstring formula).

    Bands with fewer than 2 samples have no variance estimate and score
    +inf minus their spp — breadth-first exploration before any greed.
    """
    h, w = config.height, config.width
    b = h // band_rows
    n = jnp.maximum(state.band_spp, 1).astype(jnp.float32)      # (B,)
    n_px = jnp.repeat(n, band_rows)[:, None]                    # (H, 1)
    lum_sum = _lum(state.accum)                                 # (H, W)
    # Unbiased per-pixel sample variance s² = (m2 - n·mean²) / (n-1).
    s2 = jnp.maximum(state.m2 - lum_sum * lum_sum / n_px, 0.0) / jnp.maximum(
        n_px - 1.0, 1.0
    )
    band_s2 = jnp.sum(s2.reshape(b, band_rows * w), axis=1)
    score = band_s2 / (n * (n + 1.0))
    return jnp.where(
        state.band_spp < 2,
        jnp.float32(3.0e38) - state.band_spp.astype(jnp.float32),
        score,
    )


band_scores = jax.jit(_band_scores, static_argnames=("config", "band_rows"))


def _step_body(state: AdaptiveState, scene, camera, config: RenderConfig,
               band_rows: int, band_ids: jnp.ndarray,
               spp_per_round: int = 1) -> AdaptiveState:
    """Add ``spp_per_round`` samples to each band in ``band_ids``
    ((K,) i32, unique): ONE fused scattered-rows megakernel wave per
    sample over all K bands (each ray at its band's own sample counter —
    ``render_samples(rows=...)``), then an index-depth-1 scatter-add of
    whole band blocks. One K-band wave instead of K small serialized
    waves: the lax.map formulation measured 1.7x per-sample overhead at
    256² (k=8 bands of 4 rows = 1,024-ray waves under-fill the VPU and
    pay the per-wave fixed costs 8x); the fused wave renders the same
    (pixel, sample) ids, so every path estimate is bitwise unchanged.
    ``spp_per_round > 1`` renders consecutive per-band sample counters
    before re-scoring — identical sample ids again (scheduling
    granularity coarsens, WHAT each sample computes never changes),
    amortizing the score/top_k/gather/scatter machinery per sample."""
    h, w = config.height, config.width
    n_bands = h // band_rows

    rows = (band_ids[:, None] * band_rows
            + jnp.arange(band_rows, dtype=jnp.int32)[None, :]).reshape(-1)
    accum_b = state.accum.reshape(n_bands, band_rows, w, 3)
    m2_b = state.m2.reshape(n_bands, band_rows, w)
    band_spp = state.band_spp
    for s in range(spp_per_round):
        blocks = megakernel.render_samples(
            scene, camera, config,
            sample_start=jnp.int32(0),      # unused in rows mode
            n_samples=1,
            seed=state.seed,
            rows=rows,
            rows_sample_start=jnp.repeat(band_spp[band_ids] + s,
                                         band_rows),
        ).reshape(band_ids.shape[0], band_rows, w, 3)
        accum_b = accum_b.at[band_ids].add(blocks, unique_indices=True)
        lum = _lum(blocks)
        m2_b = m2_b.at[band_ids].add(lum * lum, unique_indices=True)
    band_spp = band_spp.at[band_ids].add(spp_per_round,
                                         unique_indices=True)
    return AdaptiveState(
        accum=accum_b.reshape(h, w, 3),
        m2=m2_b.reshape(h, w),
        band_spp=band_spp,
        seed=state.seed,
    )


adaptive_step = jax.jit(
    _step_body, static_argnames=("config", "band_rows", "spp_per_round"),
    donate_argnames=("state",),
)


@functools.partial(
    jax.jit,
    static_argnames=("config", "band_rows", "k", "n_rounds",
                     "spp_per_round"),
    donate_argnames=("state",),
)
def adaptive_rounds(state: AdaptiveState, scene, camera,
                    config: RenderConfig, band_rows: int, k: int,
                    n_rounds: int,
                    spp_per_round: int = 1) -> AdaptiveState:
    """``n_rounds`` greedy rounds fused into ONE dispatch.

    Each ``lax.scan`` iteration re-scores on device, top-k's the K
    noisiest bands, and renders them — no host round trip per round.
    Through the axon tunnel a dispatch costs ~18 ms (PERF.md round-1
    table), so per-round host scheduling would tax small rounds ~2
    dispatches each; fused, the whole greedy phase pays one."""

    def body(st, _):
        scores = _band_scores(st, config, band_rows)
        _, ids = jax.lax.top_k(scores, k)
        return _step_body(st, scene, camera, config, band_rows, ids,
                          spp_per_round), None

    state, _ = jax.lax.scan(body, state, None, length=n_rounds)
    return state


def resolve(state: AdaptiveState, band_rows: int) -> jnp.ndarray:
    """Per-pixel mean radiance with PER-BAND normalization."""
    h, w, _ = state.accum.shape
    n = jnp.maximum(state.band_spp, 1).astype(jnp.float32)
    return state.accum / jnp.repeat(n, band_rows)[:, None, None]


def render_adaptive(scene, camera, config: RenderConfig,
                    band_rows: int = 0, bands_per_round: int = 0,
                    warmup_spp: int = 2, progress=None,
                    budget_spp: Optional[int] = None,
                    spp_per_round: int = 1,
                    ) -> Tuple[AdaptiveState, int]:
    """Drive adaptive sampling to a total budget of
    ``config.samples_per_pixel`` average spp (uniform-equivalent sample
    count: B · rows · W · spp samples overall).

    ``warmup_spp`` rounds cover every band uniformly first (the variance
    estimate needs 2 samples).  Each subsequent round re-scores and
    renders the ``bands_per_round`` current-highest-variance bands.
    Returns (state, rounds_run).
    """
    band_rows = pick_band_rows(config, band_rows)
    n_bands = config.height // band_rows
    k = bands_per_round or max(1, n_bands // 8)
    k = min(k, n_bands)
    state = init_state(config, band_rows)

    target = budget_spp if budget_spp is not None else (
        config.samples_per_pixel
    )
    budget = n_bands * target            # total band-samples to spend
    spent = 0
    rounds = 0

    # Uniform warmup: every band to warmup_spp (chunks of k bands).
    all_bands = np.arange(n_bands, dtype=np.int32)
    for s in range(min(warmup_spp, target)):
        for i in range(0, n_bands, k):
            # A short tail chunk re-jits on its own shape (padding with
            # duplicate ids would double-sample those bands).
            chunk = all_bands[i:i + k]
            state = adaptive_step(state, scene, camera, config,
                                  band_rows, jnp.asarray(chunk))
            spent += len(chunk)
            rounds += 1
        if progress is not None:
            progress(state, spent, budget)

    # Greedy phase: fuse rounds into few dispatches, bounded so one
    # dispatch stays well under the tunnel's ~2-minute device-time crash
    # threshold (CLAUDE.md hard rules).
    spr = max(1, spp_per_round)
    samples_per_round = k * band_rows * config.width * spr
    rounds_per_dispatch = max(1, MAX_DISPATCH_SAMPLES // samples_per_round)
    while spent + k * spr <= budget:
        n_r = min(rounds_per_dispatch, (budget - spent) // (k * spr))
        state = adaptive_rounds(state, scene, camera, config, band_rows,
                                k, n_r, spr)
        spent += n_r * k * spr
        rounds += n_r
        if progress is not None:
            progress(state, spent, budget)
    # Budget tail finer than k*spr band-samples: finish in single-spp
    # rounds (keeps the "budget == band-samples spent" contract exact
    # when spr > 1).
    while spent + k <= budget:
        n_r = (budget - spent) // k
        state = adaptive_rounds(state, scene, camera, config, band_rows,
                                k, n_r, 1)
        spent += n_r * k
        rounds += n_r
        if progress is not None:
            progress(state, spent, budget)
    return state, rounds


# --- Tile-granular scheduling (2D tiles, pixel-level-approaching) -------
#
# Full-row bands can't follow 2D-compact noise (a spotlight's hot disc
# spans every column of a few rows): the measured Neyman bounds at 256²
# (benchmarks/adaptive_ceiling.py) put band-level allocation at 2.43x
# MSE on spotlight_demo but PIXEL-level at 17.8x. Square tiles close
# most of that gap while keeping everything the TPU wants: the
# scheduling unit stays a dense compact block (traversal-tile
# coherence), the scatter-add stays index-depth-1 over tile ids, and
# the state lives TILE-MAJOR ((T, t, t[, 3])) so no gather/scatter ever
# touches single pixels. ``resolve_tiles`` untiles to image layout once
# at the end. RNG identity is unchanged (global pixel/sample ids), so
# an equal-spp tile schedule reproduces the uniform engines bitwise.


class TileState(NamedTuple):
    accum: jnp.ndarray     # (T, t, t, 3) f32 — tile-major radiance sum
    m2: jnp.ndarray        # (T, t, t, 3) f32 — per-sample radiance² sum
    tile_spp: jnp.ndarray  # (T,) i32 — samples accumulated per tile
    seed: jnp.ndarray      # () u32


def pick_tile(config: RenderConfig, tile: int = 8) -> int:
    if config.height % tile or config.width % tile:
        raise ValueError(
            f"image {config.width}x{config.height} not divisible by "
            f"tile {tile}"
        )
    return tile


def init_tile_state(config: RenderConfig, tile: int) -> TileState:
    h, w = config.height, config.width
    n_tiles = (h // tile) * (w // tile)
    return TileState(
        accum=jnp.zeros((n_tiles, tile, tile, 3), jnp.float32),
        m2=jnp.zeros((n_tiles, tile, tile, 3), jnp.float32),
        tile_spp=jnp.zeros(n_tiles, jnp.int32),
        seed=jnp.uint32(config.seed),
    )


def _tile_var1(state: TileState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unbiased per-pixel PER-CHANNEL sample variance ((T, t, t, 3))
    and the per-tile spp as f32 ((T,)). Per-channel rather than
    luminance so the scheduler descends on — and ``predicted_rmse``
    estimates — the exact RGB squared error the BASELINE quality metric
    measures (ADVICE r4: Var(lum) = wᵀΣw generally understates mean
    per-channel variance)."""
    n = jnp.maximum(state.tile_spp, 1).astype(jnp.float32)
    n4 = n[:, None, None, None]
    mean = state.accum / n4
    var1 = jnp.maximum(state.m2 / n4 - mean * mean, 0.0) * (
        n / jnp.maximum(n - 1.0, 1.0))[:, None, None, None]
    return var1, n


def _tile_scores(state: TileState, config: RenderConfig,
                 tile: int) -> jnp.ndarray:
    """Greedy per-tile score: expected image-MSE drop per sample,
    sum_{pixels,channels} s² / (n (n+1)) — the band criterion at tile
    granularity, on the same RGB squared error the quality metric uses;
    unexplored tiles (spp < 2) rank +inf minus their spp."""
    var1, n = _tile_var1(state)
    score = var1.sum(axis=(1, 2, 3)) / (n * (n + 1.0))
    return jnp.where(
        state.tile_spp < 2,
        jnp.float32(3.0e38) - state.tile_spp.astype(jnp.float32),
        score,
    )


def _tile_pixel_ids(tile_ids, config: RenderConfig, tile: int):
    """Global pixel ids ((K * tile * tile,) i32) of the given tiles."""
    w = config.width
    ntx = w // tile
    ty = (tile_ids // ntx)[:, None, None] * tile
    tx = (tile_ids % ntx)[:, None, None] * tile
    py = ty + jnp.arange(tile, dtype=jnp.int32)[None, :, None]
    px = tx + jnp.arange(tile, dtype=jnp.int32)[None, None, :]
    return (py * w + px).reshape(-1)


def _tile_step_body(state: TileState, scene, camera,
                    config: RenderConfig, tile: int, tile_ids,
                    spp_per_round: int = 1) -> TileState:
    """Add ``spp_per_round`` samples to each tile in ``tile_ids``
    ((K,) i32, unique): one fused scattered-pixels wave per sample
    (``render_samples(pixels=...)``), tile-major index-depth-1
    scatter-add."""
    k = tile_ids.shape[0]
    pix = _tile_pixel_ids(tile_ids, config, tile)
    accum, m2, tile_spp = state.accum, state.m2, state.tile_spp
    for s in range(spp_per_round):
        blocks = megakernel.render_samples(
            scene, camera, config,
            sample_start=jnp.int32(0),      # unused in pixels mode
            n_samples=1,
            seed=state.seed,
            pixels=pix,
            pixels_sample_start=jnp.repeat(tile_spp[tile_ids] + s,
                                           tile * tile),
        ).reshape(k, tile, tile, 3)
        accum = accum.at[tile_ids].add(blocks, unique_indices=True)
        m2 = m2.at[tile_ids].add(blocks * blocks, unique_indices=True)
    tile_spp = tile_spp.at[tile_ids].add(spp_per_round,
                                         unique_indices=True)
    return TileState(accum=accum, m2=m2, tile_spp=tile_spp,
                     seed=state.seed)


tile_step = jax.jit(
    _tile_step_body,
    static_argnames=("config", "tile", "spp_per_round"),
    donate_argnames=("state",),
)


@functools.partial(
    jax.jit,
    static_argnames=("config", "tile", "k", "n_rounds", "spp_per_round"),
    donate_argnames=("state",),
)
def tile_rounds(state: TileState, scene, camera, config: RenderConfig,
                tile: int, k: int, n_rounds: int,
                spp_per_round: int = 1) -> TileState:
    """``n_rounds`` greedy tile rounds fused into ONE dispatch (scan),
    exactly like ``adaptive_rounds`` for bands."""

    def body(st, _):
        scores = _tile_scores(st, config, tile)
        _, ids = jax.lax.top_k(scores, k)
        return _tile_step_body(st, scene, camera, config, tile, ids,
                               spp_per_round), None

    state, _ = jax.lax.scan(body, state, None, length=n_rounds)
    return state


@functools.partial(jax.jit, static_argnames=("config", "tile"))
def tile_neyman_gain(state: TileState, config: RenderConfig,
                     tile: int) -> jnp.ndarray:
    """Upper bound on the MSE gain ANY tile-level allocation can reach
    over uniform, from the current variance estimate: Neyman allocation
    gives exactly ``mean_t(sigma_t^2) / mean_t(sigma_t)^2`` (>= 1 by
    Cauchy-Schwarz, = 1 iff variance is tile-uniform) where sigma_t^2
    is tile t's summed per-pixel per-channel sample variance. Scene
    property, not a scheduler property — benchmarks/adaptive_ceiling.py
    is the offline version of this estimate."""
    var1, _ = _tile_var1(state)
    sig2 = var1.sum(axis=(1, 2, 3))
    sig = jnp.sqrt(sig2)
    return jnp.mean(sig2) / jnp.maximum(jnp.mean(sig) ** 2, 1e-30)


@functools.partial(jax.jit, static_argnames=("config", "tile"))
def predicted_rmse(state: TileState, config: RenderConfig,
                   tile: int) -> jnp.ndarray:
    """Predicted RGB RMSE of the CURRENT mean image vs the converged
    one: sqrt(mean(Var_pc / n_p)) over all (pixel, channel) — the SAME
    per-channel metric as the BASELINE quality headline
    (benchmarks/quality_1024.py RMSE over (H, W, 3)), computable live
    because the tile state carries per-pixel per-channel second
    moments (ADVICE r4: the earlier luminance form understated RGB
    error). An iid standard-error estimate: assumes unbiasedness
    (grounded by the suite's kernel-vs-oracle gate and
    benchmarks/quality_ab.py's measured A-vs-B check) and iid samples —
    with the LD sampler the true error sits at or below it (measured
    A-vs-B ratio, PERF.md r5a/r5b), so a ``--target-rmse`` stop is
    conservative, never optimistic."""
    var1, n = _tile_var1(state)
    return jnp.sqrt(jnp.mean(var1 / n[:, None, None, None]))


@functools.partial(
    jax.jit,
    static_argnames=("config", "tile", "n_samples"),
    donate_argnames=("state",),
)
def uniform_tile_rounds(state: TileState, scene, camera,
                        config: RenderConfig, tile: int,
                        n_samples: int) -> TileState:
    """``n_samples`` full-image uniform samples added to a tile-major
    state in ONE dispatch — the auto-uniform fallback's workhorse.

    Renders the SAME global (pixel, sample) ids the greedy scheduler
    would issue if it picked every tile (contiguous block mode, no
    scattered-pixel gathers — full traversal-tile coherence), so a
    uniform-driven TileState stays bitwise interchangeable with the
    uniform engines (tests/test_adaptive.py locks the equal-spp
    identity)."""
    h, w = config.height, config.width
    nty, ntx = h // tile, w // tile

    def body(st, s):
        img = megakernel.render_samples(
            scene, camera, config,
            sample_start=st.tile_spp[0] + s, n_samples=1, seed=st.seed,
        )
        blocks = img.reshape(nty, tile, ntx, tile, 3).transpose(
            0, 2, 1, 3, 4
        ).reshape(-1, tile, tile, 3)
        return TileState(
            accum=st.accum + blocks,
            m2=st.m2 + blocks * blocks,
            tile_spp=st.tile_spp,     # bumped once after the scan
            seed=st.seed,
        ), None

    state, _ = jax.lax.scan(
        body, state, jnp.arange(n_samples, dtype=jnp.int32)
    )
    return state._replace(tile_spp=state.tile_spp + n_samples)


def resolve_tiles(state: TileState, config: RenderConfig,
                  tile: int) -> jnp.ndarray:
    """Per-pixel mean radiance, untiled to (H, W, 3) image layout."""
    h, w = config.height, config.width
    nty, ntx = h // tile, w // tile
    n = jnp.maximum(state.tile_spp, 1).astype(jnp.float32)
    mean = state.accum / n[:, None, None, None]
    return mean.reshape(nty, ntx, tile, tile, 3).transpose(
        0, 2, 1, 3, 4
    ).reshape(h, w, 3)


def render_adaptive_tiles(scene, camera, config: RenderConfig,
                          tile: int = 8, tiles_per_round: int = 0,
                          warmup_spp: int = 2, progress=None,
                          budget_spp: Optional[int] = None,
                          spp_per_round: int = 2,
                          auto_uniform: float = 0.0,
                          target_rmse: float = 0.0,
                          ) -> Tuple[TileState, int]:
    """Tile-granular ``render_adaptive``: drive to an average budget of
    ``config.samples_per_pixel`` (or ``budget_spp``) spp. Defaults:
    8x8 tiles, k = n_tiles // 8 per round, 2 spp per picked tile per
    round (the measured band-mode operating point).

    ``auto_uniform`` > 0 makes adaptive never-lose: after the warmup the
    Neyman bound (``tile_neyman_gain``) is checked ONCE against this
    threshold — when the scene's variance is too tile-uniform for any
    allocation to beat the scheduler's own overhead (measured ~1.25-1.6x
    per budget unit, PERF.md r4c: cornell_bsdf 0.84-1.0x vs
    spotlight_demo 3.1x), the rest of the budget renders as plain
    full-image waves (``uniform_tile_rounds`` — same sample ids, full
    block coherence, no scoring machinery). 1.5 is a sensible threshold;
    0 disables (always greedy).

    ``target_rmse`` > 0 turns the budget into a CAP: after the warmup
    (and then after every fused dispatch group) the live standard-error
    estimate (``predicted_rmse``) is fetched, and rendering stops as
    soon as it reaches the target — render-until-quality, the stopping
    rule production renderers pair with adaptive allocation. 0 (the
    default) never traces or fetches the estimator, so existing
    schedules are untouched."""
    tile = pick_tile(config, tile)
    n_tiles = (config.height // tile) * (config.width // tile)
    k = tiles_per_round or max(1, n_tiles // 8)
    k = min(k, n_tiles)
    state = init_tile_state(config, tile)

    target = budget_spp if budget_spp is not None else (
        config.samples_per_pixel
    )
    if target_rmse > 0.0 and min(warmup_spp, target) < 2:
        # The n<=1 variance estimate is identically zero, so EVERY
        # stopping check (not just the post-warmup one) would fire
        # immediately with most tiles unsampled (ADVICE r4). Disable
        # the rule loudly rather than stop on garbage.
        from pathtracing_tpu.utils import logging as ptlog

        ptlog.log_warning(
            "target_rmse needs warmup_spp >= 2 (got %d) — stopping "
            "rule disabled, rendering the full budget", warmup_spp,
        )
        target_rmse = 0.0

    def _hit_target(st: TileState) -> bool:
        # Only meaningful once every tile carries >= 2 spp — the guard
        # above guarantees the warmup provides that before any check.
        return (target_rmse > 0.0 and
                float(predicted_rmse(st, config, tile)) <= target_rmse)
    budget = n_tiles * target
    spent = 0
    rounds = 0

    all_tiles = np.arange(n_tiles, dtype=np.int32)
    for _ in range(min(warmup_spp, target)):
        for i in range(0, n_tiles, k):
            chunk = all_tiles[i:i + k]
            state = tile_step(state, scene, camera, config, tile,
                              jnp.asarray(chunk))
            spent += len(chunk)
            rounds += 1
        if progress is not None:
            progress(state, spent, budget)
    if min(warmup_spp, target) >= 2 and _hit_target(state):
        return state, rounds

    if auto_uniform > 0.0 and warmup_spp >= 2 and spent < budget:
        gain = float(tile_neyman_gain(state, config, tile))
        from pathtracing_tpu.utils import logging as ptlog

        ptlog.log_information(
            "adaptive: Neyman gain bound %.2f vs auto-uniform "
            "threshold %.2f -> %s scheduling", gain, auto_uniform,
            "uniform" if gain < auto_uniform else "greedy",
        )
        if gain < auto_uniform:
            # Variance too uniform for allocation to beat the scheduler
            # overhead: spend the remainder as full-image waves (chunked
            # under the dispatch bound), same global sample ids.
            per_sample = config.height * config.width
            max_chunk = max(1, MAX_DISPATCH_SAMPLES // per_sample)
            remaining = (budget - spent) // n_tiles   # whole spp only
            done = 0
            if target_rmse > 0.0:
                # Check the stopping rule every few spp, not once at
                # the end of one huge fused dispatch.
                max_chunk = min(max_chunk, 4)
            while done < remaining:
                n_s = min(max_chunk, remaining - done)
                state = uniform_tile_rounds(state, scene, camera,
                                            config, tile, n_s)
                done += n_s
                spent += n_s * n_tiles
                rounds += n_s
                if progress is not None:
                    progress(state, spent, budget)
                if _hit_target(state):
                    break
            return state, rounds
    spr = max(1, spp_per_round)
    samples_per_round = k * tile * tile * spr
    rounds_per_dispatch = max(1, MAX_DISPATCH_SAMPLES // samples_per_round)
    if target_rmse > 0.0:
        # Bound each fused dispatch to ~2 average spp between checks.
        rounds_per_dispatch = min(
            rounds_per_dispatch, max(1, (n_tiles * 2) // (k * spr))
        )
    while spent + k * spr <= budget:
        n_r = min(rounds_per_dispatch, (budget - spent) // (k * spr))
        state = tile_rounds(state, scene, camera, config, tile, k, n_r,
                            spr)
        spent += n_r * k * spr
        rounds += n_r
        if progress is not None:
            progress(state, spent, budget)
        if _hit_target(state):
            return state, rounds
    while spent + k <= budget:
        n_r = (budget - spent) // k
        state = tile_rounds(state, scene, camera, config, tile, k, n_r, 1)
        spent += n_r * k
        rounds += n_r
        if progress is not None:
            progress(state, spent, budget)
        if _hit_target(state):
            return state, rounds
    return state, rounds
