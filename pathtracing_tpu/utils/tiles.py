"""Tiled rendering with per-tile completion tracking and fault injection.

SURVEY.md §5.3: the reference's only recovery mechanism is swapchain
recreation (`Renderer.cs:497-520`) — lose the process and the whole frame
restarts. Here the image is rendered in independent row bands with a
per-band sample counter persisted alongside the accumulation buffer, so:

  * a crash/preemption resumes by re-rendering ONLY the bands that are
    behind (counter-based RNG makes the result bit-identical to an
    uninterrupted render);
  * a fault can be *injected* (``inject_fault=band``) to drop a band's
    contribution mid-run and exercise the recovery path end to end —
    the testing story the reference lacks entirely (SURVEY.md §4).

Bands reuse the megakernel's row-block sharding hooks (the same global
pixel-id scheme the multi-chip path uses), so band renders compose with
any engine settings.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import json
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import megakernel
from pathtracing_tpu.utils.config import RenderConfig


class TiledState(NamedTuple):
    accum: jnp.ndarray     # (H, W, 3) f32 radiance sum
    band_spp: np.ndarray   # (B,) i32 samples completed per band (host)
    seed: jnp.ndarray      # () u32


def init_tiled(config: RenderConfig, n_bands: int) -> TiledState:
    if config.height % n_bands:
        raise ValueError(
            f"height {config.height} not divisible into {n_bands} bands"
        )
    return TiledState(
        accum=jnp.zeros((config.height, config.width, 3), jnp.float32),
        band_spp=np.zeros(n_bands, np.int32),
        seed=jnp.uint32(config.seed),
    )


def _fingerprint(config: RenderConfig, n_bands: int) -> str:
    payload = json.dumps(
        (dataclasses.asdict(config), n_bands), sort_keys=True
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save(path: str, state: TiledState, config: RenderConfig) -> None:
    tmp = path + ".tmp"
    np.savez(
        tmp,
        accum=np.asarray(state.accum),
        band_spp=state.band_spp,
        seed=np.asarray(state.seed),
        fingerprint=np.frombuffer(
            _fingerprint(config, len(state.band_spp)).encode(),
            dtype=np.uint8,
        ),
    )
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


def load(path: str, config: RenderConfig, n_bands: int) -> TiledState:
    with np.load(path) as data:
        stored = bytes(data["fingerprint"]).decode()
        want = _fingerprint(config, n_bands)
        if stored != want:
            raise ValueError(
                f"tiled checkpoint {path} was written with a different "
                f"config/band layout (fingerprint {stored} != {want}); "
                "refusing to resume"
            )
        return TiledState(
            accum=jnp.asarray(data["accum"]),
            band_spp=np.asarray(data["band_spp"]),
            seed=jnp.asarray(data["seed"]),
        )


def render_band(scene, camera, config: RenderConfig, state: TiledState,
                band: int, n_samples: int) -> TiledState:
    """Advance one band by ``n_samples`` spp (jitted per band shape)."""
    n_bands = len(state.band_spp)
    block_rows = config.height // n_bands
    block = _band_step(
        scene, camera, config,
        jnp.int32(int(state.band_spp[band])), n_samples,
        state.seed, jnp.int32(band * block_rows), block_rows,
    )
    accum = state.accum.at[
        band * block_rows:(band + 1) * block_rows
    ].add(block)
    band_spp = state.band_spp.copy()
    band_spp[band] += n_samples
    return TiledState(accum=accum, band_spp=band_spp, seed=state.seed)


@functools.partial(
    jax.jit, static_argnames=("config", "n_samples", "block_rows")
)
def _band_step(scene, camera, config, sample_start, n_samples, seed,
               row_start, block_rows):
    return megakernel.render_samples(
        scene, camera, config, sample_start=sample_start,
        n_samples=n_samples, seed=seed, row_start=row_start,
        block_rows=block_rows,
    )


def inject_fault(state: TiledState, band: int) -> TiledState:
    """Drop one band's accumulated radiance and its counter — simulates a
    lost/corrupted tile (debug flag; SURVEY.md §5.3 fault injection)."""
    n_bands = len(state.band_spp)
    rows = state.accum.shape[0] // n_bands
    accum = state.accum.at[band * rows:(band + 1) * rows].set(0.0)
    band_spp = state.band_spp.copy()
    band_spp[band] = 0
    return TiledState(accum=accum, band_spp=band_spp, seed=state.seed)


def resolve_tiled(state: TiledState) -> np.ndarray:
    """Mean-radiance image with PER-BAND normalization (bands may hold
    different sample counts under adaptive scheduling)."""
    accum = np.asarray(state.accum)
    n_bands = len(state.band_spp)
    rows = accum.shape[0] // n_bands
    out = np.empty_like(accum)
    for b in range(n_bands):
        out[b * rows:(b + 1) * rows] = (
            accum[b * rows:(b + 1) * rows]
            / max(int(state.band_spp[b]), 1)
        )
    return out


def render_tiled_adaptive(scene, camera, config: RenderConfig,
                          n_bands: int, progress=None) -> TiledState:
    """Variance-driven adaptive sampling over bands.

    Budget = n_bands * config.samples_per_pixel rounds-worth of samples,
    spent greedily on the band whose round-to-round estimate still moves
    the most (relative luminance delta between consecutive per-band
    means — a cheap convergence proxy that needs no second-moment
    buffer). Every band gets at least ``samples_per_step`` twice so the
    proxy exists; resolve with ``resolve_tiled`` (per-band spp differ).
    """
    state = init_tiled(config, n_bands)
    step = config.samples_per_step
    budget = n_bands * config.samples_per_pixel
    rows = config.height // n_bands

    prev_mean = np.zeros(n_bands)
    score = np.full(n_bands, np.inf)  # unexplored bands first
    spent = 0
    while spent + step <= budget:
        band = int(np.argmax(score))
        before = prev_mean[band]
        state = render_band(scene, camera, config, state, band, step)
        spent += step

        block = np.asarray(
            state.accum[band * rows:(band + 1) * rows]
        )
        mean_now = float(block.mean()) / max(int(state.band_spp[band]), 1)
        if int(state.band_spp[band]) >= 2 * step:
            rel_delta = abs(mean_now - before) / max(abs(mean_now), 1e-6)
            # Error shrinks ~1/sqrt(n): damp the score as spp grows.
            score[band] = rel_delta / np.sqrt(int(state.band_spp[band]))
        prev_mean[band] = mean_now
        if progress is not None:
            progress(band, int(state.band_spp[band]))
    return state


def render_tiled(scene, camera, config: RenderConfig, n_bands: int,
                 state: Optional[TiledState] = None,
                 checkpoint_path: Optional[str] = None,
                 inject_fault_band: Optional[int] = None,
                 progress=None) -> TiledState:
    """Drive all bands to ``config.samples_per_pixel``, resumable.

    Renders in rounds of ``config.samples_per_step``; lagging bands (from
    a resume or an injected fault) catch up first. ``progress`` is an
    optional callback(band, band_spp) for logging/UI.
    """
    if state is None:
        state = init_tiled(config, n_bands)
    target = config.samples_per_pixel
    step = config.samples_per_step

    fault_done = inject_fault_band is None
    while int(state.band_spp.min()) < target:
        band = int(np.argmin(state.band_spp))
        n = min(step, target - int(state.band_spp[band]))
        state = render_band(scene, camera, config, state, band, n)
        if progress is not None:
            progress(band, int(state.band_spp[band]))
        if checkpoint_path:
            save(checkpoint_path, state, config)
        if not fault_done and state.band_spp.min() >= target // 2:
            state = inject_fault(state, inject_fault_band)
            fault_done = True
    return state
