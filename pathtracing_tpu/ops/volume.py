"""Heterogeneous participating media: dense voxel grids + delta tracking.

The reference has no volumetrics of any kind (its one kernel is a
0-bounce sphere caster, `Test.hlsl:4-32`); this is north-star framework
capability completing the media stack (homogeneous fog: STREAM_FOG in
`models/shading.py`; interior Beer-Lambert: `Scene.mat_absorb`).

TPU-native shape: ONE dense (Nz, Ny, Nx) f32 density grid on the scene
pytree — pure trilinear gathers, no trees, no ragged shapes (PERF.md
round-1 fact #1: XLA gathers are fine). Extinction at a point is
``density(x) * (sigma_s + sigma_a)``, so the single-scattering albedo is
the CONSTANT ``sigma_s / (sigma_s + sigma_a)`` — events multiply
throughput by the albedo (analog absorption folded into the weight, no
extra RNG draw) and continue by Henyey-Greenstein phase sampling,
exactly the homogeneous-fog estimator with a spatially varying
collision density.

Free-flight sampling is delta (Woodcock) tracking: exponential flights
at a majorant rate, each collision real with probability
``sigma_t(x) / majorant`` else null — unbiased for any
``majorant >= sigma_t`` everywhere, and a block maximum bounds every
trilinear interpolant inside the block (a convex combination of voxel
values; the block max is DILATED by one voxel because trilinear support
reaches into neighbours). Shadow-ray transmittance uses ratio tracking
(the product-form estimator ``prod(1 - sigma_t(x_i)/majorant)`` at the
same flight distribution), which is the unbiased expectation of
Beer-Lambert through the grid.

MAJORANTS ARE PIECEWISE-CONSTANT over a coarse super-voxel grid
(``VolumeGrid.coarse``, default 8³ fine voxels per cell, PERF.md r5c):
each walk iteration either samples a flight at the CURRENT cell's local
majorant (clamped to the cell exit — restarting the memoryless
exponential at a boundary is exact, the classic regular-tracking /
delta-tracking hybrid) or, when the cell is empty or the flight
overshoots, advances to the cell boundary with no density lookup and no
collision test. A mostly-empty plume then pays the dense-core rate only
inside dense cells instead of everywhere (the r4 global-max walk spent
91% of its lookups on null collisions on smoke_demo; the ledger is
benchmarks/probe_volume.py). ``coarse_block=0`` at build time disables
the coarse grid and restores the single global-majorant walk.

Both walks are batch `lax.while_loop`s over (R,) lanes — data-dependent
trip counts are fine in plain XLA (this is bounce-level code, not a
Pallas kernel), and the loop exits when every lane has resolved. A hard
step cap ``n_steps`` (static pytree aux) bounds compilation and the
pathological tail: it is sized at build time to ``lambda + 8*sqrt(lambda)``
flights for ``lambda = majorant * bbox_diagonal`` (a Poisson tail beyond
that is < 1e-12), so the truncation bias (capped lanes pass through /
keep their partial product) is far below Monte Carlo noise.

RNG is counter-based like every other stream: per-step draws fold the
step index into STREAM_VOL / STREAM_VOLT sub-keys, so engines,
shardings, and resume points reproduce bit-exactly and grid-free scenes
never fold the streams in at all (the feature-gating contract).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.ops import rng

# fold_in salts keeping the three per-bounce ratio-tracking walks
# (area-light NEE, environment NEE, delta-light NEE) on disjoint
# sub-streams of STREAM_VOLT.
SALT_NEE = 1
SALT_ENV = 2
SALT_DELTA = 3


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class VolumeGrid:
    """Dense voxel-grid medium bound to a world-space AABB.

    ``density`` is (Nz, Ny, Nx) f32 >= 0 in arbitrary units;
    ``sigma_s`` / ``sigma_a`` scale it to scattering / absorption
    coefficients (world units^-1) at density 1. ``majorant`` is the
    precomputed grid-max extinction; ``n_steps`` (static aux) caps the
    tracking walks (see module docstring for the sizing argument).
    Voxel values sit at cell CENTERS; lookups outside the box clamp to
    the boundary cells (the walks only evaluate inside the box).
    """

    density: jnp.ndarray    # (Nz, Ny, Nx) f32
    sigma_s: jnp.ndarray    # ()  f32
    sigma_a: jnp.ndarray    # ()  f32
    g: jnp.ndarray          # ()  f32 Henyey-Greenstein anisotropy
    bbox_min: jnp.ndarray   # (3,) f32
    bbox_max: jnp.ndarray   # (3,) f32
    majorant: jnp.ndarray   # ()  f32 = max(density) * (sigma_s + sigma_a)
    # Optional emission: radiance at x is emission(x) * emit_color
    # (fire/blackbody media; None = cold medium). The unbiased estimator
    # adds (sigma_a/sigma_t) * Le at each real collision — the
    # absorption-weighted emission of analog tracking — so emissive
    # media need sigma_a > 0 (emission trades against absorption).
    emission: jnp.ndarray = None     # (Nz, Ny, Nx) f32 or None
    emit_color: jnp.ndarray = None   # (3,) f32 or None
    # Super-voxel majorants: per-coarse-cell dilated block max of
    # extinction ((Ncz, Ncy, Ncx) f32, world units^-1). None = single
    # global-majorant walks (coarse_block=0 at build time).
    coarse: jnp.ndarray = None
    n_steps: int = 64       # static: tracking step cap

    def tree_flatten(self):
        leaves = (self.density, self.sigma_s, self.sigma_a, self.g,
                  self.bbox_min, self.bbox_max, self.majorant,
                  self.emission, self.emit_color, self.coarse)
        return leaves, self.n_steps

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, n_steps=aux)

    @property
    def albedo(self):
        """Constant single-scattering albedo sigma_s / sigma_t."""
        return self.sigma_s / jnp.maximum(self.sigma_s + self.sigma_a,
                                          1e-20)


def _coarse_majorants(density, block):
    """Per-super-voxel max of ``density`` over ``block``³ fine voxels,
    DILATED by one voxel on every side: a trilinear lookup at a point
    in cell c interpolates voxel centers up to one voxel outside c's
    span, so the dilated max is the tight valid majorant. Host-side
    numpy (runs once at build)."""
    nz, ny, nx = density.shape
    pad = np.pad(density, 1, mode="edge")
    ncz = -(-nz // block)
    ncy = -(-ny // block)
    ncx = -(-nx // block)
    out = np.zeros((ncz, ncy, ncx), np.float32)
    for cz in range(ncz):
        for cy in range(ncy):
            for cx in range(ncx):
                out[cz, cy, cx] = pad[
                    cz * block:(cz + 1) * block + 2,
                    cy * block:(cy + 1) * block + 2,
                    cx * block:(cx + 1) * block + 2,
                ].max()
    return out


def build_grid(density, bbox_min, bbox_max, sigma_s, sigma_a=0.0,
               g=0.0, n_steps=None, emission=None,
               emit_color=None, coarse_block=8) -> VolumeGrid:
    """Host-side constructor (numpy in, device pytree out).

    ``coarse_block``: fine voxels per super-voxel-majorant cell per
    axis (default 8 — the measured sweet spot on smoke_demo, PERF.md
    r5c); 0 disables the coarse grid (single global-majorant walks)."""
    density = np.ascontiguousarray(np.asarray(density, np.float32))
    if density.ndim != 3:
        raise ValueError("density grid must be (Nz, Ny, Nx)")
    if float(density.min()) < 0.0:
        raise ValueError("density grid must be non-negative")
    sigma_s = float(sigma_s)
    sigma_a = float(sigma_a)
    if sigma_s + sigma_a <= 0.0:
        raise ValueError("volume needs sigma_s + sigma_a > 0")
    bmin = np.asarray(bbox_min, np.float32)
    bmax = np.asarray(bbox_max, np.float32)
    if not np.all(bmax > bmin):
        raise ValueError("volume bbox must have positive extent")
    if emission is not None:
        emission = np.ascontiguousarray(np.asarray(emission, np.float32))
        if emission.shape != density.shape:
            raise ValueError("emission grid must match density shape")
        if sigma_a <= 0.0:
            raise ValueError("emissive media need sigma_a > 0 (the "
                             "estimator weights emission by "
                             "sigma_a/sigma_t)")
        if emit_color is None:
            emit_color = (1.0, 1.0, 1.0)
    majorant = float(density.max()) * (sigma_s + sigma_a)
    coarse = None
    if coarse_block and coarse_block > 0:
        coarse = _coarse_majorants(density, int(coarse_block)) * (
            sigma_s + sigma_a
        )
    if n_steps is None:
        lam = majorant * float(np.linalg.norm(bmax - bmin))
        n_steps = lam + 8.0 * math.sqrt(lam + 1.0) + 8.0
        if coarse is not None:
            # Boundary advances add at most one iteration per coarse
            # cell crossed (<= sum of the per-axis cell counts).
            n_steps += float(sum(coarse.shape))
        n_steps = int(min(max(n_steps, 32.0), 512.0))
    return VolumeGrid(
        density=jnp.asarray(density),
        sigma_s=jnp.float32(sigma_s),
        sigma_a=jnp.float32(sigma_a),
        g=jnp.float32(g),
        bbox_min=jnp.asarray(bmin),
        bbox_max=jnp.asarray(bmax),
        majorant=jnp.float32(majorant),
        emission=(jnp.asarray(emission) if emission is not None
                  else None),
        emit_color=(jnp.asarray(np.asarray(emit_color, np.float32))
                    if emission is not None else None),
        coarse=(jnp.asarray(coarse) if coarse is not None else None),
        n_steps=int(n_steps),
    )


def _trilinear(grid, bbox_min, bbox_max, x):
    """Trilinear lookup in a (Nz, Ny, Nx) grid at world points (R, 3)."""
    nz, ny, nx = grid.shape
    res = jnp.asarray([nx, ny, nz], jnp.float32)
    hi = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32)
    u = (x - bbox_min) / (bbox_max - bbox_min) * res - 0.5
    i0f = jnp.floor(u)
    f = u - i0f
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, hi)
    i1 = jnp.clip(i0 + 1, 0, hi)
    flat = grid.reshape(-1)

    def fetch(ix, iy, iz):
        return flat[(iz * ny + iy) * nx + ix]

    x0, y0, z0 = i0[:, 0], i0[:, 1], i0[:, 2]
    x1, y1, z1 = i1[:, 0], i1[:, 1], i1[:, 2]
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    c00 = fetch(x0, y0, z0) * (1 - fx) + fetch(x1, y0, z0) * fx
    c10 = fetch(x0, y1, z0) * (1 - fx) + fetch(x1, y1, z0) * fx
    c01 = fetch(x0, y0, z1) * (1 - fx) + fetch(x1, y0, z1) * fx
    c11 = fetch(x0, y1, z1) * (1 - fx) + fetch(x1, y1, z1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def density_at(vol: VolumeGrid, x):
    """Trilinear density lookup at world points ``x`` (R, 3) -> (R,)."""
    return _trilinear(vol.density, vol.bbox_min, vol.bbox_max, x)


def emission_at(vol: VolumeGrid, x):
    """Emitted radiance at world points (R, 3) -> (R, 3); requires
    ``vol.emission`` (feature-gated by the caller)."""
    e = _trilinear(vol.emission, vol.bbox_min, vol.bbox_max, x)
    return e[:, None] * vol.emit_color[None, :]


def _ray_box(o, d, bmin, bmax):
    """Slab test: per-ray (t_enter, t_exit); t_enter > t_exit = miss."""
    safe_d = jnp.where(jnp.abs(d) > 1e-12, d,
                       jnp.where(d >= 0.0, 1e-12, -1e-12))
    inv = 1.0 / safe_d
    ta = (bmin - o) * inv
    tb = (bmax - o) * inv
    t0 = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)
    return t0, t1


def _flight(u, inv_maj):
    """Exponential free-flight length at the majorant rate."""
    return -jnp.log1p(-jnp.minimum(u, 1.0 - 1e-7)) * inv_maj


def _coarse_geom(vol: VolumeGrid):
    """Static coarse-cell geometry: per-axis world cell size ((3,) f32
    in x,y,z order), per-axis top cell index, flat majorant table, and
    the monotone-progress epsilon. The per-axis fine-voxels-per-cell
    block is recovered as ceil(n / nc) (constant at build time)."""
    ncz, ncy, ncx = vol.coarse.shape
    nz, ny, nx = vol.density.shape
    blocks = np.array([-(-nx // ncx), -(-ny // ncy), -(-nz // ncz)],
                      np.float32)
    fine = np.array([nx, ny, nz], np.float32)
    csize = (vol.bbox_max - vol.bbox_min) * jnp.asarray(blocks / fine)
    hi = jnp.asarray([ncx - 1, ncy - 1, ncz - 1], jnp.int32)
    t_eps = 1e-4 * jnp.min(csize)
    return csize, hi, vol.coarse.reshape(-1), t_eps


def _coarse_step(vol, csize, hi, cflat, t_eps, o, d, t, u_flight):
    """One piecewise-constant-majorant walk step shared by both
    trackers: look up the current cell's local majorant, sample a
    flight at it, clamp to the cell exit. Returns ``(t_new, advance,
    inv_lm)`` — ``advance`` lanes crossed a boundary (no collision
    test; restarting the memoryless exponential there is exact),
    flight lanes land at ``t_new`` inside the cell with majorant
    ``1/inv_lm``."""
    ncz, ncy, ncx = vol.coarse.shape
    x = o + (t + t_eps)[:, None] * d
    ci = jnp.clip(
        jnp.floor((x - vol.bbox_min) / csize).astype(jnp.int32), 0, hi
    )
    lm = cflat[(ci[:, 2] * ncy + ci[:, 1]) * ncx + ci[:, 0]]
    clo = vol.bbox_min + ci.astype(jnp.float32) * csize
    safe_d = jnp.where(jnp.abs(d) > 1e-12, d,
                       jnp.where(d >= 0.0, 1e-12, -1e-12))
    inv_d = 1.0 / safe_d
    tb = jnp.min(
        jnp.maximum((clo - o) * inv_d, (clo + csize - o) * inv_d),
        axis=-1,
    )
    tb = jnp.maximum(tb, t + t_eps)      # monotone progress under fp
    inv_lm = 1.0 / jnp.maximum(lm, 1e-20)
    t_cand = t + _flight(u_flight, inv_lm)
    advance = (lm <= 0.0) | (t_cand >= tb)
    return jnp.where(advance, tb, t_cand), advance, inv_lm


def sample_distance(vol: VolumeGrid, keys, depth, o, d, t_max, active):
    """Delta-tracking free-flight sampling inside the grid.

    Returns ``(event, t_event, u_phase)``: a bool (R,) marking lanes
    whose next vertex is an in-medium scatter event (before any surface
    hit at ``t_max``), the event distance, and two phase-sampling
    uniforms drawn from the same per-(ray, bounce) stream (step index
    ``n_steps``, disjoint from every in-walk draw by construction).
    The standard delta-tracking estimator: event lanes carry weight
    ``albedo`` (analog absorption folded in), pass-through lanes weight
    1 — both exact, matching the homogeneous-fog distance sampler.
    """
    t0, t1 = _ray_box(o, d, vol.bbox_min, vol.bbox_max)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    sig_scale = vol.sigma_s + vol.sigma_a
    inv_maj = 1.0 / jnp.maximum(vol.majorant, 1e-20)
    k_vol = jax.vmap(
        lambda k, dp: rng.stream_key(k, dp, rng.STREAM_VOL)
    )(keys, depth)

    r = o.shape[0]
    done0 = jnp.logical_not(active) | (t0 >= t1)
    event0 = jnp.zeros(r, bool)
    coarse = vol.coarse is not None
    if coarse:
        csize, chi, cflat, t_eps = _coarse_geom(vol)

    def cond(carry):
        i, _, done, _ = carry
        return (i < vol.n_steps) & jnp.logical_not(jnp.all(done))

    def body(carry):
        i, t, done, event = carry
        u = jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, i), (2,),
                                         dtype=jnp.float32)
        )(k_vol)
        if coarse:
            t_new, advance, inv_lm = _coarse_step(
                vol, csize, chi, cflat, t_eps, o, d, t, u[:, 0]
            )
        else:
            t_new = t + _flight(u[:, 0], inv_maj)
            advance = jnp.zeros(r, bool)
            inv_lm = inv_maj
        esc = t_new >= t1
        x = o + t_new[:, None] * d
        p_real = density_at(vol, x) * sig_scale * inv_lm
        real = jnp.logical_not(advance) & (u[:, 1] < p_real)
        event = event | (jnp.logical_not(done) & jnp.logical_not(esc)
                         & real)
        t = jnp.where(done, t, t_new)
        done = done | esc | real
        return i + 1, t, done, event

    _, t, _, event = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, done0, event0)
    )
    u_phase = jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, vol.n_steps), (2,), dtype=jnp.float32
        )
    )(k_vol)
    return event, t, u_phase


def transmittance(vol: VolumeGrid, keys, depth, o, d, t_max, salt):
    """Ratio-tracking transmittance along (o, d) up to ``t_max`` -> (R,).

    Unbiased estimator of exp(-integral sigma_t): exponential flights at
    the majorant rate, multiplying ``1 - sigma_t(x)/majorant`` per
    collision until the walk exits the clipped segment. ``salt`` keeps
    the per-bounce NEE arms (area / env / delta) on disjoint streams.
    """
    t0, t1 = _ray_box(o, d, vol.bbox_min, vol.bbox_max)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    sig_scale = vol.sigma_s + vol.sigma_a
    inv_maj = 1.0 / jnp.maximum(vol.majorant, 1e-20)
    k_t = jax.vmap(
        lambda k, dp: jax.random.fold_in(
            rng.stream_key(k, dp, rng.STREAM_VOLT), salt
        )
    )(keys, depth)

    r = o.shape[0]
    done0 = t0 >= t1
    trans0 = jnp.ones(r, jnp.float32)
    coarse = vol.coarse is not None
    if coarse:
        csize, chi, cflat, t_eps = _coarse_geom(vol)

    def cond(carry):
        i, _, _, done = carry
        return (i < vol.n_steps) & jnp.logical_not(jnp.all(done))

    def body(carry):
        i, t, trans, done = carry
        u = jax.vmap(
            lambda k: jax.random.uniform(jax.random.fold_in(k, i), (),
                                         dtype=jnp.float32)
        )(k_t)
        if coarse:
            t_new, advance, inv_lm = _coarse_step(
                vol, csize, chi, cflat, t_eps, o, d, t, u
            )
        else:
            t_new = t + _flight(u, inv_maj)
            advance = jnp.zeros(r, bool)
            inv_lm = inv_maj
        esc = t_new >= t1
        x = o + t_new[:, None] * d
        ratio = jnp.maximum(
            1.0 - density_at(vol, x) * sig_scale * inv_lm, 0.0
        )
        trans = jnp.where(
            jnp.logical_not(done) & jnp.logical_not(esc)
            & jnp.logical_not(advance),
            trans * ratio, trans,
        )
        t = jnp.where(done, t, t_new)
        done = done | esc
        return i + 1, t, trans, done

    _, _, trans, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, trans0, done0)
    )
    return trans
