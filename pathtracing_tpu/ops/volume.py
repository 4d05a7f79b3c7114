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

MAJORANTS ARE PER-RAY CONSTANTS derived from a coarse super-voxel grid
(``VolumeGrid.coarse``, default 8³ fine voxels per cell, dilated one
fine voxel for trilinear support — PERF.md r5c): before a walk, each
ray takes the maximum of the ONCE-MORE-dilated coarse grid
(``coarse_ray``, a 3³ coarse-cell max-pool) over ``ray_samples``
points spaced at most one coarse cell apart along its clipped
segment. Every point of the segment lies within one cell size of a
sample, so the 3³ dilation makes the sampled max a true bound on
extinction along the ray — a valid (per-ray) majorant. Rays through
empty space get rate 0 and resolve immediately; rays clipping the
plume pay their own neighbourhood's rate, not the dense core's.

THE WALKS ARE BATCHED, NOT STEPPED (PERF.md r5f): with a per-ray
constant rate, the i-th collision distance is a prefix sum of iid
exponentials, so each round draws K flights at once, evaluates all
K trilinear densities in ONE fused gather, and resolves
acceptances/ratio factors vectorially; an outer ``lax.while_loop``
repeats rounds only while some lane is unresolved. This exists
because the sequential walk spent ~88% of its time in per-step XLA
gathers (8 corner fetches per iteration inside the loop run at
~0.06 Gelem/s on TPU — the decomposition is PERF.md r5f); the same
fetches batched run ~25x faster. The per-cell sequential walk
(regular/delta-tracking hybrid with boundary restarts) is kept as
``sample_distance_seq`` / ``transmittance_seq`` for the ledger probe
and estimator cross-checks. ``coarse_block=0`` at build time disables
the coarse grids; the batched walk then runs at the global majorant.

A hard flight cap ``n_steps`` (static pytree aux) bounds compilation
and the pathological tail: it is sized at build time to
``lambda + 8*sqrt(lambda)`` flights for
``lambda = majorant * bbox_diagonal`` (a Poisson tail beyond that is
< 1e-12), so the truncation bias (capped lanes pass through / keep
their partial product) is far below Monte Carlo noise.

RNG is counter-based like every other stream: per-round draws fold the
round index into STREAM_VOL / STREAM_VOLT sub-keys, so engines,
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
    # 3³ coarse-cell max-pool of ``coarse``: sampling it at points at
    # most one cell apart along a segment bounds extinction over the
    # WHOLE segment (module docstring) — the per-ray majorant table.
    coarse_ray: jnp.ndarray = None
    n_steps: int = 64       # static: tracking step cap
    # Static count of per-ray majorant samples (ceil(bbox diagonal /
    # min coarse cell size) + 2); 0 when coarse grids are disabled.
    ray_samples: int = 0

    def tree_flatten(self):
        leaves = (self.density, self.sigma_s, self.sigma_a, self.g,
                  self.bbox_min, self.bbox_max, self.majorant,
                  self.emission, self.emit_color, self.coarse,
                  self.coarse_ray)
        return leaves, (self.n_steps, self.ray_samples)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, n_steps=aux[0], ray_samples=aux[1])

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
    coarse_ray = None
    ray_samples = 0
    if coarse_block and coarse_block > 0:
        coarse = _coarse_majorants(density, int(coarse_block)) * (
            sigma_s + sigma_a
        )
        # 3³ coarse-cell max-pool: the per-ray majorant table (module
        # docstring derives why one extra dilation + <= cell-size
        # sample spacing bounds the segment).
        cpad = np.pad(coarse, 1, mode="edge")
        coarse_ray = np.maximum.reduce([
            cpad[1 + dz:cpad.shape[0] - 1 + dz,
                 1 + dy:cpad.shape[1] - 1 + dy,
                 1 + dx:cpad.shape[2] - 1 + dx]
            for dz in (-1, 0, 1) for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ])
        nz_, ny_, nx_ = density.shape
        ncz, ncy, ncx = coarse.shape
        ext = bmax - bmin                        # xyz order
        csize_axes = np.array([
            ext[0] * (-(-nx_ // ncx)) / nx_,     # _coarse_geom's mapping
            ext[1] * (-(-ny_ // ncy)) / ny_,
            ext[2] * (-(-nz_ // ncz)) / nz_,
        ], np.float32)
        diag = float(np.linalg.norm(ext))
        ray_samples = int(math.ceil(diag / float(csize_axes.min()))) + 2
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
        coarse_ray=(jnp.asarray(coarse_ray) if coarse_ray is not None
                    else None),
        n_steps=int(n_steps),
        ray_samples=int(ray_samples),
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


def _ray_rate(vol: VolumeGrid, o, d, t0, t1):
    """Per-ray constant majorant over the clipped segment [t0, t1]:
    max of ``coarse_ray`` (the 3³-dilated coarse majorants) over
    ``ray_samples`` points spaced <= one coarse cell apart — a true
    extinction bound along the segment (module docstring). Returns
    (rate, inv_rate), both (R,) f32; global majorant when the coarse
    grids are disabled."""
    r = o.shape[0]
    if vol.coarse_ray is None or vol.ray_samples <= 0:
        rate = jnp.broadcast_to(vol.majorant, (r,))
        return rate, 1.0 / jnp.maximum(rate, 1e-20)
    ncz, ncy, ncx = vol.coarse_ray.shape
    csize, hi, _, _ = _coarse_geom(vol)
    cflat_ray = vol.coarse_ray.reshape(-1)
    s = vol.ray_samples
    frac = jnp.linspace(0.0, 1.0, s, dtype=jnp.float32)        # (S,)
    ts = t0[:, None] + (t1 - t0)[:, None] * frac[None, :]      # (R, S)
    xs = o[:, None, :] + ts[..., None] * d[:, None, :]         # (R, S, 3)
    ci = jnp.clip(
        jnp.floor((xs - vol.bbox_min) / csize).astype(jnp.int32),
        0, hi,
    )
    lm = cflat_ray[(ci[..., 2] * ncy + ci[..., 1]) * ncx + ci[..., 0]]
    rate = jnp.max(jnp.where(ts <= t1[:, None], lm, 0.0), axis=1)
    return rate, 1.0 / jnp.maximum(rate, 1e-20)


# Flights per batched walk round: each round draws K flights, fetches
# all K densities in ONE fused gather, and resolves vectorially. 8 is
# the measured sweet spot on smoke_demo (PERF.md r5f: 4/8/16 sweep);
# env-overridable for the sweep only — changing K changes RNG streams.
import os as _os

_BATCH_K = int(_os.environ.get("PT_VOL_BATCH_K", 8))


def sample_distance(vol: VolumeGrid, keys, depth, o, d, t_max, active):
    """Delta-tracking free-flight sampling inside the grid (batched).

    Returns ``(event, t_event, u_phase)``: a bool (R,) marking lanes
    whose next vertex is an in-medium scatter event (before any surface
    hit at ``t_max``), the event distance, and two phase-sampling
    uniforms drawn from the same per-(ray, bounce) stream (round index
    past every in-walk draw by construction). The standard
    delta-tracking estimator at the per-ray rate from ``_ray_rate``:
    event lanes carry weight ``albedo`` (analog absorption folded in),
    pass-through lanes weight 1 — both exact, matching the
    homogeneous-fog distance sampler.
    """
    t0, t1 = _ray_box(o, d, vol.bbox_min, vol.bbox_max)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    sig_scale = vol.sigma_s + vol.sigma_a
    k_vol = jax.vmap(
        lambda k, dp: rng.stream_key(k, dp, rng.STREAM_VOL)
    )(keys, depth)

    r = o.shape[0]
    live0 = active & (t0 < t1)
    rate, inv_rate = _ray_rate(vol, o, d, t0, t1)
    live0 = live0 & (rate > 0.0)
    n_rounds = -(-vol.n_steps // _BATCH_K)

    def cond(carry):
        i, _, _, live, _ = carry
        return (i < n_rounds) & jnp.any(live)

    def body(carry):
        i, t, t_evt, live, event = carry
        u = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, i), (_BATCH_K, 2),
                dtype=jnp.float32)
        )(k_vol)                                       # (R, K, 2)
        flights = _flight(u[..., 0], inv_rate[:, None])
        ts = t[:, None] + jnp.cumsum(flights, axis=1)  # (R, K)
        xs = o[:, None, :] + ts[..., None] * d[:, None, :]
        dens = density_at(vol, xs.reshape(r * _BATCH_K, 3)) \
            .reshape(r, _BATCH_K)
        p_real = dens * sig_scale * inv_rate[:, None]
        inside = ts < t1[:, None]
        accept = inside & (u[..., 1] < p_real)
        any_acc = jnp.any(accept, axis=1)
        first = jnp.argmax(accept, axis=1)             # first True
        t_hit = jnp.take_along_axis(ts, first[:, None], axis=1)[:, 0]
        hit = live & any_acc
        t_evt = jnp.where(hit, t_hit, t_evt)
        event = event | hit
        t = jnp.where(live, ts[:, -1], t)
        live = live & jnp.logical_not(any_acc) & (ts[:, -1] < t1)
        return i + 1, t, t_evt, live, event

    _, _, t_evt, _, event = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), t0, t1, live0, jnp.zeros(r, bool)),
    )
    t_out = jnp.where(event, t_evt, t1)
    u_phase = jax.vmap(
        lambda k: jax.random.uniform(
            jax.random.fold_in(k, n_rounds), (2,), dtype=jnp.float32
        )
    )(k_vol)
    return event, t_out, u_phase


def sample_distance_seq(vol: VolumeGrid, keys, depth, o, d, t_max,
                        active):
    """Sequential per-cell delta-tracking walk (the pre-r5f
    implementation; regular/delta-tracking hybrid over the coarse
    cells). Kept for the walk ledger (benchmarks/probe_volume.py) and
    estimator cross-checks — production uses the batched
    ``sample_distance``. Same estimator, different RNG stream layout.
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

    Unbiased estimator of exp(-integral sigma_t): exponential flights
    at the per-ray rate (``_ray_rate``), multiplying
    ``1 - sigma_t(x)/rate`` per collision until the walk exits the
    clipped segment — batched K flights per round with one fused
    density gather (module docstring / PERF.md r5f). Ratio tracking
    has NO data-dependent branch inside a round (every collision
    contributes a factor), so batching is exact. ``salt`` keeps the
    per-bounce NEE arms (area / env / delta) on disjoint streams.
    """
    t0, t1 = _ray_box(o, d, vol.bbox_min, vol.bbox_max)
    t0 = jnp.maximum(t0, 0.0)
    t1 = jnp.minimum(t1, t_max)
    sig_scale = vol.sigma_s + vol.sigma_a
    k_t = jax.vmap(
        lambda k, dp: jax.random.fold_in(
            rng.stream_key(k, dp, rng.STREAM_VOLT), salt
        )
    )(keys, depth)

    r = o.shape[0]
    rate, inv_rate = _ray_rate(vol, o, d, t0, t1)
    live0 = (t0 < t1) & (rate > 0.0)
    n_rounds = -(-vol.n_steps // _BATCH_K)

    def cond(carry):
        i, _, _, live = carry
        return (i < n_rounds) & jnp.any(live)

    def body(carry):
        i, t, trans, live = carry
        u = jax.vmap(
            lambda k: jax.random.uniform(
                jax.random.fold_in(k, i), (_BATCH_K,),
                dtype=jnp.float32)
        )(k_t)                                         # (R, K)
        flights = _flight(u, inv_rate[:, None])
        ts = t[:, None] + jnp.cumsum(flights, axis=1)  # (R, K)
        xs = o[:, None, :] + ts[..., None] * d[:, None, :]
        dens = density_at(vol, xs.reshape(r * _BATCH_K, 3)) \
            .reshape(r, _BATCH_K)
        ratio = jnp.maximum(
            1.0 - dens * sig_scale * inv_rate[:, None], 0.0
        )
        counts = live[:, None] & (ts < t1[:, None])
        trans = trans * jnp.prod(jnp.where(counts, ratio, 1.0), axis=1)
        t = jnp.where(live, ts[:, -1], t)
        live = live & (ts[:, -1] < t1) & (trans > 0.0)
        return i + 1, t, trans, live

    _, _, trans, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, jnp.ones(r, jnp.float32), live0)
    )
    return trans


def transmittance_seq(vol: VolumeGrid, keys, depth, o, d, t_max, salt):
    """Sequential per-cell ratio-tracking walk (pre-r5f; see
    ``sample_distance_seq`` for why it is kept)."""
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
