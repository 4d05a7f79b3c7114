"""Temporal reuse across frames: reprojection + history accumulation.

The reference renders every frame of its continuous windowed loop from
scratch (`/root/reference/RayTracing/App.cs:39-42` → one full dispatch
per frame, `Renderer.cs:1006-1040`) — frame-to-frame coherence is the
performance opportunity it never took. This module takes it for orbit /
animation sequences: each new low-spp frame is blended with the
previous frames' accumulated history, REPROJECTED through the camera
motion, giving converged-looking sequences at a fraction of the
per-frame sample budget (the temporal half of the SVGF family; the
spatial half is the guided à-trous denoiser in ``ops/denoise.py`` and
composes downstream of this blend).

TPU-native shape: the whole step is one jitted function of pure array
math — a feature pass (one batched closest-hit query for primary
depth/normal), one ``ops.camera.project`` of the hit points into the
PREVIOUS camera, a bilinear gather of the history buffers (XLA gathers
are fine, PERF.md round-1 fact #1), a branchless disocclusion test
(depth + normal + bounds consistency), and a running-mean blend with a
per-pixel history length. No host round trips; the state is a small
donated pytree like ``progressive.RenderState``.

Estimator note: temporal blending is BIASED during motion (history
samples come from slightly different shading points); the history cap
bounds that staleness, and rejected pixels fall back to the unbiased
current frame. This is the industry-standard TAA/SVGF trade, applied
to offline sequences for wall-clock, not to single converged stills.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import scene as scene_mod
from pathtracing_tpu.ops import camera as camera_ops
from pathtracing_tpu.utils.config import RenderConfig

# Default history cap: at most this many frames of history blend into a
# pixel (effective spp = cap × per-frame spp). Higher = smoother but
# more motion staleness; 16 is the common TAA operating point.
HISTORY_CAP = 16.0


class TemporalState(NamedTuple):
    """History buffers carried across frames (all (H, W[, ...]) f32)."""

    history: jnp.ndarray   # (H, W, 3) — mean radiance of blended frames
    hist_len: jnp.ndarray  # (H, W) — effective frames accumulated
    depth: jnp.ndarray     # (H, W) — cam_depth of the primary hit
    normal: jnp.ndarray    # (H, W, 3) — primary shading normal
    valid: jnp.ndarray     # (H, W) bool — primary hit exists
    mat: jnp.ndarray       # (H, W) i32 — primary material id (-1 = miss)


def init_state(config: RenderConfig) -> TemporalState:
    h, w = config.height, config.width
    return TemporalState(
        history=jnp.zeros((h, w, 3), jnp.float32),
        hist_len=jnp.zeros((h, w), jnp.float32),
        depth=jnp.zeros((h, w), jnp.float32),
        normal=jnp.zeros((h, w, 3), jnp.float32),
        valid=jnp.zeros((h, w), jnp.bool_),
        mat=jnp.full((h, w), -1, jnp.int32),
    )


def _center_rays(camera, config: RenderConfig):
    """Deterministic pixel-center primary rays (no jitter, no lens) —
    the feature-pass geometry, matching ``shading.camera_sample``'s
    film mapping (x left→right, film t bottom→top, row 0 at top)."""
    h, w = config.height, config.width
    pix = jnp.arange(h * w, dtype=jnp.int32)
    x = (pix % w).astype(jnp.float32)
    y = (h - 1 - pix // w).astype(jnp.float32)
    s = (x + 0.5) / w
    t = (y + 0.5) / h
    import dataclasses

    zeros = jnp.zeros_like(s)
    cam = camera_ops.resolve(camera)
    # Lens-center rays: the sharp pinhole mapping project() inverts.
    cam = dataclasses.replace(cam, lens_radius=jnp.float32(0.0))
    o, d = camera_ops.generate_ray(cam, s, t, zeros, zeros)
    return o, d


@functools.partial(jax.jit, static_argnames=("config",))
def features(scene, camera, config: RenderConfig):
    """Primary-visibility feature buffers for reprojection: world
    position, camera depth, shading normal, and hit validity — one
    batched closest-hit query (the AOV machinery's shape)."""
    h, w = config.height, config.width
    o, d = _center_rays(camera, config)
    hit = scene_mod.intersect_batch(
        scene, o, d, config.resolve_traversal(scene)
    )
    normal = hit.normal
    if scene.attr_shn is not None:
        s_normal, _ = scene_mod.surface_attributes(scene, hit)
        normal = s_normal
    # Misses can carry inf/NaN sentinels in the hit record; zero them so
    # a bilinear history gather adjacent to a miss stays finite.
    normal = jnp.where(hit.valid[:, None], normal, 0.0)
    # Misses park at the camera origin with depth 0 (never accepted —
    # the validity mask gates them) so no 3e38 sentinel can overflow
    # into the depth compares or bilinear gathers.
    pos = jnp.where(hit.valid[:, None], o + hit.t[:, None] * d, o)
    cam = camera_ops.resolve(camera)
    depth = jnp.where(hit.valid, camera_ops.cam_depth(cam, pos), 0.0)
    # Specular-primary mask: mirror-like vertices carry VIEW-DEPENDENT
    # radiance, so their history is stale the moment the camera moves —
    # measured on cornell_bsdf orbits (mirror + glass spheres), naive
    # reuse GHOSTS hard enough to lose to no-reuse (temporal RMSE 0.44
    # vs raw 0.33 at 4 spp / 4°/frame). ``advance`` clamps their
    # history length instead of rejecting outright: bounded staleness,
    # still a few frames of variance win. Diffuse/rough surfaces are
    # view-independent(-ish) and keep the full cap.
    from pathtracing_tpu.ops import materials

    mtype, _, par, _ = materials.gather(scene.material_table, hit.mat_id)
    spec = (
        (mtype == materials.TYPE_DIELECTRIC)
        | (mtype == materials.TYPE_ROUGH_DIELECTRIC)
        | ((mtype == materials.TYPE_METAL) & (par < 0.25))
        | ((mtype == materials.TYPE_GGX) & (par < 0.2))
        | ((mtype == materials.TYPE_PRINCIPLED) & (par < 0.2))
    ) & hit.valid
    # Emitter-edge band: pixels whose primary is emissive, DILATED one
    # pixel. A partial-coverage pixel at a light's silhouette (center
    # ray hits the wall behind, pixel area covers the emitter) carries
    # radiance dominated by the emitter fraction, which sweeps with the
    # camera — long history lags it by design (the mat-id taps can't
    # see sub-pixel coverage). Measured on cornell_bsdf orbits: ~100
    # edge pixels carried 65% of the 16-frame sequence MSE. The dilated
    # band gets the short spec cap; everything else keeps the full cap.
    emis = ((mtype == materials.TYPE_EMISSIVE) & hit.valid).reshape(h, w)
    emis_band = emis
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy or dx:
                emis_band = emis_band | jnp.roll(emis, (dy, dx), (0, 1))
    mat = jnp.where(hit.valid, hit.mat_id, -1)
    return (pos.reshape(h, w, 3), depth.reshape(h, w),
            normal.reshape(h, w, 3), hit.valid.reshape(h, w),
            spec.reshape(h, w), emis_band, mat.reshape(h, w))


@functools.partial(
    jax.jit,
    static_argnames=("config",),
    donate_argnames=("state",),
)
def advance(state: TemporalState, cur_img, scene, camera, cam_prev,
            config: RenderConfig, depth_tol: float = 0.05,
            normal_tol: float = 0.7, cap: float = HISTORY_CAP,
            spec_cap: float = 3.0) -> Tuple[jnp.ndarray, TemporalState]:
    """Blend one new frame into the reprojected history.

    ``cur_img`` ((H, W, 3), mean radiance of this frame's spp) was
    rendered with ``camera``; ``cam_prev`` is the PREVIOUS frame's pose
    (pass the current one for frame 0 — empty history blends to the
    current frame regardless). Returns (display image, new state).

    Acceptance is per bilinear TAP (the SVGF-style bilateral gather):
    each of the 4 history texels under the reprojected footprint is
    weighted by its bilinear weight ONLY if that texel individually was
    valid, depth-consistent (relative ``depth_tol`` against the point's
    distance in the previous camera), normal-consistent (cosine >=
    ``normal_tol``) and on the SAME primary material. Plain bilinear
    gathering instead smears history across boundaries the depth/normal
    test cannot see — the measured blow-up is a ceiling-plane emitter
    (cornell_bsdf's light quad: same plane, same normal as the ceiling)
    bleeding radiance-15 texels into radiance-0.7 neighbors for a
    100-pixel ghost carrying 80% of the sequence MSE. The mat-id plane
    makes that boundary visible; per-tap weights renormalize so partial
    footprints keep their valid taps. Pixels with no surviving tap
    restart history at the current frame — disocclusions and
    silhouettes stay crisp while smooth regions accumulate to ``cap``
    frames of effective history. Specular primaries (mirror metal /
    glass / low-roughness lobes, see ``features``) clamp to
    ``spec_cap`` frames: their radiance is view-dependent, so unbounded
    history ghosts under camera motion (measured worse than NO reuse on
    cornell_bsdf orbits); a short cap bounds the staleness at a still-
    useful variance win.
    """
    h, w = config.height, config.width
    pos, depth_c, normal_c, valid_c, spec_c, emis_band, mat_c = features(
        scene, camera, config
    )

    prev = camera_ops.resolve(cam_prev)
    s, t, in_front = camera_ops.project(prev, pos.reshape(-1, 3))
    s = s.reshape(h, w)
    t = t.reshape(h, w)
    in_front = in_front.reshape(h, w)
    # Film -> pixel coords (the _center_rays mapping inverted).
    xf = s * w - 0.5
    yf = (h - 0.5) - t * h
    # Full film extent (pixel centers sit at integers; the film edge is
    # half a pixel beyond) — edge pixels self-reproject to exactly 0.0
    # minus fp eps, which a [0, n-1] test would spuriously reject.
    in_bounds = (
        (xf > -0.5) & (xf < w - 0.5) & (yf > -0.5) & (yf < h - 0.5)
    )

    # Depth consistency target: the point's distance in the PREVIOUS
    # camera vs what the previous frame stored at each tap.
    d_expect = camera_ops.cam_depth(prev, pos.reshape(-1, 3)).reshape(h, w)

    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    fx = xf - x0
    fy = yf - y0

    hist_acc = jnp.zeros((h, w, 3), jnp.float32)
    len_acc = jnp.zeros((h, w), jnp.float32)
    w_acc = jnp.zeros((h, w), jnp.float32)
    for dy, dx, bw in ((0.0, 0.0, (1 - fx) * (1 - fy)),
                       (0.0, 1.0, fx * (1 - fy)),
                       (1.0, 0.0, (1 - fx) * fy),
                       (1.0, 1.0, fx * fy)):
        yi = (y0 + dy).astype(jnp.int32)
        xi = (x0 + dx).astype(jnp.int32)
        tap_in = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        nrm_t = state.normal[yc, xc]
        ok = (
            tap_in & state.valid[yc, xc]
            & (state.mat[yc, xc] == mat_c)
            & (jnp.abs(state.depth[yc, xc] - d_expect)
               < depth_tol * jnp.maximum(d_expect, 1e-3))
            & (jnp.sum(nrm_t * normal_c, axis=-1) > normal_tol)
        )
        wt = jnp.where(ok, bw, 0.0)
        hist_acc = hist_acc + state.history[yc, xc] * wt[..., None]
        len_acc = len_acc + state.hist_len[yc, xc] * wt
        w_acc = w_acc + wt

    accept = valid_c & in_front & in_bounds & (w_acc > 1e-3)
    norm = jnp.maximum(w_acc, 1e-3)[..., None]
    hist = hist_acc / norm
    n_prev = len_acc / norm[..., 0]

    cap_px = jnp.where(spec_c, jnp.minimum(cap, spec_cap), cap)
    # Emitter-silhouette band: its radiance is sub-pixel coverage of the
    # light, which SWEEPS with camera motion — no tap test can see it,
    # so shorten history by the reprojected pixel velocity: static
    # camera keeps the spec cap (coverage is constant, reuse is exact),
    # >= 1 px/frame motion drops to ~no reuse (a lagged blend measured
    # a 2x worse error than the raw frame's own shot noise there).
    px = (jnp.arange(w, dtype=jnp.float32))[None, :]
    py = (jnp.arange(h, dtype=jnp.float32))[:, None]
    motion = jnp.sqrt((xf - px) ** 2 + (yf - py) ** 2)
    emis_cap = 1.0 + (jnp.minimum(cap, spec_cap) - 1.0) / (1.0 + motion)
    cap_px = jnp.where(emis_band, jnp.minimum(cap_px, emis_cap), cap_px)
    n_eff = jnp.minimum(jnp.where(accept, n_prev, 0.0), cap_px - 1.0)
    out = (hist * n_eff[..., None] + cur_img) / (n_eff[..., None] + 1.0)
    new_len = jnp.minimum(n_eff + 1.0, cap_px)

    return out, TemporalState(
        history=out,
        hist_len=new_len,
        depth=depth_c,
        normal=normal_c,
        valid=valid_c,
        mat=mat_c,
    )
