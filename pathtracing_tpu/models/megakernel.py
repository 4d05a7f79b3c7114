"""Megakernel path-tracing integrator: one fused jit over all bounces.

This is the flagship single-pass engine. Where a GPU megakernel suffers from
warp divergence, on TPU the whole bounce loop is a ``lax.fori_loop`` of
branchless VPU work over the full ray batch — XLA fuses ray-gen, traversal,
shading, and accumulation into one executable with zero host round-trips
(the reference needs 3 CPU↔GPU submissions per frame, SURVEY.md §3.2; we
need 0 per step). The wavefront engine (``models.wavefront``) restructures
this loop with compaction for deep-bounce workloads.

Radiance estimator: forward path tracing with emissive-surface lighting,
cosine-weighted BSDF importance sampling, and Russian roulette from
``rr_start_depth``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pathtracing_tpu.models import shading
from pathtracing_tpu.utils.config import RenderConfig

# Back-compat re-export; the implementation moved to models.shading.
background_radiance = shading.background_radiance

# Ceiling on rays per bounce wave. XLA lays several of the bounce loop's
# (N, 1..5) per-ray temporaries out as T(8,128) tiles — a 128x padding
# expansion that reaches ~1 GB per temporary at a full 1080p wave
# (2.07M rays) and overflows the 16 GB HBM. Rows are chunked so one
# wave stays under this many rays (~128 MB per padded temp); per-pixel
# results are bitwise identical (global pixel/sample ids, no cross-ray
# coupling in the bounce).
MAX_WAVE_RAYS = 1 << 18

# Depths at which the sample's surviving paths are compacted live-first
# (one stable 2-bin counting-sort permutation of the per-path state per
# listed depth). Deep waves run at ~37% occupancy with dead lanes
# SCATTERED — every 128-ray traversal tile still walks its full cluster
# footprint (measured: marginal deep-wave rate 1.39 Mrays/s vs 3.2 on a
# live bounce wave; a traversal-stub probe puts the whole engine/shading
# machinery at ~9 ms/wave, so traversal is ~94% of a step). Grouping
# dead lanes into all-dead tiles lets those tiles short-circuit at
# ~phase1 cost. A second/third compaction measured NET SLOWER (each
# extra permutation costs ~40 ms and deep live tiles are intrinsically
# incoherent — PERF.md r2d), so one depth ships; the machinery accepts
# several. Survivors keep image order (stable sort) and the composed
# inverse takes at sample end restore pixel order exactly — per-path
# results are bitwise unchanged (pure reordering; each ray's traversal
# result is tile-independent).
COMPACT_DEPTHS = (3,)


def render_samples(scene, camera, config: RenderConfig, sample_start,
                   n_samples: int, seed, row_start=0, block_rows=None,
                   sample_stride: int = 1, rows=None,
                   rows_sample_start=None, pixels=None,
                   pixels_sample_start=None):
    """Sum of ``n_samples`` radiance samples per pixel over an image block.

    Returns shape (block_rows, W, 3) — by default the full (H, W, 3) image.

    ``sample_start`` is the global sample counter (traced scalar) so
    progressive steps continue the exact RNG sequence; ``n_samples`` is
    static (a `lax.scan` over samples, each a full vmapped bounce loop over
    the block's pixels).

    Sharding hooks (used by ``parallel.render``): ``row_start`` (traced)
    selects an image-row block, ``sample_stride`` (static) makes this
    instance compute global sample indices ``sample_start + i*stride`` —
    pixel ids and sample ids stay *global*, so any (tiles × samples)
    sharding reproduces the single-chip image bit for bit.

    Scattered-rows mode (the adaptive scheduler's fused wave): ``rows``
    ((R,) i32, traced) names arbitrary image rows and
    ``rows_sample_start`` ((R,) i32) gives each row its OWN sample
    counter; the return is (len(rows), W, 3) in ``rows`` order. Pixel
    and sample ids stay global per ray, so a pixel's k-th sample is
    bit-identical to every other engine's k-th sample regardless of the
    schedule that requested it — K scheduler-picked bands render as ONE
    dense wave (each 128-ray traversal tile still sits inside a single
    image row, so DNF tile coherence is unchanged) instead of K small
    serialized waves. The contiguous-block args are ignored in this
    mode; the default mode's jit graph is untouched (Python branch).

    Scattered-pixels mode (the tile-granular adaptive scheduler):
    ``pixels`` ((R,) i32, traced) names arbitrary global pixel ids with
    per-ray counters ``pixels_sample_start``; the return is (R, 3) in
    ``pixels`` order. The same RNG-identity contract holds; traversal
    tiles now mix whichever pixels the scheduler packed together, so
    coherence is the SCHEDULER's responsibility (compact 2D tiles keep
    it — models/adaptive.py tile mode).
    """
    h, w = config.height, config.width
    if pixels is not None:
        return _render_pixels(scene, camera, config, pixels,
                              pixels_sample_start, n_samples, seed,
                              sample_stride)
    if rows is not None:
        return _render_rows(scene, camera, config, rows,
                            rows_sample_start, n_samples, seed,
                            sample_stride)
    block_rows = h if block_rows is None else block_rows
    # Row chunking: largest divisor of block_rows whose wave fits
    # MAX_WAVE_RAYS (full block when it already fits). When block_rows
    # has no decent divisor under the cap (e.g. a prime band height from
    # tiled/multichip splits would degrade to thousands of serial 1-row
    # chunks — ADVICE r2), fall back to ceil-splitting at the cap with a
    # padded last chunk: padded rows compute global pixel ids past the
    # block and are sliced off, so real-pixel results stay bitwise
    # identical to the unchunked render.
    chunk_rows = block_rows
    n_chunks, tail_pad = 1, 0
    if block_rows * w > MAX_WAVE_RAYS:
        cap = max(1, MAX_WAVE_RAYS // w)
        divisor = max(c for c in range(1, cap + 1)
                      if block_rows % c == 0)
        chunk_rows = divisor if 2 * divisor >= cap else cap
        n_chunks = -(-block_rows // chunk_rows)
        tail_pad = n_chunks * chunk_rows - block_rows
    dys, xs = jnp.mgrid[0:chunk_rows, 0:w]
    n_rays = chunk_rows * w
    traversal = config.resolve_traversal(scene)

    def one_sample(carry, sample_ofs):
        accum = carry
        sample_idx = sample_start + sample_ofs * sample_stride

        def chunk_radiance(row0):
            pixel_index = ((dys + row0) * w + xs).reshape(-1)
            radiance = _trace_pixels(scene, camera, config, traversal,
                                     pixel_index, sample_idx, seed)
            return radiance.reshape(chunk_rows, w, 3)

        if n_chunks == 1:
            radiance = chunk_radiance(row_start)
        else:
            radiance = jax.lax.map(
                chunk_radiance,
                row_start + chunk_rows * jnp.arange(n_chunks, dtype=jnp.int32),
            ).reshape(n_chunks * chunk_rows, w, 3)
            if tail_pad:
                radiance = radiance[:block_rows]
        if config.clamp > 0.0:
            radiance = jnp.minimum(radiance, config.clamp)
        return accum + radiance, None

    accum0 = jnp.zeros((block_rows, w, 3), jnp.float32)
    accum, _ = jax.lax.scan(
        one_sample, accum0, jnp.arange(n_samples, dtype=jnp.int32)
    )
    return accum


def _trace_pixels(scene, camera, config: RenderConfig, traversal: str,
                  pixel_index, sample_idx, seed):
    """Per-path radiance ((R, 3)) for one wave of global pixel ids —
    the shared RNG-identity core of every ``render_samples`` mode.
    ``sample_idx`` is a traced scalar (uniform block waves) or an (R,)
    i32 array (the scattered-rows mode, each ray at its own global
    sample counter); both forms draw identical per-(pixel, sample)
    streams, so every schedule computes bit-identical path estimates.
    """
    from pathtracing_tpu.models import scene as scene_mod
    from pathtracing_tpu.ops import binning

    n_rays = pixel_index.shape[0]
    per_ray = getattr(sample_idx, "ndim", 0) == 1

    def vm(f):
        if per_ray:
            return jax.vmap(f)(pixel_index, sample_idx)
        return jax.vmap(lambda p: f(p, sample_idx))(pixel_index)

    keys, origin, direction = vm(
        lambda p, s: shading.camera_sample(camera, config, seed, p, s)
    )
    if config.sampler == "ld":
        # First-vertex stratified pairs, computed ONCE per
        # sample (the Halton radical inverses are loop-invariant
        # — computing them inside the bounce loop measured ~6%
        # of a step).
        from pathtracing_tpu.ops import rng as rng_ops

        def pairs(tag):
            a, b = vm(lambda p, s: rng_ops.ld_pair(seed, p, s, tag))
            return jnp.stack([a, b], axis=-1)

        pick = vm(
            lambda p, s: rng_ops.ld_scalar(seed, p, s,
                                           rng_ops.STREAM_NEE)
        )[:, None]
        ld_nee = jnp.concatenate(
            [pick, pairs(rng_ops.STREAM_NEE)], axis=1
        )
        ld_scatter = pairs(rng_ops.STREAM_SCATTER)
    else:
        ld_nee = ld_scatter = None

    times = None
    if scene_mod.has_motion(scene):
        # Object motion blur: the per-path shutter time, drawn
        # from the SAME stream camera_sample uses for camera
        # motion — rigid camera+object motion stays consistent.
        from pathtracing_tpu.ops import rng as rng_ops

        if config.sampler == "ld":
            times = vm(
                lambda p, s: rng_ops.ld_scalar(
                    seed, p, s, rng_ops.STREAM_TIME
                )
            )
        else:
            times = vm(
                lambda p, s: jax.random.uniform(
                    rng_ops.stream_key(
                        rng_ops.pixel_sample_key(seed, p, s),
                        0, rng_ops.STREAM_TIME,
                    ), (), dtype=jnp.float32,
                )
            )

    has_media = scene.mat_absorb is not None
    has_sss = scene.mat_interior is not None
    has_mips = scene_mod.uses_mips(scene)
    spread = (shading.cone_spread_of(camera, config)
              if has_mips else None)

    def make_bounce(ks, ldn, lds, tm):
        def bounce(depth, state):
            # With media the state carries the per-path interior
            # absorption coefficient as a trailing element
            # (absorption-free scenes keep the 7-tuple and the
            # exact pre-media jit graph); the interior-scattering
            # row and the ray cone's accumulated distance follow it.
            radiance, throughput, o, d, active, pdf, pdiff = \
                state[:7]
            rest = 7
            med = state[rest] if has_media else None
            rest += 1 if has_media else 0
            ss = state[rest] if has_sss else None
            rest += 1 if has_sss else 0
            cn = state[rest] if has_mips else None
            return shading.bounce_batch(
                scene, o, d, ks, depth, radiance, throughput,
                active, config.rr_start_depth, config.background,
                traversal, nee=config.nee, prev_pdf=pdf,
                prev_nee=pdiff, bin_rays=config.ray_sort,
                ld_nee=ldn, ld_scatter=lds, medium=med, sss=ss,
                time=tm, cone=cn, cone_spread=spread,
                nee_candidates=config.nee_candidates,
            )
        return bounce

    init = (
        jnp.zeros((n_rays, 3), jnp.float32),
        jnp.ones((n_rays, 3), jnp.float32),
        origin,
        direction,
        jnp.ones(n_rays, jnp.bool_),
        jnp.zeros(n_rays, jnp.float32),
        jnp.zeros(n_rays, jnp.bool_),
    )
    if has_media:
        init = init + (jnp.zeros((n_rays, 3), jnp.float32),)
    if has_sss:
        init = init + (jnp.zeros((n_rays, 2), jnp.float32),)
    if has_mips:
        init = init + (jnp.zeros(n_rays, jnp.float32),)
    # Live-first compaction pays only when several deep waves
    # follow it AND the waves actually run through a DNF kernel
    # (the tree kernels' octant sort already groups dead rays;
    # the vmapped BVH walk has no tile footprint to help) — so
    # gate on the resolved traversal, not just the scene shape.
    # Each listed depth gets its own permutation; the inverse
    # takes compose (innermost-last) to restore pixel order.
    dnf_route = (scene_mod.uses_dnf(scene) and traversal in
                 ("cluster_pallas", "cluster_interpret"))
    depths = [d for d in sorted(COMPACT_DEPTHS)
              if dnf_route and config.max_depth >= d + 2]
    state, ks, start = init, keys, 0
    ldn, lds, tm = ld_nee, ld_scatter, times
    invs = []
    for d in depths:
        state = jax.lax.fori_loop(start, d,
                                  make_bounce(ks, ldn, lds, tm),
                                  state)
        perm, inv = binning.binning_perm(
            jnp.where(state[4], 0, 1).astype(jnp.int32), 2
        )
        state = tuple(a[perm] for a in state)
        ks = ks[perm]
        if ldn is not None:
            ldn, lds = ldn[perm], lds[perm]
        if tm is not None:
            tm = tm[perm]
        invs.append(inv)
        start = d
    radiance, *_ = jax.lax.fori_loop(
        start, config.max_depth, make_bounce(ks, ldn, lds, tm),
        state
    )
    for inv in reversed(invs):
        radiance = radiance[inv]
    return radiance


def _render_rows(scene, camera, config: RenderConfig, rows,
                 rows_sample_start, n_samples: int, seed,
                 sample_stride: int):
    """Scattered-rows wave (``render_samples(rows=...)`` docs): K
    scheduler-picked image rows render as ONE dense wave with per-row
    sample counters. Oversized waves chunk at MAX_WAVE_RAYS like the
    block mode (tail chunks pad with row 0 at sample 0; the padded
    results are sliced off, so real-row results are bitwise unchanged).
    """
    w = config.width
    n_rows = rows.shape[0]
    if rows_sample_start is None:
        raise ValueError("rows mode needs rows_sample_start")
    traversal = config.resolve_traversal(scene)

    chunk_rows = n_rows
    n_chunks, tail_pad = 1, 0
    if n_rows * w > MAX_WAVE_RAYS:
        cap = max(1, MAX_WAVE_RAYS // w)
        divisor = max(c for c in range(1, cap + 1) if n_rows % c == 0)
        chunk_rows = divisor if 2 * divisor >= cap else cap
        n_chunks = -(-n_rows // chunk_rows)
        tail_pad = n_chunks * chunk_rows - n_rows
        if tail_pad:
            rows = jnp.concatenate(
                [rows, jnp.zeros(tail_pad, jnp.int32)]
            )
            rows_sample_start = jnp.concatenate(
                [rows_sample_start, jnp.zeros(tail_pad, jnp.int32)]
            )
    xs = jnp.arange(w, dtype=jnp.int32)

    def one_sample(carry, sample_ofs):
        accum = carry

        def chunk_radiance(chunk):
            row_c, ss_c = chunk
            pixel_index = (row_c[:, None] * w + xs[None, :]).reshape(-1)
            sample_idx = jnp.repeat(
                ss_c + sample_ofs * sample_stride, w
            )
            radiance = _trace_pixels(scene, camera, config, traversal,
                                     pixel_index, sample_idx, seed)
            return radiance.reshape(chunk_rows, w, 3)

        if n_chunks == 1:
            radiance = chunk_radiance((rows, rows_sample_start))
        else:
            radiance = jax.lax.map(
                chunk_radiance,
                (rows.reshape(n_chunks, chunk_rows),
                 rows_sample_start.reshape(n_chunks, chunk_rows)),
            ).reshape(n_chunks * chunk_rows, w, 3)
            if tail_pad:
                radiance = radiance[:n_rows]
        if config.clamp > 0.0:
            radiance = jnp.minimum(radiance, config.clamp)
        return accum + radiance, None

    accum0 = jnp.zeros((n_rows, w, 3), jnp.float32)
    accum, _ = jax.lax.scan(
        one_sample, accum0, jnp.arange(n_samples, dtype=jnp.int32)
    )
    return accum


def _render_pixels(scene, camera, config: RenderConfig, pixels,
                   pixels_sample_start, n_samples: int, seed,
                   sample_stride: int):
    """Scattered-pixels wave (``render_samples(pixels=...)`` docs):
    R scheduler-picked global pixel ids render as ONE dense wave with
    per-ray sample counters. Oversized waves chunk at MAX_WAVE_RAYS
    (tail chunks pad with pixel 0 at sample 0 and the padded results
    are sliced off, so real-pixel results are bitwise unchanged)."""
    if pixels_sample_start is None:
        raise ValueError("pixels mode needs pixels_sample_start")
    n_pix = pixels.shape[0]
    traversal = config.resolve_traversal(scene)

    chunk_pix = n_pix
    n_chunks, tail_pad = 1, 0
    if n_pix > MAX_WAVE_RAYS:
        divisor = max(c for c in range(1, MAX_WAVE_RAYS + 1)
                      if n_pix % c == 0)
        chunk_pix = (divisor if 2 * divisor >= MAX_WAVE_RAYS
                     else MAX_WAVE_RAYS)
        n_chunks = -(-n_pix // chunk_pix)
        tail_pad = n_chunks * chunk_pix - n_pix
        if tail_pad:
            pixels = jnp.concatenate(
                [pixels, jnp.zeros(tail_pad, jnp.int32)]
            )
            pixels_sample_start = jnp.concatenate(
                [pixels_sample_start, jnp.zeros(tail_pad, jnp.int32)]
            )

    def one_sample(carry, sample_ofs):
        accum = carry

        def chunk_radiance(chunk):
            pix_c, ss_c = chunk
            return _trace_pixels(scene, camera, config, traversal,
                                 pix_c,
                                 ss_c + sample_ofs * sample_stride,
                                 seed)

        if n_chunks == 1:
            radiance = chunk_radiance((pixels, pixels_sample_start))
        else:
            radiance = jax.lax.map(
                chunk_radiance,
                (pixels.reshape(n_chunks, chunk_pix),
                 pixels_sample_start.reshape(n_chunks, chunk_pix)),
            ).reshape(n_chunks * chunk_pix, 3)
            if tail_pad:
                radiance = radiance[:n_pix]
        if config.clamp > 0.0:
            radiance = jnp.minimum(radiance, config.clamp)
        return accum + radiance, None

    accum0 = jnp.zeros((n_pix, 3), jnp.float32)
    accum, _ = jax.lax.scan(
        one_sample, accum0, jnp.arange(n_samples, dtype=jnp.int32)
    )
    return accum
