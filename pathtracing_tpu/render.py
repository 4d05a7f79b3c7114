"""CLI entry point: ``python -m pathtracing_tpu.render``.

The reference's L3/L4 (windowed app shell + Program.cs, SURVEY.md §1) maps
to this headless driver: progressive render loop with periodic "present"
(PNG snapshot), checkpoint/resume, metrics, and optional profiling. A live
preview window is optional (matplotlib, if available) since TPU hosts are
headless.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.models.reference import render_reference
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils import checkpoint as ckpt
from pathtracing_tpu.utils import image, metrics
from pathtracing_tpu.utils import logging as ptlog
from pathtracing_tpu.utils.config import RenderConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pathtracing_tpu.render",
        description="TPU-native progressive path tracer",
    )
    p.add_argument("--scene", default="cornell_bsdf",
                   help="built-in scene (%s), 'reference' for the exact "
                        "reference kernel image (Test.hlsl parity), or a "
                        "path to a .json scene file"
                        % ", ".join(sorted(scenes.SCENES)))
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--spp", type=int, default=256, help="total samples/pixel")
    p.add_argument("--spp-per-step", type=int, default=8)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--engine", default="megakernel",
                   choices=["megakernel", "wavefront"])
    p.add_argument("--background", default="auto",
                   choices=["auto", "black", "gradient", "white"],
                   help="sky radiance for escaped rays; 'auto' (default) "
                        "uses the scene's preferred background — the "
                        "gradient sky for emitter-free outdoor scenes "
                        "(checker/sphere/glass/frosted demos, or a JSON "
                        "scene's top-level \"background\" key), black "
                        "otherwise")
    p.add_argument("--aov", default=None,
                   choices=["normal", "depth", "albedo", "mat_id"],
                   help="render a single diagnostic pass instead of the "
                        "path-traced image (the 'normal' AOV is the "
                        "reference kernel's shading generalized to any "
                        "scene, Test.hlsl:26-32)")
    p.add_argument("--aperture", type=float, default=None,
                   help="override the scene camera's aperture "
                        "(thin-lens depth of field)")
    p.add_argument("--focus-distance", type=float, default=None,
                   help="override the scene camera's focus distance")
    p.add_argument("--projection", default=None,
                   choices=["pinhole", "ortho", "fisheye", "equirect"],
                   help="override the scene camera's projection model "
                        "(equirect renders a 360x180 lat-long panorama "
                        "that ops/envmap.py can re-light scenes with)")
    p.add_argument("--motion-to", default=None, metavar="X,Y,Z",
                   help="camera motion blur: position at shutter close "
                        "(per-sample shutter times lerp the pose)")
    p.add_argument("--motion-look-to", default=None, metavar="X,Y,Z",
                   help="camera motion blur: look_at at shutter close")
    p.add_argument("--fog-sigma-s", type=float, default=0.0,
                    help="fill the scene with scattering fog: "
                         "scattering coefficient per world unit")
    p.add_argument("--fog-sigma-a", type=float, default=0.0,
                    help="fog absorption coefficient")
    p.add_argument("--fog-g", type=float, default=0.0,
                    help="fog Henyey-Greenstein anisotropy in (-1, 1)")
    p.add_argument("--nee-candidates", type=int, default=1, metavar="M",
                   help="RIS candidate count for the NEE light pick: M "
                        "power-CDF candidates resampled by unshadowed "
                        "contribution down to ONE shadow ray (default 1 "
                        "= plain power-weighted NEE; try 4-8 on "
                        "many-light scenes)")
    p.add_argument("--no-nee", action="store_true",
                   help="disable next-event estimation (direct light "
                        "sampling); brute-force path tracing only")
    p.add_argument("--traversal", default="auto",
                   choices=["auto", "bvh", "cluster_jax",
                            "cluster_pallas"],
                   help="intersection backend (auto: Pallas cluster "
                        "kernel on TPU, threaded BVH elsewhere)")
    p.add_argument("--out", default="render.png",
                   help="output path: .png (tonemapped), .ppm, or .hdr "
                        "(LINEAR Radiance RGBE — no tone curve)")
    p.add_argument("--out-hdr", default=None,
                   help="also write the linear HDR radiance (.npz with "
                        "'radiance' (H,W,3) f32 and 'spp')")
    p.add_argument("--tonemap", default="clip",
                   choices=["clip", "aces", "reinhard", "filmic"],
                   help="display transform: 'clip' (plain sRGB clamp — "
                        "the reference swapchain's behavior) or 'aces' "
                        "(filmic highlight rolloff)")
    p.add_argument("--exposure", type=float, default=1.0,
                   help="linear exposure multiplier applied before the "
                        "tone curve")
    p.add_argument("--clamp", type=float, default=0.0,
                   help="per-sample radiance clamp (firefly suppression; "
                        "0 = unbiased/off)")
    p.add_argument("--bloom", type=float, default=0.0, metavar="S",
                   help="bloom glow strength (linear-radiance additive "
                        "post-pass, ops/bloom.py; 0 disables, ~0.05-0.2 "
                        "is typical)")
    p.add_argument("--bloom-threshold", type=float, default=1.0,
                   help="luminance above which radiance blooms "
                        "(soft knee below it; default 1.0)")
    p.add_argument("--denoise", action="store_true",
                   help="edge-avoiding à-trous denoise of the final "
                        "image, guided by first-hit normal/albedo/depth "
                        "feature buffers (ops/denoise.py; ~10x effective "
                        "spp on low-spp renders)")
    p.add_argument("--denoise-iters", type=int, default=5,
                   help="à-trous iterations (dilations 1,2,4,...)")
    p.add_argument("--denoise-sigma-color", type=float, default=None,
                   help="color range sigma (default: 2.8/sqrt(spp))")
    p.add_argument("--temporal", action="store_true",
                   help="orbit sequences only: reproject and blend the "
                        "previous frames' accumulated history into each "
                        "new frame (models/temporal.py) — converged-"
                        "looking sequences at a fraction of the per-"
                        "frame spp (compose with --denoise for the "
                        "full SVGF-style pipeline)")
    p.add_argument("--temporal-cap", type=float, default=16.0,
                   help="max effective frames of blended history "
                        "(higher = smoother, more motion staleness)")
    p.add_argument("--mips", action="store_true",
                   help="rebuild the scene's texture atlas with a mip "
                        "pyramid and sample trilinearly at ray-cone LOD "
                        "(ops/texture.py; fixes minification aliasing "
                        "on textured geometry at distance)")
    p.add_argument("--snapshot-every", type=int, default=0,
                   help="write the PNG every N steps (0 = only at end)")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint file; resumes if it exists")
    p.add_argument("--tiles", type=int, default=0,
                   help="render in N independent row bands with per-band "
                        "completion tracking (resume re-renders only "
                        "missing bands)")
    p.add_argument("--inject-fault", type=int, default=None,
                   help="debug: drop band N mid-render to exercise the "
                        "tile recovery path (requires --tiles)")
    p.add_argument("--adaptive", action="store_true",
                   help="variance-driven sample allocation: per-pixel "
                        "variance scores schedule each round's rays onto "
                        "the noisiest 8x8 tiles (models/adaptive.py; the "
                        "spp budget is the uniform-equivalent total; "
                        "measured 3.1x time-to-quality on spotlight_demo, "
                        "PERF.md r4c). "
                        "With --tiles: the coarser host-driven per-tile "
                        "scheduler instead")
    p.add_argument("--adaptive-granularity", default="tiles",
                   choices=["tiles", "bands"],
                   help="adaptive scheduling unit: square tiles (default; "
                        "follows 2D-compact noise) or full row bands "
                        "(the coarser fallback — auto-selected when the "
                        "image isn't divisible by the tile size)")
    p.add_argument("--adaptive-tile", type=int, default=8,
                   help="tile edge for tile-granular adaptive scheduling "
                        "(must divide width and height)")
    p.add_argument("--adaptive-auto", type=float, default=1.5,
                   metavar="GAIN",
                   help="never-lose guard for tile-granular --adaptive: "
                        "after the warmup, if the scene's Neyman gain "
                        "bound (models/adaptive.tile_neyman_gain) is "
                        "below this threshold, the remaining budget "
                        "renders as plain uniform full-image waves "
                        "(same sample ids; no scheduler overhead on "
                        "scenes adaptive can't help). 0 disables")
    p.add_argument("--adaptive-band-rows", type=int, default=0,
                   help="rows per adaptive scheduling band (0 = auto, "
                        "largest divisor of height <= 8)")
    p.add_argument("--target-rmse", type=float, default=0.0,
                   help="render-until-quality stop for tile-granular "
                        "--adaptive: stop as soon as the live "
                        "standard-error estimate "
                        "(models/adaptive.predicted_rmse, luminance "
                        "RMSE vs converged) reaches this value; "
                        "--spp becomes a budget cap. 0 disables")
    p.add_argument("--adaptive-k", type=int, default=0,
                   help="tiles/bands re-sampled per adaptive round "
                        "(0 = auto, 1/8 of the units)")
    p.add_argument("--checkpoint-every", type=int, default=8,
                   help="checkpoint every N steps")
    p.add_argument("--metrics-jsonl", default=None)
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace into this directory")
    p.add_argument("--orbit", type=int, default=0,
                   help="turntable mode: render N frames orbiting the "
                        "scene's look-at point (the frame-loop analogue "
                        "of the reference's windowed render loop, "
                        "App.cs:39-42 — one compile, N camera frames); "
                        "writes <out>_0000.png .. <out>_NNNN.png")
    p.add_argument("--orbit-degrees", type=float, default=360.0,
                   help="arc swept by --orbit, centered on the scene "
                        "camera's position (default 360 = full turn; "
                        "use a partial arc for interior scenes like the "
                        "Cornell box, whose outside is black)")
    p.add_argument("--preview", action="store_true",
                   help="live preview via matplotlib (if installed)")
    p.add_argument("--preview-scale", type=int, default=0, metavar="F",
                   help="preview downsample factor (device-side mean "
                        "pool; 0 = auto: longest side <= ~480 px)")
    p.add_argument("--preview-every", type=int, default=1, metavar="N",
                   help="update the preview every N steps (default 1)")
    p.add_argument("--debug", action="store_true",
                   help="enable NaN checking (reference DEBUG-validation "
                        "analogue)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = ptlog.get_logger()

    if args.debug:
        jax.config.update("jax_debug_nans", True)
        ptlog.log_information("debug mode: NaN checking enabled")

    ptlog.log_information(
        "devices: %s", ", ".join(str(d) for d in jax.devices())
    )

    if args.scene == "reference":
        img = render_reference(args.height, args.width)
        image.write_image(args.out, np.asarray(img)[..., :3])
        ptlog.log_information("wrote reference-parity image to %s", args.out)
        return 0

    if args.scene.endswith(".json"):
        from pathtracing_tpu.models import scene_io

        try:
            scene, cam_cfg = scene_io.load_scene(args.scene)
            scene_bg = scene_io.preferred_background(args.scene)
        except (OSError, ValueError, KeyError) as e:
            ptlog.log_critical("failed to load scene %s: %s", args.scene, e)
            return 2
    elif args.scene.endswith((".gltf", ".glb", ".obj")):
        try:
            if args.scene.endswith(".obj"):
                from pathtracing_tpu.models import obj_mtl

                scene, cam_cfg = obj_mtl.load_obj_scene(args.scene)
            else:
                from pathtracing_tpu.models import gltf as gltf_io

                scene, cam_cfg = gltf_io.load_gltf(args.scene)
        except (OSError, ValueError, KeyError) as e:
            ptlog.log_critical("failed to load scene %s: %s", args.scene, e)
            return 2
        # Assets with no emitter of any kind need a sky to be visible.
        has_light = (float(scene.lights.total_power) > 0.0
                     or scene.delta is not None or scene.env is not None)
        scene_bg = "black" if has_light else "gradient"
    else:
        try:
            scene, cam_cfg = scenes.get_scene(args.scene)
            scene_bg = scenes.preferred_background(args.scene)
        except KeyError as e:
            ptlog.log_critical("%s", e.args[0])
            return 2
    if args.mips and scene.textures is not None:
        from pathtracing_tpu.ops import texture as texture_ops

        scene = scene._replace(
            textures=texture_ops.add_mips(scene.textures)
        )
    background = scene_bg if args.background == "auto" else args.background
    config = RenderConfig(
        width=args.width, height=args.height,
        samples_per_pixel=args.spp, max_depth=args.max_depth,
        seed=args.seed, samples_per_step=args.spp_per_step,
        engine=args.engine, background=background,
        nee=not args.no_nee, traversal=args.traversal,
        nee_candidates=args.nee_candidates,
        clamp=args.clamp,
    )
    if args.fog_sigma_s > 0.0 or args.fog_sigma_a > 0.0:
        # CLI fog override: fill ANY scene with a homogeneous scattering
        # medium (models/shading distance sampling + HG phase).
        import jax.numpy as jnp

        scene = scene._replace(fog=jnp.asarray(
            [args.fog_sigma_s, args.fog_sigma_a, args.fog_g], jnp.float32
        ))
    if (args.aperture is not None or args.focus_distance is not None
            or args.projection is not None):
        import dataclasses

        cam_cfg = dataclasses.replace(
            cam_cfg,
            aperture=(args.aperture if args.aperture is not None
                      else cam_cfg.aperture),
            focus_distance=(args.focus_distance
                            if args.focus_distance is not None
                            else cam_cfg.focus_distance),
            projection=(args.projection if args.projection is not None
                        else cam_cfg.projection),
        )
    if args.motion_to is not None or args.motion_look_to is not None:
        import dataclasses

        def _vec3(text):
            parts = [float(x) for x in text.split(",")]
            if len(parts) != 3:
                raise SystemExit(f"expected X,Y,Z; got {text!r}")
            return tuple(parts)

        cam_cfg = dataclasses.replace(
            cam_cfg,
            motion_position=(_vec3(args.motion_to)
                             if args.motion_to is not None
                             else cam_cfg.motion_position),
            motion_look_at=(_vec3(args.motion_look_to)
                            if args.motion_look_to is not None
                            else cam_cfg.motion_look_at),
        )
    motion = cam_cfg.motion_pair()
    if motion is not None and args.orbit:
        ptlog.log_warning("--orbit ignores camera motion blur")
    if motion is not None:
        aspect = args.width / args.height
        camera = (build_camera(motion[0], aspect),
                  build_camera(motion[1], aspect))
    else:
        camera = build_camera(cam_cfg, args.width / args.height)

    if args.target_rmse > 0.0 and not args.adaptive:
        # Validate BEFORE the --aov/--orbit/--tiles dispatch: those
        # branches return early and would silently render the full
        # budget with the flag ignored (ADVICE r4).
        ptlog.log_critical(
            "--target-rmse needs the per-pixel variance state: "
            "pass --adaptive (tile granularity)"
        )
        return 2

    if args.aov:
        from pathtracing_tpu.models import aov as aov_mod

        img = aov_mod.render_aov(scene, camera, config, args.aov)
        image.write_image(args.out, img)
        ptlog.log_information("wrote %s AOV to %s", args.aov, args.out)
        return 0

    if args.orbit:
        if args.engine == "wavefront":
            ptlog.log_warning(
                "--orbit always renders frames via the megakernel "
                "engine; --engine wavefront is ignored for orbits"
            )
        return _orbit_main(args, config, scene, cam_cfg)

    if args.engine == "wavefront":
        from pathtracing_tpu.models import wavefront as engine_mod
        step_fn = engine_mod.render_step
    else:
        step_fn = progressive.render_step

    if args.tiles:
        if args.engine == "wavefront":
            # The tiled path renders bands through the megakernel only;
            # silently "benchmarking wavefront + tiles" would measure the
            # wrong engine (ADVICE r1).
            ptlog.log_warning(
                "--tiles always renders via the megakernel engine; "
                "--engine wavefront is ignored for tiled renders"
            )
        return _tiled_main(args, config, scene, camera)

    if args.adaptive:
        if args.engine == "wavefront":
            ptlog.log_warning(
                "--adaptive renders band waves via the megakernel "
                "engine; --engine wavefront is ignored"
            )
        return _adaptive_main(args, config, scene, camera)

    state = progressive.init_state(config)
    if args.checkpoint and os.path.exists(args.checkpoint):
        try:
            state = ckpt.load(args.checkpoint, config)
        except ValueError as e:
            ptlog.log_critical("%s", e)
            return 2
        ptlog.log_information(
            "resumed from %s at %d spp", args.checkpoint, int(state.spp)
        )

    mlog = metrics.MetricsLog(jsonl_path=args.metrics_jsonl)
    preview = _Preview() if args.preview else None
    # Device-side downsample factor for preview-only fetches: the
    # reference presents every frame full-res because its swapchain is
    # on the GPU (`Renderer.cs:976-991`); here the "display cable" is a
    # ~30 MB/s tunnel, so the preview ships a pooled image and only PNG
    # snapshots pay for full resolution.
    prev_factor = args.preview_scale
    if prev_factor <= 0:
        prev_factor = max(1, -(-max(config.width, config.height) // 480))

    if args.profile:
        jax.profiler.start_trace(args.profile)

    n_steps = -(-config.samples_per_pixel // config.samples_per_step)
    start_spp = int(state.spp)
    step = start_spp // config.samples_per_step
    # Async present (SURVEY §2.1 P2/P3, the reference's frames-in-flight
    # scaffolding `Renderer.cs:1218-1233`): snapshots are cheap on-device
    # copies taken after a step; the tunnel fetch + PNG encode happen
    # inside the NEXT step's device window, so a snapshot step costs
    # ~the same wall-clock as a snapshot-free one.
    pending = None  # (device image, spp, write_png?)
    try:
        while int(state.spp) < config.samples_per_pixel:
            with metrics.Timer() as t:
                state = step_fn(state, scene, camera, config)
                if pending is not None:
                    img, psnap_spp, do_png = pending
                    img = np.asarray(img)  # rides the tunnel while the
                    #                        device runs the new step
                    if do_png:
                        image.write_image(args.out, img,
                                        args.exposure, args.tonemap)
                    if preview is not None:
                        preview.update(img, psnap_spp)
                    pending = None
                # A tiny fetch forces completion; block_until_ready is a
                # no-op on tunneled platforms (PERF.md methodology notes).
                np.asarray(state.accum[0, 0])
            step += 1
            rays = metrics.rays_per_sample(
                config.width, config.height, config.max_depth
            ) * config.samples_per_step
            mlog.record(metrics.StepMetrics(
                step=step, seconds=t.seconds,
                samples_added=config.samples_per_step,
                total_spp=int(state.spp),
                mrays_per_s=rays / t.seconds / 1e6,
                samples_per_s=config.width * config.height
                * config.samples_per_step / t.seconds,
            ))
            if args.checkpoint and step % args.checkpoint_every == 0:
                ckpt.save(args.checkpoint, state, config)
            do_png = bool(args.snapshot_every
                          and step % args.snapshot_every == 0)
            want_preview = (preview is not None
                            and step % max(args.preview_every, 1) == 0)
            if do_png or want_preview:
                # Device-side copy only — deferred to the next iteration
                # (the copy must happen before step_fn donates state).
                # Preview-only snapshots are pooled on device so the
                # tunnel fetch stays small (resolve_preview docstring).
                img_dev = (progressive.resolve(state) if do_png
                           else progressive.resolve_preview(
                               state, prev_factor))
                pending = (img_dev, int(state.spp), do_png)
        if pending is not None and pending[2]:
            image.write_image(args.out, np.asarray(pending[0]),
                            args.exposure, args.tonemap)
            pending = None
    except KeyboardInterrupt:
        ptlog.log_warning("interrupted at %d spp", int(state.spp))
    finally:
        if args.profile:
            jax.profiler.stop_trace()
            ptlog.log_information("profile trace in %s", args.profile)

    if args.checkpoint:
        ckpt.save(args.checkpoint, state, config)
    if args.out_hdr:
        np.savez(args.out_hdr,
                 radiance=np.asarray(progressive.resolve(state)),
                 spp=int(state.spp))
    final = _maybe_denoise(
        args, config, scene, camera, progressive.resolve(state),
        int(state.spp),
    )
    image.write_image(args.out, final, args.exposure, args.tonemap)
    ptlog.log_information(
        "wrote %s (%d spp, %d steps)", args.out, int(state.spp), step
    )
    return 0


def _orbit_main(args, config, scene, cam_cfg) -> int:
    """Turntable frame sequence: the reference's continuous windowed
    render loop (`App.cs:39-42` → `Renderer.Render` per frame), mapped
    to TPU batch reality — the camera is a *traced* pytree, so the
    jitted render compiles ONCE and each frame is a pure device
    execution with a new camera (the XLA analogue of re-recording
    command buffers per frame, `Renderer.cs:1006-1040`). Frame seeds
    differ (seed + frame) so animation noise is uncorrelated."""
    import functools
    import math as _math

    import jax.numpy as jnp

    from pathtracing_tpu.models import megakernel

    base = np.asarray(cam_cfg.position, np.float32)
    target = np.asarray(cam_cfg.look_at, np.float32)
    rel = base - target
    r_xz = _math.hypot(float(rel[0]), float(rel[2]))
    phi0 = _math.atan2(float(rel[0]), float(rel[2]))

    @functools.partial(jax.jit, static_argnames=())
    def frame(scene, camera, seed):
        spp = config.samples_per_pixel
        acc = megakernel.render_samples(
            scene, camera, config, jnp.int32(0), spp, seed
        )
        return acc / jnp.float32(spp)

    import dataclasses

    root, ext = os.path.splitext(args.out)
    ext = ext or ".png"
    out_dir = os.path.dirname(root)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    n = args.orbit
    arc = _math.radians(args.orbit_degrees)
    full_turn = abs(args.orbit_degrees) >= 360.0 - 1e-9
    tstate = cam_prev = None
    if args.temporal:
        from pathtracing_tpu.models import temporal

        tstate = temporal.init_state(config)
    for i in range(n):
        # Full turns space frames over [0, arc) (frame n would repeat
        # frame 0); partial arcs sweep [-arc/2, +arc/2] inclusive,
        # centered on the scene camera (a single frame sits AT the
        # center, not the arc edge).
        if full_turn:
            phi = phi0 + arc * i / n
        elif n == 1:
            phi = phi0
        else:
            phi = phi0 + arc * (i / (n - 1) - 0.5)
        pos = target + np.array(
            [r_xz * _math.sin(phi), float(rel[1]), r_xz * _math.cos(phi)],
            np.float32,
        )
        cc = dataclasses.replace(cam_cfg, position=tuple(map(float, pos)))
        camera = build_camera(cc, args.width / args.height)
        with metrics.Timer() as t:
            if tstate is not None:
                # Temporal reuse: blend the reprojected history into
                # this frame ON DEVICE, then fetch the blended image.
                from pathtracing_tpu.models import temporal

                cur = frame(scene, camera, jnp.uint32(args.seed + i))
                out_dev, tstate = temporal.advance(
                    tstate, cur, scene, camera,
                    camera if cam_prev is None else cam_prev,
                    config, cap=args.temporal_cap,
                )
                cam_prev = camera
                img = np.asarray(out_dev)
            else:
                img = np.asarray(frame(scene, camera,
                                       jnp.uint32(args.seed + i)))
        # Per-frame post-passes: orbit sequences get the same --denoise
        # / --bloom treatment as single-frame renders. Temporal frames
        # carry blended history: their effective spp is the per-frame
        # budget times the mean history length, and the denoiser's
        # color sigma must narrow accordingly (2.8/sqrt(spp)) or the
        # already-accumulated frames get oversmoothed.
        spp_eff = config.samples_per_pixel
        if tstate is not None:
            # Power-of-2 buckets: spp is a static jit arg of the
            # denoiser and the history mean drifts every frame.
            hist = max(1.0, float(jnp.mean(tstate.hist_len)))
            if hist > 1.0:
                spp_eff *= 2 ** int(round(_math.log2(hist)))
        img = _maybe_denoise(args, config, scene, camera, img, spp_eff)
        path = f"{root}_{i:04d}{ext}"
        image.write_image(path, img, args.exposure, args.tonemap)
        ptlog.log_information(
            "frame %d/%d -> %s (%.2fs, %.1f fps-equivalent)",
            i + 1, n, path, t.seconds, 1.0 / max(t.seconds, 1e-9),
        )
    return 0


def _maybe_denoise(args, config, scene, camera, img, spp):
    """Apply the final-image post-passes: --denoise, then --bloom
    (both in linear radiance, before the tone curve)."""
    if args.denoise:
        from pathtracing_tpu.ops import denoise as denoise_mod

        img = denoise_mod.denoise_render(
            scene, camera, config, img, spp=spp,
            iterations=args.denoise_iters,
            sigma_color=args.denoise_sigma_color,
        )
        ptlog.log_information(
            "denoised (%d à-trous iterations, %s spp)",
            args.denoise_iters, spp,
        )
    if args.bloom > 0.0:
        from pathtracing_tpu.ops import bloom as bloom_mod

        img = bloom_mod.apply_bloom(
            img, args.bloom, threshold=args.bloom_threshold
        )
        ptlog.log_information(
            "bloom applied (strength %.3g, threshold %.3g)",
            args.bloom, args.bloom_threshold,
        )
    return img


def _adaptive_main(args, config, scene, camera) -> int:
    """Per-pixel adaptive render driver: on-device variance scoring
    schedules every round's rays onto the noisiest 8x8 tiles (or row
    bands — models/adaptive.py docstring has the estimator/scheduling
    design; tiles measured 3.1x vs bands' 1.3x anchored time-to-quality
    on spotlight_demo, PERF.md r4c).
    Budget = the uniform render's total sample count, spent unevenly."""
    from pathtracing_tpu.models import adaptive

    granularity = args.adaptive_granularity
    if granularity == "tiles" and (
        config.height % args.adaptive_tile or
        config.width % args.adaptive_tile
    ):
        ptlog.log_warning(
            "adaptive: %dx%d not divisible by tile %d — falling back "
            "to band granularity", config.width, config.height,
            args.adaptive_tile,
        )
        granularity = "bands"

    if granularity == "tiles":
        return _adaptive_tiles_main(args, config, scene, camera)

    if args.target_rmse > 0.0:
        ptlog.log_warning(
            "--target-rmse is tile-granularity only; band-granular "
            "adaptive renders the full --spp budget"
        )
    band_rows = adaptive.pick_band_rows(config, args.adaptive_band_rows)
    n_bands = config.height // band_rows
    ptlog.log_information(
        "adaptive: %d bands of %d rows, %d bands/round",
        n_bands, band_rows,
        args.adaptive_k or max(1, n_bands // 8),
    )

    def progress(state, spent, budget):
        spp = np.asarray(state.band_spp)
        ptlog.log_information(
            "adaptive: %d/%d band-samples spent (band spp min %d / "
            "mean %.1f / max %d)", spent, budget, int(spp.min()),
            float(spp.mean()), int(spp.max()),
        )

    with metrics.Timer() as t:
        state, rounds = adaptive.render_adaptive(
            scene, camera, config, band_rows=band_rows,
            bands_per_round=args.adaptive_k, progress=progress,
        )
        img = np.asarray(adaptive.resolve(state, band_rows))
    spp = np.asarray(state.band_spp)
    if args.out_hdr:
        np.savez(args.out_hdr, radiance=img, spp=int(spp.min()))
    final = _maybe_denoise(args, config, scene, camera, img,
                           float(spp.mean()))
    image.write_image(args.out, final, args.exposure, args.tonemap)
    ptlog.log_information(
        "wrote %s (adaptive: %d rounds in %.1fs; band spp min %d / "
        "mean %.1f / max %d)", args.out, rounds, t.seconds,
        int(spp.min()), float(spp.mean()), int(spp.max()),
    )
    return 0


def _adaptive_tiles_main(args, config, scene, camera) -> int:
    """Tile-granular adaptive driver (the default): same greedy
    variance-descent scheduler at 8x8-tile granularity — square tiles
    follow 2D-compact noise (a spotlight disc) that full-width row
    bands smear across every column."""
    from pathtracing_tpu.models import adaptive

    tile = adaptive.pick_tile(config, args.adaptive_tile)
    n_tiles = (config.height // tile) * (config.width // tile)
    ptlog.log_information(
        "adaptive: %d tiles of %dx%d, %d tiles/round",
        n_tiles, tile, tile, args.adaptive_k or max(1, n_tiles // 8),
    )

    def progress(state, spent, budget):
        spp = np.asarray(state.tile_spp)
        ptlog.log_information(
            "adaptive: %d/%d tile-samples spent (tile spp min %d / "
            "mean %.1f / max %d)", spent, budget, int(spp.min()),
            float(spp.mean()), int(spp.max()),
        )

    with metrics.Timer() as t:
        state, rounds = adaptive.render_adaptive_tiles(
            scene, camera, config, tile=tile,
            tiles_per_round=args.adaptive_k, progress=progress,
            auto_uniform=args.adaptive_auto,
            target_rmse=args.target_rmse,
        )
        img = np.asarray(adaptive.resolve_tiles(state, config, tile))
    if args.target_rmse > 0.0:
        ptlog.log_information(
            "target-rmse %.4g: stopped at predicted RMSE %.4g",
            args.target_rmse,
            float(adaptive.predicted_rmse(state, config, tile)),
        )
    spp = np.asarray(state.tile_spp)
    if args.out_hdr:
        np.savez(args.out_hdr, radiance=img, spp=int(spp.min()))
    final = _maybe_denoise(args, config, scene, camera, img,
                           float(spp.mean()))
    image.write_image(args.out, final, args.exposure, args.tonemap)
    ptlog.log_information(
        "wrote %s (adaptive: %d rounds in %.1fs; tile spp min %d / "
        "mean %.1f / max %d)", args.out, rounds, t.seconds,
        int(spp.min()), float(spp.mean()), int(spp.max()),
    )
    return 0


def _tiled_main(args, config, scene, camera) -> int:
    """Band-tiled render driver: per-band completion tracking + resume +
    optional fault injection (SURVEY.md §5.3), or adaptive sampling."""
    from pathtracing_tpu.utils import tiles

    def progress(band, spp):
        ptlog.log_information("band %d at %d spp", band, spp)

    if args.adaptive:
        state = tiles.render_tiled_adaptive(
            scene, camera, config, args.tiles, progress=progress
        )
        mean = _maybe_denoise(
            args, config, scene, camera, tiles.resolve_tiled(state),
            float(np.mean(state.band_spp)),
        )
        image.write_image(args.out, mean, args.exposure, args.tonemap)
        ptlog.log_information(
            "wrote %s (adaptive; band spp %s)", args.out,
            list(map(int, state.band_spp)),
        )
        return 0

    state = None
    if args.checkpoint and os.path.exists(args.checkpoint):
        try:
            state = tiles.load(args.checkpoint, config, args.tiles)
        except ValueError as e:
            ptlog.log_critical("%s", e)
            return 2
        ptlog.log_information(
            "resumed tiled render: band spp %s",
            list(map(int, state.band_spp)),
        )

    state = tiles.render_tiled(
        scene, camera, config, args.tiles, state=state,
        checkpoint_path=args.checkpoint,
        inject_fault_band=args.inject_fault, progress=progress,
    )
    mean = state.accum / np.maximum(state.band_spp.min(), 1)
    mean = _maybe_denoise(
        args, config, scene, camera, mean, int(state.band_spp.min())
    )
    image.write_image(args.out, mean, args.exposure, args.tonemap)
    ptlog.log_information(
        "wrote %s (%d bands x %d spp)", args.out, args.tiles,
        int(state.band_spp.min()),
    )
    return 0


class _Preview:
    """Optional live preview window — the reference's swapchain-present
    analogue (`Renderer.cs:976-991`), degraded gracefully when headless."""

    def __init__(self) -> None:
        try:
            import matplotlib.pyplot as plt

            self._plt = plt
            plt.ion()
            self._fig, self._ax = plt.subplots()
            self._im = None
        except Exception:
            ptlog.log_warning("matplotlib unavailable; preview disabled")
            self._plt = None

    def update(self, linear, spp: int) -> None:
        if self._plt is None:
            return
        rgb = np.asarray(image.tonemap(linear))
        if self._im is None:
            self._im = self._ax.imshow(rgb)
        else:
            self._im.set_data(rgb)
        self._ax.set_title(f"{spp} spp")
        self._fig.canvas.draw_idle()
        self._plt.pause(0.001)


if __name__ == "__main__":
    sys.exit(main())
