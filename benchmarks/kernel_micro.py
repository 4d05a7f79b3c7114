"""Traversal-kernel microbenchmark: Mrays/s by wave type, kernel, binning.

The full-step bench (bench.py) mixes camera waves, bounce waves, shadow
rays, shading and pool bookkeeping; this harness isolates the traversal
kernel on three realistic wave types so kernel/binning changes can be
attributed (PERF.md methodology):

  camera   — coherent primary rays (the kernel's best case)
  bounce   — cosine-scattered rays from actual first-hit points (the
             incoherent case that dominates the full step)
  shadow   — rays from first-hit points toward a fixed light point with
             t capped at the light distance (the NEE occlusion query)

Usage (serialize TPU runs — see PERF.md):
    python benchmarks/kernel_micro.py                # all waves, defaults
    MICRO_WAVES=bounce MICRO_BINS=0,216,512 python benchmarks/kernel_micro.py

Env knobs:
  MICRO_SCENE    cornell_mesh level (default 6 → 82k tris)
  MICRO_RES      rays = RES*RES (default 512)
  MICRO_WAVES    comma list of camera,bounce,shadow (default all)
  MICRO_BINS     comma list of bin counts; 0 = unsorted (default 0,216)
  MICRO_KERNELS  comma list of trace kernels (default pallas)
  MICRO_REPS     timed reps (default 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_COMPILATION_CACHE_DIR") is None:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
        )

    from pathtracing_tpu.models import scene as scene_mod
    from pathtracing_tpu.models import scenes
    from pathtracing_tpu.ops import binning, cluster_trace
    from pathtracing_tpu.ops.camera import build_camera, generate_ray
    from pathtracing_tpu.ops import rng

    level = int(os.environ.get("MICRO_SCENE", "6"))
    res = int(os.environ.get("MICRO_RES", "512"))
    waves = os.environ.get("MICRO_WAVES", "camera,bounce,shadow").split(",")
    bins_list = [
        int(b) for b in os.environ.get("MICRO_BINS", "0,216").split(",")
    ]
    kernels = os.environ.get("MICRO_KERNELS", "pallas").split(",")
    reps = int(os.environ.get("MICRO_REPS", "2"))
    tile = int(os.environ.get("MICRO_TILE", "0"))

    scene, cam_cfg = scenes.cornell_mesh(level)
    camera = build_camera(cam_cfg, 1.0)
    n = res * res
    n_tris = int(scene.tri_v0.shape[0])
    print(f"# scene cornell_mesh({level}): {n_tris} tris, "
          f"{scene.clusters.woop.shape[0]} clusters, {n} rays",
          file=sys.stderr)

    # Primary rays (coherent).
    key = jax.random.key(0)
    px = jnp.arange(n, dtype=jnp.int32)
    s = ((px % res).astype(jnp.float32) + 0.5) / res
    t = ((px // res).astype(jnp.float32) + 0.5) / res
    o_cam, d_cam = jax.vmap(
        lambda a, b: generate_ray(camera, a, b, 0.5, 0.5)
    )(s, t)

    # First hits → bounce + shadow waves (computed once, any traversal).
    on_cpu = jax.devices()[0].platform == "cpu"
    first_mode = "cluster_jax" if on_cpu else "cluster_pallas"

    @jax.jit
    def first_hits(o, d):
        hit = scene_mod.intersect_batch(scene, o, d, first_mode)
        return hit.position, hit.normal, hit.valid

    pos, nrm, valid = first_hits(o_cam, d_cam)
    u = jax.random.uniform(key, (n, 2))
    # Cosine-weighted hemisphere about the shading normal.
    r = jnp.sqrt(u[:, 0])
    phi = 2.0 * jnp.pi * u[:, 1]
    tang = jnp.where(
        jnp.abs(nrm[:, 0:1]) > 0.9,
        jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]),
    )
    tx = tang - nrm * jnp.sum(tang * nrm, axis=1, keepdims=True)
    tx = tx / jnp.linalg.norm(tx, axis=1, keepdims=True)
    ty = jnp.cross(nrm, tx)
    z = jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))
    d_bounce = (r * jnp.cos(phi))[:, None] * tx \
        + (r * jnp.sin(phi))[:, None] * ty + z[:, None] * nrm
    o_bounce = pos

    light = jnp.array([278.0, 548.0, 279.0]) / 555.0  # cornell-ish top
    wi = light[None, :] - pos
    dist = jnp.linalg.norm(wi, axis=1)
    d_shadow = wi / jnp.maximum(dist, 1e-6)[:, None]

    big = jnp.full(n, 3.0e38, jnp.float32)
    wave_data = {
        "camera": (o_cam, d_cam, big, None),
        "bounce": (o_bounce, d_bounce,
                   jnp.where(valid, 3.0e38, 0.0), None),
        "shadow": (o_bounce, d_shadow,
                   jnp.where(valid, dist * 0.999, 0.0), None),
    }

    lo = jnp.min(scene.clusters.aabb_min, axis=0)
    hi = jnp.max(scene.clusters.aabb_max, axis=0)

    def make_fn(kernel, n_bins):
        # Kernel names: pallas (ordered default), a trailing "u" means
        # ordered=False; "la<K>x<B>[u]" = lookahead variants; jax/interp/
        # anyhit as labelled.
        kw = {}
        name = kernel
        if name.endswith("u") and name != "anyhit":
            kw["ordered"] = False
            name = name[:-1]
        trace = cluster_trace.trace_pallas
        if name == "jax":
            trace = cluster_trace.trace_jax
            kw = {}
        elif name == "interp":
            kw["interpret"] = True
        elif name == "anyhit":
            trace = getattr(cluster_trace, "occluded_pallas", None)
            if trace is None:
                return None
        elif name.startswith("dnf"):
            # dnf[g<group>][w|w2][m<debug_mode>][b<band>], e.g. dnfg8,
            # dnfw (windowed pop), dnfg6w2 (2nd-smallest-per-window),
            # dnfm1, dnfg2wm2, dnfb16 (banded cull)
            trace = cluster_trace.trace_pallas_dnf
            kw = {"interpret": True} if on_cpu else {}
            body = name[3:]
            import re as _re
            mg = _re.match(
                r"(?:g(\d+))?(w2?)?(?:m(\d+))?(?:b(\d+))?(h)?"
                r"(?:p(\d+))?(a)?(?:c(\d+))?$", body)
            if mg is None:
                raise SystemExit(f"bad kernel spec: {kernel!r}")
            if mg.group(1):
                kw["group"] = int(mg.group(1))
            if mg.group(2):
                kw["windowed"] = True
                if mg.group(2) == "w2":
                    kw["win2"] = True   # 2nd-smallest-per-window pops
            if mg.group(3):
                kw["debug_mode"] = int(mg.group(3))
            if mg.group(4):
                kw["band"] = int(mg.group(4))
            if mg.group(5):
                kw["bf16"] = True   # dnfh: bf16 MXU eval (measurement)
            if mg.group(6):
                kw["pops"] = int(mg.group(6))   # pop rounds / iteration
            if mg.group(7):
                kw["eval_always"] = True        # drop the pl.when branch
            if mg.group(8):
                kw["chains"] = int(mg.group(8))  # independent tile chains
        elif name.startswith("anyhitdnf"):
            # anyhitdnf[g<group>]
            trace = cluster_trace.occluded_pallas_dnf
            kw = {"interpret": True} if on_cpu else {}
            import re as _re
            mg = _re.match(r"anyhitdnf(?:g(\d+))?(2)?(?:c(\d+))?$", name)
            if mg is None:
                raise SystemExit(f"bad kernel spec: {kernel!r}")
            if mg.group(1):
                kw["group"] = int(mg.group(1))
            if mg.group(2):
                kw["win2"] = True       # 2nd-smallest-per-window pops
            if mg.group(3):
                kw["chains"] = int(mg.group(3))
        elif name.startswith("la") or name.startswith("lb"):
            # Lookahead variants la<K>x<B> (lb accepted as an alias);
            # trailing "a" = unconditional drain, e.g. lb4x1a.
            body = name[2:]
            if body.endswith("a"):
                kw["drain_always"] = True
                body = body[:-1]
            k_str, b_str = body.split("x")
            kw.update(lookahead=int(k_str), drain=int(b_str))
            if on_cpu:
                kw["interpret"] = True
        if tile and trace in (cluster_trace.trace_pallas,
                              cluster_trace.trace_pallas_dnf,
                              cluster_trace.occluded_pallas_dnf):
            kw["tile"] = tile

        @jax.jit
        def run(o, d, t_init):
            if n_bins:
                perm, _ = binning.sort_rays(
                    o, d, lo, hi, t_init > 0.0, n_bins
                )
                o, d, t_init = o[perm], d[perm], t_init[perm]
            out = trace(scene.clusters, o, d, t_init, **kw)
            return jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out)

        return run

    results = []
    for kernel in kernels:
        for n_bins in bins_list:
            fn = make_fn(kernel, n_bins)
            if fn is None:
                continue
            for wave in waves:
                if (kernel == "anyhit"
                        or kernel.startswith("anyhitdnf")) and wave != "shadow":
                    continue
                o, d, t0 = wave_data[wave][:3]
                float(fn(o, d, t0))  # compile + warm
                t_start = time.perf_counter()
                for _ in range(reps):
                    float(fn(o, d, t0))
                dt = (time.perf_counter() - t_start) / reps
                mrays = n / dt / 1e6
                row = {"kernel": kernel, "wave": wave, "bins": n_bins,
                       "mrays": round(mrays, 2), "ms": round(dt * 1e3, 1)}
                results.append(row)
                print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
