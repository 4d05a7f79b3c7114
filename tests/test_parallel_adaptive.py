"""Multi-chip tile-granular adaptive sampling (parallel/adaptive.py).

Pins the sharded scheduler's two contracts on the virtual 8-device mesh:

- UNIFORM schedules through the sharded machinery are bitwise equal to
  the single-chip progressive engine (global pixel/sample RNG ids;
  tile-major layout + stripe sharding are pure reorderings);
- the per-shard greedy schedule is bitwise equal to a single-chip
  SIMULATION of the same policy (each stripe ranks and renders only its
  own tiles, so per-round updates never cross stripes and the
  simulation order is irrelevant) — the sharding changes WHERE the
  budget lands, never WHAT any sample computes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import adaptive, progressive, scenes
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.parallel import adaptive as padaptive
from pathtracing_tpu.parallel import mesh as mesh_mod
from pathtracing_tpu.utils.config import RenderConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

CFG = RenderConfig(width=16, height=16, samples_per_pixel=4,
                   max_depth=3, seed=21, samples_per_step=4)
TILE = 2   # 8x8 = 64 tiles, 8 per stripe on the 8-device mesh


@pytest.fixture(scope="module")
def setup():
    scene, cam_cfg = scenes.cornell_sphere()
    cam = build_camera(cam_cfg, 1.0)
    return scene, cam


@pytest.fixture(scope="module")
def mesh():
    return mesh_mod.make_mesh(8, 1, devices=jax.devices()[:8])


def test_sharded_uniform_matches_progressive_bitwise(setup, mesh):
    import dataclasses

    scene, cam = setup
    step = padaptive.make_sharded_uniform_step(mesh, CFG, TILE)
    state = padaptive.init_sharded_tile_state(mesh, CFG, TILE)
    state = step(state, scene, cam, 3)
    img = padaptive.gather_tile_image(state, CFG, TILE)

    cfg = dataclasses.replace(CFG, samples_per_pixel=3,
                              samples_per_step=3)
    ref = progressive.render_step(progressive.init_state(cfg), scene,
                                  cam, cfg)
    np.testing.assert_array_equal(img, np.asarray(ref.accum) / 3.0)
    spp = np.asarray(jax.device_get(state.tile_spp))
    assert spp.min() == spp.max() == 3


def test_sharded_greedy_matches_single_chip_simulation(setup, mesh):
    scene, cam = setup
    n_tiles = (CFG.height // TILE) * (CFG.width // TILE)
    n_dev = 8
    t_local = n_tiles // n_dev
    k, k_local, n_rounds = 16, 2, 3

    # Sharded run: warmup 2 spp then 3 fused greedy rounds.
    uniform = padaptive.make_sharded_uniform_step(mesh, CFG, TILE)
    greedy = padaptive.make_sharded_tile_rounds(mesh, CFG, TILE, k,
                                                spp_per_round=1)
    st = padaptive.init_sharded_tile_state(mesh, CFG, TILE)
    st = uniform(st, scene, cam, 2)
    st = greedy(st, scene, cam, n_rounds)
    got = jax.device_get(st)

    # Single-chip simulation of the identical per-shard policy.
    sim = adaptive.init_tile_state(CFG, TILE)
    all_tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    for s in range(2):
        sim = adaptive.tile_step(sim, scene, cam, CFG, TILE, all_tiles)
    for _ in range(n_rounds):
        scores = np.asarray(adaptive._tile_scores(sim, CFG, TILE))
        picks = []
        for shard in range(n_dev):
            local = scores[shard * t_local:(shard + 1) * t_local]
            top = np.argsort(-local, kind="stable")[:k_local]
            # lax.top_k breaks ties by the LOWEST index; stable argsort
            # on the negated scores matches that.
            picks.extend(shard * t_local + top)
        sim = adaptive.tile_step(sim, scene, cam, CFG, TILE,
                                 jnp.asarray(np.array(picks, np.int32)))

    np.testing.assert_array_equal(np.asarray(got.accum),
                                  np.asarray(sim.accum))
    np.testing.assert_array_equal(np.asarray(got.tile_spp),
                                  np.asarray(sim.tile_spp))


def test_render_adaptive_sharded_budget_and_image(setup, mesh):
    scene, cam = setup
    state, rounds = padaptive.render_adaptive_sharded(
        mesh, scene, cam, CFG, tile=TILE, tiles_per_round=16,
        budget_spp=6)
    n_tiles = (CFG.height // TILE) * (CFG.width // TILE)
    spp = np.asarray(jax.device_get(state.tile_spp))
    assert spp.sum() == 6 * n_tiles
    img = padaptive.gather_tile_image(state, CFG, TILE)
    assert np.isfinite(img).all() and img.max() > 0.0


def test_render_adaptive_sharded_target_rmse(setup, mesh):
    """target_rmse stops the sharded schedule under budget (the
    estimator reduces globally over the stripe-sharded state), and an
    unreachable target reproduces the no-target schedule exactly."""
    scene, cam = setup
    base, _ = padaptive.render_adaptive_sharded(
        mesh, scene, cam, CFG, tile=TILE, tiles_per_round=16,
        budget_spp=64)
    loose = float(adaptive.predicted_rmse(base, CFG, TILE)) * 4.0

    state, _ = padaptive.render_adaptive_sharded(
        mesh, scene, cam, CFG, tile=TILE, tiles_per_round=16,
        budget_spp=64, target_rmse=loose)
    spp = np.asarray(jax.device_get(state.tile_spp))
    assert spp.sum() < 64 * spp.size
    assert spp.min() >= 2
    assert float(adaptive.predicted_rmse(state, CFG, TILE)) <= loose

    full, _ = padaptive.render_adaptive_sharded(
        mesh, scene, cam, CFG, tile=TILE, tiles_per_round=16,
        budget_spp=64, target_rmse=1e-9)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(full.accum)),
        np.asarray(jax.device_get(base.accum)))
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(full.tile_spp)),
        np.asarray(jax.device_get(base.tile_spp)))
