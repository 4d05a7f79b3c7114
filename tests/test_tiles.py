"""Tiled rendering: band independence, fault injection, resume (§5.3).

The strongest property the counter-based RNG buys: a render that loses a
band (injected fault) and re-renders it is BIT-IDENTICAL to an
uninterrupted render — not statistically equivalent, identical.
"""

import os

import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils import tiles
from pathtracing_tpu.utils.config import RenderConfig


CFG = RenderConfig(width=16, height=16, samples_per_pixel=4,
                   max_depth=3, samples_per_step=2, seed=11)


@pytest.fixture(scope="module")
def setup():
    scene, cam_cfg = scenes.cornell_sphere()
    cam = build_camera(cam_cfg, 1.0)
    # Reference stepped exactly like the tiled driver (2-sample rounds) so
    # float accumulation order matches and comparisons can be BITWISE.
    ref = progressive.init_state(CFG)
    ref = progressive.render_step(ref, scene, cam, CFG)
    ref = progressive.render_step(ref, scene, cam, CFG)
    return scene, cam, np.asarray(ref.accum)


def test_bands_match_full_frame(setup):
    scene, cam, ref = setup
    state = tiles.render_tiled(scene, cam, CFG, n_bands=4)
    np.testing.assert_array_equal(np.asarray(state.accum), ref)
    assert (state.band_spp == 4).all()


def test_fault_injection_recovers_bitwise(setup):
    scene, cam, ref = setup
    state = tiles.render_tiled(
        scene, cam, CFG, n_bands=4, inject_fault_band=2
    )
    np.testing.assert_array_equal(np.asarray(state.accum), ref)


def test_checkpoint_resume_only_rerenders_missing(tmp_path, setup):
    scene, cam, ref = setup
    ckpt = str(tmp_path / "tiled.npz")

    # Partial run: stop after the first couple of band rounds.
    state = tiles.init_tiled(CFG, 4)
    state = tiles.render_band(scene, cam, CFG, state, 0, 2)
    state = tiles.render_band(scene, cam, CFG, state, 0, 2)
    state = tiles.render_band(scene, cam, CFG, state, 1, 2)
    tiles.save(ckpt, state, CFG)

    resumed = tiles.load(ckpt, CFG, 4)
    assert list(resumed.band_spp) == [4, 2, 0, 0]
    done = tiles.render_tiled(scene, cam, CFG, 4, state=resumed,
                              checkpoint_path=ckpt)
    np.testing.assert_array_equal(np.asarray(done.accum), ref)
    assert os.path.exists(ckpt)


def test_load_rejects_config_change(tmp_path, setup):
    scene, cam, _ = setup
    ckpt = str(tmp_path / "tiled.npz")
    state = tiles.init_tiled(CFG, 4)
    tiles.save(ckpt, state, CFG)
    other = RenderConfig(**{**CFG.__dict__, "seed": 99})
    with pytest.raises(ValueError, match="refusing to resume"):
        tiles.load(ckpt, other, 4)
    with pytest.raises(ValueError, match="refusing to resume"):
        tiles.load(ckpt, CFG, 8)


def test_bad_band_count_rejected():
    with pytest.raises(ValueError, match="not divisible"):
        tiles.init_tiled(CFG, 3)


def test_adaptive_respects_budget_and_minimum(setup):
    scene, cam, _ = setup
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=16,
                       max_depth=3, samples_per_step=2, seed=4)
    st = tiles.render_tiled_adaptive(scene, cam, cfg, 4)
    assert int(st.band_spp.sum()) == 4 * 16
    assert st.band_spp.min() >= 4  # every band explored at least twice
    img = tiles.resolve_tiled(st)
    assert np.isfinite(img).all() and img.mean() > 0


def test_adaptive_prefers_noisy_bands(setup):
    """The band containing the bright ceiling light (top band) converges
    differently from the floor; allocation must not be uniform when the
    budget is large enough to differentiate."""
    scene, cam, _ = setup
    cfg = RenderConfig(width=16, height=16, samples_per_pixel=32,
                       max_depth=4, samples_per_step=2, seed=1)
    st = tiles.render_tiled_adaptive(scene, cam, cfg, 4)
    assert int(st.band_spp.sum()) == 4 * 32
    assert len(set(map(int, st.band_spp))) > 1, "allocation stayed uniform"
