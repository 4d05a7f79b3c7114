"""Wavefront engine: parity with the megakernel, pool sizing, regeneration.

The wavefront engine must produce the SAME image as the megakernel (shared
``models.shading`` core + identical RNG counters), while tracing only the
segments that are actually alive.
"""

import jax
import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes, wavefront
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import RenderConfig


def small_config(**kw):
    base = dict(width=24, height=16, samples_per_pixel=4, max_depth=5,
                samples_per_step=4, seed=7)
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def bsdf_scene():
    scene, cam_cfg = scenes.cornell_bsdf()
    return scene, cam_cfg


def render_both(scene, cam_cfg, config):
    camera = build_camera(cam_cfg, config.width / config.height)
    s_mega = progressive.render_step(
        progressive.init_state(config), scene, camera, config
    )
    s_wave = wavefront.render_step(
        progressive.init_state(config), scene, camera, config
    )
    return np.asarray(s_mega.accum), np.asarray(s_wave.accum)


def test_matches_megakernel(bsdf_scene):
    scene, cam_cfg = bsdf_scene
    config = small_config()
    mega, wave = render_both(scene, cam_cfg, config)
    assert mega.shape == wave.shape
    np.testing.assert_allclose(mega, wave, atol=2e-4)


def test_small_pool_same_image(bsdf_scene):
    """A pool far smaller than the wave (forces many regeneration rounds)
    must not change the image — stream indices are global."""
    scene, cam_cfg = bsdf_scene
    config = small_config(wavefront_pool=64)
    mega, wave = render_both(scene, cam_cfg, config)
    np.testing.assert_allclose(mega, wave, atol=2e-4)


def test_progressive_steps_continue_stream(bsdf_scene):
    """Two wavefront steps == one megakernel render at 2x spp/step."""
    scene, cam_cfg = bsdf_scene
    config = small_config(samples_per_step=2, samples_per_pixel=4)
    camera = build_camera(cam_cfg, config.width / config.height)
    s = progressive.init_state(config)
    s = wavefront.render_step(s, scene, camera, config)
    s = wavefront.render_step(s, scene, camera, config)
    assert int(s.spp) == 4

    config_1step = small_config(samples_per_step=4, samples_per_pixel=4)
    s_ref = progressive.render_step(
        progressive.init_state(config_1step), scene, camera, config_1step
    )
    np.testing.assert_allclose(
        np.asarray(s.accum), np.asarray(s_ref.accum), atol=2e-4
    )


def test_segment_count_below_max(bsdf_scene):
    """Counted rays (path segments + NEE shadow rays) must be below the
    2x max_depth ceiling and >= pixels*spp (every path traces at least
    one segment); disabling NEE drops the count."""
    scene, cam_cfg = bsdf_scene
    config = small_config()
    camera = build_camera(cam_cfg, config.width / config.height)
    segs = int(wavefront.count_segments(scene, camera, config, config.seed))
    n_paths = config.width * config.height * config.samples_per_step
    assert n_paths <= segs < n_paths * config.max_depth * 2
    no_nee = small_config(nee=False)
    segs_no_nee = int(
        wavefront.count_segments(scene, camera, no_nee, no_nee.seed)
    )
    assert segs_no_nee < segs


def test_ray_binning_same_image(bsdf_scene):
    """Counting-sort ray binning must not change the estimate (slots are
    permuted; per-path RNG keys travel with the slot)."""
    scene, cam_cfg = bsdf_scene
    config = small_config(ray_sort=True, traversal="cluster_interpret")
    ref_config = small_config(ray_sort=False, traversal="cluster_interpret")
    camera = build_camera(cam_cfg, config.width / config.height)
    m = progressive.render_step(
        progressive.init_state(ref_config), scene, camera, ref_config
    )
    w = wavefront.render_step(
        progressive.init_state(config), scene, camera, config
    )
    np.testing.assert_allclose(
        np.asarray(m.accum), np.asarray(w.accum), atol=3e-4
    )


def test_binning_perm_properties():
    from pathtracing_tpu.ops import binning
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    bins = jnp.asarray(rs.randint(0, binning.N_BINS, 3000), jnp.int32)
    perm, inv = binning.binning_perm(bins, binning.N_BINS)
    perm, inv = np.asarray(perm), np.asarray(inv)
    assert sorted(perm.tolist()) == list(range(3000))  # a permutation
    grouped = np.asarray(bins)[perm]
    assert (np.diff(grouped) >= 0).all()               # grouped
    # inv really inverts: sorted[inv] restores original order.
    x = rs.randn(3000).astype(np.float32)
    np.testing.assert_array_equal(x[perm][inv], x)


class TestClamp:
    """--clamp: per-sample firefly clamp (config.clamp, engines must
    agree; a non-binding clamp reproduces the unclamped values)."""

    def test_bounds_every_sample(self, bsdf_scene):
        scene, cam_cfg = bsdf_scene
        config = small_config(clamp=0.5)
        mega, _ = render_both(scene, cam_cfg, config)
        # accum is the SUM of per-sample radiance; each sample is
        # clamped per-channel, so the mean is bounded by the clamp.
        assert (mega / config.samples_per_step).max() <= 0.5 + 1e-6
        unclamped, _ = render_both(scene, cam_cfg, small_config())
        assert (unclamped / config.samples_per_step).max() > 0.5

    def test_engines_agree_under_clamp(self, bsdf_scene):
        scene, cam_cfg = bsdf_scene
        config = small_config(clamp=0.75)
        mega, wave = render_both(scene, cam_cfg, config)
        np.testing.assert_allclose(mega, wave, atol=2e-4)

    def test_non_binding_clamp_is_exact(self, bsdf_scene):
        """A clamp no sample reaches must reproduce the unclamped
        estimate bitwise (the clamp composes as min, nothing else)."""
        scene, cam_cfg = bsdf_scene
        mega_off, wave_off = render_both(scene, cam_cfg, small_config())
        mega_on, wave_on = render_both(
            scene, cam_cfg, small_config(clamp=1e9)
        )
        np.testing.assert_array_equal(mega_off, mega_on)
        np.testing.assert_array_equal(wave_off, wave_on)


def test_jit_cache_stable(bsdf_scene):
    """Repeated steps reuse the compiled executable (no retrace)."""
    scene, cam_cfg = bsdf_scene
    config = small_config()
    camera = build_camera(cam_cfg, config.width / config.height)
    s = progressive.init_state(config)
    s = wavefront.render_step(s, scene, camera, config)
    n0 = wavefront.render_step._cache_size()
    s = wavefront.render_step(s, scene, camera, config)
    assert wavefront.render_step._cache_size() == n0
    jax.block_until_ready(s.accum)
