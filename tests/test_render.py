"""End-to-end render tests: determinism, progressive equivalence, physics.

SURVEY.md §4(b,f): fixed-seed golden behavior, statistical validation
against the independent NumPy oracle, and Monte Carlo variance decay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils import image
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig

from tests import oracle


@pytest.fixture(scope="module")
def cornell():
    scene, cam_cfg = scenes.cornell_sphere()
    return scene, cam_cfg


class TestDeterminism:
    def test_same_seed_same_image(self, cornell):
        scene, cam_cfg = cornell
        cfg = RenderConfig(width=24, height=24, samples_per_pixel=4,
                           max_depth=4, seed=3)
        cam = build_camera(cam_cfg, 1.0)
        a = np.asarray(progressive.render_once(scene, cam, cfg))
        b = np.asarray(progressive.render_once(scene, cam, cfg))
        np.testing.assert_array_equal(a, b)

    def test_different_seed_different_image(self, cornell):
        scene, cam_cfg = cornell
        cam = build_camera(cam_cfg, 1.0)
        a = np.asarray(progressive.render_once(
            scene, cam, RenderConfig(width=24, height=24,
                                     samples_per_pixel=4, max_depth=4,
                                     seed=0)))
        b = np.asarray(progressive.render_once(
            scene, cam, RenderConfig(width=24, height=24,
                                     samples_per_pixel=4, max_depth=4,
                                     seed=1)))
        assert np.abs(a - b).max() > 1e-4

    def test_progressive_equals_oneshot(self, cornell):
        """N steps of K samples == one render of N*K samples, exactly:
        the RNG is counter-based over the global sample index."""
        scene, cam_cfg = cornell
        cam = build_camera(cam_cfg, 1.0)
        cfg = RenderConfig(width=16, height=16, samples_per_pixel=8,
                           max_depth=4, seed=5, samples_per_step=2)
        state = progressive.init_state(cfg)
        for _ in range(4):
            state = progressive.render_step(state, scene, cam, cfg)
        stepped = np.asarray(progressive.resolve(state))
        oneshot = np.asarray(progressive.render_once(scene, cam, cfg))
        np.testing.assert_allclose(stepped, oneshot, rtol=1e-5, atol=1e-6)
        assert int(state.spp) == 8


class TestPhysics:
    def test_matches_numpy_oracle(self, cornell):
        """Two independent unbiased estimators converge to the same image.

        16×16 Cornell, comparing means with a noise-aware tolerance.
        """
        scene, cam_cfg = cornell
        cam = build_camera(cam_cfg, 1.0)
        cfg = RenderConfig(width=8, height=8, samples_per_pixel=512,
                           max_depth=5, seed=11)
        ours = np.clip(np.asarray(progressive.render_once(scene, cam, cfg)), 0, 2)
        ref_a = np.clip(oracle.render(scene, cam_cfg, 8, 8, 512, 5, seed=99), 0, 2)
        ref_b = np.clip(oracle.render(scene, cam_cfg, 8, 8, 512, 5, seed=17), 0, 2)

        # Self-calibrating: the oracle's own seed-to-seed RMSE is the Monte
        # Carlo noise floor; a biased estimator would sit far outside it.
        # (Verified offline: at 8192 spp the two estimators agree to 0.005.)
        floor = image.rmse(ref_a, ref_b)
        ours_err = image.rmse(ours, ref_a)
        assert ours_err < max(2.0 * floor, 0.02), (
            f"RMSE vs oracle {ours_err} exceeds 2x noise floor {floor}"
        )

    def test_white_furnace(self):
        """Furnace test: albedo-ρ sphere in a uniform unit environment →
        radiance = Σ ρ^k over max_depth bounces (geometric series)."""
        b = SceneBuilder()
        rho = 0.8
        m = b.lambertian((rho, rho, rho))
        b.add_sphere((0.0, 0.0, 0.0), 1.0, m)
        scene = b.build()
        cam_cfg = CameraConfig(position=(0, 0, 4), look_at=(0, 0, 0),
                               vfov_degrees=25.0)
        cam = build_camera(cam_cfg, 1.0)
        depth = 6
        cfg = RenderConfig(width=8, height=8, samples_per_pixel=512,
                           max_depth=depth, seed=2, background="white")
        img = np.asarray(progressive.render_once(scene, cam, cfg))
        # Expected: first escape after k=1..depth-1 bounces each contributes
        # rho^k; plus paths still alive at cutoff contribute nothing.
        # Center pixels hit the sphere: L = sum_{k=1}^{depth-1} is wrong —
        # every bounce either escapes (add rho^k) or re-hits the sphere.
        # For a convex sphere, a cosine-sampled bounce from the surface
        # re-hits with some probability; the exact series still sums to
        # rho/(1-rho) as depth→∞ IF every path eventually escapes. With
        # finite depth the estimate is biased low, so assert a bracket.
        center = img[3:5, 3:5].mean()
        lower = rho**1 * 0.85  # at least the single-bounce term, mostly
        upper = rho / (1 - rho)
        assert lower < center < upper * 1.02, center

    def test_variance_decay(self, cornell):
        """Monte Carlo error ~ 1/√spp: quadrupling spp halves RMSE."""
        scene, cam_cfg = cornell
        cam = build_camera(cam_cfg, 1.0)

        def render(spp, seed):
            cfg = RenderConfig(width=12, height=12, samples_per_pixel=spp,
                               max_depth=4, seed=seed)
            return np.asarray(progressive.render_once(scene, cam, cfg))

        truth = render(1024, 0)
        e_low = [image.rmse(render(16, s), truth) for s in (1, 2, 3)]
        e_high = [image.rmse(render(256, s), truth) for s in (4, 5, 6)]
        ratio = np.mean(e_low) / np.mean(e_high)
        # Ideal ratio = 4 (√(256/16)); allow wide slack for small images.
        assert ratio > 2.0, f"variance decay ratio {ratio}"


class TestWaveRestructuring:
    """Wave chunking and live-first compaction are pure reorderings —
    both must be BITWISE identical to the plain full-wave loop
    (megakernel.MAX_WAVE_RAYS / COMPACT_DEPTH docstrings)."""

    def _render(self, scene, cam_cfg, cfg):
        from pathtracing_tpu.models import megakernel

        cam = build_camera(cam_cfg, 1.0)
        return np.asarray(megakernel.render_samples(
            scene, cam, cfg, jnp.int32(0), 2, jnp.uint32(0)
        ))

    def test_chunked_wave_bitwise(self, cornell):
        from pathtracing_tpu.models import megakernel

        scene, cam = cornell
        cfg = RenderConfig(width=16, height=16, samples_per_pixel=2,
                           max_depth=4, seed=0)
        full = self._render(scene, cam, cfg)
        old = megakernel.MAX_WAVE_RAYS
        try:
            megakernel.MAX_WAVE_RAYS = 16 * 4   # force 4 row chunks
            chunked = self._render(scene, cam, cfg)
        finally:
            megakernel.MAX_WAVE_RAYS = old
        np.testing.assert_array_equal(full, chunked)

    def test_chunked_prime_rows_bitwise(self, cornell):
        """A block height with no divisor under the chunk cap (prime 13)
        must take the padded ceil-split path, not degrade to 1-row
        chunks — and stay bitwise identical to the unchunked render."""
        from pathtracing_tpu.models import megakernel

        scene, cam = cornell
        cfg = RenderConfig(width=16, height=13, samples_per_pixel=2,
                           max_depth=4, seed=0)
        full = self._render(scene, cam, cfg)
        old = megakernel.MAX_WAVE_RAYS
        try:
            megakernel.MAX_WAVE_RAYS = 16 * 4   # cap 4 rows; 13 is prime
            chunked = self._render(scene, cam, cfg)
        finally:
            megakernel.MAX_WAVE_RAYS = old
        np.testing.assert_array_equal(full, chunked)

    def test_compaction_bitwise(self, cornell):
        from pathtracing_tpu.models import megakernel

        scene, cam = cornell
        # max_depth 8 triggers compaction — but only on the DNF route,
        # so force the interpret-mode cluster kernel (CPU default is the
        # bvh walk, where compaction is gated off as pure overhead).
        cfg = RenderConfig(width=16, height=16, samples_per_pixel=2,
                           max_depth=8, seed=0,
                           traversal="cluster_interpret")
        compacted = self._render(scene, cam, cfg)
        old = megakernel.COMPACT_DEPTHS
        try:
            megakernel.COMPACT_DEPTHS = ()   # disable all compactions
            plain = self._render(scene, cam, cfg)
        finally:
            megakernel.COMPACT_DEPTHS = old
        np.testing.assert_array_equal(compacted, plain)


class TestPreviewResolve:
    def test_resolve_preview_mean_pools(self):
        """Device-side preview downsample = mean pool of resolve(),
        cropping edge rows/cols short of a full window."""
        h, w, f = 11, 14, 4
        accum = jnp.asarray(
            np.random.default_rng(1).random((h, w, 3), np.float32) * 8
        )
        state = progressive.RenderState(
            accum=accum, spp=jnp.int32(2), seed=jnp.uint32(0)
        )
        small = np.asarray(progressive.resolve_preview(state, f))
        assert small.shape == (h // f, w // f, 3)
        full = np.asarray(progressive.resolve(state))
        ref = full[:8, :12].reshape(2, 4, 3, 4, 3).mean(axis=(1, 3))
        np.testing.assert_allclose(small, ref, rtol=1e-6)


class TestImageIO:
    def test_png_roundtrip(self):
        r = np.random.default_rng(0)
        img = r.integers(0, 256, (17, 23, 3), np.uint8)
        data = image.encode_png(img)
        back = image.decode_png(data)
        np.testing.assert_array_equal(img, back)

    def test_tonemap_range(self):
        lin = jnp.array([[[0.0, 0.5, 1.0], [2.0, -1.0, 0.0031308]]])
        out = np.asarray(image.tonemap(lin))
        assert out.dtype == np.uint8
        assert out[0, 0, 0] == 0 and out[0, 1, 0] == 255 and out[0, 1, 1] == 0

    def test_srgb_linearity_split(self):
        # Below the knee sRGB is linear ×12.92.
        v = image.linear_to_srgb(jnp.float32(0.002))
        assert float(v) == pytest.approx(0.002 * 12.92, rel=1e-4)


class TestTonemapCurves:
    def test_aces_monotone_and_bounded(self):
        x = jnp.linspace(0.0, 20.0, 512)
        y = np.asarray(image.aces_film(x))
        assert (np.diff(y) >= -1e-7).all()          # monotone
        assert y.min() >= 0.0 and y.max() <= 1.0    # bounded
        # Highlights roll off instead of clipping: at 2x mid-grey the
        # curve is still below 1 while plain clip saturates.
        assert y[np.searchsorted(np.asarray(x), 2.0)] < 0.95

    def test_tonemap_exposure_and_curve(self):
        lin = jnp.full((4, 4, 3), 0.18, jnp.float32)
        dim = np.asarray(image.tonemap(lin, exposure=0.5))
        bright = np.asarray(image.tonemap(lin, exposure=2.0))
        assert bright.mean() > dim.mean()
        aces = np.asarray(image.tonemap(lin, curve="aces"))
        clip = np.asarray(image.tonemap(lin))
        assert not np.array_equal(aces, clip)

    @pytest.mark.parametrize("fn", [image.reinhard, image.filmic_hable])
    def test_extra_curves_monotone_and_bounded(self, fn):
        x = jnp.linspace(0.0, 20.0, 512)[:, None].repeat(3, axis=1)
        y = np.asarray(fn(x))
        assert (np.diff(y[:, 0]) >= -1e-6).all()
        assert y.min() >= 0.0 and y.max() <= 1.0
        # Soft rolloff: 2x mid-grey still below saturation.
        assert y[np.searchsorted(np.linspace(0, 20, 512), 2.0), 0] < 0.97

    def test_reinhard_preserves_hue(self):
        rgb = jnp.asarray([[2.0, 1.0, 0.5]], jnp.float32)
        out = np.asarray(image.reinhard(rgb))[0]
        ratio = out / np.array([2.0, 1.0, 0.5])
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-5)

    def test_all_curves_dispatch(self):
        lin = jnp.full((2, 2, 3), 0.5, jnp.float32)
        outs = {c: np.asarray(image.tonemap(lin, curve=c)).mean()
                for c in ("clip", "aces", "reinhard", "filmic")}
        assert len({round(v, 3) for v in outs.values()}) >= 3
