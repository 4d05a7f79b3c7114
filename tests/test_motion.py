"""Camera motion blur: shutter-interval pose interpolation.

A motion camera is the pytree pair (open, close); each sample draws a
shutter time on its own stream (``rng.STREAM_TIME``) and traces through
the lerped pose (``ops/camera.lerp``). Static scenes never touch the
stream, so adding the feature moved no existing fixed-seed image.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.models.scene import SceneBuilder
from pathtracing_tpu.ops import camera as cam_ops
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def _streak_scene():
    b = SceneBuilder()
    lamp = b.emissive((20.0, 20.0, 20.0))
    b.add_sphere((0.0, 0.0, 0.0), 0.15, lamp)
    return b.build()


class TestLerp:
    def test_endpoints(self):
        c0 = cam_ops.build_camera(
            CameraConfig(position=(0, 0, 3), look_at=(0, 0, 0)), 1.0
        )
        c1 = cam_ops.build_camera(
            CameraConfig(position=(2, 0, 3), look_at=(0, 0, 0)), 1.0
        )
        for time, ref in ((0.0, c0), (1.0, c1)):
            got = cam_ops.lerp(c0, c1, jnp.float32(time))
            np.testing.assert_allclose(got.origin, ref.origin, atol=1e-6)
            np.testing.assert_allclose(got.lower_left, ref.lower_left,
                                       atol=1e-5)
            np.testing.assert_allclose(got.u, ref.u, atol=1e-6)

    def test_translation_midpoint_exact(self):
        c0 = cam_ops.build_camera(
            CameraConfig(position=(0, 0, 3), look_at=(0, 0, 0)), 1.0
        )
        c1 = cam_ops.build_camera(
            CameraConfig(position=(4, 0, 3), look_at=(4, 0, 0)), 1.0
        )
        mid = cam_ops.lerp(c0, c1, jnp.float32(0.5))
        np.testing.assert_allclose(mid.origin, [2, 0, 3], atol=1e-6)
        # Pure translation: the frame is unchanged.
        np.testing.assert_allclose(mid.u, c0.u, atol=1e-6)
        np.testing.assert_allclose(mid.w, c0.w, atol=1e-6)

    def test_projection_mismatch_rejected(self):
        c0 = cam_ops.build_camera(CameraConfig(), 1.0)
        c1 = cam_ops.build_camera(
            CameraConfig(projection="ortho"), 1.0
        )
        try:
            cam_ops.lerp(c0, c1, jnp.float32(0.5))
        except ValueError:
            return
        raise AssertionError("expected ValueError")

    def test_resolve_passthrough(self):
        c0 = cam_ops.build_camera(CameraConfig(), 1.0)
        assert cam_ops.resolve(c0) is c0


class TestMotionRender:
    def _render(self, camera, seed=0, spp=16):
        cfg = RenderConfig(width=64, height=64, samples_per_pixel=spp,
                           samples_per_step=spp, max_depth=1, seed=seed)
        return np.asarray(
            progressive.render_once(_streak_scene(), camera, cfg)
        )

    def test_streak_wider_than_static(self):
        """A laterally translating camera smears the lamp into a streak:
        the lit column span grows by about the motion length."""
        cc0 = CameraConfig(position=(0, 0, 4), look_at=(0, 0, 0),
                           vfov_degrees=60.0)
        static = self._render(cam_ops.build_camera(cc0, 1.0))
        cc1 = dataclasses.replace(cc0, position=(1.2, 0, 4),
                                  look_at=(1.2, 0, 0))
        pair = (cam_ops.build_camera(cc0, 1.0),
                cam_ops.build_camera(cc1, 1.0))
        moved = self._render(pair)
        lit_s = (static.sum(-1) > 0.5).any(0).sum()
        lit_m = (moved.sum(-1) > 0.5).any(0).sum()
        assert lit_m > lit_s * 2.0, (lit_s, lit_m)
        # Energy is conserved to MC noise: the streak is dimmer, not
        # brighter (each sample still carries one pose's radiance).
        assert abs(moved.sum() / static.sum() - 1.0) < 0.15

    def test_identical_endpoints_match_static(self):
        """A motion pair whose endpoints coincide must integrate to the
        static image (times draw but the lerp is the identity)."""
        cc = CameraConfig(position=(0, 0, 4), look_at=(0, 0, 0),
                          vfov_degrees=60.0)
        cam = cam_ops.build_camera(cc, 1.0)
        static = self._render(cam)
        degenerate = self._render((cam, cam))
        np.testing.assert_allclose(degenerate, static, atol=1e-5)

    def test_motion_pair_config(self):
        cc = CameraConfig(position=(0, 0, 4),
                          motion_position=(1, 0, 4))
        pair = cc.motion_pair()
        assert pair is not None
        assert pair[0].position == (0, 0, 4)
        assert pair[1].position == (1, 0, 4)
        assert pair[0].motion_position is None
        assert CameraConfig().motion_pair() is None

    def test_wavefront_megakernel_parity(self):
        """Both engines draw the same shutter times (counter RNG) — the
        motion image matches across engines like every other config."""
        from pathtracing_tpu.models import wavefront

        cc0 = CameraConfig(position=(0, 0, 4), look_at=(0, 0, 0),
                           vfov_degrees=60.0)
        cc1 = dataclasses.replace(cc0, position=(0.8, 0, 4),
                                  look_at=(0.8, 0, 0))
        pair = (cam_ops.build_camera(cc0, 1.0),
                cam_ops.build_camera(cc1, 1.0))
        cfg = RenderConfig(width=48, height=48, samples_per_pixel=4,
                           samples_per_step=4, max_depth=2, seed=1)
        scene = _streak_scene()
        mega = np.asarray(progressive.render_once(scene, pair, cfg))
        state = wavefront.render_step(
            progressive.init_state(cfg), scene, pair, cfg
        )
        wf = np.asarray(state.accum) / cfg.samples_per_step
        np.testing.assert_allclose(wf, mega, atol=3e-4)
