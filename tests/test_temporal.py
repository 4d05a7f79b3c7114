"""Temporal reuse (reprojection + history accumulation, VERDICT r3 #3).

Pins: the ``ops.camera.project`` inverse against ``generate_ray`` on
every projection, the static-camera identity (temporal blending == the
plain running mean of the frames, since reprojection degenerates to a
self-gather), disocclusion rejection (a teleported camera must NOT
reuse history), and the behavioral point: low-spp orbit frames with
temporal reuse land closer to the converged per-frame reference than
the same frames without it.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models import megakernel, progressive, scenes, temporal
from pathtracing_tpu.ops import camera as camera_ops
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import CameraConfig, RenderConfig


def test_project_inverts_generate_ray_all_projections():
    rs = np.random.RandomState(0)
    for proj in camera_ops.PROJECTIONS:
        cfg = CameraConfig(position=(1.0, 2.0, 3.0),
                           look_at=(0.0, 0.5, 0.0), vfov_degrees=55.0,
                           projection=proj)
        cam = build_camera(cfg, 1.5)
        # Stay away from film edges (angular projections fold there).
        s = jnp.asarray(rs.rand(128) * 0.8 + 0.1, jnp.float32)
        t = jnp.asarray(rs.rand(128) * 0.8 + 0.1, jnp.float32)
        zeros = jnp.zeros_like(s)
        o, d = camera_ops.generate_ray(cam, s, t, zeros, zeros)
        p = o + d * jnp.asarray(rs.rand(128, 1) * 4.0 + 0.5, jnp.float32)
        s2, t2, ok = camera_ops.project(cam, p)
        m = np.asarray(ok)
        assert m.mean() > 0.95, proj
        np.testing.assert_allclose(np.asarray(s2)[m], np.asarray(s)[m],
                                   atol=2e-4, err_msg=proj)
        np.testing.assert_allclose(np.asarray(t2)[m], np.asarray(t)[m],
                                   atol=2e-4, err_msg=proj)


def _cornell(size=48, spp=2):
    scene, cam_cfg = scenes.get_scene("cornell_sphere")
    config = RenderConfig(width=size, height=size, samples_per_pixel=spp,
                          max_depth=4, samples_per_step=spp, seed=0,
                          background=scenes.preferred_background(
                              "cornell_sphere"),
                          traversal="cluster_jax")
    return scene, cam_cfg, config


def _frame(scene, camera, config, seed):
    spp = config.samples_per_pixel
    acc = megakernel.render_samples(
        scene, camera, config, jnp.int32(0), spp, jnp.uint32(seed)
    )
    return acc / jnp.float32(spp)


def test_static_camera_blend_is_running_mean():
    """With an unmoving camera the reprojection is a self-lookup and the
    accept mask covers every primary hit, so K temporal frames must
    equal the plain mean of the K frame images on hit pixels."""
    scene, cam_cfg, config = _cornell()
    cam = build_camera(cam_cfg, 1.0)
    state = temporal.init_state(config)
    frames = []
    out = None
    for k in range(3):
        cur = _frame(scene, cam, config, seed=100 + k)
        frames.append(np.asarray(cur))
        out, state = temporal.advance(state, cur, scene, cam, cam,
                                      config)
    _, _, _, valid, _, _, _ = temporal.features(scene, cam, config)
    m = np.asarray(valid)
    assert m.mean() > 0.9           # the box fills the view
    want = np.mean(frames, axis=0)
    np.testing.assert_allclose(np.asarray(out)[m], want[m], atol=2e-3)
    # History length saturates at the frame count on accepted pixels.
    assert np.asarray(state.hist_len)[m].max() == 3.0


def test_disocclusion_rejects_history():
    """Teleporting the camera to the opposite side must reject the
    (now-meaningless) history: the output IS the current frame."""
    scene, cam_cfg, config = _cornell()
    cam_a = build_camera(cam_cfg, 1.0)
    pos = np.asarray(cam_cfg.position)
    look = np.asarray(cam_cfg.look_at)
    cam_b = build_camera(
        dataclasses.replace(
            cam_cfg, position=tuple(map(float, look + (look - pos)))
        ), 1.0,
    )
    state = temporal.init_state(config)
    cur_a = _frame(scene, cam_a, config, seed=7)
    _, state = temporal.advance(state, cur_a, scene, cam_a, cam_a, config)
    cur_b = _frame(scene, cam_b, config, seed=8)
    out, state2 = temporal.advance(state, cur_b, scene, cam_b, cam_a,
                                   config)
    # Nearly every pixel restarts (history length 1).
    frac_restart = float((np.asarray(state2.hist_len) <= 1.0).mean())
    assert frac_restart > 0.95, frac_restart
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(state2.hist_len) <= 1.0],
        np.asarray(cur_b)[np.asarray(state2.hist_len) <= 1.0],
        atol=1e-6,
    )


def test_orbit_temporal_beats_per_frame():
    """A small orbit: after a few frames, the temporally-accumulated
    low-spp frame sits measurably closer to the converged per-frame
    reference than the raw low-spp frame — the wall-clock point of the
    feature (quality of many-spp frames at few-spp cost)."""
    scene, cam_cfg, config = _cornell(size=40, spp=2)
    base = np.asarray(cam_cfg.position, np.float32)
    target = np.asarray(cam_cfg.look_at, np.float32)
    rel = base - target
    r_xz = float(np.hypot(rel[0], rel[2]))
    phi0 = float(np.arctan2(rel[0], rel[2]))

    def cam_at(i, n=5, arc=np.radians(16.0)):
        phi = phi0 + arc * (i / (n - 1) - 0.5)
        pos = target + np.array(
            [r_xz * np.sin(phi), rel[1], r_xz * np.cos(phi)], np.float32
        )
        return build_camera(
            dataclasses.replace(cam_cfg, position=tuple(map(float, pos))),
            1.0,
        )

    state = temporal.init_state(config)
    cam_prev = None
    out = raw = cam = None
    for i in range(5):
        cam = cam_at(i)
        raw = _frame(scene, cam, config, seed=i)
        out, state = temporal.advance(
            state, raw, scene, cam,
            cam if cam_prev is None else cam_prev, config,
        )
        cam_prev = cam

    # Converged reference for the LAST frame's pose (independent seed).
    ref_cfg = dataclasses.replace(config, samples_per_pixel=96,
                                  samples_per_step=96, seed=777)
    st = progressive.init_state(ref_cfg)
    st = progressive.render_step(st, scene, cam, ref_cfg)
    ref = np.asarray(st.accum) / float(st.spp)

    # Score the transport-reuse claim OFF the emitter-silhouette band:
    # those pixels' radiance is sub-pixel light coverage sweeping with
    # the camera — irreducible for ANY reprojection (the velocity cap
    # bounds their staleness instead; see models/temporal.py). On the
    # rest of the image demand the sqrt(#frames)-ish variance win; on
    # the band demand never-materially-worse than the raw frame.
    *_, band, _ = temporal.features(scene, cam, config)
    band = np.asarray(band)
    se_raw = (np.asarray(raw) - ref) ** 2
    se_tmp = (np.asarray(out) - ref) ** 2
    e_raw = float(np.sqrt(se_raw[~band].mean()))
    e_tmp = float(np.sqrt(se_tmp[~band].mean()))
    assert e_tmp < e_raw / 1.5, (e_raw, e_tmp)
    eb_raw = float(np.sqrt(se_raw[band].mean()))
    eb_tmp = float(np.sqrt(se_tmp[band].mean()))
    assert eb_tmp < eb_raw * 1.05, (eb_raw, eb_tmp)


def test_specular_primaries_get_capped_history():
    """cornell_bsdf's mirror/glass spheres are specular primaries: their
    history length must clamp to spec_cap while diffuse walls run to the
    full cap — the anti-ghosting rule for view-dependent radiance."""
    scene, cam_cfg = scenes.get_scene("cornell_bsdf")
    config = RenderConfig(width=32, height=32, samples_per_pixel=2,
                          max_depth=4, samples_per_step=2, seed=0,
                          background="black", traversal="cluster_jax")
    cam = build_camera(cam_cfg, 1.0)
    _, _, _, valid, spec, _, _ = temporal.features(scene, cam, config)
    spec = np.asarray(spec)
    assert spec.any() and not spec.all()       # spheres yes, walls no

    state = temporal.init_state(config)
    for k in range(6):
        cur = _frame(scene, cam, config, seed=k)
        _, state = temporal.advance(state, cur, scene, cam, cam, config,
                                    spec_cap=3.0)
    hl = np.asarray(state.hist_len)
    v = np.asarray(valid)
    assert hl[spec].max() == 3.0
    diffuse = v & ~spec
    assert hl[diffuse].max() == 6.0
