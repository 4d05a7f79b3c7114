"""Many-light selection: packed-gather mode vs the masked-sum path.

Large light tables (ops.lights._GATHER_MIN rows and up) switch the NEE
light pick from one-hot masked-sum (O(L) per vertex) to searchsorted +
one packed row gather (O(1)). The switch is a static table-size
property, so these tests lock its contracts:

- both modes draw bit-identical picks/points/pdfs on the SAME table
  (the gather path is a schedule change, not an estimator change);
- pick frequencies follow the power weights (the estimator's pdf law);
- small-table scenes never build the packed column (their pytrees and
  jit graphs stay untouched — the r3n zero-cost gating contract);
- the many_lights_demo scene renders finite, NEE-lit images.

No reference analogue (the reference has no lights at all,
/root/reference/RayTracing/Shader/Test.hlsl:26-32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtracing_tpu.models import progressive, scenes
from pathtracing_tpu.ops import lights as lights_mod
from pathtracing_tpu.ops.camera import build_camera
from pathtracing_tpu.utils.config import RenderConfig


@pytest.fixture(scope="module")
def demo():
    """many_lights_demo built in FORCED gather mode (the default
    _GATHER_MIN sits above 288 rows since the r4e crossover
    measurement put masked-sum ahead through L ≈ 2.3k)."""
    saved = lights_mod._GATHER_MIN
    lights_mod._GATHER_MIN = 1
    try:
        return scenes.get_scene("many_lights_demo")
    finally:
        lights_mod._GATHER_MIN = saved


def test_forced_gather_table_shape(demo):
    scene, _ = demo
    lt = scene.lights
    assert lt.packed is not None
    assert lt.packed.shape == (lt.v0.shape[0], lights_mod._P_WIDTH)
    # No sphere emitters -> the r4a kind gate stays engaged.
    assert lt.kind is None


def test_default_table_modes_match_crossover():
    """Small tables keep the masked-sum build (no packed column,
    bit-identical legacy pytree/graph); tables at or above the r5e
    re-measured crossover (L >= 192 — sum-count pick + pgather rows,
    PERF.md r5e) build the packed column. many_lights_demo (288 rows)
    crossed over when the crossover dropped from 4096."""
    for name in ("cornell_bsdf", "veach_mis", "screenlight_demo"):
        scene, _ = scenes.get_scene(name)
        assert scene.lights.packed is None, name
    scene, _ = scenes.get_scene("many_lights_demo")
    assert scene.lights.packed is not None
    assert lights_mod._GATHER_MIN == 192


def test_gather_matches_masked_sum_bitwise(demo):
    scene, _ = demo
    lt = scene.lights
    masked = lt._replace(packed=None)   # force the legacy path
    u = jax.random.uniform(jax.random.key(7), (8192, 3),
                           dtype=jnp.float32)
    origin = (jax.random.uniform(jax.random.key(9), (8192, 3),
                                 dtype=jnp.float32) * 6.0 - 3.0)
    for a, b in zip(lights_mod.sample(lt, u),
                    lights_mod.sample(masked, u)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(lights_mod.sample_solid_angle(lt, u, origin),
                    lights_mod.sample_solid_angle(masked, u, origin)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pick_frequencies_follow_power(demo):
    """Empirical pick histogram ≈ the power weights (pdf law of the
    power-weighted estimator, ops/lights.py module docstring)."""
    scene, _ = demo
    lt = scene.lights
    n = lt.v0.shape[0]
    draws = 200_000
    u = jax.random.uniform(jax.random.key(3), (draws,),
                           dtype=jnp.float32)
    idx = np.asarray(jnp.clip(
        jnp.searchsorted(lt.cum, u, side="left"), 0, n - 1))
    counts = np.bincount(idx, minlength=n).astype(np.float64)
    cum = np.asarray(lt.cum, np.float64)
    probs = np.diff(np.concatenate([[0.0], cum]))
    probs = np.maximum(probs, 0.0)
    probs /= probs.sum()
    # Normalized L1 distance vs its analytic MC expectation:
    # E|p_hat - p| = sqrt(2 p (1-p) / (pi n)) per bin (normal approx).
    l1 = np.abs(counts / draws - probs).sum()
    expect_l1 = np.sqrt(2.0 * probs * (1.0 - probs) / (np.pi * draws)).sum()
    assert l1 < 2.0 * expect_l1, (l1, expect_l1)
    # The power-law spread is real: top light picked far more than
    # the median one.
    assert probs.max() > 8.0 * np.median(probs[probs > 0])


def test_many_lights_render_finite(demo):
    scene, camcfg = demo
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=2,
                       samples_per_step=2, max_depth=3, seed=0)
    cam = build_camera(camcfg, 48 / 32)
    state = progressive.init_state(cfg)
    state = progressive.render_step(state, scene, cam, cfg)
    img = np.asarray(progressive.resolve(state))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01   # the panels actually light the hall
