"""Bloom post-process (ops/bloom.py).

The reference has no post pipeline (raw blit present,
`RayTracing/Graphics/Renderer.cs:1042-1121`); these tests pin the
framework's bloom contract: identity below threshold, hue-preserving
energy spread above it, monotone halo falloff, and CLI integration.
"""

import numpy as np
import jax.numpy as jnp

from pathtracing_tpu.ops import bloom


def test_below_threshold_is_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 0.4, (48, 64, 3)).astype(np.float32)
    out = np.asarray(bloom.apply_bloom(img, strength=0.3, threshold=1.0))
    # Nothing crosses the knee (threshold - knee = 0.5 > max), so the
    # bright pass is exactly zero and bloom adds exactly nothing.
    np.testing.assert_array_equal(out, img)


def test_zero_strength_is_noop_object():
    img = jnp.ones((8, 8, 3), jnp.float32)
    assert bloom.apply_bloom(img, strength=0.0) is img


def test_bright_spot_spreads_hue_preserving():
    img = np.zeros((64, 64, 3), np.float32)
    img[32, 32] = (40.0, 20.0, 10.0)  # a 2:1:1-ish orange firefly
    out = np.asarray(bloom.apply_bloom(img, strength=0.5, threshold=1.0))
    added = out - img
    assert added.min() >= -1e-6
    # Neighbors gained energy...
    assert added[30, 30].sum() > 1e-4
    # ...and a wide halo exists (pyramid reach far beyond the 5-tap core).
    assert added[32, 48].sum() > 1e-6
    # Hue preserved: the glow keeps the source's channel ratios.
    near = added[31, 31]
    ratio = near / max(near[0], 1e-9)
    np.testing.assert_allclose(ratio, [1.0, 0.5, 0.25], rtol=0.05)


def test_halo_falls_off_monotonically():
    img = np.zeros((64, 64, 3), np.float32)
    img[32, 32] = 100.0
    layer = np.asarray(bloom.bloom_layer(jnp.asarray(img)))
    lum = layer.sum(axis=-1)
    radii = [2, 4, 8, 16, 24]
    vals = [lum[32, 32 + r] for r in radii]
    assert all(a > b for a, b in zip(vals, vals[1:])), vals
    assert vals[0] > 1e-3


def test_energy_scale_is_bounded():
    # The normalized layer never adds more than ~the bright-pass energy.
    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 8.0, (40, 56, 3)).astype(np.float32)
    layer = np.asarray(bloom.bloom_layer(jnp.asarray(img), threshold=1.0))
    bp = np.asarray(bloom._bright_pass(jnp.asarray(img), 1.0, 0.5))
    # Blurs and the bilinear upsample are (near-)energy-preserving per
    # level; the sum of L+1 levels divided by L+1 stays at bright-pass
    # scale. Edge replication can only add a few percent.
    assert layer.sum() <= bp.sum() * 1.15
    assert layer.sum() >= bp.sum() * 0.5


def test_odd_shapes_and_jit_cache():
    # Non-power-of-two and odd dims go through the pad/crop path.
    img = jnp.ones((37, 53, 3), jnp.float32) * 3.0
    out = bloom.apply_bloom(img, strength=0.1)
    assert out.shape == (37, 53, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_cli_bloom_flag(tmp_path):
    from pathtracing_tpu import render as render_cli

    out = tmp_path / "bloom.png"
    rc = render_cli.main([
        "--scene", "cornell_sphere", "--width", "32", "--height", "32",
        "--spp", "2", "--spp-per-step", "2", "--max-depth", "2",
        "--bloom", "0.2", "--out", str(out),
    ])
    assert rc == 0 and out.exists()
