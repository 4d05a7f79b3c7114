"""OpenEXR float output (utils/exr.py)."""

import numpy as np

from pathtracing_tpu.utils import exr, image


def test_roundtrip_exact():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.0, 50.0, (23, 37, 3)).astype(np.float32)
    img[3, 5] = (0.0, 1e-20, 7e8)  # extremes survive float32 verbatim
    path = "/tmp/_exr_rt.exr"
    exr.write_exr(path, img)
    back = exr.read_exr(path)
    np.testing.assert_array_equal(back, img)


def test_write_image_dispatch(tmp_path):
    img = np.linspace(0.0, 4.0, 8 * 6 * 3, dtype=np.float32)
    img = img.reshape(6, 8, 3)
    path = tmp_path / "out.exr"
    image.write_image(str(path), img, exposure=2.0)
    back = exr.read_exr(str(path))
    np.testing.assert_allclose(back, img * 2.0, rtol=1e-6)


def test_cli_exr_output(tmp_path):
    from pathtracing_tpu import render as render_cli

    out = tmp_path / "r.exr"
    rc = render_cli.main([
        "--scene", "cornell_sphere", "--width", "16", "--height", "16",
        "--spp", "2", "--spp-per-step", "2", "--max-depth", "2",
        "--out", str(out),
    ])
    assert rc == 0
    img = exr.read_exr(str(out))
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
    assert img.max() > 0.0
