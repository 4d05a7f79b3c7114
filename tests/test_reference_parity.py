"""Golden parity with the reference compute kernel (`Test.hlsl:1-40`).

An independent NumPy transliteration of the HLSL is the oracle; the jitted
parity model must match it to float tolerance, per SURVEY.md §7 phase 1
("reproduce the reference kernel's exact output image"). Also documents the
reference's hard-coded-resolution quirk (SURVEY.md §0.1.5) that we support
but do not default to.
"""

import numpy as np

from pathtracing_tpu.models.reference import render_reference


def numpy_reference(height, width, res=None):
    """Direct NumPy transliteration of Test.hlsl (independent of jax code)."""
    rx, ry = res if res else (width, height)
    img = np.zeros((height, width, 4), np.float32)
    for y in range(height):
        for x in range(width):
            uv = np.array([x / rx, y / ry], np.float32) * 2.0 - 1.0
            cam = np.array([0.0, 0.0, 1.0], np.float32)
            d = np.array([uv[0], uv[1], -1.0], np.float32)
            d /= np.linalg.norm(d)
            oc = cam
            a = float(d @ d)
            b = 2.0 * float(oc @ d)
            c = float(oc @ oc) - 0.25
            disc = b * b - 4 * a * c
            if disc > 0:
                t = (-b - np.sqrt(disc)) / (2 * a)
                p = cam + t * d
                n = p / np.linalg.norm(p)
                img[y, x] = (*(n * 0.5 + 0.5), 1.0)
            else:
                img[y, x] = (uv[0], uv[1], 0.0, 1.0)
    return img


class TestReferenceParity:
    def test_golden_64(self):
        ours = np.asarray(render_reference(64, 64))
        golden = numpy_reference(64, 64)
        assert np.abs(ours - golden).max() < 1e-5

    def test_golden_rectangular(self):
        ours = np.asarray(render_reference(48, 96))
        golden = numpy_reference(48, 96)
        assert np.abs(ours - golden).max() < 1e-5

    def test_hardcoded_resolution_quirk(self):
        """Reference bug we can reproduce on demand: uv computed against
        1080×1080 while rendering 1920×1080 stretches the sphere
        (`Test.hlsl:6` vs `Renderer.cs:1020`)."""
        quirk = np.asarray(render_reference(54, 96, resolution=(54, 54)))
        golden = numpy_reference(54, 96, res=(54, 54))
        assert np.abs(quirk - golden).max() < 1e-5
        # And it differs from the corrected mapping.
        fixed = np.asarray(render_reference(54, 96))
        assert np.abs(quirk - fixed).max() > 0.1

    def test_hit_region_structure(self):
        """Sphere (r=.5 at origin, eye at z=1) subtends the center; corners
        miss and show the uv gradient."""
        img = np.asarray(render_reference(64, 64))
        # Center pixel: hit, normal ≈ +z → color ≈ (.5, .5, 1).
        c = img[32, 32]
        assert abs(c[2] - 1.0) < 0.05 and abs(c[0] - 0.5) < 0.05
        # Corner: miss, uv gradient (negative uv clamps to 0 in display but
        # raw buffer keeps the values — reference writes raw floats too).
        assert img[0, 0][0] < 0.0 and img[0, 0][1] < 0.0
