"""Independent NumPy path tracer — the CPU oracle for statistical tests.

Deliberately shares NO code with the JAX engine (`pathtracing_tpu`): scalar
ray loops, brute-force intersection (no BVH), and numpy Generator RNG. Two
correct unbiased estimators of the same scene must converge to the same
image, so the tests compare mean images by RMSE with sample-count-aware
tolerances. This plays the role SURVEY.md §4 assigns to the "fake backend"
oracle the reference lacks.
"""

from __future__ import annotations

import numpy as np

TYPE_LAMBERTIAN = 0
TYPE_METAL = 1
TYPE_DIELECTRIC = 2
TYPE_EMISSIVE = 3

T_MIN = 1e-3


def _normalize(v):
    return v / max(np.linalg.norm(v), 1e-12)


class OracleScene:
    """Plain-array scene mirroring the pytree layout (built from a Scene)."""

    def __init__(self, scene):
        g = lambda a: np.asarray(a, np.float64)
        self.sph_center = g(scene.sph_center)
        self.sph_radius = g(scene.sph_radius)
        self.sph_mat = np.asarray(scene.sph_mat)
        self.tri_v0 = g(scene.tri_v0)
        self.tri_e1 = g(scene.tri_e1)
        self.tri_e2 = g(scene.tri_e2)
        self.tri_mat = np.asarray(scene.tri_mat)
        self.mat_type = np.asarray(scene.mat_type)
        self.mat_albedo = g(scene.mat_albedo)
        self.mat_param = g(scene.mat_param)
        self.mat_emit = g(scene.mat_emit)


def intersect(scene: OracleScene, o, d):
    """Brute force closest hit. Returns (t, normal, mat_id) or (inf,..)."""
    best_t, best_n, best_m = np.inf, None, -1

    # Spheres (vectorized quadratic).
    oc = o[None, :] - scene.sph_center
    a = np.dot(d, d)
    half_b = oc @ d
    c = np.sum(oc * oc, axis=1) - scene.sph_radius**2
    disc = half_b * half_b - a * c
    ok = disc > 0
    if ok.any():
        sq = np.sqrt(np.maximum(disc, 0))
        t0 = (-half_b - sq) / a
        t1 = (-half_b + sq) / a
        t = np.where(t0 > T_MIN, t0, t1)
        t = np.where(ok & (t > T_MIN), t, np.inf)
        i = int(np.argmin(t))
        if t[i] < best_t:
            best_t = float(t[i])
            p = o + best_t * d
            best_n = (p - scene.sph_center[i]) / scene.sph_radius[i]
            best_m = int(scene.sph_mat[i])

    # Triangles (vectorized Möller–Trumbore).
    pvec = np.cross(d[None, :], scene.tri_e2)
    det = np.sum(scene.tri_e1 * pvec, axis=1)
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1e-12, det)
    tvec = o[None, :] - scene.tri_v0
    u = np.sum(tvec * pvec, axis=1) * inv
    qvec = np.cross(tvec, scene.tri_e1)
    v = np.sum(d[None, :] * qvec, axis=1) * inv
    t = np.sum(scene.tri_e2 * qvec, axis=1) * inv
    ok = (
        (np.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
        & (t > T_MIN) & (t < best_t)
    )
    t = np.where(ok, t, np.inf)
    i = int(np.argmin(t))
    if t[i] < best_t:
        best_t = float(t[i])
        best_n = _normalize(np.cross(scene.tri_e1[i], scene.tri_e2[i]))
        best_m = int(scene.tri_mat[i])

    return best_t, best_n, best_m


def trace(scene: OracleScene, o, d, rng: np.random.Generator,
          max_depth: int, background: str):
    radiance = np.zeros(3)
    throughput = np.ones(3)
    for _ in range(max_depth):
        t, n_geo, m = intersect(scene, o, d)
        if not np.isfinite(t):
            if background == "gradient":
                k = 0.5 * (d[1] + 1.0)
                env = (1 - k) * np.ones(3) + k * np.array([0.5, 0.7, 1.0])
                radiance += throughput * env
            break
        front = np.dot(d, n_geo) < 0
        n = n_geo if front else -n_geo
        mtype = int(scene.mat_type[m])
        radiance += throughput * scene.mat_emit[m]
        p = o + t * d

        if mtype == TYPE_EMISSIVE:
            break
        if mtype == TYPE_LAMBERTIAN:
            # Cosine hemisphere via normal + uniform sphere point.
            while True:
                s = rng.normal(size=3)
                if np.linalg.norm(s) > 1e-9:
                    break
            d_new = _normalize(n + _normalize(s))
            if np.linalg.norm(n + _normalize(s)) < 1e-9:
                d_new = n
            throughput = throughput * scene.mat_albedo[m]
        elif mtype == TYPE_METAL:
            refl = d - 2 * np.dot(d, n) * n
            fuzz = scene.mat_param[m]
            while True:
                s = rng.uniform(-1, 1, 3)
                if np.dot(s, s) < 1:
                    break
            d_new = _normalize(refl + fuzz * s)
            if np.dot(d_new, n) <= 0:
                break
            throughput = throughput * scene.mat_albedo[m]
        else:  # dielectric
            ior = max(scene.mat_param[m], 1.0)
            eta = 1.0 / ior if front else ior
            cos_i = min(-np.dot(d, n), 1.0)
            sin_i = np.sqrt(max(1 - cos_i * cos_i, 0))
            r0 = ((1 - eta) / (1 + eta)) ** 2
            refl_p = r0 + (1 - r0) * (1 - cos_i) ** 5
            if eta * sin_i > 1.0 or rng.uniform() < refl_p:
                d_new = d - 2 * np.dot(d, n) * n
            else:
                perp = eta * (d + cos_i * n)
                d_new = perp - np.sqrt(max(1 - np.dot(perp, perp), 0)) * n
            d_new = _normalize(d_new)
            throughput = throughput * scene.mat_albedo[m]

        o, d = p, d_new
    return radiance


def render(scene, camera_cfg, width, height, spp, max_depth, seed,
           background="black"):
    """Mean-radiance image (H, W, 3) float64 via the oracle estimator."""
    import math

    oracle = OracleScene(scene)
    rng = np.random.default_rng(seed)

    pos = np.asarray(camera_cfg.position, np.float64)
    look = np.asarray(camera_cfg.look_at, np.float64)
    up = np.asarray(camera_cfg.up, np.float64)
    theta = math.radians(camera_cfg.vfov_degrees)
    half_h = math.tan(theta / 2)
    half_w = (width / height) * half_h
    w_ax = _normalize(pos - look)
    u_ax = _normalize(np.cross(up, w_ax))
    v_ax = np.cross(w_ax, u_ax)

    img = np.zeros((height, width, 3))
    for y in range(height):
        for x in range(width):
            acc = np.zeros(3)
            for _ in range(spp):
                s = (x + rng.uniform()) / width
                t = (height - 1 - y + rng.uniform()) / height
                film = (
                    pos - half_w * u_ax - half_h * v_ax - w_ax
                    + 2 * half_w * s * u_ax + 2 * half_h * t * v_ax
                )
                d = _normalize(film - pos)
                acc += trace(oracle, pos.copy(), d, rng, max_depth,
                             background)
            img[y, x] = acc / spp
    return img
