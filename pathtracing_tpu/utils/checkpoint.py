"""Render-state checkpoint / resume.

The reference has no persistence of any kind (SURVEY.md §5.4) — every run
restarts from scratch. Here the progressive state (accum, spp, seed) is the
whole render, and because the RNG is counter-based over the global sample
index (``ops.rng``), a resumed render is bit-identical to an uninterrupted
one (covered by tests/test_checkpoint.py).

Format: a single .npz with the state arrays plus a config fingerprint that
refuses cross-config resumes (resolution/seed/engine changes invalidate the
accumulation buffer, the way a swapchain resize invalidates the reference's
framebuffers, `Renderer.cs:497-520`).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os

import jax.numpy as jnp
import numpy as np

from pathtracing_tpu.models.progressive import RenderState
from pathtracing_tpu.utils.config import RenderConfig


def config_fingerprint(config: RenderConfig) -> str:
    payload = json.dumps(dataclasses.asdict(config), sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save(path: str, state: RenderState, config: RenderConfig) -> None:
    tmp = path + ".tmp"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp,
        accum=np.asarray(state.accum),
        spp=np.asarray(state.spp),
        seed=np.asarray(state.seed),
        fingerprint=np.frombuffer(
            config_fingerprint(config).encode(), dtype=np.uint8
        ),
    )
    # np.savez appends .npz if missing.
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load(path: str, config: RenderConfig) -> RenderState:
    with np.load(path) as data:
        stored = bytes(data["fingerprint"]).decode()
        want = config_fingerprint(config)
        if stored != want:
            raise ValueError(
                f"checkpoint {path} was written with a different config "
                f"(fingerprint {stored} != {want}); refusing to resume"
            )
        return RenderState(
            accum=jnp.asarray(data["accum"]),
            spp=jnp.asarray(data["spp"]),
            seed=jnp.asarray(data["seed"]),
        )
