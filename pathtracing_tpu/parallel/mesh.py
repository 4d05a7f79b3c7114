"""Device-mesh construction for multi-chip rendering.

The reference is single-GPU with no distributed anything (SURVEY.md §2.1);
this is the TPU-native scaling layer it lacks: a 2D ``jax.sharding.Mesh``
with a ``tiles`` axis (image-space row blocks — each chip owns a stripe of
the accumulation buffer in its HBM) and a ``samples`` axis (sample-space:
same pixels, interleaved sample indices, merged with a psum over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

TILE_AXIS = "tiles"
SAMPLE_AXIS = "samples"


def make_mesh(n_tiles: Optional[int] = None, n_samples: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (tiles, samples) mesh over the available devices.

    Defaults to all devices on the tiles axis. The tiles axis should map to
    contiguous chips so the final row-block all-gather rides ICI neighbors
    (jax's default device order already enumerates the torus coherently).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_tiles is None:
        n_tiles = len(devices) // n_samples
    if n_tiles * n_samples != len(devices):
        raise ValueError(
            f"mesh {n_tiles}x{n_samples} != {len(devices)} devices"
        )
    arr = np.array(devices).reshape(n_tiles, n_samples)
    return Mesh(arr, (TILE_AXIS, SAMPLE_AXIS))


def mesh_from_config(cfg) -> Mesh:
    """Build the mesh described by a ``utils.config.DeviceConfig``.

    ``mesh_shape`` entries map onto (tiles, samples); a 1-element shape
    puts everything on the tiles axis.
    """
    shape = tuple(cfg.mesh_shape)
    n_tiles = shape[0]
    n_samples = shape[1] if len(shape) > 1 else 1
    return make_mesh(n_tiles, n_samples)


def multihost_init() -> None:
    """Initialize multi-host JAX (DCN) when launched under a cluster
    runtime. Safe no-op in single-process runs.

    Must run before any JAX computation. Reads the standard trio of env
    vars; under managed launchers (SLURM/GKE) that set their own
    cluster env, ``jax.distributed.initialize()``'s auto-detection
    kicks in instead. Exercised end-to-end by tests/test_multihost.py
    (two localhost CPU processes assembling one global mesh)."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    n = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if n is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(n),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()
