"""ops/pgather.gather_rows — the Pallas dynamic_gather row fetch.

Contract: bit-identical to ``jnp.take(table, clip(idx), axis=0)`` on
every backend and every shape (gathers are exact copies, PERF.md
r5d/r5e). The kernel path is exercised in Pallas interpret mode here
(repo convention for TPU-only kernels); the on-chip bitwise A/B
(masked-sum vs gather light-selection modes, and pgather vs jnp.take
at four table shapes) was verified on the v5e directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_tpu.ops import pgather


def _ref(table, idx):
    return jnp.take(table, jnp.clip(idx, 0, table.shape[0] - 1), axis=0)


@pytest.mark.parametrize(
    "L,W,N",
    [
        (288, 24, 1000),     # many_lights_demo shape, ragged N
        (130, 24, 4096),     # ragged L (pads to 256)
        (128, 8, 1024),      # exact multiples
        (2312, 24, 2048),    # multi-chunk table (19 chunks)
        (7, 16, 300),        # tiny table, single chunk
    ],
)
def test_kernel_matches_take_bitwise(L, W, N):
    table = jax.random.normal(jax.random.PRNGKey(0), (L, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, L, jnp.int32)
    got = pgather.gather_rows(table, idx, interpret=True)
    want = _ref(table, idx)
    assert got.shape == (N, W)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_out_of_range_indices_clamp():
    table = jnp.arange(40, dtype=jnp.float32).reshape(5, 8)
    idx = jnp.asarray([-3, 0, 4, 7, 100], jnp.int32)
    got = pgather.gather_rows(table, idx, interpret=True)
    want = _ref(table, idx)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_cpu_fallback_is_take():
    # On a non-TPU backend the public entry point must return take()
    # results exactly (no kernel, no layout surprises).
    table = jax.random.normal(jax.random.PRNGKey(2), (64, 24), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(3), (512,), 0, 64, jnp.int32)
    got = pgather.gather_rows(table, idx)
    assert np.array_equal(np.asarray(got), np.asarray(_ref(table, idx)))


def test_jit_and_grad_safe_shapes():
    # gather_rows must be jittable with static table shape.
    table = jax.random.normal(jax.random.PRNGKey(4), (96, 8), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(5), (257,), 0, 96, jnp.int32)
    got = jax.jit(pgather.gather_rows)(table, idx)
    assert np.array_equal(np.asarray(got), np.asarray(_ref(table, idx)))
