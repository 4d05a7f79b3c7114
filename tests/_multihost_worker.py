"""Worker process for test_multihost: one host of a 2-process DCN mesh.

Launched with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID set; each process owns ONE virtual CPU device, so the
global mesh spans processes and every collective crosses the (loopback)
DCN boundary. Asserts the mesh assembles and a psum over it sums
contributions from both hosts, then prints MULTIHOST_OK.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pathtracing_tpu.parallel import mesh as mesh_mod  # noqa: E402

mesh_mod.multihost_init()  # the hook under test

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
assert len(jax.local_devices()) == 1

mesh = mesh_mod.make_mesh(2, 1)


@jax.jit
def cross_host_sum():
    def body():
        me = jax.lax.axis_index("tiles").astype(jnp.float32)
        return jax.lax.psum(2.0 ** me, "tiles")

    return shard_map(body, mesh=mesh, in_specs=(), out_specs=P())()


total = float(cross_host_sum())
assert total == 3.0, total  # 2^0 + 2^1 — both hosts contributed
print("MULTIHOST_OK", flush=True)
