"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The reference tests multi-node behavior only under real mpirun; we can do
better — JAX's host-platform device count gives us an 8-device mesh on CPU,
so the sharded code paths are exercised in every CI run.
"""

import os

# NOTE: the axon TPU plugin ignores JAX_PLATFORMS; JAX_PLATFORM_NAME +
# jax.config both work.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
