"""Test configuration: CPU platform with 8 virtual devices.

The reference tests multi-node behavior only under real mpirun; here the
host-platform device count gives an 8-device mesh on CPU, which
tests/test_parallel.py uses to check the sharded step against the
single-device step.  Everything else runs unsharded on device 0.
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
# NOTE: the persistent compile cache is deliberately NOT enabled — a
# cache write segfaulted mid-suite (jax compilation_cache.py
# put_executable_and_time via zstandard), and a nondeterministic crash
# is worse than re-compiling on suite re-runs.
