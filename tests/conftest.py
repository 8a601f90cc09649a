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

# Subprocess tests (CLI end-to-end) run with cwd=tmp_path; the package is
# used from the source tree (not pip-installed), so child interpreters
# need the repo root on PYTHONPATH.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = (_REPO + os.pathsep + _pp) if _pp else _REPO
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
