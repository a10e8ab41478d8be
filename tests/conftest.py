"""Test harness: run all tests on a virtual 8-device CPU mesh.

XLA flags must be set before JAX initializes (SURVEY.md §4: distributed tests
without TPUs via xla_force_host_platform_device_count).  Note: on the axon
TPU tunnel, JAX_PLATFORMS=cpu does NOT switch the default platform, so tests
additionally pin the CPU backend via jax.default_device (autouse fixture);
sharding tests build meshes from jax.devices('cpu') explicitly.
"""

import os
import sys

# The axon TPU-tunnel plugin DEADLOCKS multi-device CPU executions on this
# host; tests must run pure-CPU.  Strip it from the path and force the CPU
# platform before any JAX backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# on few-core hosts the virtual devices execute serially, so reaching a
# collective rendezvous can take minutes; the 40 s default aborts the process
if "collective_call_terminate" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
    )
# At the native ISA, XLA:CPU bakes +prefer-no-gather/+prefer-no-scatter
# tuning features into executables that the AOT loader's host-feature check
# rejects, so persistent-cache loads silently recompile from scratch every
# run.  Capping at AVX2 keeps the features out and makes the .jax_cache
# actually reusable (tests are compile-dominated, not vector-width-bound).
if "max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: XLA-CPU compiles of the big conv graphs take
# minutes on this 1-core host; cache them across test runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture(autouse=True)
def _cpu_default_device():
    with jax.default_device(jax.devices("cpu")[0]):
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(37)


def cpu_devices(n: int):
    return jax.devices("cpu")[:n]
