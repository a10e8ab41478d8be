"""Test harness: run all tests on a virtual 8-device CPU mesh.

XLA flags must be set before JAX initializes (SURVEY.md §4: distributed tests
without TPUs via xla_force_host_platform_device_count).

CRITICAL platform note: this image's site hook PRE-IMPORTS jax at interpreter
startup with the config already set to ``jax_platforms="axon,cpu"`` — so
setting the JAX_PLATFORMS *env var* here is a NO-OP (the config value, fixed
at import time, wins) and the TPU-tunnel plugin stays the DEFAULT platform.
Any test array/dispatch not explicitly pinned to CPU then goes through the
tunnel, and when the tunnel flaps the op blocks forever (observed: a plain
``mu[1, 2:]`` slice stuck >5 min inside ``_array_shard_arg`` — the round-2
"full suite never finishes" failure).  The backend, however, is NOT yet
initialized at startup, so ``jax.config.update("jax_platforms", "cpu")``
below still excludes the axon plugin entirely; tests never touch the tunnel.
"""

import os
import sys

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

# Pure-CPU platform, via CONFIG (see module docstring: the env var is dead
# on this image because jax is pre-imported at startup).  Must run before
# the first jax.devices()/dispatch anywhere in the test session.
jax.config.update("jax_platforms", "cpu")

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
