"""Test harness: run all tests on a virtual 8-device CPU mesh.

XLA flags must be set before JAX initializes (SURVEY.md §4: distributed tests
without TPUs via xla_force_host_platform_device_count).  Note: on the axon
TPU tunnel, JAX_PLATFORMS=cpu does NOT switch the default platform, so tests
additionally pin the CPU backend via jax.default_device (autouse fixture);
sharding tests build meshes from jax.devices('cpu') explicitly.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _cpu_default_device():
    with jax.default_device(jax.devices("cpu")[0]):
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(37)


def cpu_devices(n: int):
    return jax.devices("cpu")[:n]
