"""Subprocess environments for pure-CPU JAX children.

This image's site hook pre-imports JAX with the experimental axon TPU-tunnel
plugin as the default platform (``JAX_PLATFORMS=axon`` + ``/root/.axon_site``
on PYTHONPATH).  A live backend cannot be switched off in-process, so every
virtual-multi-device CPU run (the driver's multi-chip dry run, the
two-process ``jax.distributed`` test) happens in a fresh child process with
the axon knobs scrubbed.  This module is the single definition of that
scrub, shared by ``__graft_entry__.dryrun_multichip`` and
``tests/test_multiprocess.py`` (replaces the reference's implicit reliance
on Lightning to spawn per-GPU worker processes, train.py:132-143)."""

import os
import sys
from typing import Dict, Optional, Sequence


def cpu_subprocess_env(
    n_devices: int,
    repo_root: Optional[str] = None,
    extra_xla_flags: Sequence[str] = (),
    base: Optional[Dict[str, str]] = None,
) -> Dict[str, str]:
    """Environment for a child that must resolve the pure-CPU JAX platform
    with ``n_devices`` virtual devices.

    - drops every axon/TPU/libtpu knob and the ``.axon_site`` PYTHONPATH
      entry so the axon plugin never registers in the child;
    - raises the XLA:CPU collective rendezvous timeouts (few-core hosts
      serialize the virtual devices; the 40 s default aborts the process);
    - caps the ISA at AVX2 so persistent-compile-cache loads survive the
      AOT loader's host-feature check (at native ISA, XLA:CPU bakes
      +prefer-no-gather/+prefer-no-scatter tuning pseudo-features into the
      executable, and every cache load silently falls back to a full
      recompile — measured as a re-paid ~45 min dry run)."""
    if repo_root is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(base if base is not None else os.environ)
    for key in list(env):
        up = key.upper()
        if up.startswith(("AXON", "PALLAS_AXON", "TPU_", "LIBTPU", "PJRT")):
            env.pop(key)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root]
        + [
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p and p != repo_root
        ]
    )
    env["XLA_FLAGS"] = " ".join(
        [
            f"--xla_force_host_platform_device_count={n_devices}",
            "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600",
            "--xla_cpu_collective_call_terminate_timeout_seconds=3600",
            "--xla_cpu_max_isa=AVX2",
        ]
        + list(extra_xla_flags)
        + [
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "force_host_platform_device_count" not in f
            and "collective_call" not in f
            and "max_isa" not in f
        ]
    )
    return env
