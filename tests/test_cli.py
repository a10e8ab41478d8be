"""CLI surface smoke tests: every module entry point imports and fails
gracefully (usage message, not traceback) when run without inputs."""

import subprocess
import sys

import pytest

ENTRY_POINTS = [
    "facegantts_tpu.data.preprocess",
    "facegantts_tpu.data.lrs2_prep",
    "facegantts_tpu.data.cfd_crop",
    "facegantts_tpu.evaluation.evaluate",
    "facegantts_tpu.evaluation.acc_measure",
    "facegantts_tpu.hyperopt",
    "facegantts_tpu.migrate_checkpoint",
]


@pytest.mark.parametrize("mod", ENTRY_POINTS)
def test_entry_point_importable(mod):
    __import__(mod)


def test_usage_errors_are_clean():
    """No-arg invocations that must exit with a usage error, not a crash."""
    for mod, args in [
        ("facegantts_tpu.data.preprocess", []),           # needs packed_data_dir
        ("facegantts_tpu.data.cfd_crop", []),             # needs source/target
        ("facegantts_tpu.migrate_checkpoint", []),        # needs src/dst
        ("facegantts_tpu.data.lrs2_prep", ["bogus-cmd"]),
    ]:
        proc = subprocess.run(
            [sys.executable, "-m", mod, *args],
            capture_output=True, text=True, timeout=240,
        )
        assert proc.returncode != 0, (mod, proc.stdout)
        assert "Traceback" not in proc.stderr, (mod, proc.stderr[-800:])
