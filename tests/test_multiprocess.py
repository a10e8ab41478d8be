"""True multi-process distributed test: 2 OS processes x 4 virtual CPU
devices each run ONE plain train step over a shared jax.distributed mesh.

The single-process 8-device mesh tests (test_train.py) validate the SPMD
math; this validates the cross-process machinery the reference delegates to
Lightning DDP/NCCL (train.py:132-143): coordinator bring-up, gloo CPU
collectives, per-process local batch blocks assembled with
``jax.make_array_from_process_local_data`` (parallel/mesh.py shard_batch),
and pmean'd gradients/metrics agreeing across processes."""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(stdout: str):
    m = re.search(r"^MPRESULT (.+)$", stdout, re.M)
    assert m, f"no MPRESULT line in output:\n{stdout}"
    fields = dict(kv.split("=", 1) for kv in m.group(1).split())
    return fields


@pytest.mark.slow  # ~10 min cold (two CPU compiles on a serialized core)
def test_two_process_train_step():
    from facegantts_tpu.utils.hostenv import cpu_subprocess_env

    env = cpu_subprocess_env(4, repo_root=REPO)
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", WORKER, str(pid), "2", str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("two-process train step timed out (900 s)")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{out}"

    r0, r1 = (_parse(o) for o in outs)
    assert {r0["proc"], r1["proc"]} == {"0", "1"}
    assert r0["devices"] == r1["devices"] == "8"
    assert r0["local"] == r1["local"] == "4"
    # pmean'd metrics and the post-update param checksum must agree across
    # processes (bit-for-bit: both sides reduce over the same global mesh)
    for key in r0:
        if key in ("proc",):
            continue
        a, b = float(r0[key]), float(r1[key])
        assert a == pytest.approx(b, rel=1e-6), (key, a, b)
