"""Scale-out dossier math (parallel/scaleout.py): regression-guarded
projection from the measured per-chip GAN-step rate to the >=10x reference
training-throughput north star (VERDICT r4 next #3).

The HLO side of the dossier — one pmean per grad tree, no collectives in
While bodies — is asserted by tests/test_train.py::
test_gan_step_collective_audit."""

import json
import math
import os

import numpy as np
import pytest

from facegantts_tpu.parallel import scaleout as so

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_allreduce_model_basics():
    # 1 chip: no communication
    assert so.allreduce_seconds(100e6, 1) == 0.0
    # ring model: 2G(n-1)/n at the per-chip link bandwidth
    t8 = so.allreduce_seconds(100e6, 8)
    assert t8 == pytest.approx(2 * 100e6 * 7 / 8 / so.V5E_ICI_LINK_BYTES_PER_S)
    # monotone in n, bounded by 2G/bw
    assert t8 < so.allreduce_seconds(100e6, 64) < 2 * 100e6 / so.V5E_ICI_LINK_BYTES_PER_S


def test_flagship_grad_bytes_are_sane():
    """eval_shape param count at flagship dims: the generator is tens of MB
    (encoder+decoder+syncnet), the discriminator a few MB — the all-reduce
    payload the dossier charges per step."""
    gen_b, disc_b = so.flagship_grad_bytes()
    assert 40e6 < gen_b < 400e6, gen_b
    assert 1e6 < disc_b < 100e6, disc_b


def test_parity_rate_matches_bench_artifact():
    """The dossier's parity per-chip rate is the committed BENCH_r04
    measurement — not a hand-typed aspiration."""
    path = os.path.join(REPO, "BENCH_r04.json")
    if not os.path.exists(path):
        pytest.skip("no BENCH_r04.json in this checkout")
    # driver artifact: {"tail": "<bench stderr+stdout>", ...} where the tail
    # embeds the emitted metric JSON lines
    tail = json.load(open(path)).get("tail", "")
    rows = []
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    sps = [r["value"] for r in rows if r.get("metric") == "train_samples_per_sec"]
    assert sps, rows
    assert so.MEASURED_SAMPLES_PER_SEC["parity"] == pytest.approx(
        sps[0], rel=0.02
    )


def test_chips_for_10x_projection():
    """10x = 990 samples/s.  At the r4 parity rate (26.62/chip) that is ~38
    chips; communication at these grad sizes costs ~2 ms vs a ~1.2 s step,
    so the projection must stay within one chip of the naive ceil."""
    gen_b, disc_b = so.flagship_grad_bytes()
    grad_b = gen_b + disc_b
    sps = so.MEASURED_SAMPLES_PER_SEC["parity"]
    naive = math.ceil(10 * so.REF_RIG_SAMPLES_PER_SEC / sps)
    n = so.chips_for_multiple(sps, grad_bytes=grad_b)
    assert naive <= n <= naive + 1, (naive, n)
    # the tpu_opt family (once measured) needs strictly fewer chips
    opt = so.MEASURED_SAMPLES_PER_SEC.get("tpu_opt")
    if opt:
        assert so.chips_for_multiple(opt, grad_bytes=grad_b) < n


def test_projection_accounts_for_dcn_beyond_one_host():
    gen_b, disc_b = so.flagship_grad_bytes()
    grad_b = gen_b + disc_b
    sps = 26.62
    p8 = so.projected_samples_per_sec(8, sps, grad_b)
    p16 = so.projected_samples_per_sec(16, sps, grad_b)
    # linear within a host up to the small ICI tax
    assert 0.99 * 8 * sps <= p8 <= 8 * sps
    # crossing DCN costs something but stays near-linear at this model size
    assert 0.95 * 16 * sps <= p16 <= 16 * sps
    # the dossier renders without error and names the assumptions
    text = so.dossier()
    assert "chips for 10x" in text and "all-reduce" in text


def test_measured_rates_match_bench_notes():
    """Any family rate recorded here must also appear in BENCH_NOTES.md —
    the dossier may not carry numbers the notes don't evidence."""
    notes = open(os.path.join(REPO, "BENCH_NOTES.md")).read()
    for fam, sps in so.MEASURED_SAMPLES_PER_SEC.items():
        if sps is None:
            continue
        token = f"{sps:.2f}".rstrip("0").rstrip(".")
        assert token in notes, (
            f"{fam} rate {sps} not found in BENCH_NOTES.md — "
            "record the measurement before using it in the dossier"
        )
