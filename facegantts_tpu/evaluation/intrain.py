"""In-training periodic evaluation (reference StepwiseEvalCallback,
custom_callbacks.py:57-92,165-190 — minus the subprocess hack).

Every ``cfg.eval_interval`` steps the trainer calls :func:`run_intrain_eval`
with the live TrainState: a few validation items are synthesized end-to-end
(10-step diffusion + HiFi-GAN) with the *current* generator weights, and

- mel-domain metrics vs the ground-truth mel (SyncNet speaker similarity,
  log-mel spectral distance) and a MOS proxy of the vocoded audio are
  written to ``<dir>/eval_output.txt`` in the reference's regex-parsed
  ``key: value`` format (custom_callbacks.py:13-55),
- wavs land next to it (``sample_<i>.wav``), and the caller's MetricLogger
  publishes the scalars (and audio when TensorBoard is available),

all in-process: no conda-activate subprocess, no 60 s file polling
(custom_callbacks.py:62-92).
"""

import os
from typing import Dict, Optional

import numpy as np

from facegantts_tpu.config import Config
from facegantts_tpu.evaluation import metrics as M
from facegantts_tpu.evaluation.utmos import make_mos_predictor


def _gen_variables(state) -> Dict:
    v = {"params": state.params}
    if state.model_state:
        v.update(state.model_state)
    return v


def run_intrain_eval(
    cfg: Config,
    state,
    val_ds,
    out_dir: str,
    step: int,
    vocoder_params=None,
    syncnet_apply=None,
    n_samples: Optional[int] = None,
) -> Dict[str, float]:
    """Synthesize n validation items with the current weights and score them.

    Returns the metric dict (also written to eval_output.txt)."""
    from facegantts_tpu.synthesis import Synthesizer
    from facegantts_tpu.utils.audio import save_wav

    n = n_samples or cfg.eval_n_samples
    step_dir = os.path.join(out_dir, f"step_{step:08d}")
    os.makedirs(step_dir, exist_ok=True)

    synth = Synthesizer(cfg, params=_gen_variables(state),
                        vocoder_params=vocoder_params)
    if syncnet_apply is None:
        from facegantts_tpu.evaluation.evaluate import build_syncnet_apply

        syncnet_apply = build_syncnet_apply(cfg)
    mos = make_mos_predictor(cfg.mos_ckpt)

    sims, lsds, moses = [], [], []
    for i in range(min(n, len(val_ds))):
        item = val_ds[i]
        face = synth.prepare_face(item["spk"])
        wav, mel = synth.synthesize(item["x"], face, seed=i)
        gt_mel = item["y"]
        _, sim = M.speaker_similarity(syncnet_apply, gt_mel, mel)
        t = min(mel.shape[1], gt_mel.shape[1])
        lsd = float(np.mean(np.sqrt(np.mean(
            (mel[:, :t] - gt_mel[:, :t]) ** 2, axis=0))))
        sims.append(sim)
        lsds.append(lsd)
        moses.append(mos(wav, cfg.sample_rate))
        save_wav(os.path.join(step_dir, f"sample_{i}.wav"), wav, cfg.sample_rate)

    results = {
        "Speaker Similarity": float(np.mean(sims)) if sims else 0.0,
        "Mel Distance": float(np.mean(lsds)) if lsds else 0.0,
        "UTMOS": float(np.mean(moses)) if moses else 0.0,
        "Samples": float(len(sims)),
    }
    with open(os.path.join(step_dir, "eval_output.txt"), "w") as f:
        f.write(M.format_eval_output(results))
    return results
