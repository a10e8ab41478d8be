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


def load_eval_vocoder_params(cfg: Config):
    """Import the pretrained HiFi-GAN weights configured by
    ``cfg.vocoder_ckpt`` (reference pulls bshall/hifigan via torch.hub,
    inference.py:79).  Returns None (-> random init, mel metrics only) when
    unset or unreadable — with a loud warning, because wavs vocoded with
    random weights are noise."""
    if not cfg.vocoder_ckpt:
        print("[WARN] intrain eval: cfg.vocoder_ckpt unset — vocoded wavs/"
              "UTMOS use a RANDOM vocoder; only mel metrics are meaningful")
        return None
    try:
        from facegantts_tpu.train.checkpoint import import_hifigan

        return import_hifigan(cfg.vocoder_ckpt)
    except Exception as e:  # missing/corrupt file: degrade, don't kill train
        print(f"[WARN] intrain eval: failed to import vocoder_ckpt "
              f"{cfg.vocoder_ckpt!r} ({e}); falling back to random vocoder")
        return None


class IntrainEvaluator:
    """Reusable in-training evaluator: builds the Synthesizer, SyncNet
    scorer, MOS predictor, and (imported) vocoder ONCE, then re-scores the
    live generator weights each eval interval — the compiled per-bucket
    programs are reused across evals instead of re-traced (the reference
    re-launches whole subprocesses, custom_callbacks.py:62-92)."""

    def __init__(self, cfg: Config, val_ds, out_dir: str,
                 vocoder_params=None, syncnet_apply=None):
        from facegantts_tpu.evaluation.evaluate import build_syncnet_apply
        from facegantts_tpu.synthesis import Synthesizer

        self.cfg = cfg
        self.val_ds = val_ds
        self.out_dir = out_dir
        if vocoder_params is None:
            vocoder_params = load_eval_vocoder_params(cfg)
        self.vocoder_imported = vocoder_params is not None
        self.synth = Synthesizer(cfg, vocoder_params=vocoder_params)
        self.syncnet_apply = (
            syncnet_apply if syncnet_apply is not None else build_syncnet_apply(cfg)
        )
        self.mos = make_mos_predictor(cfg.mos_ckpt)

    def run(self, state, step: int) -> Dict[str, float]:
        """Synthesize n validation items with the current weights and score
        them.  Returns the metric dict (also written to eval_output.txt)."""
        from facegantts_tpu.utils.audio import save_wav

        cfg = self.cfg
        self.synth.update_params(params=_gen_variables(state))
        step_dir = os.path.join(self.out_dir, f"step_{step:08d}")
        os.makedirs(step_dir, exist_ok=True)

        sims, lsds, moses = [], [], []
        for i in range(min(cfg.eval_n_samples, len(self.val_ds))):
            item = self.val_ds[i]
            face = self.synth.prepare_face(item["spk"])
            wav, mel = self.synth.synthesize(item["x"], face, seed=i)
            gt_mel = item["y"]
            _, sim = M.speaker_similarity(self.syncnet_apply, gt_mel, mel)
            t = min(mel.shape[1], gt_mel.shape[1])
            lsd = float(np.mean(np.sqrt(np.mean(
                (mel[:, :t] - gt_mel[:, :t]) ** 2, axis=0))))
            sims.append(sim)
            lsds.append(lsd)
            moses.append(self.mos(wav, cfg.sample_rate))
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
    """One-shot wrapper around :class:`IntrainEvaluator` (kept for callers
    that eval a single checkpoint; the training loop holds an evaluator)."""
    if n_samples is not None:
        cfg = cfg.replace(eval_n_samples=n_samples)
    ev = IntrainEvaluator(cfg, val_ds, out_dir,
                          vocoder_params=vocoder_params,
                          syncnet_apply=syncnet_apply)
    return ev.run(state, step)
