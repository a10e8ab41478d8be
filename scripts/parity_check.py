#!/usr/bin/env python
"""End-to-end reference-parity harness (north-star: "match reference
inference.py outputs within mel-distance tolerance", BASELINE.md).

Given the reference pretrained generator (``facetts_lrs3.pt``, reference
config.py:151) and optionally the bshall HiFi-GAN checkpoint, this script
runs the EXACT reference inference recipe — T=10 diffusion steps,
temperature 1.5, length_scale 0.91, deterministic sampler (reference
inference.py:125-133) — through this framework and compares against stored
reference outputs.

Usage:
  python scripts/parity_check.py resume_from=ckpts/facetts_lrs3.pt \\
      [vocoder_ckpt=ckpts/hifigan16k.pt] [ref_dir=ref_outputs] \\
      [test_txt=test/text.txt] [test_faceimg=test/face.png] [tol=1.0]

``ref_dir`` holds the reference run's outputs, one per sentence i, as
either ``sample_<i>.npy`` (the (n_mels, T) log-mel that reference
inference.py:136 denotes y_dec[-1]) or ``sample_<i>.wav`` (vocoded; the
comparison then re-extracts mel with ops/mel, adding vocoder+STFT noise to
the measurement — prefer .npy).  To produce them on a GPU box:

  # in the reference repo
  python inference.py with use_custom=1   # writes wavs; or dump
  # torch.save / np.save of y_dec[-1] per sentence (inference.py:135-136)

For each sentence the script reports the masked mean-absolute log-mel
distance over the common length after aligning frame counts, and exits
non-zero if any exceeds ``tol``.  Without ``ref_dir`` it writes this run's
mels+wavs to ``output_dir`` so they can serve as the stored side later.

A CI smoke test (tests/test_parity_script.py) drives this script with
torch-replica weights on both sides, so the harness itself is verified
even though the real LRS3 checkpoint cannot ship in this repo.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facegantts_tpu.config import default_config, parse_cli_overrides  # noqa: E402


def mel_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Mean |Δ| of two log-mels (n_mels, T) over the common length."""
    t = min(a.shape[1], b.shape[1])
    if t == 0:
        return float("inf")
    return float(np.mean(np.abs(a[:, :t] - b[:, :t])))


def load_ref_mel(path_base: str, cfg):
    npy = path_base + ".npy"
    wav = path_base + ".wav"
    if os.path.exists(npy):
        return np.asarray(np.load(npy), np.float32)
    if os.path.exists(wav):
        from facegantts_tpu.ops.mel import mel_spectrogram
        from facegantts_tpu.utils.audio import load_wav

        y, sr = load_wav(wav)
        mel = mel_spectrogram(
            np.asarray(y, np.float32), cfg.n_fft, cfg.n_mels, sr,
            cfg.hop_len, cfg.win_len, cfg.f_min, cfg.f_max,
        )
        return np.asarray(mel)[0]
    return None


def main(argv=None):
    overrides = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    ref_dir = overrides.pop("ref_dir", "")
    tol = float(overrides.pop("tol", 1.0))
    vocoder_ckpt = overrides.pop("vocoder_ckpt", "")
    cfg = default_config(overrides=overrides)

    from facegantts_tpu.synthesis import Synthesizer, load_face
    from facegantts_tpu.text.cmudict import default_cmudict
    from facegantts_tpu.train import checkpoint as ck
    from facegantts_tpu.utils.audio import save_wav

    if not (cfg.resume_from and os.path.exists(cfg.resume_from)):
        raise SystemExit(
            "parity_check needs resume_from=<facetts checkpoint> "
            "(reference inference.py:47-68 loads the same file)"
        )
    if os.path.isdir(cfg.resume_from):
        params = ck.restore_generator_variables(cfg.resume_from)
    else:
        p, stats = ck.import_facetts(cfg.resume_from)
        params = {"params": p, "batch_stats": stats}
    vocoder_params = ck.import_hifigan(vocoder_ckpt) if vocoder_ckpt else None

    cmu = default_cmudict(cfg.cmudict_path)
    # f32 path for bit-level comparability (use_bf16=0); the reference
    # recipe values are cfg defaults: timesteps=10, temperature=1.5,
    # length_scale=0.91, stoc=False (inference.py:125-133)
    synth = Synthesizer(
        cfg.replace(use_bf16=0), params=params,
        vocoder_params=vocoder_params, cmudict=cmu,
    )
    face = load_face(cfg.test_faceimg, cfg.image_size)
    with open(cfg.test_txt) as f:
        texts = [ln.strip() for ln in f if ln.strip()]

    out_dir = cfg.output_dir
    os.makedirs(out_dir, exist_ok=True)
    failures = []
    for i, text in enumerate(texts):
        wav, mel = synth.synthesize(text, face, seed=0)
        np.save(os.path.join(out_dir, f"sample_{i}.npy"), mel)
        save_wav(os.path.join(out_dir, f"sample_{i}.wav"), wav, cfg.sample_rate)
        if ref_dir:
            ref = load_ref_mel(os.path.join(ref_dir, f"sample_{i}"), cfg)
            if ref is None:
                print(f"[WARN] no reference output for sample_{i}; skipped")
                continue
            d = mel_distance(mel, ref)
            frame_gap = abs(mel.shape[1] - ref.shape[1])
            status = "OK" if d <= tol else "FAIL"
            print(f"sample_{i}: mel_distance={d:.4f} (tol {tol}) "
                  f"frames {mel.shape[1]} vs {ref.shape[1]} "
                  f"(gap {frame_gap}) [{status}]")
            if d > tol:
                failures.append((i, d))
        else:
            print(f"sample_{i}: wrote mel {mel.shape} + wav "
                  f"({len(wav)/cfg.sample_rate:.2f}s) to {out_dir}")
    if ref_dir and failures:
        raise SystemExit(f"parity FAILED for {len(failures)} sentences: {failures}")
    if ref_dir:
        print("parity OK: all sentences within tolerance")


if __name__ == "__main__":
    main()
