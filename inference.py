#!/usr/bin/env python
"""Synthesis entry point (reference inference.py equivalent).

Modes (use_custom, reference config.py:154-158):
  1 — custom face image (test_faceimg) + sentences from test_txt
  2 — batch inference over the LRS2 test split with a fixed face
  other — face from the first dataset clip + sentences from test_txt

Checkpoints: resume_from may be a reference torch .pt/.ckpt (GAN-aware key
filtering, reference inference.py:54-64) or an orbax dir; without one the
model runs from random init (pipeline smoke mode).  The vocoder is the
in-framework HiFi-GAN-16k (vocoder_ckpt= to import bshall weights)."""

import os
import sys

from facegantts_tpu.config import default_config, parse_cli_overrides


def main(argv=None):
    overrides = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    vocoder_ckpt = overrides.pop("vocoder_ckpt", "")
    cfg = default_config(overrides=overrides)

    from facegantts_tpu.synthesis import Synthesizer, load_face
    from facegantts_tpu.text.cmudict import default_cmudict
    from facegantts_tpu.train import checkpoint as ck
    from facegantts_tpu.utils.audio import save_wav

    params = None
    if cfg.resume_from and os.path.exists(cfg.resume_from):
        print(f"######## Loading checkpoint from {cfg.resume_from}")
        if os.path.isdir(cfg.resume_from):  # orbax TrainState directory
            params = ck.restore_generator_variables(cfg.resume_from)
        else:  # reference torch .pt/.ckpt
            p, stats = ck.import_facetts(cfg.resume_from)
            params = {"params": p, "batch_stats": stats}
    vocoder_params = ck.import_hifigan(vocoder_ckpt) if vocoder_ckpt else None

    cmu = default_cmudict(cfg.cmudict_path)
    synth = Synthesizer(cfg, params=params, vocoder_params=vocoder_params, cmudict=cmu)

    out_dir = cfg.output_dir
    os.makedirs(out_dir, exist_ok=True)

    if cfg.use_custom == 2:
        test_dir = os.path.join(cfg.lrs2_path, "test")
        face = load_face(cfg.test_faceimg, cfg.image_size)
        if os.path.isdir(test_dir):
            speakers = sorted(os.listdir(test_dir))[:5]
            for speaker in speakers:
                sdir = os.path.join(test_dir, speaker)
                for fn in os.listdir(sdir):
                    if not fn.endswith(".txt"):
                        continue
                    with open(os.path.join(sdir, fn)) as f:
                        line = f.readline().strip()
                    text = line.split(":", 1)[1].strip() if line.upper().startswith("TEXT") else line
                    wav, _ = synth.synthesize(text, face)
                    odir = os.path.join(out_dir, speaker)
                    os.makedirs(odir, exist_ok=True)
                    out = os.path.join(odir, fn.replace(".txt", ".wav"))
                    save_wav(out, wav, cfg.sample_rate)
                    print(f"Saved  ->  {out}")
        else:
            print(f"[WARN] {test_dir} not found; falling back to test_txt sentences")

    # sentences from test_txt with the chosen face.  Mode "other": the face
    # comes from the first dataset clip (reference inference.py:88-158's
    # non-custom branch uses a dataset face); modes 1/2 use test_faceimg.
    face = None
    if cfg.use_custom not in (1, 2):
        from facegantts_tpu.data.dataset import load_packed

        ds = load_packed(cfg, "test") or load_packed(cfg, "val")
        if ds is not None and len(ds):
            face = ds[0]["spk"]  # (224,224,3) float32 BGR 0..255
            print("######## Using the first dataset clip's face")
        else:
            print("[WARN] no packed dataset for a dataset face; "
                  "falling back to test_faceimg")
    if face is None:
        face = load_face(cfg.test_faceimg, cfg.image_size)
    if os.path.exists(cfg.test_txt):
        with open(cfg.test_txt) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
        tag = os.environ.get("FACE_TAG", "face")
        for i, text in enumerate(texts):
            wav, mel = synth.synthesize(text, face)
            out = os.path.join(out_dir, f"{tag}_sample_{i}.wav")
            save_wav(out, wav, cfg.sample_rate)
            print(f"Saved  ->  {out}  ({len(wav) / cfg.sample_rate:.2f}s)")
    print(f"######## Done inference. Check '{out_dir}' folder")


if __name__ == "__main__":
    main()
