"""Offline dataset packing: LRS2 corpus -> packed .npz shards.

Runs the reference's per-epoch CPU hot loop ONCE (SURVEY.md §7 step 6):
wav load -> spectral-gating denoise -> 50 ms fade-out -> optional band
filters -> log-mel; transcript -> cleaned symbol IDs with blank
interspersal; one face frame per clip.  Mirrors reference
data/lrs2_dataset.py:61-130 and the lrs2_preprocessing suite's audio
extraction step.

Face frames: reads pre-extracted images from `<image_data_root>` when
present (`<clip>.jpg`), else decodes the video with cv2 if importable;
clips with neither are skipped with a warning (reference retries video
reads 5x, lrs2_dataset.py:188-244 — offline we just surface the failure).

Usage:
  python -m facegantts_tpu.data.preprocess split=train lrs2_path=... \
      packed_data_dir=packed/ [shard_size=512] [pack_format=raw|npz]
"""

import os
import sys
from typing import Dict, List, Optional

import numpy as np

from facegantts_tpu.config import Config, default_config, parse_cli_overrides
from facegantts_tpu.data.denoise import fade_out, spectral_gate
from facegantts_tpu.text import intersperse, text_to_sequence
from facegantts_tpu.text.cmudict import default_cmudict
from facegantts_tpu.utils.audio import load_wav


def _mel_host(wav: np.ndarray, cfg: Config) -> np.ndarray:
    import jax

    from facegantts_tpu.ops.mel import mel_spectrogram

    out = mel_spectrogram(
        wav[None], cfg.n_fft, cfg.n_mels, cfg.sample_rate, cfg.hop_len,
        cfg.win_len, cfg.f_min, cfg.f_max,
    )
    return np.asarray(out[0])


def _load_face(clip_path: str, cfg: Config, rng) -> Optional[np.ndarray]:
    """One face frame as (224, 224, 3) uint8 BGR."""
    img_path = clip_path.replace(
        f"/{cfg.video_data_root}/", f"/{cfg.image_data_root}/"
    ).rsplit(".", 1)[0] + ".jpg"
    if os.path.exists(img_path):
        from PIL import Image

        img = Image.open(img_path).convert("RGB").resize(
            (cfg.image_size, cfg.image_size)
        )
        return np.asarray(img, np.uint8)[..., ::-1]
    try:
        import cv2  # optional
    except ImportError:
        return None
    cap = cv2.VideoCapture(clip_path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if n <= 0:
        return None
    cap.set(cv2.CAP_PROP_POS_FRAMES, int(rng.integers(0, n)))
    ok, frame = cap.read()
    cap.release()
    if not ok:
        return None
    return cv2.resize(frame, (cfg.image_size, cfg.image_size)).astype(np.uint8)


def _apply_filters(wav: np.ndarray, cfg: Config) -> np.ndarray:
    """Optional adaptive-bandstop/highpass/lowpass experiments with the
    reference's exact RBJ biquad semantics (reference config.py:75-83,
    filter_test.py:59-98; see data/filters.py)."""
    from facegantts_tpu.data.filters import apply_filter_chain

    return apply_filter_chain(wav, cfg.sample_rate, cfg)


def pack_split(cfg: Config, split: str, shard_size: int = 512,
               pack_format: str = "raw") -> List[str]:
    filelist = {
        "train": cfg.lrs2_train, "val": cfg.lrs2_val, "test": cfg.lrs2_test
    }[split]
    subdir = "test" if split == "test" else "trainval"
    with open(filelist) as f:
        names = [ln.strip() for ln in f if ln.strip()]

    spk_ids: Dict[str, int] = {}
    for n in names:  # speaker dir -> integer id (lrs2_dataset.py:50-56)
        spk_ids.setdefault(n.split("/")[0], len(spk_ids))

    cmu = default_cmudict(cfg.cmudict_path)
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(cfg.packed_data_dir, exist_ok=True)

    shard, paths = _new_shard(), []
    for n in names:
        wav_path = os.path.join(cfg.lrs2_path, cfg.audio_data_root, subdir, n + ".wav")
        txt_path = os.path.join(cfg.lrs2_path, subdir, n + ".txt")
        vid_path = os.path.join(cfg.lrs2_path, subdir, n + ".mp4")
        if not (os.path.exists(wav_path) and os.path.exists(txt_path)):
            print(f"[WARN] missing audio/text for {n}, skipping")
            continue
        wav, sr = load_wav(wav_path)
        assert sr == cfg.sample_rate, f"sampling rate must be {cfg.sample_rate}"
        wav = spectral_gate(wav, sr, prop_decrease=cfg.denoise_factor,
                            n_fft=cfg.n_fft, hop=cfg.hop_len,
                            win_length=cfg.win_len)
        wav = fade_out(wav, sr)
        wav = _apply_filters(wav, cfg)
        mel = _mel_host(wav, cfg)

        with open(txt_path) as f:
            line = f.readline().strip()
        text = line.split(":", 1)[1].strip() if line.upper().startswith("TEXT") else line
        ids = text_to_sequence(text, dictionary=cmu)
        if cfg.add_blank:
            ids = intersperse(ids)

        face = _load_face(vid_path, cfg, rng)
        if face is None:
            print(f"[WARN] no face frame for {n}, skipping")
            continue

        shard["text"].append(np.asarray(ids, np.int32))
        shard["mel"].append(mel.astype(np.float16))
        shard["faces"].append(face)
        shard["spk"].append(spk_ids[n.split("/")[0]])
        if len(shard["spk"]) >= shard_size:
            paths.append(_flush(cfg, split, shard, len(paths), pack_format))
            shard = _new_shard()
    if shard["spk"]:
        paths.append(_flush(cfg, split, shard, len(paths), pack_format))
    print(f"packed {split}: {len(paths)} shards, {len(spk_ids)} speakers")
    return paths


def _new_shard():
    return {"text": [], "mel": [], "faces": [], "spk": []}


def _flush(cfg: Config, split: str, shard, idx: int,
           pack_format: str = "raw") -> str:
    """Write one shard.  ``raw`` (default): a directory of plain .npy
    members the loader opens with mmap — random item access touches only
    the pages read, no per-access inflation (numpy NpzFile decompresses a
    whole member on EVERY [] access).  ``npz``: legacy compressed single
    file (smaller at rest, materialized once at open)."""
    members = dict(
        text_flat=np.concatenate(shard["text"]) if shard["text"] else np.zeros(0, np.int32),
        text_offsets=np.cumsum([0] + [len(t) for t in shard["text"]]).astype(np.int64),
        mel_flat=np.concatenate(shard["mel"], axis=1),
        mel_offsets=np.cumsum([0] + [m.shape[1] for m in shard["mel"]]).astype(np.int64),
        faces=np.stack(shard["faces"]),
        spk_ids=np.asarray(shard["spk"], np.int32),
    )
    if pack_format == "npz":
        path = os.path.join(cfg.packed_data_dir, f"{split}_{idx:05d}.npz")
        np.savez_compressed(path, **members)
        return path
    path = os.path.join(cfg.packed_data_dir, f"{split}_{idx:05d}")
    os.makedirs(path, exist_ok=True)
    for name, arr in members.items():
        np.save(os.path.join(path, f"{name}.npy"), arr)
    return path


def main(argv=None):
    overrides = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    split = overrides.pop("split", "train")
    shard_size = int(overrides.pop("shard_size", 512))
    pack_format = overrides.pop("pack_format", "raw")
    cfg = default_config(overrides=overrides)
    if not cfg.packed_data_dir:
        raise SystemExit("set packed_data_dir=...")
    pack_split(cfg, split, shard_size, pack_format)


if __name__ == "__main__":
    main()
