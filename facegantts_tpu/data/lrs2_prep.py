"""LRS2 corpus preparation suite (reference lrs2_preprocessing/, C24).

One CLI with subcommands covering the reference's one-time data production
scripts, redesigned for this framework (the reference splits these across
six scripts in a separate conda env, README.md:9-13):

- ``extract-audio`` : mp4 -> 16 kHz mono PCM wav via ffmpeg
  (reference lrs2_split/extract_audio.py:11), parallel over a process pool.
- ``reformat``      : reorganize the raw corpus into the
  ``<root>/{mp4,}/{train,val,test}/<speaker>/<clip>`` layout using the
  re-ID mapping file, rejecting clips shorter than 1.3 s into
  ``unmatched/too_short`` (reference lrs2_split/reformat_data.py:71-79).
- ``filelists``     : write ``datalist/lrs2_{split}_long.list`` relative-path
  lists (reference lrs2_split/filelist_split.py:17-42).
- ``check``         : verify the partitioning invariants — everything in
  too_short really is < 1.3 s with a transcript next to it, and unmatched
  clips appear in no split (reference lrs2_split/check_format.py:25-47).
- ``count``         : speakers/clips per split (reference count_speaker.py).
- ``label``         : speaker re-identification.  The reference uses
  RetinaFace + dlib face_recognition embeddings on CPU (labeling.py:35-98);
  here detection is cv2 Haar-cascade (no external model downloads), blur
  filtering is the same Laplacian-variance test, and the embedding is this
  framework's SyncNet face stream run *batched on the accelerator* — the
  whole corpus embeds in one jit'd pass per batch instead of per-frame CPU
  calls.  Matching keeps the reference's quality-weighted mean embedding and
  dynamic-threshold nearest-neighbor assignment (labeling.py:73-98, cosine
  instead of L2 since SyncNet embeddings are trained with cosine contrast).

- ``filter-test``   : preview the denoise + adaptive-bandstop/highpass/
  lowpass filter chain on corpus wavs (reference
  data_filtering/filter_test.py).
- ``plot-noise``    : mean/median corpus spectrograms + dominant-peak /
  -3 dB-bandwidth / Q analysis used to place the adaptive bandstop
  (reference data_filtering/plot_noise_frequencies.py).

Usage:
  python -m facegantts_tpu.data.lrs2_prep <subcommand> [key=value ...]
"""

import os
import shutil
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np

from facegantts_tpu.config import default_config, parse_cli_overrides

MIN_CLIP_SECONDS = 1.3  # reference reformat_data.py:73


# ---------------------------------------------------------------------------
# durations
# ---------------------------------------------------------------------------

def media_duration(path: str) -> float:
    """Clip duration in seconds; wav via header, video via cv2, 0 on failure."""
    if not os.path.exists(path):
        return 0.0
    if path.endswith(".wav"):
        import wave

        try:
            with wave.open(path) as w:
                return w.getnframes() / float(w.getframerate())
        except Exception:
            return 0.0
    try:
        import cv2
    except ImportError:
        return 0.0
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    n = cap.get(cv2.CAP_PROP_FRAME_COUNT)
    cap.release()
    return n / fps if fps > 0 else 0.0


# ---------------------------------------------------------------------------
# extract-audio
# ---------------------------------------------------------------------------

def _extract_one(args: Tuple[str, str, int]) -> Optional[str]:
    src, dst, sr = args
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    cmd = ["ffmpeg", "-y", "-loglevel", "error", "-i", src,
           "-vn", "-ac", "1", "-ar", str(sr), "-acodec", "pcm_s16le", dst]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return f"{src}: {e}"


def extract_audio(video_root: str, audio_root: str, sr: int, workers: int = 8) -> int:
    """All mp4 under video_root -> same relpath wav under audio_root."""
    jobs = []
    for base, _, files in os.walk(video_root):
        for f in files:
            if f.endswith(".mp4"):
                src = os.path.join(base, f)
                rel = os.path.relpath(src, video_root)[:-4] + ".wav"
                dst = os.path.join(audio_root, rel)
                if not os.path.exists(dst):
                    jobs.append((src, dst, sr))
    errors = []
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for err in ex.map(_extract_one, jobs):
            if err:
                errors.append(err)
    for e in errors[:20]:
        print(f"[WARN] {e}")
    print(f"extracted {len(jobs) - len(errors)}/{len(jobs)} wavs -> {audio_root}")
    return len(jobs) - len(errors)


# ---------------------------------------------------------------------------
# reformat (split reorganization)
# ---------------------------------------------------------------------------

def load_filelist(path: str) -> set:
    with open(path) as f:
        return {ln.strip().split()[0] for ln in f if ln.strip()}


def load_mapping(path: str) -> Dict[str, str]:
    """``PROCESSED: old.mp4 -> new.mp4 | ...`` lines -> {old: new} relpaths
    (last two path components, no extension)."""
    mapping = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" -> ")
            if len(parts) == 2 and parts[0].startswith("PROCESSED"):
                old = parts[0].split(": ", 1)[1].replace(".mp4", "")
                new = parts[1].split(" | ")[0].replace(".mp4", "")
                mapping["/".join(old.split("/")[-2:])] = "/".join(new.split("/")[-2:])
    return mapping


def reformat(src_root: str, dest_root: str, filelists: Dict[str, set],
             mapping: Dict[str, str]) -> Dict[str, int]:
    """Copy clips into per-split speaker dirs; reject short clips.

    Layout written (what data/preprocess.py consumes): for train/val the txt
    split dir is ``trainval`` holding both ``.txt`` and ``.mp4``; videos also
    land under ``mp4/<split>``; rejects under ``unmatched[/too_short]``."""
    too_short_dir = os.path.join(dest_root, "unmatched", "too_short")
    os.makedirs(too_short_dir, exist_ok=True)
    counts = {"placed": 0, "too_short": 0, "unmatched": 0}

    placed = set()
    for split, filelist in filelists.items():
        txt_split = "trainval" if split in ("train", "val") else split
        for old, new in mapping.items():
            if old not in filelist:
                continue
            parts = new.split("/")
            if len(parts) != 2:
                print(f"[WARN] malformed mapped path {new}")
                continue
            placed.add(old)
            spk, name = parts
            src_mp4 = os.path.join(src_root, new + ".mp4")
            src_txt = os.path.join(src_root, new + ".txt")
            if os.path.exists(src_mp4) and media_duration(src_mp4) < MIN_CLIP_SECONDS:
                flat = new.replace("/", "_")
                shutil.copy(src_mp4, os.path.join(too_short_dir, flat + ".mp4"))
                if os.path.exists(src_txt):
                    shutil.copy(src_txt, os.path.join(too_short_dir, flat + ".txt"))
                counts["too_short"] += 1
                continue
            mp4_dir = os.path.join(dest_root, "mp4", split, spk)
            txt_dir = os.path.join(dest_root, txt_split, spk)
            os.makedirs(mp4_dir, exist_ok=True)
            os.makedirs(txt_dir, exist_ok=True)
            if os.path.exists(src_mp4):
                shutil.copy(src_mp4, os.path.join(mp4_dir, name + ".mp4"))
                shutil.copy(src_mp4, os.path.join(txt_dir, name + ".mp4"))
            if os.path.exists(src_txt):
                shutil.copy(src_txt, os.path.join(txt_dir, name + ".txt"))
            counts["placed"] += 1

    unmatched_dir = os.path.join(dest_root, "unmatched")
    for old, new in mapping.items():
        if old in placed:
            continue
        src_mp4 = os.path.join(src_root, new + ".mp4")
        if os.path.exists(src_mp4):
            shutil.copy(src_mp4, os.path.join(unmatched_dir, new.replace("/", "_") + ".mp4"))
            counts["unmatched"] += 1
    print(f"reformat: {counts}")
    return counts


# ---------------------------------------------------------------------------
# filelists / count / check
# ---------------------------------------------------------------------------

def write_filelists(dest_root: str, splits=("train", "val", "test")) -> Dict[str, int]:
    os.makedirs(os.path.join(dest_root, "datalist"), exist_ok=True)
    counts = {}
    for split in splits:
        split_dir = os.path.join(dest_root, "mp4", split)
        entries = []
        for base, _, files in os.walk(split_dir):
            for f in files:
                if f.endswith(".mp4"):
                    rel = os.path.relpath(os.path.join(base, f), split_dir)
                    entries.append(os.path.splitext(rel)[0])
        out = os.path.join(dest_root, "datalist", f"lrs2_{split}_long.list")
        with open(out, "w") as f:
            f.write("".join(e + "\n" for e in sorted(entries)))
        speakers = {e.split("/")[0] for e in entries}
        counts[split] = len(entries)
        print(f"{out}: {len(entries)} clips, {len(speakers)} speakers")
    return counts


def count_speakers(dest_root: str, splits=("train", "val", "test")) -> Dict[str, Tuple[int, int]]:
    out = {}
    for split in splits:
        split_dir = os.path.join(dest_root, "mp4", split)
        speakers, clips = set(), 0
        for base, _, files in os.walk(split_dir):
            mp4s = [f for f in files if f.endswith(".mp4")]
            if mp4s:
                speakers.add(os.path.basename(base))
                clips += len(mp4s)
        out[split] = (len(speakers), clips)
        print(f"{split}: {len(speakers)} speakers, {clips} clips")
    return out


def check_format(dest_root: str) -> List[str]:
    """Partitioning invariants (reference check_format.py:25-47).  Returns
    the list of violations (empty = pass)."""
    errors = []
    too_short_dir = os.path.join(dest_root, "unmatched", "too_short")
    if os.path.isdir(too_short_dir):
        for f in os.listdir(too_short_dir):
            if not f.endswith(".mp4"):
                continue
            p = os.path.join(too_short_dir, f)
            if not os.path.exists(p[:-4] + ".txt"):
                errors.append(f"missing txt for too_short clip {f}")
            d = media_duration(p)
            if d >= MIN_CLIP_SECONDS:
                errors.append(f"{f} in too_short but {d:.2f}s >= {MIN_CLIP_SECONDS}")
    # unmatched clips must not appear in any split
    split_names = set()
    for split in ("train", "val", "test"):
        split_dir = os.path.join(dest_root, "mp4", split)
        for base, _, files in os.walk(split_dir):
            split_names.update(f for f in files if f.endswith(".mp4"))
    unmatched_dir = os.path.join(dest_root, "unmatched")
    if os.path.isdir(unmatched_dir):
        for f in os.listdir(unmatched_dir):
            if f.endswith(".mp4") and "_" in f:
                name = f.split("_", 1)[1]
                if name in split_names:
                    errors.append(f"unmatched clip {f} also present in a split")
    print("\n".join(errors) if errors else "format check passed")
    return errors


# ---------------------------------------------------------------------------
# label (speaker re-identification)
# ---------------------------------------------------------------------------

def laplacian_blur_score(gray: np.ndarray) -> float:
    """Variance of the Laplacian (reference labeling.py:29-33) without cv2:
    4-neighbor Laplacian stencil."""
    g = gray.astype(np.float64)
    lap = (-4 * g[1:-1, 1:-1] + g[:-2, 1:-1] + g[2:, 1:-1]
           + g[1:-1, :-2] + g[1:-1, 2:])
    return float(lap.var())


def sample_face_crops(video_path: str, image_size: int, sample_rate: int = 5,
                      blur_threshold: float = 40.0) -> Tuple[List[np.ndarray], List[float]]:
    """Sampled, blur-filtered, face-detected crops from one clip.

    Returns (crops as (S,S,3) uint8 BGR 0..255, quality weights).  Haar-cascade
    detection; on cascade miss, the full frame is used (LRS2 clips are
    face-centered crops already)."""
    import cv2

    from facegantts_tpu.data.cfd_crop import detect_faces

    cap = cv2.VideoCapture(video_path)
    crops, weights = [], []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % sample_rate == 0:
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            quality = laplacian_blur_score(gray)
            if quality >= blur_threshold:
                boxes = detect_faces(frame)
                if boxes:
                    x1, y1, x2, y2 = boxes[0]
                    crop = frame[y1:y2, x1:x2]
                else:
                    crop = frame
                crop = cv2.resize(crop, (image_size, image_size))
                # keep cv2's native BGR uint8: the pretrained SyncNet weights
                # were trained on raw BGR 0..255 crops — the convention used
                # everywhere else (synthesis.load_face, data/preprocess)
                crops.append(crop.copy())
                weights.append(quality)
        idx += 1
    cap.release()
    return crops, weights


class FaceEmbedder:
    """Batched SyncNet face-stream embeddings on the accelerator."""

    def __init__(self, cfg):
        import jax
        import jax.numpy as jnp

        from facegantts_tpu.models.syncnet import SyncNet
        from facegantts_tpu.train import checkpoint as ck

        model = SyncNet(n_out=cfg.vid_emb_dim, stride=cfg.syncnet_stride)
        if cfg.syncnet_ckpt and os.path.exists(cfg.syncnet_ckpt):
            params, stats = ck.import_syncnet_checkpoint(cfg.syncnet_ckpt)
            variables = {"params": params, "batch_stats": stats}
        else:
            variables = jax.jit(lambda r: model.init(
                r,
                jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
                method=SyncNet.forward_vid,
            ))(jax.random.PRNGKey(0))  # jitted: eager init is slow op-by-op
        self._apply = jax.jit(
            lambda img: model.apply(variables, img, method=SyncNet.forward_vid)
        )
        self._jnp = jnp

    def __call__(self, crops: np.ndarray) -> np.ndarray:
        """(N, S, S, 3) uint8 BGR 0..255 -> (N, D) unit-norm embeddings.

        No rescale/channel flip: the framework's SyncNet convention is raw
        cv2 BGR 0..255 (synthesis.load_face, data/preprocess._load_face),
        which is what the pretrained cfg.syncnet_ckpt weights expect —
        feeding [0,1] RGB here would embed out-of-distribution inputs."""
        x = self._jnp.asarray(crops, self._jnp.float32)
        e = np.asarray(self._apply(x))
        return e / (np.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)


def weighted_mean_embedding(emb: np.ndarray, weights: List[float]) -> Optional[np.ndarray]:
    """Quality-weighted mean, re-normalized (reference labeling.py:73-81)."""
    if len(emb) == 0:
        return None
    w = np.asarray(weights, np.float64)
    w = w / w.sum()
    m = (emb * w[:, None]).sum(axis=0)
    return m / (np.linalg.norm(m) + 1e-8)


def match_speaker(known: List[np.ndarray], emb: np.ndarray,
                  base_threshold: float = 0.40) -> Tuple[int, float]:
    """Nearest known speaker by cosine distance with the reference's
    dynamic-threshold validation (labeling.py:84-98): accept only if the
    best distance beats min(base, 0.8 * mean distance).  With a single
    known identity the mean IS the best distance (the dynamic rule would
    reject everything), so the base threshold applies alone."""
    if not known:
        return -1, float("inf")
    d = np.array([1.0 - float(emb @ k) for k in known])
    best = int(np.argmin(d))
    dyn = base_threshold if len(d) < 2 else min(base_threshold, float(d.mean()) * 0.8)
    if d[best] < dyn:
        return best, float(d[best])
    return -1, float("inf")


def label_speakers(cfg, video_root: str, out_path: str,
                   sample_rate: int = 5, batch: int = 64,
                   base_threshold: float = 0.40) -> Dict[str, int]:
    """Assign a global speaker id to every clip under video_root; writes
    ``<old_relpath> -> spk<ID>/<clip>`` mapping lines compatible with
    :func:`load_mapping`.

    ``base_threshold`` is the cosine-distance acceptance bound and MUST be
    calibrated to the embedder: the measured operating envelope
    (scripts/labeler_benchmark.py, PARITY.md §re-ID labeling) is
    inter-identity distance > base_threshold > per-clip mean deviation —
    identities closer than the threshold collapse into one cluster."""
    clips = []
    for base, _, files in os.walk(video_root):
        clips += [os.path.join(base, f) for f in files if f.endswith(".mp4")]
    clips.sort()
    if getattr(cfg, "retinaface_ckpt", ""):
        # real RetinaFace detection (reference labeling.py:6,48) instead of
        # the Haar fallback — routed through cfd_crop's shared detector hook
        from facegantts_tpu.data.cfd_crop import configure_retinaface

        configure_retinaface(cfg.retinaface_ckpt)
    embedder = FaceEmbedder(cfg)

    known: List[np.ndarray] = []
    assignment: Dict[str, int] = {}
    with open(out_path, "w") as out:
        for path in clips:
            rel = os.path.relpath(path, video_root)[:-4]
            crops, weights = sample_face_crops(path, cfg.image_size, sample_rate)
            if not crops:
                out.write(f"SKIPPED: {rel}.mp4 (no usable face frames)\n")
                continue
            embs = []
            for i in range(0, len(crops), batch):
                embs.append(embedder(np.stack(crops[i:i + batch])))
            mean = weighted_mean_embedding(np.concatenate(embs), weights)
            sid, dist = match_speaker(known, mean, base_threshold)
            if sid < 0:
                sid = len(known)
                known.append(mean)
            else:  # running refinement of the identity prototype
                known[sid] = known[sid] + 0.1 * (mean - known[sid])
                known[sid] /= np.linalg.norm(known[sid]) + 1e-8
            assignment[rel] = sid
            name = os.path.basename(rel)
            out.write(f"PROCESSED: {rel}.mp4 -> spk{sid:05d}/{name}.mp4 | dist={dist:.3f}\n")
    print(f"labeled {len(assignment)} clips into {len(known)} speakers -> {out_path}")
    return assignment


# ---------------------------------------------------------------------------
# Audio-filter experiments (reference lrs2_preprocessing/data_filtering/)
# ---------------------------------------------------------------------------

def filter_test(cfg, input_dir: str, output_dir: str, limit: int = 2000):
    """Preview the preprocessing filter chain on up to ``limit`` corpus wavs
    (reference data_filtering/filter_test.py:16-114): spectral-gate denoise,
    adaptive bandstop / highpass / lowpass biquads per the ``use_*_filter``
    config gates, 50 ms fade-out, written under ``output_dir`` preserving
    relative paths."""
    from facegantts_tpu.data.denoise import fade_out, spectral_gate
    from facegantts_tpu.data.filters import apply_filter_chain
    from facegantts_tpu.utils.audio import load_wav, save_wav

    paths = []
    for r, _, files in os.walk(input_dir):
        paths += [os.path.join(r, f) for f in sorted(files) if f.endswith(".wav")]
    paths = sorted(paths)[:limit]
    print(f"filter-test: processing {len(paths)} wavs -> {output_dir}")
    os.makedirs(output_dir, exist_ok=True)
    for path in paths:
        try:
            wav, sr = load_wav(path)
            wav = spectral_gate(wav, sr, prop_decrease=cfg.denoise_factor,
                                n_fft=cfg.n_fft, hop=cfg.hop_len,
                                win_length=cfg.win_len)
            actions: List[str] = []
            wav = apply_filter_chain(wav, sr, cfg, log=actions)
            wav = fade_out(wav, sr)
            rel = os.path.relpath(path, input_dir)
            out_path = os.path.join(output_dir, rel)
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            save_wav(out_path, wav, sr)
            if actions:
                print(f"  {rel}: " + "; ".join(actions))
        except Exception as e:  # keep going like the reference (:111-112)
            print(f"  error {path}: {e}")
    print(f"filter-test done: {len(paths)} files in {output_dir}")


def plot_noise(cfg, input_dir: str, output_dir: str, limit: int = 2000):
    """Corpus noise-frequency analysis (reference
    data_filtering/plot_noise_frequencies.py): mean/median dB spectrograms
    over up to ``limit`` wavs, plus the dominant-peak / -3 dB-bandwidth /
    implied-Q report used to place the adaptive bandstop."""
    from facegantts_tpu.data.filters import _stft_mag, noise_frequency_analysis
    from facegantts_tpu.evaluation.analysis import save_spectrogram_db
    from facegantts_tpu.utils.audio import load_wav

    paths = []
    for r, _, files in os.walk(input_dir):
        paths += [os.path.join(r, f) for f in sorted(files) if f.endswith(".wav")]
    paths = sorted(paths)[:limit]
    if not paths:
        raise SystemExit(f"no wavs under {input_dir}")
    os.makedirs(output_dir, exist_ok=True)
    specs, sr = [], cfg.sample_rate
    for path in paths:
        try:
            wav, sr = load_wav(path)
            mag = _stft_mag(wav, cfg.n_fft, cfg.hop_len, cfg.win_len)
            specs.append(20.0 * np.log10(mag + 1e-8))
        except Exception as e:
            print(f"  error {path}: {e}")
    min_t = min(s.shape[1] for s in specs)
    stack = np.stack([s[:, :min_t] for s in specs])
    mean_spec, median_spec = stack.mean(axis=0), np.median(stack, axis=0)
    for data, name in ((mean_spec, "mean"), (median_spec, "median")):
        out = os.path.join(output_dir, f"{name}_spectrogram.pdf")
        save_spectrogram_db(data, out, title=f"{name.capitalize()} Spectrogram")
        print(f"{name} spectrogram saved at: {out}")
    report = noise_frequency_analysis(mean_spec, sr)
    print(f"Dominant frequency (Peak): Bin {report['peak_bin']} -> "
          f"{report['peak_freq_hz']} Hz")
    print(f"-3 dB bandwidth: {report['bandwidth_hz']:.2f} Hz -> "
          f"Q-Value: {report['q_value']}")
    return report


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    if not argv:
        raise SystemExit(__doc__)
    cmd, rest = argv[0], argv[1:]
    kv = parse_cli_overrides(rest)
    cfg = default_config(overrides={
        k: v for k, v in kv.items()
        if k not in ("video_root", "audio_root", "dest_root", "src_root",
                     "mapping", "out", "workers", "sample_rate",
                     "input_dir", "limit")
    })
    root = kv.get("dest_root", cfg.lrs2_path)
    if cmd == "extract-audio":
        extract_audio(kv.get("video_root", os.path.join(root, "mp4")),
                      kv.get("audio_root", os.path.join(root, cfg.audio_data_root)),
                      cfg.sample_rate, int(kv.get("workers", 8)))
    elif cmd == "reformat":
        filelists = {s: load_filelist(kv[f"{s}_list"]) for s in ("train", "val", "test")}
        reformat(kv["src_root"], root, filelists, load_mapping(kv["mapping"]))
    elif cmd == "filelists":
        write_filelists(root)
    elif cmd == "check":
        errors = check_format(root)
        sys.exit(1 if errors else 0)
    elif cmd == "count":
        count_speakers(root)
    elif cmd == "label":
        label_speakers(cfg, kv.get("video_root", root),
                       kv.get("out", os.path.join(root, "speaker_mapping.txt")),
                       int(kv.get("sample_rate", 5)),
                       base_threshold=float(kv.get("base_threshold", 0.40)))
    elif cmd == "filter-test":
        filter_test(cfg, kv.get("input_dir", os.path.join(root, cfg.audio_data_root)),
                    kv.get("out", "test_preprocessed_wavs"),
                    int(kv.get("limit", 2000)))
    elif cmd == "plot-noise":
        plot_noise(cfg, kv.get("input_dir", os.path.join(root, cfg.audio_data_root)),
                   kv.get("out", "filter_plots"), int(kv.get("limit", 2000)))
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}\n\n{__doc__}")


if __name__ == "__main__":
    main()
