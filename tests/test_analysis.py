"""Analysis/plotting utility tests."""

import json
import os

import numpy as np

from facegantts_tpu.evaluation.analysis import (
    mos_statistics,
    pairwise_wilcoxon,
    plot_training_curves,
    save_mel_comparison,
    save_mel_plot,
)


def test_mos_statistics_and_wilcoxon(rng, tmp_path):
    a = rng.normal(4.0, 0.3, 40)
    b = rng.normal(3.0, 0.3, 40)
    stats = mos_statistics({"ours": a, "baseline": b})
    assert abs(stats["ours"]["mean"] - 4.0) < 0.2
    assert stats["baseline"]["n"] == 40
    res = pairwise_wilcoxon({"ours": a, "baseline": b})
    assert len(res) == 1 and res[0]["significant_0.05"]
    # identical ratings -> not significant
    res2 = pairwise_wilcoxon({"x": a, "y": a})
    assert not res2[0]["significant_0.05"]


def test_plots(rng, tmp_path):
    mel = rng.standard_normal((128, 100))
    p1 = os.path.join(tmp_path, "mel.png")
    save_mel_plot(mel, p1, title="test")
    p2 = os.path.join(tmp_path, "cmp.png")
    save_mel_comparison([("a", mel), ("b", mel + 1)], p2)
    log = os.path.join(tmp_path, "metrics.jsonl")
    with open(log, "w") as f:
        for i in range(5):
            f.write(json.dumps({"step": i, "train/loss": 1.0 / (i + 1)}) + "\n")
    p3 = os.path.join(tmp_path, "curves.png")
    plot_training_curves(log, p3)
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_epoch_progress_and_face_pdf(rng, tmp_path):
    from facegantts_tpu.evaluation.analysis import (
        save_epoch_progress, save_face_grid_pdf,
    )
    from PIL import Image

    mels = [(e, rng.standard_normal((128, 80))) for e in (0, 10, 96)]
    p1 = os.path.join(tmp_path, "progress.png")
    save_epoch_progress(mels, p1)

    faces = []
    for i in range(3):
        p = os.path.join(tmp_path, f"f{i}.png")
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype("uint8")
        ).save(p)
        faces.append(p)
    p2 = os.path.join(tmp_path, "faces.pdf")
    save_face_grid_pdf(faces, p2, cols=2)
    for p in (p1, p2):
        assert os.path.getsize(p) > 1000


def test_collect_mos_samples(tmp_path):
    """collect_mos_samples pairs generated wavs with a face frame from the
    source video (reference evaluation/syncnet_inputs.py flow)."""
    import wave

    import cv2
    import numpy as np

    from facegantts_tpu.evaluation.analysis import (
        collect_mos_samples, save_face_grid_pdf,
    )

    # fake inference outputs <out>/<spk>/<clip>.wav
    out = tmp_path / "outputs" / "spk1"
    out.mkdir(parents=True)
    wav_path = out / "00001.wav"
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(np.zeros(1600, np.int16).tobytes())
    # matching video <root>/<spk>/<clip>.mp4
    vdir = tmp_path / "videos" / "spk1"
    vdir.mkdir(parents=True)
    vw = cv2.VideoWriter(str(vdir / "00001.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(10):
        vw.write(rng.integers(0, 255, (64, 64, 3), np.uint8))
    vw.release()

    target = tmp_path / "mos"
    faces = collect_mos_samples([str(wav_path)], str(tmp_path / "videos"),
                                str(target))
    assert (target / "spk1_00001.wav").exists()
    assert len(faces) == 1 and faces[0].endswith("spk1_00001_face.png")
    save_face_grid_pdf(faces, str(target / "faces.pdf"))
    assert (target / "faces.pdf").stat().st_size > 0

    # missing video -> wav still collected, warn path
    wav2 = tmp_path / "outputs" / "spk2"
    wav2.mkdir(parents=True)
    with wave.open(str(wav2 / "00002.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(np.zeros(16, np.int16).tobytes())
    faces2 = collect_mos_samples([str(wav2 / "00002.wav")],
                                 str(tmp_path / "videos"), str(target))
    assert faces2 == [] and (target / "spk2_00002.wav").exists()
