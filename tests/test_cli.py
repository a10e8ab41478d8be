"""CLI surface smoke tests: every module entry point imports and fails
gracefully (usage message, not traceback) when run without inputs."""

import subprocess
import sys

import pytest

ENTRY_POINTS = [
    "facegantts_tpu.data.preprocess",
    "facegantts_tpu.data.lrs2_prep",
    "facegantts_tpu.data.cfd_crop",
    "facegantts_tpu.evaluation.evaluate",
    "facegantts_tpu.evaluation.acc_measure",
    "facegantts_tpu.hyperopt",
    "facegantts_tpu.migrate_checkpoint",
]


@pytest.mark.parametrize("mod", ENTRY_POINTS)
def test_entry_point_importable(mod):
    __import__(mod)


def test_tpu_fast_preset_loads():
    """configs/tpu_fast.json: every key is a real Config field and the
    preset resolves to the lane-aligned families + lazy R1; explicit
    key=value overrides still win over the preset."""
    import json
    import os

    from facegantts_tpu.config import Config, default_config

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "tpu_fast.json")
    raw = json.load(open(path))
    field_names = {f.name for f in __import__("dataclasses").fields(Config)}
    for k in raw:
        if not k.startswith("_"):
            assert k in field_names, f"preset key {k!r} is not a Config field"
    cfg = default_config(env={}, json_path=path)
    assert cfg.unet_family == "tpu_opt" and cfg.disc_family == "tpu_opt"
    assert cfg.r1_interval == 16
    assert cfg.effective_r1_gamma == 16 * cfg.r1_gamma
    cfg2 = default_config(env={}, overrides={"unet_family": "parity"},
                          json_path=path)
    assert cfg2.unet_family == "parity"


def test_usage_errors_are_clean():
    """No-arg invocations that must exit with a usage error, not a crash."""
    for mod, args in [
        ("facegantts_tpu.data.preprocess", []),           # needs packed_data_dir
        ("facegantts_tpu.data.cfd_crop", []),             # needs source/target
        ("facegantts_tpu.migrate_checkpoint", []),        # needs src/dst
        ("facegantts_tpu.data.lrs2_prep", ["bogus-cmd"]),
    ]:
        proc = subprocess.run(
            [sys.executable, "-m", mod, *args],
            capture_output=True, text=True, timeout=240,
        )
        assert proc.returncode != 0, (mod, proc.stdout)
        assert "Traceback" not in proc.stderr, (mod, proc.stderr[-800:])


def test_inference_dataset_face_mode(tmp_path):
    """use_custom=0 (neither custom mode): the synthesis face comes from the
    first packed dataset clip (reference inference.py's non-custom branch)."""
    import numpy as np

    import inference
    from facegantts_tpu.config import default_config
    from facegantts_tpu.data.preprocess import _flush
    from tests.test_train import TINY

    rng = np.random.default_rng(0)
    shard = {
        "text": [rng.integers(1, 148, 10).astype(np.int32)],
        "mel": [(rng.standard_normal((128, 20)) - 5).astype(np.float16)],
        "faces": [rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)],
        "spk": [0],
    }
    packed = tmp_path / "packed"
    packed.mkdir()
    cfg0 = default_config(env={}).replace(packed_data_dir=str(packed))
    _flush(cfg0, "test", shard, 0, "raw")
    txt = tmp_path / "text.txt"
    txt.write_text("hello world\n")
    out = tmp_path / "out"

    argv = [f"{k}={v}" for k, v in dict(
        TINY, use_gan="0", use_bf16="0", use_custom="0", spk_emb="face",
        packed_data_dir=str(packed), test_txt=str(txt),
        output_dir=str(out), text_buckets="32", mel_buckets="64",
    ).items()]
    inference.main(argv)
    wavs = [f for f in out.iterdir() if f.suffix == ".wav"]
    assert len(wavs) == 1
