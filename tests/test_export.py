"""AOT export bundle tests (facegantts_tpu/export.py): serialized StableHLO
programs must reproduce the live Synthesizer's outputs exactly."""

import numpy as np
import pytest

from facegantts_tpu.config import default_config
from tests.test_train import TINY


# slow tier: export lowering + bundle round-trip compile (~90 s)
pytestmark = pytest.mark.slow


def test_export_bundle_round_trip(tmp_path):
    import jax

    from facegantts_tpu.export import export_bundle, load_bundle
    from facegantts_tpu.synthesis import Synthesizer

    # spk_emb=face: this test synthesizes from a face image (TINY defaults to
    # the cheaper speech conditioning for train-step tests)
    cfg = default_config(env=dict(TINY, use_gan="0", use_bf16="0", spk_emb="face")).replace(
        text_buckets=(16,), mel_buckets=(64,),
    )
    synth = Synthesizer(cfg)
    # Export explicitly for the platform this test executes on: without it,
    # jax.export lowers for the ambient default backend — which is the axon
    # TPU plugin when the tunnel is up, even though the test harness pins
    # execution to CPU via jax.default_device — and the exported program
    # then refuses to run on 'cpu'.
    manifest = export_bundle(synth, str(tmp_path), platforms=("cpu",))
    assert manifest["sample_rate"] == cfg.sample_rate
    assert len(manifest["entries"]) == 1
    # the manifest must faithfully record the lowering targets (the
    # production default platforms=None records the ambient backend — a
    # regression there would show up as a wrong/missing entry here)
    assert manifest["entries"][0]["platforms"] == ["cpu"]

    m2, fns = load_bundle(str(tmp_path))
    assert (16, 64) in fns

    ids = np.arange(1, 11, dtype=np.int32)
    x = np.zeros((1, 16), np.int32)
    x[0, :10] = ids
    face = np.zeros((1, 224, 224, 3), np.float32)
    wav, mel, y_len = fns[(16, 64)](
        x, np.array([10], np.int32), face, np.int32(7)
    )

    # live path with the same inputs/seed must agree exactly
    ref_wav, ref_mel = synth.synthesize(ids, synth.prepare_face(face[0]), seed=7)
    n = int(jax.device_get(y_len)[0])
    got = np.clip(np.asarray(wav)[0][: n * cfg.hop_len], -1, 1)
    assert len(got) == len(ref_wav)
    np.testing.assert_allclose(got, ref_wav, atol=1e-5)
    # exported vs live executables differ in fusion/reassociation order:
    # tolerate float round-off on the ~|10|-magnitude log-mels
    np.testing.assert_allclose(
        np.asarray(mel)[0][:, :n], ref_mel, rtol=0, atol=5e-4
    )
