"""Synthesizer pipeline tests: the split (duration-cache miss) and fused
(cache hit, single-dispatch) paths must agree exactly; batch mode preserves
order and lengths."""

import jax
import numpy as np

from facegantts_tpu.config import default_config
from tests.test_train import TINY


def tiny_synth(use_bf16="0"):
    from facegantts_tpu.synthesis import Synthesizer

    cfg = default_config(env=dict(TINY, use_gan="0", use_bf16=use_bf16)).replace(
        text_buckets=(16,), mel_buckets=(64,),
    )
    return Synthesizer(cfg), cfg


def test_fused_path_matches_split_path():
    synth, cfg = tiny_synth()
    ids = np.arange(1, 11, dtype=np.int32)
    face = synth.prepare_face(np.zeros((224, 224, 3), np.float32))

    w1, m1 = synth.synthesize(ids, face, seed=3)  # miss -> split path
    assert synth._ty_cache, "duration cache not populated"
    w2, m2 = synth.synthesize(ids, face, seed=3)  # hit -> fused path
    assert len(w1) == len(w2)
    np.testing.assert_allclose(w1, w2, atol=1e-5)
    np.testing.assert_allclose(m1, m2, atol=1e-4)


def test_duration_cache_keys_on_face_identity():
    synth, cfg = tiny_synth()
    ids = np.arange(1, 8, dtype=np.int32)
    f1 = synth.prepare_face(np.zeros((224, 224, 3), np.float32))
    f2 = synth.prepare_face(np.full((224, 224, 3), 30.0, np.float32))
    synth.synthesize(ids, f1, seed=0)
    assert len(synth._ty_cache) == 1
    synth.synthesize(ids, f2, seed=0)  # different face -> separate entry
    assert len(synth._ty_cache) == 2


def test_synthesize_batch_order_and_lengths():
    synth, cfg = tiny_synth()
    face = np.zeros((224, 224, 3), np.float32)
    texts = [
        np.arange(1, 6, dtype=np.int32),
        np.arange(1, 13, dtype=np.int32),
        np.arange(5, 10, dtype=np.int32),
    ]
    wavs = synth.synthesize_batch(texts, face, seed=1)
    assert len(wavs) == 3
    assert all(w is not None and w.ndim == 1 and len(w) > 0 for w in wavs)
    # batch result matches single-utterance result for the same input
    w_single, _ = synth.synthesize(texts[0], synth.prepare_face(face), seed=1)
    assert abs(len(w_single) - len(wavs[0])) <= cfg.hop_len
