"""Synthesizer pipeline tests: the split (duration-cache miss) and fused
(cache hit, single-dispatch) paths must agree exactly; batch mode preserves
order and lengths."""

import jax
import numpy as np
import pytest

from facegantts_tpu.config import default_config
from tests.test_train import TINY


def tiny_synth(use_bf16="0"):
    from facegantts_tpu.synthesis import Synthesizer

    # spk_emb=face: the Synthesizer tests condition on a face image (TINY
    # defaults to the cheaper speech conditioning for train-step tests)
    cfg = default_config(env=dict(TINY, use_gan="0", use_bf16=use_bf16, spk_emb="face")).replace(
        text_buckets=(16,), mel_buckets=(64,),
    )
    return Synthesizer(cfg), cfg


@pytest.mark.slow
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


@pytest.mark.slow
def test_duration_cache_content_keyed_numpy_faces():
    """Numpy faces (no prepare_face) must HIT the content-keyed cache on
    repeat calls instead of growing one pinned entry per call; the cache
    is LRU-bounded (round-1 ADVICE.md item 3 / VERDICT weak 6)."""
    synth, cfg = tiny_synth()
    ids = np.arange(1, 8, dtype=np.int32)
    face_np = np.zeros((224, 224, 3), np.float32)
    synth.synthesize(ids, face_np, seed=0)
    assert len(synth._ty_cache) == 1
    synth.synthesize(ids, face_np.copy(), seed=0)  # same content, new array
    assert len(synth._ty_cache) == 1  # hit, no growth
    # same content via prepare_face also maps to the same entry
    synth.synthesize(ids, synth.prepare_face(face_np), seed=0)
    assert len(synth._ty_cache) == 1
    # bound enforced
    synth._ty_cache_max = 2
    for v in (1.0, 2.0, 3.0):
        synth.synthesize(ids, np.full((224, 224, 3), v, np.float32), seed=0)
    assert len(synth._ty_cache) <= 2


def test_speech_conditioned_synthesis():
    """spk_emb='speech': a mel clip conditions the voice instead of a face
    (reference face_tts.py:108-114,152-155); end-to-end through the
    Synthesizer (round-1 VERDICT weak 8)."""
    from facegantts_tpu.synthesis import Synthesizer

    cfg = default_config(env=dict(TINY, use_gan="0", use_bf16="0", spk_emb="speech")).replace(
        text_buckets=(16,), mel_buckets=(64,),
    )
    synth = Synthesizer(cfg)
    ids = np.arange(1, 9, dtype=np.int32)
    rng = np.random.default_rng(0)
    mel_a = rng.standard_normal((cfg.n_mels, 40)).astype(np.float32)
    mel_b = rng.standard_normal((cfg.n_mels, 40)).astype(np.float32) + 2.0
    wav_a, m_a = synth.synthesize(ids, synth.prepare_face(mel_a), seed=1)
    wav_b, m_b = synth.synthesize(ids, synth.prepare_face(mel_b), seed=1)
    assert wav_a.ndim == 1 and len(wav_a) > 0
    # the conditioning clip actually changes the output
    t = min(m_a.shape[1], m_b.shape[1])
    assert np.abs(m_a[:, :t] - m_b[:, :t]).max() > 1e-4


@pytest.mark.slow
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


@pytest.mark.slow
def test_synthesize_batch_data_parallel_mesh():
    """Meshed synthesize_batch shards each bucket dispatch over the data
    axis and matches the unmeshed output exactly when the batch divides
    the mesh (same shapes -> same RNG draws); non-divisible batches pad,
    still returning one wav per text."""
    from facegantts_tpu.parallel import create_mesh
    from facegantts_tpu.synthesis import Synthesizer

    synth, cfg = tiny_synth()
    mesh = create_mesh(jax.devices("cpu")[:4])
    msynth = Synthesizer(cfg, params=synth.params,
                         vocoder_params=synth.vocoder_params, mesh=mesh)
    face = np.zeros((224, 224, 3), np.float32)
    texts = [np.arange(1, 6 + i, dtype=np.int32) for i in range(4)]

    base = synth.synthesize_batch(texts, face, seed=5)
    par = msynth.synthesize_batch(texts, face, seed=5)
    assert len(base) == len(par) == 4
    for a, b in zip(base, par):
        assert len(a) == len(b)
        np.testing.assert_allclose(a, b, atol=2e-4)

    # non-divisible: 3 texts on a 4-device mesh -> padded dispatch
    par3 = msynth.synthesize_batch(texts[:3], face, seed=5)
    assert len(par3) == 3
    for w in par3:
        assert len(w) > 0 and np.isfinite(w).all()


@pytest.mark.slow
def test_stream_vocode_exact_vs_full():
    """Tiled vocoding must reproduce the full-signal vocoder output exactly
    (up to executable-level float reassociation): the window margin is the
    generator's receptive-field half-width (models/hifigan.py
    margin_frames), and signal-edge windows align with the true edges."""
    from facegantts_tpu.models.hifigan import HiFiGANGenerator
    from facegantts_tpu.synthesis import Synthesizer

    synth, cfg = tiny_synth()
    M = synth.vocoder.margin_frames()
    assert M == HiFiGANGenerator().margin_frames() == 24  # full-size arch too

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, cfg.n_mels, 200)).astype(np.float32)
    full = jax.device_get(
        synth._vocode_fn(200)(synth.vocoder_params, mel)
    )[0]
    chunks = list(synth.stream_vocode(mel, chunk_frames=48))
    got = np.concatenate(chunks)
    assert len(got) == len(full) == 200 * cfg.hop_len
    np.testing.assert_allclose(got, np.clip(full, -1, 1), atol=2e-5)

    # the margin has teeth: a far-too-small margin must NOT match
    bad = np.concatenate(list(synth.stream_vocode(mel, chunk_frames=48, margin=1)))
    assert np.abs(bad - np.clip(full, -1, 1)).max() > 1e-3


def test_stream_vocode_short_signal_single_call():
    synth, cfg = tiny_synth()
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, cfg.n_mels, 40)).astype(np.float32)
    chunks = list(synth.stream_vocode(mel, chunk_frames=64))
    assert len(chunks) == 1 and len(chunks[0]) == 40 * cfg.hop_len


@pytest.mark.slow
def test_synthesize_streaming_matches_vocode_of_same_mel():
    synth, cfg = tiny_synth()
    ids = np.arange(1, 11, dtype=np.int32)
    face = synth.prepare_face(np.zeros((224, 224, 3), np.float32))

    wav, mel = synth.synthesize(ids, face, seed=5)
    got = np.concatenate(list(
        synth.synthesize_streaming(ids, face, seed=5, chunk_frames=16)
    ))
    # same mel -> streamed vocode equals direct vocode of the trimmed mel
    ref = jax.device_get(
        synth._vocode_fn(mel.shape[-1])(synth.vocoder_params, mel[None])
    )[0]
    np.testing.assert_allclose(got, np.clip(ref, -1, 1), atol=2e-5)
    # and agrees with synthesize() away from the bucket-padding tail
    m = synth.vocoder.margin_frames() * cfg.hop_len
    assert len(got) == len(wav)
    np.testing.assert_allclose(got[:-m], wav[:-m], atol=2e-5)


@pytest.mark.slow
def test_streaming_bf16_consistent_with_fused_path():
    """Under cfg.use_bf16 (the serving default) the streaming decode must
    draw the SAME bf16 diffusion noise as the fused path — outputs agree up
    to bfloat16 vocoder round-off, not just statistically."""
    synth, cfg = tiny_synth(use_bf16="1")
    ids = np.arange(1, 11, dtype=np.int32)
    face = synth.prepare_face(np.zeros((224, 224, 3), np.float32))

    wav, _ = synth.synthesize(ids, face, seed=2)
    got = np.concatenate(list(
        synth.synthesize_streaming(ids, face, seed=2, chunk_frames=16)
    ))
    assert len(got) == len(wav)
    m = synth.vocoder.margin_frames() * cfg.hop_len
    # same mel; bf16 tiling/fusion reassociation bounds the wav delta
    np.testing.assert_allclose(got[:-m], wav[:-m], atol=0.05)
