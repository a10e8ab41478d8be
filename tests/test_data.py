"""Data pipeline tests: denoiser, bucketing loader, collate, packed format."""

import os

import numpy as np

from facegantts_tpu.config import default_config
from facegantts_tpu.data import BucketedLoader, SyntheticDataset, collate
from facegantts_tpu.data.denoise import fade_out, spectral_gate


def test_spectral_gate_reduces_noise(rng):
    sr = 16000
    t = np.arange(sr) / sr
    clean = 0.5 * np.sin(2 * np.pi * 440 * t)
    noise = 0.05 * rng.standard_normal(sr)
    denoised = spectral_gate((clean + noise).astype(np.float32), sr, prop_decrease=0.9)
    assert denoised.shape == (sr,)
    # quiet (noise-only) tail of the spectrum should lose energy
    from numpy.fft import rfft

    orig_spec = np.abs(rfft(clean + noise))
    new_spec = np.abs(rfft(denoised.astype(np.float64)))
    hi = slice(len(orig_spec) // 2, None)  # well above 440 Hz: pure noise
    assert new_spec[hi].sum() < 0.7 * orig_spec[hi].sum()
    # the tone remains the dominant peak and its SNR vs the noise band improves
    tone_bin = 440
    tone = lambda s: s[tone_bin - 2 : tone_bin + 3].max()  # noqa: E731
    assert int(new_spec.argmax()) in range(tone_bin - 2, tone_bin + 3)
    assert tone(new_spec) / new_spec[hi].mean() > tone(orig_spec) / orig_spec[hi].mean()


def test_spectral_gate_pure_tone_with_gated_noise(rng):
    """Adversarial envelope case (VERDICT r4 next #9): a STEADY pure tone
    riding on noise that is gated on/off.  The stationary gate profiles the
    whole clip as its own noise estimate (reference lrs2_dataset.py:74-85
    passes y as both signal and noise), so a constant tone IS stationary
    background by definition: the per-bin mean tracks the tone's own level
    and mean+1.5*std sits above it.  Faithful behavior — measured on the
    real noisereduce too — is the tone driven to the gate floor
    (1-prop_decrease) UNIFORMLY, with no segment-dependent pumping from
    the on/off noise."""
    sr = 16000
    t = np.arange(2 * sr) / sr
    tone = 0.3 * np.sin(2 * np.pi * 700 * t)
    noise = 0.05 * rng.standard_normal(2 * sr)
    gate = np.zeros(2 * sr)
    gate[: sr // 2] = 1.0          # noise burst in the first 0.5 s
    gate[sr : sr + sr // 2] = 1.0  # and the third 0.5 s
    noisy = (tone + noise * gate).astype(np.float32)
    den = spectral_gate(noisy, sr, prop_decrease=0.9)

    from numpy.fft import rfft

    def tone_ratio(a, b):
        def amp(seg):
            s = np.abs(rfft(seg * np.hanning(len(seg))))
            bin700 = int(round(700 * len(seg) / sr))
            return float(s[bin700 - 2 : bin700 + 3].max())

        return amp(den[a:b].astype(np.float64)) / amp(
            noisy[a:b].astype(np.float64))

    ratios = [tone_ratio(a, b)
              for a, b in [(0, sr // 2), (sr // 2, sr), (sr, sr + sr // 2)]]
    # floor = 1 - prop_decrease = 0.10 (measured 0.100-0.107)
    for r in ratios:
        assert 0.08 < r < 0.16, ratios
    # uniform across noisy and quiet segments: no gate pumping
    assert max(ratios) - min(ratios) < 0.03, ratios


def test_spectral_gate_speech_shaped_noise(rng):
    """Adversarial envelope case: noise with a SPEECH-LIKE spectral tilt
    (-6 dB/octave pink-ish shaping) instead of white.  The per-bin
    mean+1.5*std threshold adapts per frequency, so low-frequency-heavy
    noise must still be suppressed toward the gate floor in noise-only
    regions — a single broadband threshold would let the low band through."""
    sr = 16000
    n = 2 * sr
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    freqs = np.maximum(np.fft.rfftfreq(n, 1 / sr), 50.0)
    shaped = np.fft.irfft(spec / np.sqrt(freqs / 50.0), n)
    shaped = 0.08 * shaped / np.sqrt(np.mean(shaped**2))
    # one voiced burst in the middle; rest is noise only
    t = np.arange(n) / sr
    burst = np.zeros(n)
    i, j = int(0.8 * sr), int(1.2 * sr)
    burst[i:j] = np.hanning(j - i)
    voiced = 0.4 * np.sin(2 * np.pi * 220 * t) * burst
    noisy = (voiced + shaped).astype(np.float32)
    den = spectral_gate(noisy, sr, prop_decrease=0.9)
    head = slice(1024, int(0.7 * sr))
    head_gain = float(np.sqrt(np.mean(den[head] ** 2)
                              / np.mean(noisy[head] ** 2)))
    body = slice(int(0.9 * sr), int(1.1 * sr))
    body_gain = float(np.sqrt(np.mean(den[body] ** 2)
                              / np.mean(noisy[body] ** 2)))
    # noise-only region driven to the gate floor regardless of the tilt
    # (measured 0.122 ~= 0.10 floor + smoother leakage); the voiced burst
    # passes MORE than the floor but far from unity — its 220 Hz line sits
    # where the tilted noise (and so the threshold) is strongest, the
    # known noisereduce muffling of low-frequency voicing at high
    # prop_decrease (measured 0.260)
    assert head_gain < 0.20, head_gain
    assert 0.18 < body_gain < 0.45, body_gain
    assert body_gain > 1.5 * head_gain, (head_gain, body_gain)


def test_spectral_gate_silence_and_dc_robust():
    """Degenerate inputs must not produce NaNs: all-zero audio (std=0 ->
    threshold 0) and a pure DC offset."""
    sr = 16000
    zero = np.zeros(sr, np.float32)
    out = spectral_gate(zero, sr, prop_decrease=0.7)
    assert out.shape == (sr,) and np.isfinite(out).all()
    dc = np.full(sr, 0.25, np.float32)
    out2 = spectral_gate(dc, sr, prop_decrease=0.7)
    assert np.isfinite(out2).all()


def test_fade_out():
    y = np.ones(16000, np.float32)
    f = fade_out(y, 16000, 0.05)
    assert f[-1] == 0.0 and f[0] == 1.0 and f[-800] == 1.0


def test_bucketed_loader_static_shapes():
    cfg = default_config(env={})
    ds = SyntheticDataset(n_items=64, n_mels=128, max_frames=500)
    loader = BucketedLoader(ds, cfg, batch_size=4, seed=0)
    shapes = set()
    n = 0
    for batch in loader.epoch(0):
        assert batch.x.shape[0] == 4
        assert batch.y.shape[1] == 128
        assert batch.y.shape[2] % 4 == 0  # fix_len_compatibility
        assert int(batch.y_len.max()) <= batch.y.shape[2]
        shapes.add((batch.x.shape[1], batch.y.shape[2]))
        n += 1
    assert n >= 8
    assert len(shapes) <= len(cfg.text_buckets) * len(cfg.mel_buckets)


def test_collate_padding():
    items = [
        {"x": np.arange(1, 5, dtype=np.int32), "y": np.ones((128, 10), np.float32),
         "spk": np.zeros((224, 224, 3), np.float32), "spk_id": 0},
        {"x": np.arange(1, 3, dtype=np.int32), "y": np.ones((128, 6), np.float32),
         "spk": np.zeros((224, 224, 3), np.float32), "spk_id": 1},
    ]
    b = collate(items, 8, 12)
    assert b.x.shape == (2, 8) and b.y.shape == (2, 128, 12)
    assert list(np.asarray(b.x_len)) == [4, 2]
    assert list(np.asarray(b.y_len)) == [10, 6]
    assert float(b.y[1, :, 6:].sum()) == 0.0


def test_process_sharded_loader_blocks_partition_global_batch():
    """Multi-host loading: with the same seed, per-process loaders build the
    identical epoch plan but each materializes only its contiguous row
    block; stacking the blocks reproduces the single-host global batch."""
    from facegantts_tpu.config import default_config

    cfg = default_config(env={})
    ds = SyntheticDataset(n_items=32, n_mels=8)
    full = BucketedLoader(ds, cfg, batch_size=4, seed=3,
                          process_index=0, process_count=1)
    halves = [
        BucketedLoader(ds, cfg, batch_size=4, seed=3,
                       process_index=pi, process_count=2)
        for pi in (0, 1)
    ]
    got_full = list(full.epoch(0))
    got_halves = [list(h.epoch(0)) for h in halves]
    assert len(got_full) == len(got_halves[0]) == len(got_halves[1])
    for bf, b0, b1 in zip(got_full, *got_halves):
        assert b0.x.shape[0] == b1.x.shape[0] == 2
        for field in ("x", "x_len", "y", "y_len", "spk"):
            merged = np.concatenate(
                [getattr(b0, field), getattr(b1, field)], axis=0
            )
            np.testing.assert_array_equal(merged, getattr(bf, field))


def test_process_sharded_loader_validates_divisibility():
    import pytest

    from facegantts_tpu.config import default_config

    cfg = default_config(env={})
    ds = SyntheticDataset(n_items=8, n_mels=8)
    with pytest.raises(ValueError, match="divisible"):
        BucketedLoader(ds, cfg, batch_size=3, process_index=0, process_count=2)
    with pytest.raises(ValueError, match="drop_last"):
        BucketedLoader(ds, cfg, batch_size=4, drop_last=False,
                       process_index=0, process_count=2)


def test_shard_batch_assembles_from_local_rows():
    """shard_batch on a single host is the identity placement; the
    make_array_from_process_local_data path must preserve values/order."""
    import jax

    from facegantts_tpu.config import default_config
    from facegantts_tpu.parallel import create_mesh, shard_batch

    cfg = default_config(env={})
    ds = SyntheticDataset(n_items=64, n_mels=8)
    loader = BucketedLoader(ds, cfg, batch_size=8, seed=0)
    batch = next(loader.epoch(0))  # 8 rows: divisible over the 8-dev mesh
    mesh = create_mesh(jax.devices())
    placed = shard_batch(mesh, batch)
    for field in ("x", "x_len", "y", "y_len", "spk"):
        np.testing.assert_array_equal(
            np.asarray(getattr(placed, field)), getattr(batch, field)
        )


def _fake_shard(n=6, n_mels=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": [rng.integers(1, 148, rng.integers(5, 20)).astype(np.int32)
                 for _ in range(n)],
        "mel": [(rng.standard_normal((n_mels, rng.integers(10, 30))) - 5)
                .astype(np.float16) for _ in range(n)],
        "faces": [rng.integers(0, 255, (224, 224, 3)).astype(np.uint8)
                  for _ in range(n)],
        "spk": list(range(n)),
    }


def test_packed_shard_raw_and_npz_round_trip(tmp_path):
    """Both shard formats round-trip identical items through PackedDataset,
    and load_packed discovers both."""
    from facegantts_tpu.config import default_config
    from facegantts_tpu.data.dataset import PackedDataset, load_packed
    from facegantts_tpu.data.preprocess import _flush

    cfg = default_config(env={}).replace(
        packed_data_dir=str(tmp_path), n_mels=8
    )
    shard = _fake_shard()
    p_raw = _flush(cfg, "train", shard, 0, "raw")
    p_npz = _flush(cfg, "val", shard, 0, "npz")
    assert os.path.isdir(p_raw) and p_npz.endswith(".npz")

    ds_raw = PackedDataset([p_raw], n_mels=8)
    ds_npz = PackedDataset([p_npz], n_mels=8)
    assert len(ds_raw) == len(ds_npz) == 6
    assert ds_raw.lengths() == ds_npz.lengths() == [
        (len(t), m.shape[1]) for t, m in zip(shard["text"], shard["mel"])
    ]
    for i in range(6):
        a, b = ds_raw[i], ds_npz[i]
        for k in ("x", "y", "spk"):
            np.testing.assert_array_equal(a[k], b[k])
        np.testing.assert_array_equal(a["x"], shard["text"][i])
        np.testing.assert_array_equal(
            a["y"], shard["mel"][i].astype(np.float32))
        assert a["spk_id"] == b["spk_id"] == i

    # discovery: raw dir for train, npz for val
    assert len(load_packed(cfg, "train")) == 6
    assert len(load_packed(cfg, "val")) == 6
