"""Data pipeline tests: denoiser, bucketing loader, collate, packed format."""

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
