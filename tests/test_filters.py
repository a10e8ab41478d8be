"""Tests for the RBJ biquad filter chain (reference
lrs2_preprocessing/data_filtering/filter_test.py, config.py:75-83)."""

import numpy as np
import pytest

from facegantts_tpu.data.filters import (
    DEFAULT_Q,
    apply_filter_chain,
    bandreject_biquad,
    biquad,
    detect_bandstop_freq,
    highpass_biquad,
    lowpass_biquad,
    noise_frequency_analysis,
    rbj_coeffs,
)

SR = 16000


def _gain_at(b, a, f, sr=SR):
    from scipy.signal import freqz

    w, h = freqz(b, a, worN=[2 * np.pi * f / sr])
    return float(np.abs(h[0]))


def test_rbj_frequency_responses():
    b, a = rbj_coeffs("lowpass", SR, 1000.0)
    assert _gain_at(b, a, 1.0) == pytest.approx(1.0, abs=1e-3)   # DC passes
    assert _gain_at(b, a, 1000.0) == pytest.approx(1 / np.sqrt(2), abs=0.02)
    assert _gain_at(b, a, 7000.0) < 0.03                         # stop band

    b, a = rbj_coeffs("highpass", SR, 1000.0)
    assert _gain_at(b, a, 10.0) < 1e-3
    assert _gain_at(b, a, 1000.0) == pytest.approx(1 / np.sqrt(2), abs=0.02)
    assert _gain_at(b, a, 7900.0) == pytest.approx(1.0, abs=1e-2)

    b, a = rbj_coeffs("bandreject", SR, 200.0, q=1.0)
    assert _gain_at(b, a, 200.0) < 1e-6                          # deep null
    assert _gain_at(b, a, 1.0) == pytest.approx(1.0, abs=1e-2)
    assert _gain_at(b, a, 4000.0) == pytest.approx(1.0, abs=1e-2)


def test_biquad_matches_naive_difference_equation():
    """lfilter application == the direct-form recurrence torchaudio's
    lfilter implements, including the [-1, 1] clamp."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(256) * 2.0  # force the clamp to fire
    b, a = rbj_coeffs("lowpass", SR, 500.0)
    b, a = b / a[0], a / a[0]
    y = np.zeros_like(x)
    for n in range(len(x)):
        acc = b[0] * x[n]
        if n >= 1:
            acc += b[1] * x[n - 1] - a[1] * y[n - 1]
        if n >= 2:
            acc += b[2] * x[n - 2] - a[2] * y[n - 2]
        y[n] = acc
    # NOTE: torchaudio clamps once at the END (not per-sample inside the
    # recurrence), so a post-hoc clip of the naive output is the oracle.
    np.testing.assert_allclose(
        biquad(x, *rbj_coeffs("lowpass", SR, 500.0)),
        np.clip(y, -1.0, 1.0), rtol=0, atol=1e-9,
    )


def test_detect_bandstop_freq_finds_planted_hum():
    t = np.arange(SR * 2) / SR
    hum = 0.5 * np.sin(2 * np.pi * 150.0 * t)
    speech = 0.1 * np.sin(2 * np.pi * 1200.0 * t)
    f = detect_bandstop_freq(hum + speech, SR, win=1024, hop=160)
    assert abs(f - 150.0) < SR / 2 / 513 + 1e-6  # within one bin


def test_apply_filter_chain_gates_and_notches(monkeypatch):
    from facegantts_tpu.config import default_config

    t = np.arange(SR) / SR
    hum = 0.4 * np.sin(2 * np.pi * 150.0 * t)
    tone = 0.4 * np.sin(2 * np.pi * 2000.0 * t)
    wav = (hum + tone).astype(np.float32)

    cfg = default_config(env={})
    out = apply_filter_chain(wav, SR, cfg)  # all gates off by default
    np.testing.assert_allclose(out, wav, atol=1e-6)

    cfg = default_config(env={}, overrides={"use_bandstop_filter": 1,
                                            "bandstop_q_value": 1.0})
    log = []
    out = apply_filter_chain(wav, SR, cfg, log=log)
    assert any("adaptive bandstop" in s for s in log)

    def band_energy(x, f):
        spec = np.abs(np.fft.rfft(x))
        k = int(round(f / SR * len(x)))
        return float(spec[k - 2:k + 3].sum())

    assert band_energy(out, 150.0) < 0.15 * band_energy(wav, 150.0)
    assert band_energy(out, 2000.0) > 0.8 * band_energy(wav, 2000.0)


def test_noise_frequency_analysis_report():
    # synthetic mean spectrum: peak at bin 20 with ~4-bin -3 dB width
    bins, frames = 128, 10
    spec = np.full((bins, frames), -60.0)
    spec[18:23, :] = -12.0
    spec[20, :] = -10.0
    r = noise_frequency_analysis(spec, SR)
    assert r["peak_bin"] == 20
    assert r["peak_freq_hz"] == pytest.approx(20 * (SR // 2) / bins, abs=0.01)
    assert r["q_value"] > 0


def test_filter_test_cli_writes_filtered_wavs(tmp_path):
    from facegantts_tpu.data import lrs2_prep
    from facegantts_tpu.utils.audio import load_wav, save_wav

    src = tmp_path / "wav" / "spk1"
    src.mkdir(parents=True)
    t = np.arange(SR) / SR
    wav = (0.3 * np.sin(2 * np.pi * 150.0 * t)
           + 0.2 * np.sin(2 * np.pi * 1100.0 * t)).astype(np.float32)
    save_wav(str(src / "00001.wav"), wav, SR)

    out_dir = tmp_path / "filtered"
    lrs2_prep.main([
        "filter-test", f"input_dir={tmp_path / 'wav'}", f"out={out_dir}",
        "use_bandstop_filter=1", "limit=10",
    ])
    got, sr = load_wav(str(out_dir / "spk1" / "00001.wav"))
    assert sr == SR and len(got) == SR
    # fade-out applied: last sample ~0
    assert abs(got[-1]) < 1e-3


def test_plot_noise_cli_reports_peak(tmp_path):
    pytest.importorskip("matplotlib")
    from facegantts_tpu.config import default_config
    from facegantts_tpu.data.lrs2_prep import plot_noise
    from facegantts_tpu.utils.audio import save_wav

    src = tmp_path / "wav" / "spk1"
    src.mkdir(parents=True)
    t = np.arange(SR) / SR
    for i in range(2):
        wav = (0.5 * np.sin(2 * np.pi * 150.0 * t)).astype(np.float32)
        save_wav(str(src / f"{i:05d}.wav"), wav, SR)

    cfg = default_config(env={})
    report = plot_noise(cfg, str(tmp_path / "wav"), str(tmp_path / "plots"),
                        limit=10)
    assert (tmp_path / "plots" / "mean_spectrogram.pdf").exists()
    assert (tmp_path / "plots" / "median_spectrogram.pdf").exists()
    assert abs(report["peak_freq_hz"] - 150.0) < 2 * SR / 2 / (cfg.n_fft // 2 + 1)
