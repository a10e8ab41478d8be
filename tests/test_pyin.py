"""Tests for pYIN (evaluation/pyin.py) and the VoiceFeatureExtractor
(feature_extractor.py) — the reference's C10 surface
(model/feature_extractor.py:5-49): pitch accuracy on known-F0 signals,
voicing decisions, octave-jump tracking through the HMM, and the
mel/F0/energy output contracts."""

import numpy as np
import pytest

from facegantts_tpu.evaluation.pyin import C2_HZ, C7_HZ, pyin
from facegantts_tpu.feature_extractor import VoiceFeatureExtractor

SR = 16000


def _tone(f0, seconds=0.5, sr=SR, harmonics=5):
    t = np.arange(int(seconds * sr)) / sr
    y = sum((0.6 / k) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, harmonics + 1))
    return y.astype(np.float64)


def _cfg():
    return dict(
        sample_rate=SR, hop_len=160, n_fft=1024, win_len=1024,
        n_mels=128, f_min=0.0, f_max=8000.0,
    )


def test_pyin_tracks_tone():
    f0, flag, prob = pyin(_tone(220.0), SR)
    assert f0.shape == flag.shape == prob.shape
    voiced = flag & (f0 > 0)
    assert voiced.mean() > 0.6
    med = np.median(f0[voiced])
    # pitch-bin resolution is 0.1 semitone; allow 1%
    assert abs(med - 220.0) / 220.0 < 0.01, med
    assert prob[voiced].mean() > 0.5


def test_pyin_low_and_high_pitch():
    for target in (90.0, 523.25):
        f0, flag, _ = pyin(_tone(target), SR)
        med = np.median(f0[flag & (f0 > 0)])
        assert abs(med - target) / target < 0.02, (target, med)


def test_pyin_silence_and_noise_unvoiced():
    f0, flag, prob = pyin(np.zeros(SR // 2), SR)
    assert not flag.any()
    assert (f0 == 0).all()
    rng = np.random.default_rng(0)
    f0n, flagn, probn = pyin(rng.standard_normal(SR // 2), SR)
    assert flagn.mean() < 0.3  # white noise: mostly unvoiced
    assert probn.mean() < 0.5


def test_pyin_voiced_unvoiced_boundary():
    """Tone followed by silence: the HMM switches to unvoiced."""
    y = np.concatenate([_tone(200.0, 0.4), np.zeros(int(0.4 * SR))])
    f0, flag, _ = pyin(y, SR)
    n = len(flag)
    assert flag[: n // 3].mean() > 0.5        # tone region voiced
    assert flag[-n // 3 :].mean() < 0.2       # silent region unvoiced


def test_pyin_tracks_octave_jump():
    """Pitch doubles mid-signal; the Viterbi path follows within a few
    frames rather than smearing (transition band is ~1 octave/frame)."""
    y = np.concatenate([_tone(150.0, 0.4), _tone(300.0, 0.4)])
    f0, flag, _ = pyin(y, SR)
    n = len(f0)
    head = f0[: n // 3][flag[: n // 3]]
    tail = f0[-n // 3 :][flag[-n // 3 :]]
    assert abs(np.median(head) - 150.0) / 150.0 < 0.02
    assert abs(np.median(tail) - 300.0) / 300.0 < 0.02


def test_pyin_range_clamp():
    """Out-of-range F0 snaps to the configured search range edges."""
    f0, flag, _ = pyin(_tone(440.0), SR, fmin=100.0, fmax=300.0)
    voiced = flag & (f0 > 0)
    assert (f0[voiced] <= 300.0 * 1.01).all()


def test_extractor_f0_contract():
    fx = VoiceFeatureExtractor(_cfg())
    wav = _tone(220.0, 0.5)
    f0 = fx.extract_f0(wav)
    assert f0.shape[0] == 1 and f0.dtype == np.float32
    # librosa pyin framing: centered, frame_length=2048, hop=512
    assert f0.shape[1] == 1 + len(wav) // 512
    voiced = f0[0] > 0
    assert abs(np.median(f0[0][voiced]) - 220.0) / 220.0 < 0.01
    assert np.isfinite(f0).all()


def test_extractor_mel_and_energy_contract():
    fx = VoiceFeatureExtractor(_cfg())
    wav = _tone(220.0, 0.3)
    n_frames = 1 + len(wav) // fx.hop_length
    mel = fx.extract_mel_spectrogram(wav)
    assert mel.shape == (128, n_frames)
    assert (mel >= 0).all() and np.isfinite(mel).all()
    # tone energy concentrates in low mel bins
    assert mel[:48].sum() > 10 * mel[64:].sum()
    e = fx.extract_energy(wav)
    assert e.shape == (n_frames,)
    # interior RMS of a unit-ish tone is O(0.5); silence edges lower
    assert e[n_frames // 2] > 0.2
    ez = fx.extract_energy(np.zeros(4096))
    assert (ez == 0).all()


def test_extractor_matches_reference_nan_policy():
    """Reference nan_to_nums pYIN output (feature_extractor.py:40); ours
    must be finite and zero on unvoiced by construction."""
    fx = VoiceFeatureExtractor(_cfg())
    f0 = fx.extract_f0(np.zeros(SR // 4))
    assert np.isfinite(f0).all() and (f0 == 0).all()


def test_pyin_beats_plain_yin_on_noisy_tone():
    """The HMM smoothing should yield fewer octave errors than plain YIN
    on a noisy harmonic tone (the reason the reference uses pYIN)."""
    from facegantts_tpu.evaluation.metrics import yin_f0

    rng = np.random.default_rng(1)
    y = _tone(180.0, 0.6) + 0.25 * rng.standard_normal(int(0.6 * SR))

    def octave_err(f0):
        v = f0 > 0
        if v.sum() == 0:
            return 1.0
        ratio = f0[v] / 180.0
        return float((np.abs(np.log2(ratio)) > 0.4).mean())

    f0_p, flag, _ = pyin(y, SR)
    f0_y = yin_f0(y, SR)
    assert octave_err(np.where(flag, f0_p, 0)) <= octave_err(f0_y) + 1e-9


def test_log_f0_rmse_pyin_estimator():
    """The pyin-protocol metric sees pitch differences and is ~0 on
    identical inputs."""
    from facegantts_tpu.evaluation.metrics import log_f0_rmse

    a = _tone(200.0, 0.5)
    b = _tone(230.0, 0.5)
    same = log_f0_rmse(a, a, SR, estimator="pyin")
    diff = log_f0_rmse(a, b, SR, estimator="pyin")
    assert same < 0.02
    expected = abs(np.log(230.0) - np.log(200.0))
    assert abs(diff - expected) < 0.04, diff
