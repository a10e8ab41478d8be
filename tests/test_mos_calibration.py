"""Calibration record for the DSP MOS proxy (evaluation/utmos.py).

The reference reports UTMOS22-strong MOS from torch.hub
(/root/reference/evaluation/eval.py:209-211).  The real checkpoint is not
reachable on an air-gapped pod, so the default backend is the DSP proxy —
this test RECORDS its calibration against the behavior published for
UTMOS22 (VoiceMOS'22 results; tarepan/SpeechMOS model card):

- ground-truth clean speech scores high (UTMOS ~3.5-4.5 on LJSpeech /
  VoiceMOS natural anchors),
- additive noise lowers the score monotonically with SNR,
- hard clipping, band-limiting, and silence-padding each lower it,
- the scale is bounded to [1, 5].

The proxy is a *relative* quality signal (its role in eval_output.txt and
in-train regression tracking), so the contract tested here is monotone
ordering over a synthetic degradation ladder plus the anchor ranges, not
numeric equality to UTMOS.  The recorded values live in PARITY.md; if the
proxy's calibration drifts, this test pins the expected table.
"""

import numpy as np
import pytest

from facegantts_tpu.evaluation.utmos import DSPMOSPredictor, mos_features

SR = 16000


def _speech_like(seconds: float = 2.0, seed: int = 0) -> np.ndarray:
    """Synthetic voiced 'speech': F0-contoured harmonics under a formant
    envelope with syllabic amplitude modulation and short pauses."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 1.7 * t) + 10.0 * np.sin(2 * np.pi * 0.3 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    formants = {500.0: 1.0, 1500.0: 0.63, 2500.0: 0.32, 3500.0: 0.16}
    wav = np.zeros_like(t)
    for k in range(1, 28):
        fk = k * 130.0
        amp = sum(a * np.exp(-0.5 * ((fk - fc) / 350.0) ** 2)
                  for fc, a in formants.items())
        wav += amp * np.sin(k * phase + rng.uniform(0, 2 * np.pi))
    # syllabic envelope (~4 Hz) with two short pauses
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t) ** 2
    for start in (0.8, 1.6):
        env[int(start * SR):int((start + 0.08) * SR)] *= 0.02
    wav = wav * env
    return (wav / np.max(np.abs(wav)) * 0.7).astype(np.float32)


def _add_noise(wav: np.ndarray, snr_db: float, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(wav)).astype(np.float32)
    p_sig = np.mean(wav**2)
    p_noise = p_sig / (10.0 ** (snr_db / 10.0))
    return wav + noise * np.sqrt(p_noise / np.mean(noise**2))


def _clip(wav: np.ndarray, level: float) -> np.ndarray:
    out = np.clip(wav, -level, level) / level
    return out.astype(np.float32)


def _lowpass(wav: np.ndarray, cutoff_hz: float) -> np.ndarray:
    spec = np.fft.rfft(wav)
    freqs = np.fft.rfftfreq(len(wav), 1.0 / SR)
    spec[freqs > cutoff_hz] = 0.0
    return np.fft.irfft(spec, len(wav)).astype(np.float32)


@pytest.fixture(scope="module")
def ladder():
    clean = _speech_like()
    mos = DSPMOSPredictor()
    return {
        "clean": mos(clean, SR),
        "snr20": mos(_add_noise(clean, 20.0), SR),
        "snr10": mos(_add_noise(clean, 10.0), SR),
        "snr0": mos(_add_noise(clean, 0.0), SR),
        "clipped": mos(_clip(clean, 0.25), SR),
        "band3k": mos(_lowpass(clean, 3000.0), SR),
        "noise_only": mos(np.random.default_rng(2).standard_normal(2 * SR).astype(np.float32), SR),
    }


def test_scale_bounds(ladder):
    for name, v in ladder.items():
        assert 1.0 <= v <= 5.0, (name, v)


def test_clean_anchor(ladder):
    # UTMOS-strong scores natural clean speech ~3.5-4.5; the proxy's ceiling
    # is 4.5 and clean synthetic speech must land in the top band
    assert ladder["clean"] >= 3.5, ladder


def test_noise_monotone(ladder):
    assert ladder["clean"] > ladder["snr20"] > ladder["snr10"] > ladder["snr0"], ladder


def test_degradations_penalized(ladder):
    assert ladder["clipped"] < ladder["clean"] - 0.3, ladder
    assert ladder["band3k"] < ladder["clean"], ladder
    # pure noise is the floor band (UTMOS gives non-speech ~1-1.5)
    assert ladder["noise_only"] <= 2.0, ladder
    assert ladder["noise_only"] < ladder["snr0"], ladder


def test_feature_directions():
    clean = _speech_like()
    f_clean = mos_features(clean, SR)
    f_noisy = mos_features(_add_noise(clean, 0.0), SR)
    # flatness is the noise detector: must rise under broadband noise
    assert f_noisy["flatness"] > f_clean["flatness"]
    f_clip = mos_features(_clip(clean, 0.25), SR)
    assert f_clip["clipping"] > f_clean["clipping"]
    f_lp = mos_features(_lowpass(clean, 3000.0), SR)
    assert f_lp["bandwidth"] < f_clean["bandwidth"]


def test_recorded_calibration_table(ladder):
    """Pin the recorded values (PARITY.md 'MOS proxy calibration') to one
    decimal so silent recalibrations are caught; update BOTH places
    deliberately when the proxy changes."""
    recorded = {"clean": 4.01, "snr20": 3.97, "snr10": 3.30, "snr0": 2.24,
                "clipped": 3.06, "band3k": 4.00, "noise_only": 1.80}
    for name, want in recorded.items():
        assert ladder[name] == pytest.approx(want, abs=0.25), (
            name, ladder[name], want)
