"""Stationary spectral-gating denoiser.

Capability equivalent of the reference's `noisereduce.reduce_noise(...,
stationary=True, prop_decrease=f)` preprocessing step (reference
data/lrs2_dataset.py:74-85), implemented natively: estimate a per-frequency
stationary noise floor, build a soft sigmoid gain mask thresholded above the
floor, smooth it over time/frequency, and attenuate by `prop_decrease`.
Runs offline on the host (numpy) during dataset packing — never in the
training hot path (SURVEY.md §7 step 6)."""

import numpy as np


def _stft(y, n_fft=2048, hop=512):
    win = np.hanning(n_fft + 1)[:-1]
    n_frames = 1 + max(0, -(-(len(y) - n_fft) // hop))  # ceil: cover the tail
    pad = (n_frames - 1) * hop + n_fft - len(y)
    y = np.pad(y, (0, max(0, pad)))
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * win
    return np.fft.rfft(frames, axis=-1), win


def _istft(spec, n_samples, n_fft=2048, hop=512):
    win = np.hanning(n_fft + 1)[:-1]
    frames = np.fft.irfft(spec, n=n_fft, axis=-1) * win
    out = np.zeros((spec.shape[0] - 1) * hop + n_fft)
    norm = np.zeros_like(out)
    for i in range(spec.shape[0]):
        out[i * hop : i * hop + n_fft] += frames[i]
        norm[i * hop : i * hop + n_fft] += win**2
    out = out / np.maximum(norm, 1e-8)
    return out[:n_samples]


def spectral_gate(
    y: np.ndarray,
    sr: int,
    prop_decrease: float = 0.7,
    n_std_thresh: float = 1.5,
    n_fft: int = 2048,
    hop: int = 512,
    smooth_hz: float = 500.0,
    smooth_frames: int = 4,
) -> np.ndarray:
    """Denoise a mono float waveform; stationary gate.

    The noise statistics are estimated from the full clip (stationary
    assumption, like the reference's configuration)."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) < n_fft:
        return y.astype(np.float32)
    spec, _ = _stft(y, n_fft, hop)
    mag_db = 20.0 * np.log10(np.abs(spec) + 1e-12)

    noise_mean = mag_db.mean(axis=0)
    noise_std = mag_db.std(axis=0)
    thresh = noise_mean + n_std_thresh * noise_std

    # soft sigmoid gate around the threshold (dB domain)
    softness = 6.0
    gain = 1.0 / (1.0 + np.exp(-(mag_db - thresh[None, :]) / softness))

    # smooth over frequency and time
    if smooth_hz > 0:
        k_f = max(1, int(smooth_hz / (sr / n_fft)))
        kernel = np.ones(k_f) / k_f
        gain = np.apply_along_axis(lambda m: np.convolve(m, kernel, mode="same"), 1, gain)
    if smooth_frames > 1:
        kernel = np.ones(smooth_frames) / smooth_frames
        gain = np.apply_along_axis(lambda m: np.convolve(m, kernel, mode="same"), 0, gain)

    gain = 1.0 - prop_decrease * (1.0 - gain)
    out = _istft(spec * gain, len(y), n_fft, hop)
    return out.astype(np.float32)


def fade_out(y: np.ndarray, sr: int, duration_s: float = 0.05) -> np.ndarray:
    """Linear fade-out over the final `duration_s` seconds (reference
    lrs2_dataset.py:90-92)."""
    n = min(len(y), int(sr * duration_s))
    if n <= 0:
        return y
    y = np.array(y, copy=True)
    y[-n:] *= np.linspace(1.0, 0.0, n, dtype=y.dtype)
    return y
