"""Mel-spectrogram op, TPU-native.

Reproduces the HiFi-GAN-convention extraction of the reference
(utils/mel_spectrogram.py:48-93): reflect-pad by (n_fft-hop)/2, non-centered
Hann STFT, magnitude with a 1e-9 floor inside the sqrt, Slaney-normalized mel
filterbank, log dynamic-range compression with a 1e-5 clamp.

Design: the STFT is expressed as framing + one fused matmul with a combined
[cos; sin] DFT basis so the whole op runs on the MXU (no FFT primitive, no
host round-trip).  The mel projection folds into a second matmul; XLA fuses
pad/window/log elementwise work around them.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_slaney(f):
    """Slaney-style mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Slaney mel filterbank with Slaney area normalization, shape (n_mels, n_fft//2+1).

    Matches librosa.filters.mel(..., htk=False, norm='slaney') which the
    reference uses (utils/mel_spectrogram.py:58)."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@lru_cache(maxsize=4)
def _dft_basis(n_fft: int, win_len: int) -> np.ndarray:
    """Windowed real-DFT basis, shape (n_fft, 2*(n_fft//2+1)).

    frames @ basis == [Re(rfft(frame*win)); Im(rfft(frame*win))] concatenated.
    The periodic Hann window is baked into the basis (one matmul total)."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    # periodic hann, centered in the FFT buffer like torch.stft for win<n_fft
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_len) / win_len)
    pad = (n_fft - win_len) // 2
    full_win = np.zeros(n_fft)
    full_win[pad : pad + win_len] = win
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1) * full_win[:, None]
    return basis.astype(np.float32)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Slice (B, T) into non-centered frames (B, n_frames, n_fft)."""
    n_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return y[..., idx]


@partial(jax.jit, static_argnames=("n_fft", "num_mels", "sampling_rate", "hop_size", "win_size", "fmin", "fmax", "center"))
def mel_spectrogram(
    y: jnp.ndarray,
    n_fft: int = 1024,
    num_mels: int = 128,
    sampling_rate: int = 16000,
    hop_size: int = 160,
    win_size: int = 1024,
    fmin: float = 0.0,
    fmax: float = 8000.0,
    center: bool = False,
) -> jnp.ndarray:
    """(B, T) float waveform in [-1, 1] -> (B, num_mels, n_frames) log-mel.

    Frame count matches torch.stft(center=False) after the reference's
    (n_fft-hop)/2 reflect pad: n_frames = 1 + T // hop - n_fft // hop."""
    if y.ndim == 1:
        y = y[None]
    assert not center, "reference uses center=False with explicit reflect pad"
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")

    frames = frame_signal(y, n_fft, hop_size)  # (B, F, n_fft)
    basis = jnp.asarray(_dft_basis(n_fft, win_size))
    spec = jnp.einsum(
        "bfn,nk->bfk", frames, basis, preferred_element_type=jnp.float32
    )  # (B, F, 2*bins)
    n_bins = n_fft // 2 + 1
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    mag = jnp.sqrt(power + 1e-9)  # reference's in-sqrt floor

    fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum("bfk,mk->bmf", mag, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5))


def num_mel_frames(n_samples: int, n_fft: int = 1024, hop: int = 160) -> int:
    """Frame count produced by mel_spectrogram for a T-sample input."""
    pad = (n_fft - hop) // 2
    return 1 + (n_samples + 2 * pad - n_fft) // hop
