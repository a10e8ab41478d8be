"""Generate the noisereduce denoise-parity golden.

Run this wherever the actual ``noisereduce`` package is installed (it is
NOT baked into the TPU image) and commit the resulting
``tests/goldens/denoise_nr_golden.npz``; ``tests/test_world.py::
test_spectral_gate_vs_committed_noisereduce_golden`` then pins the native
``spectral_gate`` (facegantts_tpu/data/denoise.py) against the package's
output on the exact fixture, with the reference's call signature
(reference data/lrs2_dataset.py:73-84: stationary=True,
prop_decrease=denoise_factor, n_fft=1024, win_length=1024, hop_length=160).

The fixture is generated deterministically from seeds, so this script can
run on a machine that has never seen the repo's test data.

Usage: python scripts/make_denoise_golden.py [out.npz]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000


def fixture() -> np.ndarray:
    """Speech-like fixture: harmonic bursts with an F0 glide over stationary
    Gaussian noise (seeded).  The voicing is SPARSE per frequency bin (burst
    duty cycle ~45%, F0 gliding 120->230 Hz moves the harmonics across
    bins) — the stationary gate estimates its noise statistics from the
    clip itself (reference passes no noise clip), and a per-bin
    mean+1.5*std threshold only passes values that are outliers of their
    own bin's distribution, so a fixture whose tones sit in fixed bins most
    of the clip would be gated wholesale BY DESIGN of the algorithm (the
    real package behaves identically there)."""
    rng = np.random.default_rng(1234)
    t = np.arange(int(1.2 * SR)) / SR
    f0 = 120.0 + 110.0 * t / t[-1]
    phase = 2 * np.pi * np.cumsum(f0) / SR
    y = np.zeros_like(t)
    for k, a in [(1, 1.0), (2, 0.6), (3, 0.45), (4, 0.2), (6, 0.1)]:
        y += a * np.sin(k * phase)
    env = np.zeros_like(t)
    for a, b in [(0.20, 0.45), (0.55, 0.75), (0.85, 1.05)]:
        i, j = int(a * SR), int(b * SR)
        n = j - i
        env[i:j] = np.hanning(n) ** 0.3  # burst with soft on/offset
    y *= 0.2 * env
    y += 0.02 * rng.standard_normal(len(t))
    return y.astype(np.float32)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "denoise_nr_golden.npz")
    import noisereduce as nr

    noisy = fixture()
    den = nr.reduce_noise(
        y=noisy, sr=SR, stationary=True, prop_decrease=0.7,
        n_fft=1024, win_length=1024, hop_length=160,
    ).astype(np.float32)
    version = getattr(nr, "__version__", "unknown")
    # librosa's version matters too: 0.10 changed the stft pad_mode default
    # (reflect -> constant), which shifts noisereduce's output at the edges
    try:
        import librosa

        librosa_version = getattr(librosa, "__version__", "unknown")
    except ImportError:
        librosa_version = "absent"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, noisy=noisy, denoised=den,
                        version=np.array(version),
                        librosa_version=np.array(librosa_version),
                        sr=np.array(SR))
    print(f"wrote {out} (noisereduce {version}, librosa {librosa_version})")

    try:
        from facegantts_tpu.data.denoise import spectral_gate

        ours = spectral_gate(noisy, SR, prop_decrease=0.7)
        n = min(len(ours), len(den))
        err = float(np.sqrt(np.mean((ours[:n] - den[:n]) ** 2)))
        ref = float(np.sqrt(np.mean(den[:n] ** 2)))
        print(f"native spectral_gate vs package: rel RMSE {err / ref:.4f}")
    except Exception as e:  # the script may run outside the repo env
        print(f"(native comparison skipped: {e})")


if __name__ == "__main__":
    main()
