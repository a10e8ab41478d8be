"""DSP + alignment op tests: mel vs torch-STFT golden path, MAS vs brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from facegantts_tpu.ops import (
    duration_loss,
    fix_len_compatibility,
    generate_path,
    maximum_path,
    maximum_path_numpy,
    mel_spectrogram,
    num_mel_frames,
    sequence_mask,
)


def test_sequence_mask():
    m = sequence_mask(jnp.array([2, 4]), 5)
    assert m.shape == (2, 5)
    np.testing.assert_array_equal(
        np.asarray(m), [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]]
    )


def test_fix_len_compatibility():
    assert fix_len_compatibility(125) == 128
    assert fix_len_compatibility(128) == 128
    assert fix_len_compatibility(1) == 4


def test_generate_path():
    dur = jnp.array([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6))
    p = np.asarray(generate_path(dur, mask))
    expect = np.array(
        [[[1, 1, 0, 0, 0, 0], [0, 0, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1]]]
    )
    np.testing.assert_array_equal(p, expect)


def test_duration_loss():
    lw = jnp.array([[1.0, 2.0]])
    lw_ = jnp.array([[1.0, 0.0]])
    out = float(duration_loss(lw, lw_, jnp.array([2.0])))
    assert np.isclose(out, 4.0 / 2.0)


def _mel_torch_reference(y, n_fft=1024, num_mels=128, sr=16000, hop=160, win=1024, fmin=0.0, fmax=8000.0):
    """HiFi-GAN-convention mel via torch.stft (the reference's exact pipeline,
    utils/mel_spectrogram.py:48-93) with our own Slaney filterbank."""
    import torch

    from facegantts_tpu.ops.mel import mel_filterbank

    y = torch.as_tensor(np.asarray(y), dtype=torch.float32)
    pad = int((n_fft - hop) / 2)
    y = torch.nn.functional.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        y, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.view_as_real(spec)
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(mel_filterbank(sr, n_fft, num_mels, fmin, fmax))
    mel = torch.matmul(fb, spec)
    return torch.log(torch.clamp(mel, min=1e-5)).numpy()


def test_mel_matches_torch_stft_pipeline(rng):
    y = (rng.standard_normal((2, 16000)) * 0.2).astype(np.float32)
    ours = np.asarray(mel_spectrogram(jnp.asarray(y)))
    ref = _mel_torch_reference(y)
    assert ours.shape == ref.shape == (2, 128, num_mel_frames(16000))
    # the MXU matmul-DFT accumulates 1024-term f32 sums (FFT is unimplemented
    # on this TPU backend); log-domain error stays < 3e-2 in quiet bins
    np.testing.assert_allclose(ours, ref, atol=3e-2, rtol=2e-3)
    assert np.abs(ours - ref).mean() < 2e-3


def test_mel_filterbank_matches_slaney_convention():
    """Cross-check filter 0 against hand-derived Slaney values.

    mel(8000 Hz) = 15 + 27*ln(8)/ln(6.4); 130 points over [0, that]; first
    triangle spans [0, 23.38, 46.77] Hz with area norm 2/46.77 — weights at
    the 15.625 Hz-spaced FFT bins follow directly."""
    from facegantts_tpu.ops.mel import hz_to_mel_slaney, mel_filterbank, mel_to_hz_slaney

    fb = mel_filterbank(16000, 1024, 128, 0.0, 8000.0)
    assert fb.shape == (128, 513)
    assert (fb.sum(axis=1) > 0).all()
    top_mel = 15 + 27 * np.log(8.0) / np.log(6.4)
    np.testing.assert_allclose(hz_to_mel_slaney(8000.0), top_mel, rtol=1e-9)
    np.testing.assert_allclose(mel_to_hz_slaney(15.0), 1000.0, rtol=1e-9)
    f1 = mel_to_hz_slaney(top_mel / 129)
    f2 = mel_to_hz_slaney(2 * top_mel / 129)
    enorm = 2.0 / f2
    bin_hz = 8000.0 / 512
    np.testing.assert_allclose(fb[0, 0], 0.0, atol=1e-9)
    np.testing.assert_allclose(fb[0, 1], (bin_hz / f1) * enorm, rtol=1e-5)
    np.testing.assert_allclose(fb[0, 2], ((f2 - 2 * bin_hz) / (f2 - f1)) * enorm, rtol=1e-5)
    np.testing.assert_allclose(fb[0, 3], 0.0, atol=1e-9)


def _random_log_prior(rng, b, tx, ty):
    return rng.standard_normal((b, tx, ty)).astype(np.float32)


def _band_mask(b, tx_max, ty_max, t_xs, t_ys):
    m = np.zeros((b, tx_max, ty_max), np.float32)
    for i in range(b):
        m[i, : t_xs[i], : t_ys[i]] = 1
    return m


def _brute_force_best_path(value, t_x, t_y):
    """Exhaustive DP (independent re-derivation) for cross-checking."""
    import itertools

    best, best_path = -1e18, None
    # enumerate all monotonic paths: choose which y-steps advance x
    for advance_positions in itertools.combinations(range(1, t_y), t_x - 1):
        path = np.zeros((t_x, t_y), np.int32)
        x = 0
        score = value[0, 0]
        path[0, 0] = 1
        adv = set(advance_positions)
        for y in range(1, t_y):
            if y in adv:
                x += 1
            path[x, y] = 1
            score += value[x, y]
        if score > best:
            best, best_path = score, path
    return best_path


@pytest.mark.parametrize("tx,ty", [(3, 5), (4, 4), (2, 7)])
def test_mas_jax_matches_bruteforce(rng, tx, ty):
    val = _random_log_prior(rng, 1, tx, ty)
    mask = np.ones((1, tx, ty), np.float32)
    ours = np.asarray(maximum_path(jnp.asarray(val), jnp.asarray(mask)))
    brute = _brute_force_best_path(val[0], tx, ty)
    np.testing.assert_array_equal(ours[0].astype(np.int32), brute)


def test_mas_jax_matches_numpy_reference_batched(rng):
    b, tx, ty = 5, 11, 29
    t_xs = rng.integers(2, tx + 1, size=b)
    t_ys = np.maximum(rng.integers(5, ty + 1, size=b), t_xs)
    val = _random_log_prior(rng, b, tx, ty)
    mask = _band_mask(b, tx, ty, t_xs, t_ys)
    ours = np.asarray(maximum_path(jnp.asarray(val), jnp.asarray(mask)))
    ref = maximum_path_numpy(val, mask)
    np.testing.assert_array_equal(ours.astype(np.int32), ref)
    # each valid mel frame aligns to exactly one text token
    for i in range(b):
        np.testing.assert_array_equal(
            ours[i, :, : t_ys[i]].sum(0), np.ones(t_ys[i])
        )


def test_mas_native_matches_numpy(rng):
    native = pytest.importorskip("facegantts_tpu.native")
    b, tx, ty = 4, 9, 17
    t_xs = rng.integers(2, tx + 1, size=b)
    t_ys = np.maximum(rng.integers(4, ty + 1, size=b), t_xs)
    val = _random_log_prior(rng, b, tx, ty)
    mask = _band_mask(b, tx, ty, t_xs, t_ys)
    try:
        got = native.maximum_path_native(val, mask)
    except Exception as e:  # toolchain missing in some environments
        pytest.skip(f"native build unavailable: {e}")
    ref = maximum_path_numpy(val, mask)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# fused GroupNorm (ops/groupnorm.py)


def test_group_norm_matches_flax(rng):
    """XLA path == flax nn.GroupNorm math (the U-Net Blocks' norm)."""
    import jax
    from flax import linen as nn

    from facegantts_tpu.ops.groupnorm import group_norm

    x = jnp.asarray(rng.standard_normal((2, 8, 12, 64)) * 3 + 1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(64) * 0.5 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32)
    got = group_norm(x, scale, bias, 8, 1e-6)
    gn = nn.GroupNorm(num_groups=8, epsilon=1e-6)
    want = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # gradient path (custom_vjp) matches flax's autodiff
    g_got = jax.grad(lambda a: jnp.sum(jnp.sin(group_norm(a, scale, bias, 8, 1e-6))))(x)
    g_want = jax.grad(
        lambda a: jnp.sum(jnp.sin(gn.apply({"params": {"scale": scale, "bias": bias}}, a)))
    )(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), atol=2e-5)


@pytest.mark.parametrize("shape", [(2, 8, 26, 64), (1, 4, 16, 128), (2, 4, 64, 32)])
def test_group_norm_pallas_kernel_interpret(rng, shape):
    """Pallas stats kernel (interpret mode) == pure-XLA reference, including
    the lane-replica fold for C < 128 and odd T with F*T*C % 128 == 0."""
    from facegantts_tpu.ops.groupnorm import (
        _fast_group_norm,
        _shape_supported,
        _xla_group_norm,
    )

    x = jnp.asarray(rng.standard_normal(shape) * 2 - 0.5, jnp.float32)
    assert _shape_supported(x)
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal(c) + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    got = _fast_group_norm(x, scale, bias, 8, 1e-6, interpret=True)
    want = _xla_group_norm(x, scale, bias, 8, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_group_norm_unsupported_shapes_fall_back():
    from facegantts_tpu.ops.groupnorm import _shape_supported, group_norm

    x = jnp.ones((2, 3, 5, 96))  # 128 % 96 != 0
    assert not _shape_supported(x)
    y = group_norm(x, jnp.ones(96), jnp.zeros(96), 8, 1e-6)
    assert y.shape == x.shape


# ---------------------------------------------------------------------------
# fused GroupNorm+Mish+mask chain (ops/gn_mish.py)


@pytest.mark.parametrize("shape", [(2, 8, 26, 64), (1, 4, 16, 128), (2, 4, 10, 256)])
def test_gn_mish_mask_kernel_interpret(rng, shape):
    """Fused chain kernel (interpret mode) == reference XLA chain for every
    supported channel width, including partial-length time masks."""
    from facegantts_tpu.ops.gn_mish import (
        _fused_chain,
        _shape_supported,
        _xla_chain,
    )

    x = jnp.asarray(rng.standard_normal(shape) * 2 - 0.5, jnp.float32)
    assert _shape_supported(x)
    c, t = shape[-1], shape[-2]
    scale = jnp.asarray(rng.standard_normal(c) * 0.5 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    lens = jnp.asarray([t - 3, t][: shape[0]], jnp.int32)
    got = _fused_chain(x, scale, bias, lens, 8, 1e-5, interpret=True)
    want = _xla_chain(x, scale, bias, lens, 8, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_gn_mish_mask_bf16_interpret(rng):
    from facegantts_tpu.ops.gn_mish import _fused_chain, _xla_chain

    x = jnp.asarray(rng.standard_normal((2, 8, 32, 64)), jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(64) * 0.5 + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32)
    lens = jnp.asarray([20, 32], jnp.int32)
    got = _fused_chain(x, scale, bias, lens, 8, 1e-5, interpret=True)
    want = _xla_chain(x, scale, bias, lens, 8, 1e-5)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05
    )


def test_gn_mish_mask_grad_matches_reference(rng):
    """custom_vjp backward == autodiff through the reference chain."""
    import jax

    from facegantts_tpu.ops.gn_mish import _xla_chain, gn_mish_mask

    x = jnp.asarray(rng.standard_normal((2, 4, 12, 64)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(64) + 1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64), jnp.float32)
    lens = jnp.asarray([9, 12], jnp.int32)

    def f(fn, x_, s_, b_):
        return jnp.sum(jnp.sin(fn(x_, s_, b_, lens, 8, 1e-5)))

    g_got = jax.grad(lambda a, s, b: f(gn_mish_mask, a, s, b), (0, 1, 2))(
        x, scale, bias
    )
    g_want = jax.grad(lambda a, s, b: f(_xla_chain, a, s, b), (0, 1, 2))(
        x, scale, bias
    )
    for got, want in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gn_mish_mask_unsupported_falls_back():
    from facegantts_tpu.ops.gn_mish import _shape_supported, gn_mish_mask

    x = jnp.ones((2, 3, 5, 96), jnp.float32)
    assert not _shape_supported(x)
    y = gn_mish_mask(x, jnp.ones(96), jnp.zeros(96), jnp.full((2,), 5, jnp.int32), 8, 1e-5)
    assert y.shape == x.shape
