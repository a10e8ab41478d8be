"""Model-layer tests: shapes, masking invariants, jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegantts_tpu.config import default_config
from facegantts_tpu.models import (
    Diffusion,
    FaceTTS,
    GradLogPEstimator2d,
    SpectrogramDiscriminator,
    SyncNet,
    TextEncoder,
)

CFG = default_config(env={})


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 8)


def test_mish_matches_textbook_form():
    """The rational-exp mish (models/unet.py) must match x*tanh(softplus(x))
    to f32 rounding everywhere, including extremes, and have finite,
    matching gradients."""
    from flax import linen as nn

    from facegantts_tpu.models.unet import mish

    x = jnp.concatenate([
        jnp.linspace(-80.0, 80.0, 40001),
        jnp.array([-1e30, -1e4, -25.0, 19.999, 20.0, 20.001, 1e4, 1e30]),
    ])
    ref = x * jnp.tanh(nn.softplus(x))
    got = mish(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-6, atol=5e-6)
    g_ref = jax.grad(lambda v: jnp.sum(v * jnp.tanh(nn.softplus(v))))(x)
    g_got = jax.grad(lambda v: jnp.sum(mish(v)))(x)
    assert np.isfinite(np.asarray(g_got)).all()
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
    # bf16 inputs stay bf16 out
    xb = x.astype(jnp.bfloat16)
    assert mish(xb).dtype == jnp.bfloat16


def test_text_encoder_shapes_and_masking(keys):
    enc = TextEncoder(
        n_vocab=149, n_feats=16, n_channels=24, filter_channels=48,
        filter_channels_dp=16, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, window_size=4, spk_emb_dim=8, multi_spks=1,
    )
    x = jnp.array([[5, 6, 7, 8, 0, 0], [9, 10, 0, 0, 0, 0]])
    xl = jnp.array([4, 2])
    spk = jax.random.normal(keys[0], (2, 8))
    params = enc.init(keys[1], x, xl, spk)
    mu, logw, mask = enc.apply(params, x, xl, spk)
    assert mu.shape == (2, 6, 16) and logw.shape == (2, 6, 1)
    # masked positions produce exact zeros
    np.testing.assert_array_equal(np.asarray(mu[1, 2:]), 0.0)
    np.testing.assert_array_equal(np.asarray(logw[0, 4:]), 0.0)
    # padding tokens don't leak into valid outputs
    x2 = x.at[0, 4].set(77)
    mu2, _, _ = enc.apply(params, x2, xl, spk)
    np.testing.assert_allclose(np.asarray(mu[0, :4]), np.asarray(mu2[0, :4]), atol=1e-5)


def test_rel_pos_forms_agree(keys):
    """The gather form (picked at b=1) and the skew form (b>1) of the
    windowed relative-position attention compute the same function from the
    same parameter tables."""
    from facegantts_tpu.models.text_encoder import WindowedSelfAttention

    attn = WindowedSelfAttention(channels=24, n_heads=2, window_size=4)
    for t in (3, 6, 17):  # t-1 < w, = and > window
        x1 = jax.random.normal(keys[2], (1, t, 24))
        mask = jnp.ones((1, t, t))
        params = attn.init(keys[3], x1, mask)
        out_gather = attn.apply(params, x1, mask)  # b=1 -> gather form
        xb = jnp.concatenate([x1, jax.random.normal(keys[4], (2, t, 24))])
        out_skew = attn.apply(params, xb, jnp.ones((3, t, t)))  # b=3 -> skew
        np.testing.assert_allclose(
            np.asarray(out_gather[0]), np.asarray(out_skew[0]),
            atol=2e-5, rtol=1e-4,
        )


@pytest.mark.slow
def test_unet_shapes(keys):
    net = GradLogPEstimator2d(dim=16, n_feats=32, spk_emb_dim=8)
    b, f, t = 2, 32, 16
    x = jax.random.normal(keys[0], (b, f, t))
    mu = jax.random.normal(keys[1], (b, f, t))
    mask = jnp.ones((b, 1, t))
    tt = jnp.array([0.3, 0.7])
    spk = jax.random.normal(keys[2], (b, 8))
    params = net.init(keys[3], x, mask, mu, tt, spk)
    out = net.apply(params, x, mask, mu, tt, spk)
    assert out.shape == (b, f, t)
    # time-masked frames are zero
    mask2 = mask.at[:, :, 8:].set(0.0)
    out2 = net.apply(params, x, mask2, mu, tt, spk)
    np.testing.assert_array_equal(np.asarray(out2[:, :, 8:]), 0.0)


@pytest.mark.slow
def test_diffusion_loss_and_sampler(keys):
    dec = Diffusion(n_feats=32, dim=16, spk_emb_dim=8)
    b, f, t = 2, 32, 16
    x0 = jax.random.normal(keys[0], (b, f, t))
    mu = jax.random.normal(keys[1], (b, f, t))
    mask = jnp.ones((b, 1, t))
    spk = jax.random.normal(keys[2], (b, 8))
    params = dec.init(keys[3], x0, mask, mu, 2, False, spk, keys[4])

    loss, xt, xt_hat = dec.apply(
        params, keys[5], x0, mask, mu, spk, method=Diffusion.compute_loss
    )
    assert np.isfinite(float(loss)) and xt.shape == (b, f, t) and xt_hat.shape == (b, f, t)

    out, _ = dec.apply(params, x0, mask, mu, 4, False, spk, keys[6])
    assert out.shape == (b, f, t)
    out_s, _ = dec.apply(params, x0, mask, mu, 4, True, spk, keys[6])
    assert np.isfinite(np.asarray(out_s)).all()

    # sampler_unroll is a pure perf knob: same math, but XLA re-fuses the
    # unrolled iterations so results differ in the last ulps only
    dec_u = Diffusion(n_feats=32, dim=16, spk_emb_dim=8, sampler_unroll=4)
    out_u, _ = dec_u.apply(params, x0, mask, mu, 4, False, spk, keys[6])
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out), rtol=1e-4, atol=1e-4)


def test_tpu_opt_unet_shapes_and_masking(keys):
    """tpu_opt family (models/unet.py GradLogPEstimator2dTpuOpt): same
    (B, F, T) -> (B, F, T) score-net contract as the parity family, with
    lane-aligned trunk activations behind a 2x2 patchify stem."""
    from facegantts_tpu.models import GradLogPEstimator2dTpuOpt

    net = GradLogPEstimator2dTpuOpt(dim=16, n_feats=32, spk_emb_dim=8)
    b, f, t = 2, 32, 16
    x = jax.random.normal(keys[0], (b, f, t))
    mu = jax.random.normal(keys[1], (b, f, t))
    mask = jnp.ones((b, 1, t))
    tt = jnp.array([0.3, 0.7])
    spk = jax.random.normal(keys[2], (b, 8))
    params = net.init(keys[3], x, mask, mu, tt, spk)
    out = net.apply(params, x, mask, mu, tt, spk)
    assert out.shape == (b, f, t)
    assert np.isfinite(np.asarray(out)).all()
    # time-masked frames are zero (full-resolution output mask)
    mask2 = mask.at[:, :, 8:].set(0.0)
    out2 = net.apply(params, x, mask2, mu, tt, spk)
    np.testing.assert_array_equal(np.asarray(out2[:, :, 8:]), 0.0)
    # odd (F, T) is a hard error, not silent truncation
    with pytest.raises(ValueError, match="even"):
        net.init(keys[3], x[:, :, :15], mask[:, :, :15], mu[:, :, :15], tt, spk)
    # gradients flow and are finite
    g = jax.grad(
        lambda p: jnp.sum(net.apply(p, x, mask, mu, tt, spk) ** 2)
    )(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)


@pytest.mark.slow
def test_tpu_opt_family_in_diffusion_and_train_step(keys):
    """unet_family="tpu_opt" wires through Diffusion/FaceTTS/config and the
    fused GAN train step; loss finite, params update, sampler runs."""
    from facegantts_tpu.train import Batch, init_state, make_gan_train_step

    cfg = default_config(env={}, overrides=dict(
        n_enc_channels=16, filter_channels=32, filter_channels_dp=16,
        n_enc_layers=1, dec_dim=8, vid_emb_dim=32, use_gan=1,
        micro_batch_size=2, timesteps=2, learning_rate=1e-4,
        spk_emb="speech", syncnet_width_mult=0.125,
        disc_base_channels=8, disc_num_layers=2, kernel_height=5,
        kernel_width=3, unet_family="tpu_opt",
    ))
    b, tx, ty = 8, 8, 32
    rng = np.random.default_rng(0)
    batch = Batch(
        x=jnp.asarray(rng.integers(1, 100, (b, tx)), jnp.int32),
        x_len=jnp.asarray(np.full(b, tx), jnp.int32),
        y=jnp.asarray(rng.standard_normal((b, cfg.n_mels, ty)), jnp.float32),
        y_len=jnp.asarray([32, 30, 27, 20, 32, 31, 16, 8], jnp.int32),
        spk=jnp.asarray(rng.standard_normal((b, cfg.n_mels, ty)), jnp.float32),
    )
    state = init_state(cfg, jax.random.PRNGKey(0), batch)
    # the tpu_opt estimator has its own parameter tree (stem/head)
    est = state.params["decoder"]["estimator"]
    assert "stem" in est and "head_kernel" in est
    assert "final_conv" not in est  # parity-only head
    step, _ = make_gan_train_step(cfg)
    before = jax.tree.map(np.asarray, state.params["decoder"])
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in m.values()), m
    after = state.params["decoder"]
    moved = any(
        float(np.abs(np.asarray(a) - b).max()) > 0
        for a, b in zip(jax.tree.leaves(after), jax.tree.leaves(before))
    )
    assert moved, "tpu_opt decoder params did not update"


def test_unknown_unet_family_rejected(keys):
    model = FaceTTS(
        n_vocab=149, n_feats=32, n_enc_channels=8, filter_channels=16,
        filter_channels_dp=8, n_heads=2, n_enc_layers=1, enc_kernel=3,
        enc_dropout=0.0, window_size=4, dec_dim=8, beta_min=0.05,
        beta_max=20.0, pe_scale=1000.0, vid_emb_dim=16, out_size=32,
        unet_family="nope",
    )
    with pytest.raises(ValueError, match="unet_family"):
        model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32),
            jnp.array([4]), 2, 16, 1.0, False,
            jnp.zeros((1, 224, 224, 3)), 1.0, jax.random.PRNGKey(1),
        )


def test_syncnet_embeddings(keys):
    net = SyncNet(n_out=64)
    mel = jax.random.normal(keys[0], (2, 128, 40, 1))
    face = jax.random.normal(keys[1], (2, 224, 224, 3))
    params = net.init(keys[2], mel, face)
    vid, aud = net.apply(params, mel, face)
    assert vid.shape == (2, 64)
    assert aud.ndim == 3 and aud.shape[0] == 2 and aud.shape[2] == 64
    feats = net.apply(params, mel, method=SyncNet.forward_perceptual)
    assert len(feats) == 8  # 6 conv relu maps + 1 fc relu map + output


def test_discriminator(keys):
    d = SpectrogramDiscriminator()
    x = jax.random.normal(keys[0], (2, 128, 64, 1))
    params = d.init(keys[1], x)
    fmap, logits = d.apply(params, x)
    assert len(fmap) == 6  # conv_prev + 5 layers
    assert logits.ndim == 2 and logits.shape[0] == 2
    # speaker injection path
    spk = jax.random.normal(keys[2], (2, 256))
    params2 = d.init(keys[1], x, spk)
    _, logits2 = d.apply(params2, x, spk)
    assert logits2.shape == logits.shape


def test_discriminator_tpu_opt_family(keys):
    """disc_family=tpu_opt (models/discriminator.py): patchify stem +
    half-res SAME ladder at 2x channels; same fmap count as parity so
    feature matching is family-agnostic; input-gradients flow (R1)."""
    d = SpectrogramDiscriminator(family="tpu_opt")
    x = jax.random.normal(keys[0], (2, 128, 64, 1))
    params = d.init(keys[1], x)
    fmap, logits = d.apply(params, x)
    assert len(fmap) == 6  # stem + 5 layers (parity fmap count)
    assert fmap[0].shape == (2, 64, 32, 128)  # half-res, 2x channels
    assert logits.ndim == 2 and logits.shape[0] == 2
    assert np.isfinite(np.asarray(logits)).all()
    # speaker injection
    spk = jax.random.normal(keys[2], (2, 256))
    params2 = d.init(keys[1], x, spk)
    _, logits2 = d.apply(params2, x, spk)
    assert logits2.shape == logits.shape
    # R1 path: gradient w.r.t. the INPUT is finite and nonzero
    g = jax.grad(lambda y: d.apply(params, y)[1].sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(np.abs(np.asarray(g)).max()) > 0
    # odd input dims are a hard error
    with pytest.raises(ValueError, match="even"):
        d.init(keys[1], x[:, :, :63])
    with pytest.raises(ValueError, match="family"):
        SpectrogramDiscriminator(family="nope").init(keys[1], x)


@pytest.fixture(scope="module")
def tiny_facetts():
    model = FaceTTS(
        n_vocab=149, n_feats=128, n_enc_channels=24, filter_channels=48,
        filter_channels_dp=16, n_heads=2, n_enc_layers=1, enc_kernel=3,
        enc_dropout=0.0, window_size=4, dec_dim=8, beta_min=0.05,
        beta_max=20.0, pe_scale=1000.0, vid_emb_dim=32, out_size=32,
    )
    b, tx, ty = 2, 10, 48
    x = jnp.ones((b, tx), jnp.int32) * 5
    xl = jnp.array([10, 7])
    y = jax.random.normal(jax.random.PRNGKey(1), (b, 128, ty))
    yl = jnp.array([48, 40])
    face = jax.random.normal(jax.random.PRNGKey(2), (b, 224, 224, 3))
    params = model.init(
        jax.random.PRNGKey(0), jax.random.PRNGKey(3), x, xl, y, yl, face,
        method=FaceTTS.compute_loss,
    )
    return model, params, (x, xl, y, yl, face)


@pytest.mark.slow
def test_facetts_compute_loss(tiny_facetts):
    model, params, (x, xl, y, yl, face) = tiny_facetts
    parts, aux = model.apply(
        params, jax.random.PRNGKey(9), x, xl, y, yl, face, 32,
        method=FaceTTS.compute_loss,
    )
    for name, v in parts._asdict().items():
        assert np.isfinite(float(v)), name
    assert aux["y_cut"].shape[-1] == 32
    assert float(parts.total) > 0


def test_facetts_forward(tiny_facetts):
    model, params, (x, xl, y, yl, face) = tiny_facetts

    @jax.jit
    def synth(params, rng):
        return model.apply(
            params, x, xl, 3, 64, 1.5, False, face, 0.91, rng,
        )

    enc, dec, attn, ylen = synth(params, jax.random.PRNGKey(4))
    assert enc.shape == (2, 128, 64) and dec.shape == (2, 128, 64)
    assert attn.shape == (2, 10, 64)
    assert (np.asarray(ylen) >= 1).all()
    assert np.isfinite(np.asarray(dec)).all()


@pytest.mark.slow
def test_facetts_forward_speech_conditioning(tiny_facetts):
    """spk_emb=speech: inference conditions on a reference mel clip through
    the SyncNet audio stream (reference face_tts.py:108-114) instead of a
    face image; same params work for both (the conditioning dim is shared)."""
    model, params, (x, xl, y, yl, face) = tiny_facetts
    speech_model = model.clone(spk_emb="speech")

    dec = speech_model.apply(
        params, x, xl, 3, 64, 1.5, False, y, 0.91, jax.random.PRNGKey(4)
    )[1]
    assert dec.shape == (2, 128, 64)
    assert np.isfinite(np.asarray(dec)).all()
    # the speech embedding must actually change the output vs face mode
    dec_face = model.apply(
        params, x, xl, 3, 64, 1.5, False, face, 0.91, jax.random.PRNGKey(4)
    )[1]
    assert float(np.abs(np.asarray(dec) - np.asarray(dec_face)).max()) > 1e-6
