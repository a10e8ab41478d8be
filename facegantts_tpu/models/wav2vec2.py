"""wav2vec2-style SSL speech encoder (JAX/Flax).

The reference's UTMOS MOS predictor (evaluation/eval.py:209-211 pulls
``tarepan/SpeechMOS`` utmos22_strong off torch.hub) is an SSL feature
extractor — a wav2vec2 BASE encoder — with a small regression stack on
top.  This module implements that encoder natively so a real UTMOS-class
checkpoint can be imported and reproduced on TPU (see
evaluation/ssl_mos.py for the head + importer).

Architecture (wav2vec2 base, ``feat_extract_norm="group"``):

- 7-layer strided 1-D conv feature encoder over raw 16 kHz waveform
  (dims 512, kernels 10/3/3/3/3/2/2, strides 5/2/2/2/2/2/2, no bias),
  GroupNorm(512, 512) after the first conv only, GELU everywhere
  -> ~49 frames/s.
- feature projection: LayerNorm -> Dense 512->768.
- convolutional relative positional embedding: grouped Conv1d
  (kernel 128, groups 16, same-pad with one trailing pad removed), GELU,
  added to the input, then LayerNorm (post-norm variant).
- N transformer encoder layers, post-norm: MHA(768, 12 heads) + residual
  -> LayerNorm -> FFN(3072, GELU) + residual -> LayerNorm.

All sizes are module attributes so tests can build tiny replicas; the
importer in evaluation/ssl_mos.py maps HuggingFace/fairseq-style torch
state_dicts onto these parameters.

TPU notes: everything is static-shape; the conv encoder is NWC convs on
the MXU; attention is standard dense attention (SSL eval utterances are a
few hundred frames — no windowing needed).
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvFeatureEncoder(nn.Module):
    """Raw waveform (B, S) -> frame features (B, T, conv_dim[-1])."""

    conv_dims: Tuple[int, ...] = (512,) * 7
    kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[..., None]  # (B, S, 1) NWC
        for i, (d, k, s) in enumerate(zip(self.conv_dims, self.kernels, self.strides)):
            x = nn.Conv(
                d, (k,), strides=(s,), padding="VALID", use_bias=False,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                # group norm over channels, first layer only (base config)
                x = nn.GroupNorm(num_groups=d, name="group_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


class FeatureProjection(nn.Module):
    hidden: int = 768

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(name="layer_norm")(x)
        return nn.Dense(self.hidden, name="projection")(x)


class PositionalConvEmbedding(nn.Module):
    """Grouped temporal conv over (B, T, C); same-pad with the trailing
    column dropped for even kernels (matches the torch padding trick)."""

    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        pad = self.kernel // 2
        h = nn.Conv(
            c, (self.kernel,), padding=[(pad, pad)],
            feature_group_count=self.groups, name="conv",
        )(x)
        if self.kernel % 2 == 0:
            h = h[:, : x.shape[1], :]
        return nn.gelu(h, approximate=False)


class TransformerLayer(nn.Module):
    """Post-norm transformer encoder layer (wav2vec2 base variant)."""

    hidden: int = 768
    heads: int = 12
    ffn: int = 3072

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="q_proj")(x)
        k = nn.Dense(self.hidden, name="k_proj")(x)
        v = nn.Dense(self.hidden, name="v_proj")(x)
        b, t, _ = x.shape

        def split(a):
            return a.reshape(b, t, self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d).astype(x.dtype)
        att = nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.hidden)
        out = nn.Dense(self.hidden, name="out_proj")(out)
        x = nn.LayerNorm(name="layer_norm")(x + out)
        h = nn.Dense(self.ffn, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, name="output_dense")(h)
        return nn.LayerNorm(name="final_layer_norm")(x + h)


class Wav2Vec2Encoder(nn.Module):
    """Raw 16 kHz waveform (B, S) float -> SSL features (B, T, hidden)."""

    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    conv_dims: Tuple[int, ...] = (512,) * 7
    conv_kernels: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    pos_kernel: int = 128
    pos_groups: int = 16

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = ConvFeatureEncoder(
            self.conv_dims, self.conv_kernels, self.conv_strides,
            name="feature_extractor",
        )(wav)
        x = FeatureProjection(self.hidden, name="feature_projection")(x)
        x = x + PositionalConvEmbedding(
            self.pos_kernel, self.pos_groups, name="pos_conv_embed"
        )(x)
        x = nn.LayerNorm(name="encoder_layer_norm")(x)
        for i in range(self.layers):
            x = TransformerLayer(
                self.hidden, self.heads, self.ffn, name=f"layer_{i}"
            )(x)
        return x
