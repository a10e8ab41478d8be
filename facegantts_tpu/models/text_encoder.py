"""Text encoder: phoneme embeddings -> prior mel statistics + log-durations.

Functional re-design of the reference encoder stack (model/text_encoder.py:
349-422 and its building blocks): scaled embedding, 3-layer ConvReluNorm
prenet with zero-init residual projection, broadcast speaker-embedding
concat, 6-layer transformer with ±window relative-position self-attention,
mel-prior projection, and a gradient-stopped duration predictor head.

TPU-first choices: all tensors are time-major (B, T, C) so convs and matmuls
tile naturally; the relative-position terms use the pad/reshape skew trick
(as in reference model/text_encoder.py:236-252) over a zero-padded (2t-1, d)
table — device traces showed the earlier take_along_axis formulation lowered
to serialized gather fusions costing 155 ms/step in the GAN train step,
while the skew form is pure pads/reshapes plus MXU matmuls.  At batch 1 the
measured ranking flips (the gathers don't serialize and the skew pads cost
+8 ms/utterance), so the attention picks its form from the static batch size
at trace time; both forms share the same (2w+1, d) parameter tables.
"""

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from facegantts_tpu.ops.align import sequence_mask


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with learned scale/shift.

    Matches reference model/text_encoder.py:13-31 (eps=1e-4, stats over C)."""

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * lax.rsqrt(var + self.eps)
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        return x * gamma + beta


class ConvReluNorm(nn.Module):
    """Masked conv prenet with residual zero-init projection
    (reference model/text_encoder.py:34-82)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    p_dropout: float = 0.5

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # x: (B, T, C); x_mask: (B, T, 1)
        x_org = x
        for i in range(self.n_layers):
            x = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME", name=f"conv_{i}")(x * x_mask)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = x_org + nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        return x * x_mask


class DurationPredictor(nn.Module):
    """Two masked conv blocks + scalar projection in the log domain
    (reference model/text_encoder.py:85-113)."""

    filter_channels: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name="norm_1")(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_2")(x * x_mask)
        x = nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name="norm_2")(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = nn.Dense(1, name="proj")(x * x_mask)
        return x * x_mask  # (B, T, 1)


class WindowedSelfAttention(nn.Module):
    """Multi-head self-attention with shared ±window relative-position
    embeddings on keys and values (reference model/text_encoder.py:116-257,
    heads_share=True path)."""

    channels: int
    n_heads: int
    window_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        b, t, _ = x.shape
        h, w = self.n_heads, self.window_size
        d = self.channels // h
        q = nn.Dense(self.channels, name="conv_q")(x).reshape(b, t, h, d)
        k = nn.Dense(self.channels, name="conv_k")(x).reshape(b, t, h, d)
        v = nn.Dense(self.channels, name="conv_v")(x).reshape(b, t, h, d)

        scale = 1.0 / math.sqrt(d)
        scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32) * scale

        rel_init = nn.initializers.normal(stddev=d**-0.5)
        emb_rel_k = self.param("emb_rel_k", rel_init, (2 * w + 1, d))
        emb_rel_v = self.param("emb_rel_v", rel_init, (2 * w + 1, d))

        # Static (trace-time) choice of the relative-position formulation:
        # the skew trick's pad/reshape pipeline is all-MXU and wins at
        # training batches (the gather lowering serializes, 155 ms/step at
        # b=16), while at b=1 the gathers are cheap and the skew pads cost
        # +8 ms/utterance.  Both read the same parameter tables.
        use_gather = b == 1

        if use_gather:
            # relative logits: r index = (s - t) + w, valid iff |s - t| <= w
            pos = jnp.arange(t)
            delta = pos[None, :] - pos[:, None]  # (t_q, t_k) = s - t
            r_idx = jnp.clip(delta + w, 0, 2 * w)
            in_window = jnp.abs(delta) <= w
            rel_q = jnp.einsum(
                "bthd,rd->bhtr", q, emb_rel_k,
                preferred_element_type=jnp.float32,
            )
            rel_scores = jnp.take_along_axis(
                rel_q, jnp.broadcast_to(r_idx[None, None], (b, h, t, t)), axis=-1
            )
            scores = scores + jnp.where(in_window[None, None], rel_scores * scale, 0.0)
        else:
            # Zero-pad the +-w table to the full (2t-1,) relative range
            # centered at t-1; positions outside the window contribute
            # exactly zero, same as the reference's zero-padded
            # _get_relative_embeddings (model/text_encoder.py:216-234).
            def pad_table(emb):
                pad_len = max(t - 1 - w, 0)
                start = max(w - (t - 1), 0)
                padded = jnp.pad(emb, ((pad_len, pad_len), (0, 0)))
                return lax.slice_in_dim(padded, start, start + 2 * t - 1, axis=0)

            # relative logits (b,h,t,2t-1) -> absolute (b,h,t,t) via the skew
            # trick (pads/reshapes only; reference model/text_encoder.py:236-252)
            rel_q = jnp.einsum(
                "bthd,rd->bhtr", q, pad_table(emb_rel_k),
                preferred_element_type=jnp.float32,
            )
            x_ = jnp.pad(rel_q, ((0, 0), (0, 0), (0, 0), (0, 1)))
            x_ = x_.reshape(b, h, t * 2 * t)
            x_ = jnp.pad(x_, ((0, 0), (0, 0), (0, t - 1)))
            rel_scores = x_.reshape(b, h, t + 1, 2 * t - 1)[:, :, :t, t - 1:]
            scores = scores + rel_scores * scale

        scores = jnp.where(attn_mask[:, None] > 0, scores, -1e4)
        p_attn = nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=deterministic)(p_attn)

        out = jnp.einsum("bhts,bshd->bthd", p_attn, v, preferred_element_type=jnp.float32)

        if use_gather:
            # relative-value contribution: rel_w[b,h,t,r] = p_attn[b,h,t,t+r-w]
            pos = jnp.arange(t)
            s_idx = jnp.clip(pos[:, None] + jnp.arange(2 * w + 1)[None, :] - w, 0, t - 1)
            r_valid = (pos[:, None] + jnp.arange(2 * w + 1)[None, :] - w >= 0) & (
                pos[:, None] + jnp.arange(2 * w + 1)[None, :] - w <= t - 1
            )
            rel_w = jnp.take_along_axis(
                p_attn, jnp.broadcast_to(s_idx[None, None], (b, h, t, 2 * w + 1)), axis=-1
            )
            rel_w = jnp.where(r_valid[None, None], rel_w, 0.0)
            out = out + jnp.einsum(
                "bhtr,rd->bthd", rel_w, emb_rel_v,
                preferred_element_type=jnp.float32,
            )
        else:
            # relative-value contribution: absolute (b,h,t,t) -> relative
            # (b,h,t,2t-1), inverse skew (reference model/text_encoder.py:
            # 254-266), then contract with the zero-padded value table.
            y_ = jnp.pad(p_attn, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
            y_ = y_.reshape(b, h, t * (2 * t - 1))
            y_ = jnp.pad(y_, ((0, 0), (0, 0), (t, 0)))
            rel_w = y_.reshape(b, h, t, 2 * t)[:, :, :, 1:]
            out = out + jnp.einsum(
                "bhtr,rd->bthd", rel_w, pad_table(emb_rel_v),
                preferred_element_type=jnp.float32,
            )

        out = out.reshape(b, t, self.channels)
        return nn.Dense(self.channels, name="conv_o")(out)


class FFN(nn.Module):
    """Masked conv feed-forward (reference model/text_encoder.py:260-284)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding="SAME", name="conv_2")(x)
        return x * x_mask


class TransformerEncoder(nn.Module):
    """Pre-mask transformer stack (reference model/text_encoder.py:287-346)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    window_size: int

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        attn_mask = x_mask * jnp.swapaxes(x_mask, 1, 2)  # (B, T, T)
        for i in range(self.n_layers):
            x = x * x_mask
            y = WindowedSelfAttention(
                self.hidden_channels, self.n_heads, self.window_size,
                self.p_dropout, name=f"attn_{i}",
            )(x, attn_mask, deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm1_{i}")(x + y)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                self.p_dropout, name=f"ffn_{i}",
            )(x, x_mask, deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm2_{i}")(x + y)
        return x * x_mask


class TextEncoder(nn.Module):
    """Full text encoder (reference model/text_encoder.py:349-422).

    Returns (mu, logw, x_mask): prior mel means (B, T, n_feats), predicted
    log-durations (B, T, 1) computed on gradient-stopped features, and the
    text mask (B, T, 1)."""

    n_vocab: int
    n_feats: int
    n_channels: int
    filter_channels: int
    filter_channels_dp: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    window_size: int
    spk_emb_dim: int = 512
    multi_spks: int = 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T) int token ids
        x_lengths: jnp.ndarray,  # (B,)
        spk: Optional[jnp.ndarray] = None,  # (B, spk_emb_dim)
        deterministic: bool = True,
    ):
        t = x.shape[1]
        emb = nn.Embed(
            self.n_vocab, self.n_channels,
            embedding_init=nn.initializers.normal(stddev=self.n_channels**-0.5),
            name="emb",
        )(x) * math.sqrt(self.n_channels)
        x_mask = sequence_mask(x_lengths, t).astype(emb.dtype)[:, :, None]

        h = ConvReluNorm(
            self.n_channels, self.n_channels, kernel_size=5, n_layers=3,
            p_dropout=0.5, name="prenet",
        )(emb, x_mask, deterministic)

        if self.multi_spks:
            spk_b = jnp.broadcast_to(spk[:, None, :], (h.shape[0], t, self.spk_emb_dim))
            h = jnp.concatenate([h, spk_b.astype(h.dtype)], axis=-1)

        width = self.n_channels + (self.spk_emb_dim if self.multi_spks else 0)
        h = TransformerEncoder(
            width, self.filter_channels, self.n_heads, self.n_layers,
            self.kernel_size, self.p_dropout, self.window_size, name="encoder",
        )(h, x_mask, deterministic)

        mu = nn.Dense(self.n_feats, name="proj_m")(h) * x_mask

        h_dp = lax.stop_gradient(h)  # duration head never trains the trunk
        logw = DurationPredictor(
            self.filter_channels_dp, self.kernel_size, self.p_dropout, name="proj_w",
        )(h_dp, x_mask, deterministic)

        return mu, logw, x_mask
