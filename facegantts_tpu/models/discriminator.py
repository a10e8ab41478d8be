"""2-D spectrogram discriminator (reference model/discriminator.py:9-76).

Treats the mel-spectrogram as a 1-channel image (freq x time) and scores it
with a weight-normalized conv stack (spectral norm optional), returning the
per-layer feature maps (for feature matching) and flattened logits.

Layout: NHWC — input (B, n_mels, T, 1)."""

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn


class SpectrogramDiscriminator(nn.Module):
    base_channels: int = 64
    num_layers: int = 5
    kernel_height: int = 12
    kernel_width: int = 5
    stride: int = 1
    padding: int = 6
    lrelu_slope: float = 0.3
    use_spectral_norm: int = 0
    multi_speaker: int = 1
    residual_channels: int = 256
    # "parity" = the reference ladder: (kh, kw) stride-1 convs at
    # base_channels over near-full mel resolution.  "tpu_opt" = lane-
    # aligned variant (see _tpu_opt below): 2x2 stride-2 patchify stem to
    # 2*base_channels, then a SAME-padded ladder at half resolution with
    # (kh//2, kw) kernels — the same receptive footprint in mel units.
    # Device-trace motivation (BENCH_NOTES r5): the parity ladder's
    # 64ch x 64ch (12,5) convs run at ~12% of MXU peak (64 input channels
    # fill half the 128-wide systolic array; C=64 f32/bf16 activations pay
    # lane padding on every elementwise pass).  C=128 fills the MXU and
    # the half-res grid cuts activation traffic 4x at equal conv FLOPs.
    # OPT-IN: the discriminator trains from scratch (no reference
    # pretrained artifact exists for it — facetts ckpt disc keys are
    # stripped on import), but a different D is a different adversary, so
    # the default stays "parity"; D-health under tpu_opt is a committed
    # artifact (artifacts/overfit_metrics_dopt.jsonl).
    family: str = "parity"

    def _norm(self, conv):
        if self.use_spectral_norm:
            return nn.SpectralNorm(conv)
        return nn.WeightNorm(conv)

    def _tpu_opt(self, x, speaker_emb, update_stats):
        """Lane-aligned family: patchify stem + SAME-padded half-res ladder.

        Static shapes throughout (no per-layer freq-shrink/time-grow drift
        like the parity ladder's explicit-pad scheme), C = 2*base_channels
        everywhere, kernel (kh//2, kw) at half resolution = the parity
        kernel's (kh, 2*kw-ish) footprint in mel units.  Feature-map list
        has the same length as the parity family (stem + num_layers) so
        feature-matching code is family-agnostic."""
        fmap: List[jnp.ndarray] = []
        ch = self.base_channels * 2
        kh = max(self.kernel_height // 2, 1)
        kw = self.kernel_width
        b, f, t, _ = x.shape
        if f % 2 or t % 2:
            raise ValueError(
                f"tpu_opt discriminator needs even (F, T); got ({f}, {t})"
            )

        def apply_conv(conv, h):
            if self.use_spectral_norm:
                return conv(h, update_stats=update_stats)
            return conv(h)

        h = apply_conv(
            self._norm(nn.Conv(ch, (2, 2), strides=(2, 2), padding="VALID",
                               name="stem")),
            x,
        )
        h = nn.leaky_relu(h, self.lrelu_slope)
        fmap.append(h)

        if self.multi_speaker and speaker_emb is not None:
            s = apply_conv(
                self._norm(nn.Dense(ch, name="spk_mlp")), speaker_emb
            )
            h = h + s[:, None, None, :]

        for i in range(self.num_layers):
            h = apply_conv(
                self._norm(
                    nn.Conv(ch, (kh, kw), strides=(1, self.stride),
                            padding="SAME", name=f"conv_{i}")
                ),
                h,
            )
            h = nn.leaky_relu(h, self.lrelu_slope)
            fmap.append(h)

        h = apply_conv(
            self._norm(nn.Conv(ch, (3, 3), padding="SAME", name="post_0")), h
        )
        h = nn.leaky_relu(h, self.lrelu_slope)
        h = apply_conv(self._norm(nn.Conv(1, (3, 3), padding="SAME", name="post_1")), h)
        return fmap, h.reshape(h.shape[0], -1)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, speaker_emb: Optional[jnp.ndarray] = None,
        update_stats: bool = False,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        # x: (B, F, T, 1)
        if self.family == "tpu_opt":
            return self._tpu_opt(x, speaker_emb, update_stats)
        if self.family != "parity":
            raise ValueError(
                f"unknown discriminator family {self.family!r} "
                "(expected 'parity' or 'tpu_opt')"
            )
        fmap: List[jnp.ndarray] = []
        kh, kw = self.kernel_height, self.kernel_width

        # explicit pad + VALID conv (identical math to padding=(1, disc_padding));
        # the combined form triggers an XLA:TPU space_to_batch_converter crash
        # for the (12, 5) kernel, the split form compiles cleanly
        def padded(h):
            return jnp.pad(
                h, ((0, 0), (1, 1), (self.padding, self.padding), (0, 0))
            )

        def apply_conv(conv, h):
            if self.use_spectral_norm:
                return conv(h, update_stats=update_stats)
            return conv(h)

        h = apply_conv(
            self._norm(nn.Conv(self.base_channels, (kh, kw), padding="VALID", name="conv_prev")),
            padded(x),
        )
        h = nn.leaky_relu(h, self.lrelu_slope)
        fmap.append(h)

        if self.multi_speaker and speaker_emb is not None:
            s = apply_conv(
                self._norm(nn.Dense(self.base_channels, name="spk_mlp")), speaker_emb
            )
            # inject along freq rows, broadcast over time (reference :57-59)
            h = h + s[:, None, None, :]

        for i in range(self.num_layers):
            h = apply_conv(
                self._norm(
                    nn.Conv(
                        self.base_channels, (kh, kw), strides=(1, self.stride),
                        padding="VALID", name=f"conv_{i}",
                    )
                ),
                padded(h),
            )
            h = nn.leaky_relu(h, self.lrelu_slope)
            fmap.append(h)

        h = apply_conv(
            self._norm(nn.Conv(self.base_channels, (3, 3), padding="SAME", name="post_0")), h
        )
        h = nn.leaky_relu(h, self.lrelu_slope)
        h = apply_conv(self._norm(nn.Conv(1, (3, 3), padding="SAME", name="post_1")), h)
        logits = h.reshape(h.shape[0], -1)
        return fmap, logits
