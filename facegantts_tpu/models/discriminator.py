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

    def _norm(self, conv):
        if self.use_spectral_norm:
            return nn.SpectralNorm(conv)
        return nn.WeightNorm(conv)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, speaker_emb: Optional[jnp.ndarray] = None,
        update_stats: bool = False,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        # x: (B, F, T, 1)
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
