"""HiFi-GAN generator (16 kHz vocoder): mel -> waveform.

The reference treats the vocoder as an external torch.hub dependency
(`bshall/hifigan:main`, reference inference.py:79); this framework owns a
TPU-native implementation so the full face->wav path stays on-device
(SURVEY.md §7 step 5).  Architecture is the standard HiFi-GAN V1 generator
matching the bshall 16 kHz checkpoint: upsample rates (5,4,2,2,2) (hop 160),
kernels (11,8,4,4,4), initial width 512, three ResBlock1 MRF branches with
kernels (3,7,11) and dilations ((1,3,5),)*3 — so its weights import directly.

TPU-first: 1-D convs run in NTC layout; transposed convs use the
torch-semantics fractionally-strided conv (ops/convt.py) which XLA lowers to
a single MXU convolution; `remove_weight_norm`-style folding happens at
import time (we store plain kernels).
"""

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from facegantts_tpu.ops.convt import conv_transpose

LRELU_SLOPE = 0.1


class ResBlock1(nn.Module):
    """Multi-receptive-field residual block (HiFi-GAN V1)."""

    channels: int
    kernel_size: int
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(d,),
                padding="SAME", name=f"convs1_{i}",
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = nn.Conv(
                self.channels, (self.kernel_size,), padding="SAME", name=f"convs2_{i}",
            )(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    in_channels: int = 128
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (5, 4, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (11, 8, 4, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Tuple[Sequence[int], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """(B, n_mels, T) log-mel -> (B, T * prod(rates)) waveform in [-1, 1]."""
        x = jnp.swapaxes(mel, 1, 2)  # NTC
        x = nn.Conv(self.upsample_initial_channel, (7,), padding=((3, 3),), name="conv_pre")(x)
        for i, (r, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            kernel = self.param(
                f"up_{i}_kernel", nn.initializers.lecun_normal(), (k, x.shape[-1], ch)
            )
            bias = self.param(f"up_{i}_bias", nn.initializers.zeros, (ch,))
            x = conv_transpose(x, kernel, (r,), ((k - r) // 2,)) + bias
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                h = ResBlock1(ch, rk, rd, name=f"res_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = nn.Conv(1, (7,), padding=((3, 3),), name="conv_post")(x)
        return jnp.tanh(x)[..., 0]  # (B, T_samples)

    def margin_frames(self) -> int:
        """Mel-frame receptive-field half-width of the whole generator: an
        output sample at time t depends on mel frames within
        ``t // hop ± margin_frames()`` only.  Walking the layer stack
        backwards from the waveform: conv_post (k=7 -> 3), then per
        upsample stage the MRF resblocks' dilated-conv context at that
        stage's rate followed by the transposed conv's stride division,
        then conv_pre (k=7 -> 3).  This bound makes tiled (streaming)
        vocoding exact: windows overlapped by >= margin_frames() and
        trimmed by the same amount reproduce the full-signal output
        (see synthesis.Synthesizer.stream_vocode)."""
        m = 3  # conv_post
        for r, k in zip(reversed(self.upsample_rates),
                        reversed(self.upsample_kernel_sizes)):
            rf = max(
                sum((rk - 1) // 2 * d + (rk - 1) // 2 for d in rd)
                for rk, rd in zip(self.resblock_kernel_sizes,
                                  self.resblock_dilations)
            )
            m += rf
            m = -(-(m + k - 1) // r)  # ceil((m + k - 1) / r)
        return m + 3  # conv_pre
