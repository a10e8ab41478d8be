"""SyncNet face/voice embedder (reference model/syncnet_hifigan.py:8-145).

Dual-stream CNN: an audio stream over the mel-spectrogram (treated as a 1-ch
image) and an image stream over 224x224 RGB faces, both projected to a
512-d embedding by 1x1 conv heads.  `forward_perceptual` returns the post-ReLU
feature maps of the audio stream — the speaker-binding loss compares these
between generated and ground-truth mels (reference face_tts.py:226-230).

Used with pretrained weights; its audio CNN is frozen in the reference
(face_tts.py:81-82), so BatchNorm runs with stored running statistics
(use_running_average) — and the TPU train step keeps the whole embedder out
of the optimizer in the GAN path exactly like the reference's
configure_optimizers (face_tts_w_discriminator.py:116-125).

Layout: NHWC.  Audio input (B, n_mels, T, 1); image input (B, 224, 224, 3).
"""

from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn


def _pool(x, window, strides, padding=(0, 0)):
    return nn.max_pool(
        x,
        window_shape=window,
        strides=strides,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
    )


class _ConvBNRelu(nn.Module):
    features: int
    kernel: tuple
    stride: tuple = (1, 1)
    pad: tuple = (0, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.stride,
            padding=((self.pad[0], self.pad[0]), (self.pad[1], self.pad[1])),
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return nn.relu(x)


class _BNHead(nn.Module):
    """1x1 conv head: Dense -> BN -> ReLU -> Dense (reference netfc*)."""

    n_out: int
    hidden: int = 512

    @nn.compact
    def __call__(self, h, train: bool = False, collect: Optional[List] = None):
        h = nn.Dense(self.hidden, name="fc1")(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(h)
        h = nn.relu(h)
        if collect is not None:
            collect.append(h)
        return nn.Dense(self.n_out, name="fc2")(h)


class SyncNet(nn.Module):
    """Face/voice embedder with perceptual-feature access.

    ``width_mult`` scales every trunk/head channel count (1.0 = the exact
    reference architecture, required for pretrained-weight import).  Smaller
    values exist for cheap smoke/dry-run configurations — SyncNet is the only
    component whose cost is NOT already controlled by the encoder/decoder
    dim knobs, and its fixed 224x224 trunk dominates tiny-config steps."""

    n_out: int = 512
    stride: int = 1  # audio head time stride (reference syncnet_stride)
    width_mult: float = 1.0

    def setup(self):
        def w(c):
            return max(1, int(round(c * self.width_mult)))

        self.aud_convs = [
            _ConvBNRelu(w(96), (5, 5), (1, 1), (2, 2), name="aud_c1"),
            _ConvBNRelu(w(256), (5, 5), (2, 1), (1, 1), name="aud_c2"),
            _ConvBNRelu(w(384), (5, 3), (1, 1), (2, 2), name="aud_c3"),
            _ConvBNRelu(w(256), (3, 3), (1, 1), (1, 1), name="aud_c4"),
            _ConvBNRelu(w(256), (3, 3), (1, 1), (1, 1), name="aud_c5"),
            _ConvBNRelu(w(512), (3, 1), (1, self.stride), (0, 0), name="aud_c6"),
        ]
        self.aud_head = _BNHead(self.n_out, w(512), name="aud_head")
        self.img_convs = [
            _ConvBNRelu(w(96), (7, 7), (2, 2), (0, 0), name="img_c1"),
            _ConvBNRelu(w(256), (5, 5), (2, 2), (1, 1), name="img_c2"),
            _ConvBNRelu(w(256), (3, 3), (1, 1), (1, 1), name="img_c3"),
            _ConvBNRelu(w(256), (3, 3), (1, 1), (1, 1), name="img_c4"),
            _ConvBNRelu(w(256), (3, 3), (1, 1), (1, 1), name="img_c5"),
            _ConvBNRelu(w(512), (6, 6), (1, 1), (0, 0), name="img_c6"),
        ]
        self.img_head = _BNHead(self.n_out, w(512), name="img_head")

    # pool placements mirror reference netcnnaud (syncnet_hifigan.py:21-46)
    def _aud_trunk(self, x, train: bool, collect: Optional[List] = None):
        def keep(h):
            if collect is not None:
                collect.append(h)
            return h

        h = keep(self.aud_convs[0](x, train))
        h = _pool(h, (3, 1), (2, 1))
        h = keep(self.aud_convs[1](h, train))
        h = _pool(h, (3, 3), (2, 2))
        h = keep(self.aud_convs[2](h, train))
        h = _pool(h, (3, 1), (2, 1))
        h = keep(self.aud_convs[3](h, train))
        h = keep(self.aud_convs[4](h, train))
        h = _pool(h, (3, 3), (2, 2), (0, 1))
        h = keep(self.aud_convs[5](h, train))
        return h  # (B, 1, T', 512)

    def __call__(self, mel, face, train: bool = False):
        return self.forward_vid(face, train), self.forward_aud(mel, train)

    def forward_aud(self, mel, train: bool = False):
        """(B, n_mels, T, 1) mel image -> (B, T', n_out) voice embedding track."""
        h = self._aud_trunk(mel, train)
        h = h[:, 0]  # collapse freq axis -> (B, T', 512)
        return self.aud_head(h, train)

    def forward_vid(self, face, train: bool = False):
        """(B, 224, 224, 3) face -> (B, n_out) face embedding
        (reference netcnnimg, syncnet_hifigan.py:55-84)."""
        h = self.img_convs[0](face, train)
        h = _pool(h, (3, 3), (2, 2))
        h = self.img_convs[1](h, train)
        h = _pool(h, (3, 3), (2, 2), (1, 1))
        h = self.img_convs[2](h, train)
        h = self.img_convs[3](h, train)
        h = self.img_convs[4](h, train)
        h = _pool(h, (3, 3), (2, 2))
        h = self.img_convs[5](h, train)
        h = h.reshape(h.shape[0], 1, h.shape[-1])
        return self.img_head(h, train)[:, 0]  # (B, n_out)

    def forward_perceptual(self, mel, train: bool = False):
        """Post-ReLU audio-stream feature maps + final embedding
        (reference syncnet_hifigan.py:129-145): 6 conv maps, 1 fc map, and
        the head output — 8 tensors."""
        feats: List[jnp.ndarray] = []
        h = self._aud_trunk(mel, train, collect=feats)
        h = h[:, 0]
        out = self.aud_head(h, train, collect=feats)
        feats.append(out)
        return feats
