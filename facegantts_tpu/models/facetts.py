"""FaceTTS generator: text + face -> mel-spectrogram.

Functional re-assembly of the reference FaceTTS LightningModule
(model/face_tts.py:27-241): TextEncoder -> MAS-aligned prior -> diffusion
decoder, conditioned on SyncNet face (or voice) embeddings, with the
four-part training loss (duration, prior, diffusion, speaker-binding).

Differences by design (TPU-first):
- pure function of (params, batch, rng); no device juggling, no Lightning.
- static shapes everywhere: inference takes a static `y_max_length` bucket
  instead of the reference's dynamic `int(y_lengths.max())`
  (face_tts.py:120-122); training uses the static 2-s crop.
- MAS runs on-device inside the same jit (ops/mas.py) instead of the
  reference's Cython host round-trip.
- the random 2-second crop (face_tts.py:181-215) is a vmapped dynamic_slice.

Conventions: text (B, T_x) int32; mel (B, n_feats, T_y) float; face
(B, 224, 224, 3) float; masks (B, T, 1) for text, (B, 1, T_y) for mel.
"""

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from facegantts_tpu.config import Config
from facegantts_tpu.ops.align import generate_path, sequence_mask
from facegantts_tpu.ops.mas import maximum_path
from facegantts_tpu.models.diffusion import Diffusion
from facegantts_tpu.models.syncnet import SyncNet
from facegantts_tpu.models.text_encoder import TextEncoder
from facegantts_tpu.text.symbols import symbols


class LossParts(NamedTuple):
    dur_loss: jnp.ndarray
    prior_loss: jnp.ndarray
    diff_loss: jnp.ndarray
    spk_loss: jnp.ndarray  # already gamma-weighted (reference face_tts.py:240)

    @property
    def total(self):
        return self.dur_loss + self.prior_loss + self.diff_loss + self.spk_loss


class FaceTTS(nn.Module):
    """Generator model.  Build with :func:`from_config`.

    The reference defines an unused `spk_fc` Linear (face_tts.py:78); it is
    intentionally omitted here — the weight importer drops those keys."""

    n_vocab: int
    n_feats: int
    n_enc_channels: int
    filter_channels: int
    filter_channels_dp: int
    n_heads: int
    n_enc_layers: int
    enc_kernel: int
    enc_dropout: float
    window_size: int
    dec_dim: int
    beta_min: float
    beta_max: float
    pe_scale: float
    vid_emb_dim: int = 512
    n_spks: int = 2  # reference hard-codes 2 => multi-speaker pathway on
    spk_emb: str = "face"
    gamma: float = 0.02
    perceptual_loss: int = 1
    out_size: int = 128
    syncnet_stride: int = 1
    # 1.0 = exact reference SyncNet (required for pretrained import); smaller
    # only for smoke/dry-run configs where the fixed 224x224 trunk dominates
    syncnet_width_mult: float = 1.0
    sampler_unroll: int = 1
    fused_gn: int = 1
    unet_family: str = "parity"  # "parity" | "tpu_opt" (models/unet.py)

    @staticmethod
    def from_config(cfg: Config) -> "FaceTTS":
        n_vocab = len(symbols) + 1 if cfg.add_blank else len(symbols)
        return FaceTTS(
            n_vocab=n_vocab,
            n_feats=cfg.n_feats,
            n_enc_channels=cfg.n_enc_channels,
            filter_channels=cfg.filter_channels,
            filter_channels_dp=cfg.filter_channels_dp,
            n_heads=cfg.n_heads,
            n_enc_layers=cfg.n_enc_layers,
            enc_kernel=cfg.enc_kernel,
            enc_dropout=cfg.enc_dropout,
            window_size=cfg.window_size,
            dec_dim=cfg.dec_dim,
            beta_min=cfg.beta_min,
            beta_max=cfg.beta_max,
            pe_scale=cfg.pe_scale,
            vid_emb_dim=cfg.vid_emb_dim,
            spk_emb=cfg.spk_emb,
            gamma=cfg.gamma,
            perceptual_loss=cfg.perceptual_loss,
            out_size=cfg.out_size,
            syncnet_stride=cfg.syncnet_stride,
            syncnet_width_mult=cfg.syncnet_width_mult,
            sampler_unroll=cfg.sampler_unroll,
            fused_gn=cfg.fused_gn_mish,
            unet_family=cfg.unet_family,
        )

    def setup(self):
        self.encoder = TextEncoder(
            n_vocab=self.n_vocab,
            n_feats=self.n_feats,
            n_channels=self.n_enc_channels,
            filter_channels=self.filter_channels,
            filter_channels_dp=self.filter_channels_dp,
            n_heads=self.n_heads,
            n_layers=self.n_enc_layers,
            kernel_size=self.enc_kernel,
            p_dropout=self.enc_dropout,
            window_size=self.window_size,
            spk_emb_dim=self.vid_emb_dim,
            multi_spks=1 if self.n_spks > 1 else 0,
            name="encoder",
        )
        self.decoder = Diffusion(
            n_feats=self.n_feats,
            dim=self.dec_dim,
            multi_spks=1 if self.n_spks > 1 else 0,
            spk_emb_dim=self.vid_emb_dim,
            beta_min=self.beta_min,
            beta_max=self.beta_max,
            pe_scale=self.pe_scale,
            perceptual_loss=self.perceptual_loss,
            sampler_unroll=self.sampler_unroll,
            fused_gn=self.fused_gn,
            unet_family=self.unet_family,
            name="decoder",
        )
        self.syncnet = SyncNet(
            n_out=self.vid_emb_dim, stride=self.syncnet_stride,
            width_mult=self.syncnet_width_mult, name="syncnet"
        )

    # ---------------------------------------------------------- embeddings
    def speaker_embedding(self, spk: jnp.ndarray) -> jnp.ndarray:
        """Condition from a face image or a mel clip per `spk_emb`
        (reference face_tts.py:108-114, 148-155)."""
        if self.spk_emb == "speech":
            e = self.syncnet.forward_aud(spk[..., None])  # (B, T', D)
            return jax.lax.stop_gradient(jnp.mean(e, axis=1))
        e = self.syncnet.forward_vid(spk)
        return jax.lax.stop_gradient(e)

    # ------------------------------------------------------------- forward
    def encode(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        spk: Optional[jnp.ndarray] = None,
        length_scale: float = 1.0,
        spk_is_embedding: bool = False,
    ):
        """Phase 1: text+face -> prior stats + predicted mel lengths.

        Split from decode() so the host can pick a static Ty bucket from the
        predicted lengths (the reference instead materializes a dynamic
        y_max_length, face_tts.py:120-122 — not XLA-compilable)."""
        spk_e = spk if spk_is_embedding else self.speaker_embedding(spk)
        mu_x, logw, x_mask = self.encoder(x, x_lengths, spk_e)

        w = jnp.exp(logw) * x_mask
        w_ceil = jnp.ceil(w) * length_scale  # reference scales after ceil
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), min=1.0)
        return mu_x, w_ceil, x_mask, y_lengths, spk_e

    def decode(
        self,
        mu_x: jnp.ndarray,
        w_ceil: jnp.ndarray,
        x_mask: jnp.ndarray,
        y_lengths: jnp.ndarray,
        spk_e: jnp.ndarray,
        n_timesteps: int,
        y_max_length: int,
        temperature: float = 1.0,
        stoc: bool = False,
        rng: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
    ):
        """Phase 2: expand the prior along the predicted durations and run
        the reverse diffusion at a static Ty bucket.

        ``noise``: optional pre-drawn standard-normal (B, F, y_max_length)
        replacing the internal draw (reference inference.py:127's
        torch.randn_like) — used by cross-framework parity harnesses that
        must feed BOTH implementations the identical noise."""
        y_lengths = jnp.minimum(y_lengths, y_max_length).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, y_max_length).astype(mu_x.dtype)[:, None, :]
        attn_mask = x_mask * y_mask  # (B, Tx, Ty)
        attn = generate_path(w_ceil[..., 0], attn_mask)

        mu_y = jnp.einsum(
            "bxy,bxf->bfy", attn, mu_x, preferred_element_type=jnp.float32
        ).astype(mu_x.dtype)  # (B, F, Ty)

        rng_z, rng_s = jax.random.split(rng)
        if noise is None:
            noise = jax.random.normal(rng_z, mu_y.shape, mu_y.dtype)
        z = mu_y + noise.astype(mu_y.dtype) / temperature
        dec, _ = self.decoder(
            z, y_mask, mu_y, n_timesteps, stoc=stoc, spk=spk_e, rng=rng_s
        )
        return mu_y, dec, attn, y_lengths

    def __call__(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        n_timesteps: int,
        y_max_length: int,
        temperature: float = 1.0,
        stoc: bool = False,
        spk: Optional[jnp.ndarray] = None,
        length_scale: float = 1.0,
        rng: Optional[jax.Array] = None,
        spk_is_embedding: bool = False,
        noise: Optional[jnp.ndarray] = None,
    ):
        """Inference: synthesize a mel given text and a face image
        (reference face_tts.py:92-140).

        `y_max_length` is a static frame bucket (multiple of 4).  Returns
        (encoder_outputs, decoder_output, attn, y_lengths); frames beyond the
        per-sample y_length are zero-masked."""
        mu_x, w_ceil, x_mask, y_lengths, spk_e = self.encode(
            x, x_lengths, spk, length_scale, spk_is_embedding
        )
        return self.decode(
            mu_x, w_ceil, x_mask, y_lengths, spk_e, n_timesteps, y_max_length,
            temperature, stoc, rng, noise,
        )

    # --------------------------------------------------------------- loss
    def compute_loss(
        self,
        rng: jax.Array,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        y: jnp.ndarray,  # (B, n_feats, T_y)
        y_lengths: jnp.ndarray,
        spk: jnp.ndarray,  # face images (B, 224, 224, 3)
        out_size: Optional[int] = None,
        deterministic: bool = True,
    ):
        """Duration + prior + diffusion + speaker-binding losses
        (reference face_tts.py:142-241).  Returns (LossParts, aux dict)."""
        # NOT detached: gradients flow into the SyncNet image stream exactly
        # like the reference (face_tts.py:148-157); which parameters actually
        # update is decided by the optimizer partition (train/optim.py).
        # Only the SELECTED branch is built: the reference computes both
        # embeddings and discards one (face_tts.py:148-155) — numerically
        # identical, but skipping the dead branch keeps the fixed 224x224
        # image trunk out of speech-mode programs entirely (and lets
        # speech-mode batches carry a mel clip in `spk` instead of a face).
        if self.spk_emb == "speech":
            spk_e = jnp.mean(self.syncnet.forward_aud(y[..., None]), axis=1)
        else:
            spk_e = self.syncnet.forward_vid(spk)

        mu_x, logw, x_mask = self.encoder(
            x, x_lengths, spk_e, deterministic=deterministic
        )
        y_max_length = y.shape[-1]
        y_mask = sequence_mask(y_lengths, y_max_length).astype(x_mask.dtype)[:, None, :]
        attn_mask = x_mask * y_mask  # (B, Tx, Ty)

        # Gaussian log-prior over (text, mel) pairs, no gradient
        # (reference face_tts.py:165-171)
        mu_sg = jax.lax.stop_gradient(mu_x)
        const = -0.5 * math.log(2 * math.pi) * self.n_feats
        y_sq = jnp.sum(-0.5 * y**2, axis=1)[:, None, :]  # (B, 1, Ty)
        y_mu = jnp.einsum("bxf,bfy->bxy", mu_sg, y, preferred_element_type=jnp.float32)
        mu_sq = jnp.sum(-0.5 * mu_sg**2, axis=-1)[:, :, None]  # (B, Tx, 1)
        log_prior = y_sq + y_mu + mu_sq + const

        attn = jax.lax.stop_gradient(maximum_path(log_prior, attn_mask))

        logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=-1))[:, :, None] * x_mask
        dur_loss = jnp.sum((logw - logw_) ** 2) / jnp.sum(x_lengths)

        # random 2-second crop with static out_size (face_tts.py:181-215)
        if out_size is not None and out_size < y_max_length:
            rng, rng_off = jax.random.split(rng)
            max_offset = jnp.maximum(y_lengths - out_size, 0)
            u = jax.random.uniform(rng_off, (y.shape[0],))
            offset = (u * max_offset).astype(jnp.int32)

            def cut(arr, off):
                return jax.lax.dynamic_slice_in_dim(arr, off, out_size, axis=-1)

            y = jax.vmap(cut)(y, offset)
            attn = jax.vmap(cut)(attn, offset)
            y_cut_lengths = jnp.minimum(y_lengths, out_size)
            y_mask = sequence_mask(y_cut_lengths, out_size).astype(y_mask.dtype)[:, None, :]

        mu_y = jnp.einsum(
            "bxy,bxf->bfy", attn, mu_x, preferred_element_type=jnp.float32
        )

        rng, rng_diff = jax.random.split(rng)
        diff_loss, xt, xt_hat = self.decoder.compute_loss(
            rng_diff, y, y_mask, mu_y, spk_e
        )

        # speaker-binding perceptual loss over SyncNet audio features
        # (face_tts.py:225-230): layers i >= 2, averaged over all 8 maps
        spk_loss = 0.0
        if self.perceptual_loss:
            out_f = self.syncnet.forward_perceptual(xt_hat[..., None])
            gt_f = self.syncnet.forward_perceptual(jax.lax.stop_gradient(y)[..., None])
            for i in range(2, len(out_f)):
                spk_loss += jnp.mean(jnp.abs(out_f[i] - jax.lax.stop_gradient(gt_f[i])))
            spk_loss = spk_loss / float(len(out_f))

        prior_loss = jnp.sum(
            0.5 * ((y - mu_y) ** 2 + math.log(2 * math.pi)) * y_mask
        ) / (jnp.sum(y_mask) * self.n_feats)

        parts = LossParts(
            dur_loss=dur_loss,
            prior_loss=prior_loss,
            diff_loss=diff_loss,
            spk_loss=self.gamma * spk_loss,
        )
        aux: Dict[str, Any] = {"attn": attn, "xt_hat": xt_hat, "spk_e": spk_e,
                               "y_cut": y, "y_cut_mask": y_mask, "mu_y": mu_y}
        return parts, aux
