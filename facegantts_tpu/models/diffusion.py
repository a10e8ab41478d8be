"""Score-based diffusion decoder (Grad-TTS SDE).

Re-design of the reference Diffusion module (model/diffusion.py:151-262):
linear β(t) ∈ [beta_min, beta_max] noise schedule, forward diffusion toward
the aligned prior mean μ, an Euler reverse ODE/SDE sampler, and the
score-matching loss with the one-step denoised x̂_t used by the perceptual
speaker-binding loss.

TPU-first: the reverse sampler is a `lax.scan` over diffusion steps (one
U-Net evaluation per step, fully on-device, no Python loop), returning the
final state; intermediates are optional (the reference returns all of them,
inference only consumes the last — reference inference.py:137)."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from facegantts_tpu.models.unet import (
    GradLogPEstimator2d,
    GradLogPEstimator2dTpuOpt,
)


def noise_level(t, beta_min: float, beta_max: float, cumulative: bool = False):
    """β(t) or its integral ∫₀ᵗ β (reference diffusion.py:181-186)."""
    if cumulative:
        return beta_min * t + 0.5 * (beta_max - beta_min) * t**2
    return beta_min + (beta_max - beta_min) * t


class Diffusion(nn.Module):
    """Wraps the score estimator with the SDE machinery."""

    n_feats: int
    dim: int
    multi_spks: int = 1
    spk_emb_dim: int = 512
    beta_min: float = 0.05
    beta_max: float = 20.0
    pe_scale: float = 1000.0
    perceptual_loss: int = 1
    # lax.scan unroll factor for the reverse sampler: >1 lets XLA fuse/
    # overlap across Euler iterations at the cost of program size (perf
    # knob only — identical math)
    sampler_unroll: int = 1
    # fused GroupNorm+Mish+mask Pallas chain in the U-Net (ops/gn_mish.py)
    fused_gn: int = 1
    # score-net family: "parity" = the reference U-Net shape (checkpoint-
    # compatible); "tpu_opt" = lane-aligned patchify family (see
    # models/unet.py GradLogPEstimator2dTpuOpt)
    unet_family: str = "parity"

    def setup(self):
        if self.unet_family == "tpu_opt":
            # trunk dims (2*dim, 4*dim) = the parity family's own /2 and /4
            # level widths; with the reference dec_dim=64 that is (128, 256)
            # — every trunk activation lane-aligned on the 128-wide axis
            self.estimator = GradLogPEstimator2dTpuOpt(
                dim=self.dim * 2,
                multi_spks=self.multi_spks,
                spk_emb_dim=self.spk_emb_dim,
                n_feats=self.n_feats,
                pe_scale=self.pe_scale,
                fused_gn=self.fused_gn,
                name="estimator",
            )
            return
        if self.unet_family != "parity":
            raise ValueError(
                f"unknown unet_family {self.unet_family!r} "
                "(expected 'parity' or 'tpu_opt')"
            )
        self.estimator = GradLogPEstimator2d(
            dim=self.dim,
            multi_spks=self.multi_spks,
            spk_emb_dim=self.spk_emb_dim,
            n_feats=self.n_feats,
            pe_scale=self.pe_scale,
            fused_gn=self.fused_gn,
            name="estimator",
        )

    # ---------------------------------------------------------------- fwd
    def forward_diff(
        self, rng, x0, mask, mu, t
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Diffuse x0 toward μ at time t (reference diffusion.py:188-202).

        Returns (x_t, z) with z the standard normal actually drawn."""
        cum = noise_level(t[:, None, None], self.beta_min, self.beta_max, cumulative=True)
        decay = jnp.exp(-0.5 * cum)
        mean = x0 * decay + mu * (1.0 - decay)
        var = 1.0 - jnp.exp(-cum)
        z = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
        xt = mean + z * jnp.sqrt(var)
        return xt * mask, z * mask

    # ------------------------------------------------------------ sampler
    def reverse_diff(
        self,
        z: jnp.ndarray,  # (B, F, T) initial noise around mu
        mask: jnp.ndarray,  # (B, 1, T)
        mu: jnp.ndarray,  # (B, F, T)
        n_steps: int,
        stoc: bool = False,
        spk: Optional[jnp.ndarray] = None,
        rng: Optional[jax.Array] = None,
        return_all: bool = False,
    ):
        """Euler reverse sampler (reference diffusion.py:204-236) as lax.scan."""
        h = 1.0 / n_steps
        xt = z * mask
        b = z.shape[0]
        if stoc and rng is None:
            raise ValueError("stochastic sampling needs an rng key")
        step_rngs = (
            jax.random.split(rng, n_steps) if stoc else jnp.zeros((n_steps, 2), jnp.uint32)
        )

        def step(mdl, xt, inputs):
            i, step_rng = inputs
            t = (1.0 - (i + 0.5) * h) * jnp.ones((b,), dtype=z.dtype)
            beta_t = noise_level(t[:, None, None], mdl.beta_min, mdl.beta_max)
            score = mdl.estimator(xt, mask, mu, t, spk)
            if stoc:
                dxt_det = (0.5 * (mu - xt) - score) * beta_t * h
                noise = jax.random.normal(step_rng, z.shape, dtype=z.dtype)
                dxt = dxt_det + noise * jnp.sqrt(beta_t * h)
            else:
                dxt = 0.5 * (mu - xt - score) * beta_t * h
            xt = (xt - dxt) * mask
            return xt, (xt if return_all else None)

        xs = (jnp.arange(n_steps, dtype=z.dtype), step_rngs)
        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            unroll=max(1, min(self.sampler_unroll, n_steps)),
        )
        xt, traj = scan(self, xt, xs)
        return (xt, traj) if return_all else (xt, None)

    def __call__(self, z, mask, mu, n_steps, stoc=False, spk=None, rng=None, return_all=False):
        return self.reverse_diff(z, mask, mu, n_steps, stoc, spk, rng, return_all)

    # --------------------------------------------------------------- loss
    def loss_t(self, rng, x0, mask, mu, t, spk=None):
        """Score-matching loss at times t (reference diffusion.py:242-255)."""
        xt, z = self.forward_diff(rng, x0, mask, mu, t)
        cum = noise_level(t[:, None, None], self.beta_min, self.beta_max, cumulative=True)
        score = self.estimator(xt, mask, mu, t, spk)
        pred_noise = score * jnp.sqrt(1.0 - jnp.exp(-cum))
        loss = jnp.sum((pred_noise + z) ** 2) / (jnp.sum(mask) * self.n_feats)
        if self.perceptual_loss:
            # one-step denoised estimate for the speaker-binding loss
            dxt = 0.5 * (mu - xt - score) * cum
            xt_hat = (xt - dxt) * mask
            return loss, xt, xt_hat
        return loss, xt, None

    def compute_loss(self, rng, x0, mask, mu, spk=None, offset: float = 1e-5):
        """Sample t ~ U(offset, 1-offset) and evaluate the loss
        (reference diffusion.py:257-262)."""
        rng_t, rng_z = jax.random.split(rng)
        t = jax.random.uniform(
            rng_t, (x0.shape[0],), dtype=x0.dtype, minval=offset, maxval=1.0 - offset
        )
        return self.loss_t(rng_z, x0, mask, mu, t, spk)
