"""U-Net score estimator for the diffusion decoder.

Re-design of the reference GradLogPEstimator2d and its blocks
(model/diffusion.py:33-148, model/baseblock.py:9-104) in NHWC layout —
(batch, freq, time, channels) — the native TPU conv layout, so every conv
lands on the MXU without layout transposes.  Mask shape is (B, 1, T, 1):
broadcast over frequency and channels.
"""

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from facegantts_tpu.ops.convt import conv_transpose
from facegantts_tpu.ops.gn_mish import gn_mish_mask
from facegantts_tpu.ops.groupnorm import group_norm


def mish(x):
    """x * tanh(softplus(x)), in rational-exp form.

    With u = e^x:  tanh(ln(1+u)) = ((1+u)^2 - 1)/((1+u)^2 + 1)
                                 = u(u+2) / (u(u+2) + 2),
    so one exp + 4 cheap VPU ops replace the exp/log/tanh chain XLA emits
    for the textbook form (tanh alone expands to a rational-polynomial
    ladder).  The U-Net applies mish to every post-GroupNorm activation at
    full mel resolution, where the VPU transcendental chain — not HBM —
    bounds the pass.  Clamp at 20: tanh(softplus(20)) == 1 to 1e-17, and
    e^x stays far from f32 overflow.  Matches x*tanh(softplus(x)) to f32
    rounding (<4e-6 abs; validated over [-100, 100]).  Stats in f32 even
    for bf16 inputs: u(u+2)+2 in bf16 would lose the +2 at u > 2^8."""
    xf = x.astype(jnp.float32)
    u = jnp.exp(jnp.minimum(xf, 20.0))
    n = u * (u + 2.0)
    # grouping matters: the ratio is bounded in [0, 1), while (xf * n) can
    # overflow f32 for large |xf| and poison the where-branch VJP with NaN
    y = jnp.where(xf > 20.0, xf, xf * (n / (n + 2.0)))
    return y.astype(x.dtype)


class FusedGroupNorm(nn.Module):
    """GroupNorm with Pallas-accelerated statistics on TPU (ops/groupnorm).

    Parameter tree ("scale", "bias" per channel) and math are identical to
    flax nn.GroupNorm — torch-checkpoint importers and replica-parity tests
    are unaffected.

    NOT used by default: on the axon v5e the per-pallas-call overhead and
    the pipeline break around the kernel cost more than the stats-bandwidth
    win at every model shape (U-Net eval b=16 T=436: 41.7 ms with
    nn.GroupNorm vs 61.0 ms with this; b=1: 3.6 vs 6.5 ms) — see
    ops/groupnorm.py.  Kept as tested infrastructure for backends/shapes
    where a standalone reduction kernel wins."""

    channels: int
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return group_norm(x, scale, bias, self.groups, 1e-5)


def timestep_embedding(t: jnp.ndarray, dim: int, scale: float = 1000.0) -> jnp.ndarray:
    """Sinusoidal positions for diffusion time (reference diffusion.py:19-30)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / (half - 1))
    args = scale * t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class _GNParams(nn.Module):
    """Bare GroupNorm affine parameters, tree-identical to flax
    nn.GroupNorm's {scale, bias} so torch-checkpoint importers and replica
    parity are layout-invariant whichever Block path runs."""

    channels: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.channels,)),
            self.param("bias", nn.initializers.zeros, (self.channels,)),
        )


class Block(nn.Module):
    """conv3x3 -> GroupNorm(8) -> Mish, masked (reference baseblock.py:42-51).

    With ``fused=True`` and a sequence-length vector, the post-conv chain
    runs as ONE Pallas kernel on TPU (ops/gn_mish.py) — statistics,
    normalize, affine, Mish and the time mask in a single lane-packed pass
    (exact reference math everywhere, incl. the fallback path)."""

    dim_out: int
    groups: int = 8
    fused: bool = False

    @nn.compact
    def __call__(self, x, mask, lens=None):
        x = nn.Conv(self.dim_out, (3, 3), padding="SAME", name="conv")(x * mask)
        # epsilon=1e-5: torch nn.GroupNorm's default, which the reference
        # uses (baseblock.py:46) — flax's 1e-6 default is a real (if tiny)
        # semantic mismatch that the e2e parity harness resolves
        if self.fused and lens is not None:
            scale, bias = _GNParams(self.dim_out, name="norm")()
            return gn_mish_mask(x, scale, bias, lens, self.groups, 1e-5)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(x)
        return mish(x) * mask


class ResnetBlock(nn.Module):
    """Two Blocks with a time-embedding injection and residual conv
    (reference baseblock.py:54-71)."""

    dim_out: int
    groups: int = 8
    fused: bool = False

    @nn.compact
    def __call__(self, x, mask, time_emb, lens=None):
        h = Block(self.dim_out, self.groups, self.fused, name="block1")(x, mask, lens)
        temb = nn.Dense(self.dim_out, name="mlp")(mish(time_emb))
        h = h + temb[:, None, None, :].astype(h.dtype)
        h = Block(self.dim_out, self.groups, self.fused, name="block2")(h, mask, lens)
        if x.shape[-1] != self.dim_out:
            # 1x1 conv == Dense on the channel axis; XLA lowers Dense to a
            # plain MXU matmul whereas a (1,1) convolution takes the (slow)
            # convolution path on TPU (~2x whole-block cost measured)
            res = nn.Dense(self.dim_out, name="res_conv")(x * mask)
        else:
            res = x * mask
        return h + res


class LinearAttention(nn.Module):
    """Softmax-key linear attention over the (freq*time) grid
    (reference baseblock.py:74-94)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, f, t, c = x.shape
        h, d = self.heads, self.dim_head
        hidden = h * d
        # Layout-preserving formulation (device-trace driven): 1x1 convs as
        # Dense (MXU matmul lowering); q/k/v via lane-aligned slices of the
        # packed projection (torch to_qkv channel order is [3][H][D], so
        # [:hidden] IS q); softmax/contractions over the (f, t) grid
        # directly.  The textbook reshape to (B, f*t, 3, H, D) materialized
        # two ~1.4 GB layout copies per eval at training shapes — this form
        # removes them (57.6 -> 45.6 ms per U-Net eval at (16,128,436)).
        qkv = nn.Dense(hidden * 3, use_bias=False, name="to_qkv")(x)
        q = qkv[..., :hidden]
        k = qkv[..., hidden:2 * hidden]
        v = qkv[..., 2 * hidden:]
        # softmax over spatial positions, per packed channel (= per (h, d))
        m = jnp.max(k, axis=(1, 2), keepdims=True)
        ek = jnp.exp(k - m)
        kn = ek / jnp.sum(ek, axis=(1, 2), keepdims=True)
        # Per-head contractions expressed as channel-packed matmuls with a
        # block-diagonal head mask: "bnc,bne->bce" / "bnc,bce->bne" keep the
        # channel axis minor on both operands, so XLA emits plain A^T B / A B
        # MXU matmuls with no layout transposes.  The per-head einsum form
        # ("bfthd,bfthe->bhde") forced two f-minor relayouts of the
        # (B,F,T,hidden) tensors — ~110 ms/step of pure copies in the GAN
        # step at training shapes.  The cross-head blocks computed here are
        # masked to zero; the extra h* FLOPs are ~29 GFLOP, noise vs the
        # to_qkv projection itself.
        n = f * t
        kn2 = kn.reshape(b, n, hidden)
        v2 = v.reshape(b, n, hidden)
        q2 = q.reshape(b, n, hidden)
        ctx = jnp.einsum("bnc,bne->bce", kn2, v2, preferred_element_type=jnp.float32)
        head_id = jnp.arange(hidden) // d
        block_mask = (head_id[:, None] == head_id[None, :]).astype(ctx.dtype)
        ctx = ctx * block_mask
        out = jnp.einsum("bnc,bce->bne", q2, ctx, preferred_element_type=jnp.float32)
        out = out.reshape(b, f, t, hidden).astype(x.dtype)
        return nn.Dense(c, name="to_out")(out)


class RezeroAttention(nn.Module):
    """x + g * LinearAttention(x), g zero-init (baseblock.py:32-39,97-104)."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.zeros, (1,))
        return x + LinearAttention(self.heads, self.dim_head, name="fn")(x) * g


class Downsample(nn.Module):
    """conv3x3 stride-2 over (freq, time) (baseblock.py:23-29)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="conv")(x)


class Upsample(nn.Module):
    """transposed conv k4 s2 doubling (freq, time) (baseblock.py:14-20),
    torch ConvTranspose2d(4, 2, 1) semantics for weight-import parity."""

    dim: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (4, 4, x.shape[-1], self.dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return conv_transpose(x, kernel, (2, 2), (1, 1)) + bias


class GradLogPEstimator2dTpuOpt(nn.Module):
    """TPU-optimized score-estimator family (``unet_family="tpu_opt"``).

    Same capability slot as the parity U-Net below (the score net inside the
    diffusion decoder, reference model/diffusion.py:33-148) but re-shaped
    for the v5e memory system.  The parity family's ceiling is structural:
    its full-resolution level carries (B, 128, T, 64) f32 activations, and
    C=64 on the 128-wide lane axis means every elementwise/GN/attention pass
    at full mel resolution pays a 2x HBM padding expansion (measured: hot
    fusions at 60-75% of HBM speed-of-light, MFU capped at 24% — BENCH_NOTES
    r3/r4; both Pallas attacks on the padding lost to XLA's own fusions).

    This family removes the padded level instead of optimizing it:

    - a **patchify stem** (2x2 stride-2 conv == lossless space-to-depth of
      the [mu, x_t, spk] stack followed by a Dense) folds the (F, T) grid to
      (F/2, T/2) with ``dim`` >= 128 channels, so EVERY trunk activation is
      lane-aligned (C in {128, 256}) and full-resolution tensors exist only
      as the stem input and head output;
    - the trunk is the parity family's own /2 and /4 levels (same
      ResnetBlock / RezeroAttention blocks, dims (dim, 2*dim) = the parity
      dims dec_dim*(2, 4)) — capacity where the parity model had it, minus
      the C=64 level whose work the stem now does in one conv;
    - a **2x2 stride-2 transposed-conv head** (== Dense to 2x2x1 patches +
      depth-to-space) restores (B, F, T) for the score output.

    NOT checkpoint-compatible with the reference/parity family (new
    parameter tree, different receptive-field ladder) — an opt-in
    performance family, selected by ``Config.unet_family``; the parity
    family stays the default for reference-recipe and weight-import work.
    """

    dim: int  # trunk width at /2 resolution; 128 = lane-width aligned
    dim_mults: Sequence[int] = (1, 2)
    groups: int = 8
    multi_spks: int = 1
    spk_emb_dim: int = 512
    n_feats: int = 128
    pe_scale: float = 1000.0
    fused_gn: int = 0

    @nn.compact
    def __call__(self, x, mask, mu, t, spk=None):
        # x, mu: (B, F, T); mask: (B, 1, T); t: (B,); spk: (B, spk_emb_dim)
        b, f, tt = x.shape
        if f % 2 or tt % 2:
            raise ValueError(
                f"tpu_opt U-Net needs even (F, T); got ({f}, {tt}) — mel "
                "buckets are fix_len_compatibility'd to multiples of 4, so "
                "this indicates a non-bucketed input"
            )
        temb = timestep_embedding(t, self.dim, self.pe_scale)
        temb = nn.Dense(self.dim * 4, name="mlp_1")(temb)
        temb = nn.Dense(self.dim, name="mlp_2")(mish(temb))

        if self.multi_spks:
            s = nn.Dense(self.spk_emb_dim * 4, name="spk_mlp_1")(spk)
            s = nn.Dense(self.n_feats, name="spk_mlp_2")(mish(s))
            s_map = jnp.broadcast_to(s[:, :, None], (*s.shape, x.shape[-1]))
            h = jnp.stack([mu, x, s_map], axis=-1)  # (B, F, T, 3)
        else:
            h = jnp.stack([mu, x], axis=-1)

        mask4 = mask[:, :, :, None]  # (B, 1, T, 1)
        # patchify stem: one strided MXU conv does the full-resolution work
        h = nn.Conv(
            self.dim, (2, 2), strides=(2, 2), padding="VALID", name="stem"
        )(h * mask4)

        # half-resolution masks/lengths: stride-2 keeps positions 0,2,4,…
        # so ceil(len/2) frames survive (same rule as Downsample below)
        m_half = mask4[:, :, ::2]
        lens = None
        if self.fused_gn:
            full = jnp.round(
                jnp.sum(mask[:, 0, :].astype(jnp.float32), axis=-1)
            ).astype(jnp.int32)
            lens = (full + 1) // 2

        dims = [self.dim * m for m in self.dim_mults]
        num_res = len(dims)
        fused = bool(self.fused_gn)
        hiddens = []
        masks = [m_half]
        lens_by_level = [lens]
        for i, d in enumerate(dims):
            m, ln = masks[-1], lens_by_level[-1]
            h = ResnetBlock(d, self.groups, fused, name=f"down_{i}_res1")(h, m, temb, ln)
            h = ResnetBlock(d, self.groups, fused, name=f"down_{i}_res2")(h, m, temb, ln)
            h = RezeroAttention(name=f"down_{i}_attn")(h)
            hiddens.append(h)
            if i < num_res - 1:
                h = Downsample(d, name=f"down_{i}_ds")(h * m)
                masks.append(m[:, :, ::2])
                lens_by_level.append(None if ln is None else (ln + 1) // 2)

        m_mid, ln_mid = masks[-1], lens_by_level[-1]
        h = ResnetBlock(dims[-1], self.groups, fused, name="mid_res1")(h, m_mid, temb, ln_mid)
        h = RezeroAttention(name="mid_attn")(h)
        h = ResnetBlock(dims[-1], self.groups, fused, name="mid_res2")(h, m_mid, temb, ln_mid)

        for j, i in enumerate(range(num_res - 1, 0, -1)):
            m, ln = masks.pop(), lens_by_level.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock(dims[i - 1], self.groups, fused, name=f"up_{j}_res1")(h, m, temb, ln)
            h = ResnetBlock(dims[i - 1], self.groups, fused, name=f"up_{j}_res2")(h, m, temb, ln)
            h = RezeroAttention(name=f"up_{j}_attn")(h)
            h = Upsample(dims[i - 1], name=f"up_{j}_us")(h * m)

        h = Block(self.dim, self.groups, fused, name="final_block")(h, m_half, lens)
        # unpatchify head: 2x2 stride-2 transposed conv to one channel
        # (== Dense to 2x2x1 patches + depth-to-space)
        kernel = self.param(
            "head_kernel", nn.initializers.lecun_normal(), (2, 2, self.dim, 1)
        )
        bias = self.param("head_bias", nn.initializers.zeros, (1,))
        out = conv_transpose(h * m_half, kernel, (2, 2), (0, 0)) + bias
        return (out * mask4)[..., 0]  # (B, F, T)


class GradLogPEstimator2d(nn.Module):
    """Score-estimator U-Net (reference model/diffusion.py:33-148).

    Inputs are stacked as channels of an NHWC image: [mu, x_t, spk-bias] ->
    (B, n_feats, T, 3); three resolution levels with dims dim*(1,2,4);
    linear-attention residuals at every level; output is the predicted score
    (B, n_feats, T)."""

    dim: int
    dim_mults: Sequence[int] = (1, 2, 4)
    groups: int = 8
    multi_spks: int = 1
    spk_emb_dim: int = 512
    n_feats: int = 128
    pe_scale: float = 1000.0
    fused_gn: int = 1

    @nn.compact
    def __call__(self, x, mask, mu, t, spk=None):
        # x, mu: (B, F, T); mask: (B, 1, T); t: (B,); spk: (B, spk_emb_dim)
        # The model's masks are always sequence masks (ops/align.py
        # sequence_mask; reference model/utils.py:6), so the per-sample
        # frame count recovers the mask exactly — it feeds the fused
        # GroupNorm+Mish+mask Pallas chain (ops/gn_mish.py), which computes
        # the mask in-kernel instead of reading a mask tensor.  f32 sum:
        # a bf16 mask cannot count past 256 frames exactly.
        lens = jnp.round(
            jnp.sum(mask[:, 0, :].astype(jnp.float32), axis=-1)
        ).astype(jnp.int32) if self.fused_gn else None
        temb = timestep_embedding(t, self.dim, self.pe_scale)
        temb = nn.Dense(self.dim * 4, name="mlp_1")(temb)
        temb = nn.Dense(self.dim, name="mlp_2")(mish(temb))

        if self.multi_spks:
            s = nn.Dense(self.spk_emb_dim * 4, name="spk_mlp_1")(spk)
            s = nn.Dense(self.n_feats, name="spk_mlp_2")(mish(s))
            s_map = jnp.broadcast_to(s[:, :, None], (*s.shape, x.shape[-1]))
            h = jnp.stack([mu, x, s_map], axis=-1)  # (B, F, T, 3)
        else:
            h = jnp.stack([mu, x], axis=-1)

        mask4 = mask[:, :, :, None]  # (B, 1, T, 1)
        dims = [self.dim * m for m in self.dim_mults]
        num_res = len(dims)

        fused = bool(self.fused_gn)
        hiddens = []
        masks = [mask4]
        lens_by_level = [lens]
        for i, d in enumerate(dims):
            m, ln = masks[-1], lens_by_level[-1]
            h = ResnetBlock(d, self.groups, fused, name=f"down_{i}_res1")(h, m, temb, ln)
            h = ResnetBlock(d, self.groups, fused, name=f"down_{i}_res2")(h, m, temb, ln)
            h = RezeroAttention(name=f"down_{i}_attn")(h)
            hiddens.append(h)
            if i < num_res - 1:
                h = Downsample(d, name=f"down_{i}_ds")(h * m)
                masks.append(m[:, :, ::2])
                # stride-2 keeps positions 0,2,4,…: ceil(len/2) survive
                lens_by_level.append(
                    None if ln is None else (ln + 1) // 2
                )

        m_mid, ln_mid = masks[-1], lens_by_level[-1]
        h = ResnetBlock(dims[-1], self.groups, fused, name="mid_res1")(h, m_mid, temb, ln_mid)
        h = RezeroAttention(name="mid_attn")(h)
        h = ResnetBlock(dims[-1], self.groups, fused, name="mid_res2")(h, m_mid, temb, ln_mid)

        for j, i in enumerate(range(num_res - 1, 0, -1)):
            m, ln = masks.pop(), lens_by_level.pop()
            h = jnp.concatenate([h, hiddens.pop()], axis=-1)
            h = ResnetBlock(dims[i - 1], self.groups, fused, name=f"up_{j}_res1")(h, m, temb, ln)
            h = ResnetBlock(dims[i - 1], self.groups, fused, name=f"up_{j}_res2")(h, m, temb, ln)
            h = RezeroAttention(name=f"up_{j}_attn")(h)
            h = Upsample(dims[i - 1], name=f"up_{j}_us")(h * m)

        h = Block(self.dim, self.groups, fused, name="final_block")(h, mask4, lens)
        out = nn.Dense(1, name="final_conv")(h * mask4)  # 1x1 conv as matmul
        return (out * mask4)[..., 0]  # (B, F, T)
