"""Full-model torch replica of the reference FaceTTS generator, for
END-TO-END output-parity testing (VERDICT r2 next-step #3).

Assembles the complete reference inference pipeline — SyncNet face
embedding, text encoder with ±window relative-position attention, duration
expansion, and the Euler reverse-diffusion sampler — in torch with the
reference's module/parameter NAMING (model/face_tts.py, model/
text_encoder.py:349-422, model/diffusion.py:151-236), so its ``state_dict``
round-trips through ``train.checkpoint.import_facetts`` exactly like the
published ``facetts_lrs3.pt`` checkpoint would.

Written replica-style (loop-wise, reference layouts (B, C, T)) like
tests/test_import.py: these are the ground truth the TPU vectorizations are
checked against, NOT copies of reference code.
"""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

from tests.test_import import _TUnet, _torch_syncnet


class TLayerNorm(tnn.Module):
    """Channel LayerNorm with reference param names gamma/beta, eps=1e-4
    (reference model/text_encoder.py:13-31); input (B, C, T)."""

    def __init__(self, channels):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(channels))
        self.beta = tnn.Parameter(torch.zeros(channels))

    def forward(self, x):
        mean = x.mean(1, keepdim=True)
        var = ((x - mean) ** 2).mean(1, keepdim=True)
        x = (x - mean) * torch.rsqrt(var + 1e-4)
        return x * self.gamma[None, :, None] + self.beta[None, :, None]


class TPrenet(tnn.Module):
    """ConvReluNorm prenet (reference model/text_encoder.py:34-82)."""

    def __init__(self, channels, kernel_size=5, n_layers=3):
        super().__init__()
        self.conv_layers = tnn.ModuleList([
            tnn.Conv1d(channels, channels, kernel_size, padding=kernel_size // 2)
            for _ in range(n_layers)
        ])
        self.norm_layers = tnn.ModuleList([TLayerNorm(channels) for _ in range(n_layers)])
        self.proj = tnn.Conv1d(channels, channels, 1)
        self.proj.weight.data.zero_()
        self.proj.bias.data.zero_()

    def forward(self, x, x_mask):
        x_org = x
        for conv, norm in zip(self.conv_layers, self.norm_layers):
            x = torch.relu(norm(conv(x * x_mask)))
        return (x_org + self.proj(x)) * x_mask


class TWindowAttention(tnn.Module):
    """±window relative-position self-attention, heads_share=True
    (reference model/text_encoder.py:116-257).  Positions outside the
    window contribute exactly zero (zero-padded relative tables)."""

    def __init__(self, channels, n_heads, window_size):
        super().__init__()
        self.h, self.w = n_heads, window_size
        self.d = channels // n_heads
        self.conv_q = tnn.Conv1d(channels, channels, 1)
        self.conv_k = tnn.Conv1d(channels, channels, 1)
        self.conv_v = tnn.Conv1d(channels, channels, 1)
        self.conv_o = tnn.Conv1d(channels, channels, 1)
        std = self.d ** -0.5
        self.emb_rel_k = tnn.Parameter(torch.randn(1, 2 * window_size + 1, self.d) * std)
        self.emb_rel_v = tnn.Parameter(torch.randn(1, 2 * window_size + 1, self.d) * std)

    def forward(self, x, attn_mask):
        b, c, t = x.shape
        h, d, w = self.h, self.d, self.w
        q = self.conv_q(x).view(b, h, d, t)
        k = self.conv_k(x).view(b, h, d, t)
        v = self.conv_v(x).view(b, h, d, t)
        scale = 1.0 / math.sqrt(d)
        scores = torch.einsum("bhdt,bhds->bhts", q, k) * scale

        pos = torch.arange(t)
        delta = pos[None, :] - pos[:, None]  # (t_q, t_k) = s - t
        in_win = delta.abs() <= w
        r_idx = (delta + w).clamp(0, 2 * w)
        rel_q = torch.einsum("bhdt,rd->bhtr", q, self.emb_rel_k[0])  # (b,h,t,2w+1)
        rel_scores = rel_q.gather(
            -1, r_idx.clamp(0, 2 * w).expand(b, h, t, t)
        )
        scores = scores + torch.where(in_win[None, None], rel_scores * scale,
                                      torch.zeros(()))
        scores = scores.masked_fill(attn_mask[:, None] == 0, -1e4)
        p = scores.softmax(-1)
        out = torch.einsum("bhts,bhds->bhdt", p, v)

        # relative-value contribution: rel_w[b,h,t,r] = p[b,h,t,t+r-w]
        r = torch.arange(2 * w + 1)
        s_idx = (pos[:, None] + r[None, :] - w).clamp(0, t - 1)
        valid = (pos[:, None] + r[None, :] - w >= 0) & (pos[:, None] + r[None, :] - w <= t - 1)
        rel_w = p.gather(-1, s_idx.expand(b, h, t, 2 * w + 1))
        rel_w = torch.where(valid[None, None], rel_w, torch.zeros(()))
        out = out + torch.einsum("bhtr,rd->bhdt", rel_w, self.emb_rel_v[0])

        return self.conv_o(out.reshape(b, c, t))


class TFFN(tnn.Module):
    def __init__(self, channels, filter_channels, kernel_size):
        super().__init__()
        self.conv_1 = tnn.Conv1d(channels, filter_channels, kernel_size, padding=kernel_size // 2)
        self.conv_2 = tnn.Conv1d(filter_channels, channels, kernel_size, padding=kernel_size // 2)

    def forward(self, x, x_mask):
        return self.conv_2(torch.relu(self.conv_1(x * x_mask))) * x_mask


class TTransformer(tnn.Module):
    def __init__(self, channels, filter_channels, n_heads, n_layers, kernel_size, window_size):
        super().__init__()
        self.attn_layers = tnn.ModuleList(
            [TWindowAttention(channels, n_heads, window_size) for _ in range(n_layers)])
        self.ffn_layers = tnn.ModuleList(
            [TFFN(channels, filter_channels, kernel_size) for _ in range(n_layers)])
        self.norm_layers_1 = tnn.ModuleList([TLayerNorm(channels) for _ in range(n_layers)])
        self.norm_layers_2 = tnn.ModuleList([TLayerNorm(channels) for _ in range(n_layers)])

    def forward(self, x, x_mask):
        attn_mask = x_mask.transpose(1, 2) * x_mask  # (B, T, T): rows=query
        for attn, ffn, n1, n2 in zip(self.attn_layers, self.ffn_layers,
                                     self.norm_layers_1, self.norm_layers_2):
            x = x * x_mask
            x = n1(x + attn(x, attn_mask))
            x = n2(x + ffn(x, x_mask))
        return x * x_mask


class TDurationPredictor(tnn.Module):
    def __init__(self, in_channels, filter_channels, kernel_size):
        super().__init__()
        self.conv_1 = tnn.Conv1d(in_channels, filter_channels, kernel_size, padding=kernel_size // 2)
        self.norm_1 = TLayerNorm(filter_channels)
        self.conv_2 = tnn.Conv1d(filter_channels, filter_channels, kernel_size, padding=kernel_size // 2)
        self.norm_2 = TLayerNorm(filter_channels)
        self.proj = tnn.Conv1d(filter_channels, 1, 1)

    def forward(self, x, x_mask):
        x = self.norm_1(torch.relu(self.conv_1(x * x_mask)))
        x = self.norm_2(torch.relu(self.conv_2(x * x_mask)))
        return self.proj(x * x_mask) * x_mask


class TTextEncoder(tnn.Module):
    """Reference TextEncoder (model/text_encoder.py:349-422), (B, C, T)."""

    def __init__(self, n_vocab, n_feats, n_channels, filter_channels,
                 filter_channels_dp, n_heads, n_layers, kernel_size,
                 window_size, spk_emb_dim):
        super().__init__()
        self.n_channels = n_channels
        self.emb = tnn.Embedding(n_vocab, n_channels)
        tnn.init.normal_(self.emb.weight, 0.0, n_channels ** -0.5)
        self.prenet = TPrenet(n_channels)
        width = n_channels + spk_emb_dim
        self.encoder = TTransformer(width, filter_channels, n_heads, n_layers,
                                    kernel_size, window_size)
        self.proj_m = tnn.Conv1d(width, n_feats, 1)
        self.proj_w = TDurationPredictor(width, filter_channels_dp, kernel_size)

    def forward(self, x, x_lengths, spk):
        # x: (B, T) ids; spk: (B, spk_emb_dim)
        t = x.shape[1]
        h = (self.emb(x) * math.sqrt(self.n_channels)).transpose(1, 2)  # (B,C,T)
        x_mask = (torch.arange(t)[None, :] < x_lengths[:, None]).float()[:, None, :]
        h = self.prenet(h, x_mask)
        spk_b = spk[:, :, None].expand(-1, -1, t)
        h = torch.cat([h, spk_b], dim=1)
        h = self.encoder(h, x_mask)
        mu = self.proj_m(h) * x_mask
        logw = self.proj_w(h.detach(), x_mask)
        return mu, logw, x_mask


class TDecoder(tnn.Module):
    def __init__(self, estimator):
        super().__init__()
        self.estimator = estimator


class TFaceTTS(tnn.Module):
    """Container matching the reference's top-level module names so
    ``state_dict()`` keys read encoder.* / decoder.estimator.* / syncnet.*
    (what import_facetts consumes)."""

    def __init__(self, n_vocab=149, n_feats=128, n_channels=192,
                 filter_channels=768, filter_channels_dp=256, n_heads=2,
                 n_layers=6, kernel_size=3, window_size=4, spk_emb_dim=512,
                 dec_dim=64, dec_mults=(1, 2, 4), pe_scale=1000):
        super().__init__()
        self.encoder = TTextEncoder(
            n_vocab, n_feats, n_channels, filter_channels, filter_channels_dp,
            n_heads, n_layers, kernel_size, window_size, spk_emb_dim)
        self.decoder = TDecoder(_TUnet(
            dim=dec_dim, mults=dec_mults, spk_dim=spk_emb_dim,
            n_feats=n_feats, pe_scale=pe_scale))
        self.syncnet = _torch_syncnet(n_out=spk_emb_dim)


def torch_generate_path(duration: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Durations -> hard monotonic path (reference model/utils.py:27-40):
    row x covers mel frames [cumsum[x-1], cumsum[x])."""
    b, t_x, t_y = mask.shape
    cum = np.cumsum(duration, axis=1)
    pos = np.arange(t_y)
    upper = (pos[None, None, :] < cum[:, :, None]).astype(mask.dtype)
    lower = np.pad(upper, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return (upper - lower) * mask


@torch.no_grad()
def torch_inference(model: TFaceTTS, x, x_lengths, face, n_timesteps,
                    y_max_length, temperature, length_scale, noise,
                    beta_min=0.05, beta_max=20.0, spk=None):
    """The exact reference inference recipe (inference.py:125-133 +
    face_tts.py:92-140 + diffusion.py:204-236, Euler deterministic), with
    the initial noise injected so the jax side can consume the identical
    draw.  ``spk``: optional precomputed (B, D) speaker embedding replacing
    the SyncNet face forward (the golden artifact stores the embedding so
    the committed file skips the multi-MB syncnet weights).  Returns
    (mel (B, F, Ty) numpy, y_lengths numpy, spk (B, D) numpy)."""
    model.eval()
    if spk is None:
        spk = model.syncnet.netfcimg(
            model.syncnet.netcnnimg(face).squeeze(-1)).squeeze(-1)  # (B, D)
    mu_x, logw, x_mask = model.encoder(x, x_lengths, spk)

    w = torch.exp(logw) * x_mask
    w_ceil = torch.ceil(w) * length_scale
    y_lengths = torch.clamp(w_ceil.sum(dim=(1, 2)), min=1.0)
    y_lengths = torch.minimum(
        y_lengths, torch.tensor(float(y_max_length))).long()

    t_y = y_max_length
    y_mask = (torch.arange(t_y)[None, :] < y_lengths[:, None]).float()[:, None, :]
    attn_mask = x_mask.transpose(1, 2) * y_mask  # (B, Tx, Ty)
    attn = torch.from_numpy(torch_generate_path(
        w_ceil.squeeze(1).numpy(), attn_mask.numpy())).float()

    mu_y = torch.einsum("bxy,bfx->bfy", attn, mu_x)  # expand prior over time
    z = mu_y + torch.from_numpy(noise).float() / temperature

    xt = z * y_mask
    h = 1.0 / n_timesteps
    b = xt.shape[0]
    for i in range(n_timesteps):
        t = (1.0 - (i + 0.5) * h) * torch.ones(b)
        beta_t = beta_min + (beta_max - beta_min) * t[:, None, None]
        score = model.decoder.estimator(xt, y_mask, mu_y, t, spk)
        dxt = 0.5 * (mu_y - xt - score) * beta_t * h
        xt = (xt - dxt) * y_mask
    return xt.numpy(), y_lengths.numpy(), spk.numpy()
