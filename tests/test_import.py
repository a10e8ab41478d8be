"""Weight-import parity: torch replicas of the reference modules (built here
from the SURVEY spec, eval mode) -> state_dict -> importer -> flax params ->
outputs must match torch to float tolerance.

These replicas are written loop-wise/straightforwardly on purpose: they are
the ground truth the TPU vectorizations are checked against."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from facegantts_tpu.train import checkpoint as ck  # noqa: E402


# ---------------------------------------------------------------------------
# SyncNet
# ---------------------------------------------------------------------------

def _torch_syncnet(n_out=64):
    aud = tnn.Sequential(
        tnn.Conv2d(1, 96, (5, 5), (1, 1), (2, 2)), tnn.BatchNorm2d(96), tnn.ReLU(),
        tnn.MaxPool2d((3, 1), (2, 1)),
        tnn.Conv2d(96, 256, (5, 5), (2, 1), (1, 1)), tnn.BatchNorm2d(256), tnn.ReLU(),
        tnn.MaxPool2d((3, 3), (2, 2)),
        tnn.Conv2d(256, 384, (5, 3), (1, 1), (2, 2)), tnn.BatchNorm2d(384), tnn.ReLU(),
        tnn.MaxPool2d((3, 1), (2, 1)),
        tnn.Conv2d(384, 256, (3, 3), padding=(1, 1)), tnn.BatchNorm2d(256), tnn.ReLU(),
        tnn.Conv2d(256, 256, (3, 3), padding=(1, 1)), tnn.BatchNorm2d(256), tnn.ReLU(),
        tnn.MaxPool2d((3, 3), (2, 2), padding=(0, 1)),
        tnn.Conv2d(256, 512, (3, 1), (1, 1), (0, 0)), tnn.BatchNorm2d(512), tnn.ReLU(),
    )
    fca = tnn.Sequential(
        tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(), tnn.Conv1d(512, n_out, 1)
    )
    img = tnn.Sequential(
        tnn.Conv2d(3, 96, (7, 7), (2, 2), 0), tnn.BatchNorm2d(96), tnn.ReLU(),
        tnn.MaxPool2d((3, 3), (2, 2)),
        tnn.Conv2d(96, 256, (5, 5), (2, 2), 1), tnn.BatchNorm2d(256), tnn.ReLU(),
        tnn.MaxPool2d((3, 3), (2, 2), padding=1),
        tnn.Conv2d(256, 256, (3, 3), padding=1), tnn.BatchNorm2d(256), tnn.ReLU(),
        tnn.Conv2d(256, 256, (3, 3), padding=1), tnn.BatchNorm2d(256), tnn.ReLU(),
        tnn.Conv2d(256, 256, (3, 3), padding=1), tnn.BatchNorm2d(256), tnn.ReLU(),
        tnn.MaxPool2d((3, 3), (2, 2)),
        tnn.Conv2d(256, 512, (6, 6), padding=0), tnn.BatchNorm2d(512), tnn.ReLU(),
    )
    fci = tnn.Sequential(
        tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(), tnn.Conv1d(512, n_out, 1)
    )

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.netcnnaud, self.netfcaud = aud, fca
            self.netcnnimg, self.netfcimg = img, fci

    net = Net().eval()
    # randomize BN running stats so eval-mode parity is a real check
    for m in net.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    return net


@pytest.mark.slow
def test_syncnet_import_parity():
    from facegantts_tpu.models.syncnet import SyncNet

    torch.manual_seed(0)
    net = _torch_syncnet(n_out=64)
    mel = torch.randn(2, 1, 128, 40)
    face = torch.randn(2, 3, 224, 224)
    with torch.no_grad():
        aud_mid = net.netcnnaud(mel).squeeze(-2)
        taud = net.netfcaud(aud_mid)  # (B, 64, T')
        tvid = net.netfcimg(net.netcnnimg(face).squeeze(-1)).squeeze(-1)  # (B, 64)

    params, stats = ck.import_syncnet(net.state_dict(), prefix="")
    variables = {"params": params, "batch_stats": stats}
    model = SyncNet(n_out=64)

    jaud = model.apply(
        variables, jnp.asarray(mel.numpy().transpose(0, 2, 3, 1)),
        method=SyncNet.forward_aud,
    )
    jvid = model.apply(
        variables, jnp.asarray(face.numpy().transpose(0, 2, 3, 1)),
        method=SyncNet.forward_vid,
    )
    np.testing.assert_allclose(
        np.asarray(jaud), taud.numpy().transpose(0, 2, 1), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(jvid), tvid.numpy(), atol=2e-4)

    feats = model.apply(
        variables, jnp.asarray(mel.numpy().transpose(0, 2, 3, 1)),
        method=SyncNet.forward_perceptual,
    )
    assert len(feats) == 8


# ---------------------------------------------------------------------------
# U-Net score estimator
# ---------------------------------------------------------------------------

class _TMish(tnn.Module):
    def forward(self, x):
        return x * torch.tanh(tF.softplus(x))


class _TBlock(tnn.Module):
    def __init__(self, ci, co, groups=8):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Conv2d(ci, co, 3, padding=1), tnn.GroupNorm(groups, co), _TMish()
        )

    def forward(self, x, m):
        return self.block(x * m) * m


class _TResnet(tnn.Module):
    def __init__(self, ci, co, temb, groups=8):
        super().__init__()
        self.mlp = tnn.Sequential(_TMish(), tnn.Linear(temb, co))
        self.block1 = _TBlock(ci, co, groups)
        self.block2 = _TBlock(co, co, groups)
        self.res_conv = tnn.Conv2d(ci, co, 1) if ci != co else tnn.Identity()

    def forward(self, x, m, t):
        h = self.block1(x, m) + self.mlp(t).unsqueeze(-1).unsqueeze(-1)
        h = self.block2(h, m)
        return h + self.res_conv(x * m)


class _TLinAttn(tnn.Module):
    def __init__(self, dim, heads=4, dh=32):
        super().__init__()
        self.heads, self.dh = heads, dh
        self.to_qkv = tnn.Conv2d(dim, heads * dh * 3, 1, bias=False)
        self.to_out = tnn.Conv2d(heads * dh, dim, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        qkv = self.to_qkv(x).reshape(b, 3, self.heads, self.dh, hh * ww)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (b, heads, dh, n)
        k = k.softmax(dim=-1)
        ctx = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", ctx, q)
        return self.to_out(out.reshape(b, self.heads * self.dh, hh, ww))


class _TRezeroAttn(tnn.Module):
    """Residual(Rezero(LinearAttention)) with reference param paths fn.g/fn.fn."""

    class _Rz(tnn.Module):
        def __init__(self, fn):
            super().__init__()
            self.fn = fn
            self.g = tnn.Parameter(torch.zeros(1))

        def forward(self, x):
            return self.fn(x) * self.g

    def __init__(self, dim):
        super().__init__()
        self.fn = self._Rz(_TLinAttn(dim))
        with torch.no_grad():
            self.fn.g.fill_(0.37)  # nonzero so the path is actually tested

    def forward(self, x):
        return self.fn(x) + x


class _TUnet(tnn.Module):
    """Torch replica of GradLogPEstimator2d (reference diffusion.py:33-148)."""

    def __init__(self, dim=8, mults=(1, 2), spk_dim=16, n_feats=32, pe_scale=1000):
        super().__init__()
        self.dim, self.pe_scale = dim, pe_scale
        self.spk_mlp = tnn.Sequential(tnn.Linear(spk_dim, spk_dim * 4), _TMish(), tnn.Linear(spk_dim * 4, n_feats))
        self.mlp = tnn.Sequential(tnn.Linear(dim, dim * 4), _TMish(), tnn.Linear(dim * 4, dim))
        dims = [3, *[dim * m for m in mults]]
        inout = list(zip(dims[:-1], dims[1:]))
        self.downs = tnn.ModuleList()
        for i, (ci, co) in enumerate(inout):
            last = i == len(inout) - 1
            ds = tnn.Identity() if last else tnn.Module()
            if not last:
                ds.conv = tnn.Conv2d(co, co, 3, 2, 1)
                ds.forward = lambda x, c=ds.conv: c(x)
            self.downs.append(tnn.ModuleList([
                _TResnet(ci, co, dim), _TResnet(co, co, dim), _TRezeroAttn(co), ds
            ]))
        mid = dims[-1]
        self.mid_block1 = _TResnet(mid, mid, dim)
        self.mid_attn = _TRezeroAttn(mid)
        self.mid_block2 = _TResnet(mid, mid, dim)
        self.ups = tnn.ModuleList()
        for ci, co in reversed(inout[1:]):
            us = tnn.Module()
            us.conv = tnn.ConvTranspose2d(ci, ci, 4, 2, 1)
            us.forward = lambda x, c=us.conv: c(x)
            self.ups.append(tnn.ModuleList([
                _TResnet(co * 2, ci, dim), _TResnet(ci, ci, dim), _TRezeroAttn(ci), us
            ]))
        self.final_block = _TBlock(dim, dim)
        self.final_conv = tnn.Conv2d(dim, 1, 1)

    def forward(self, x, mask, mu, t, spk):
        s = self.spk_mlp(spk)
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half).float() * -emb)
        emb = self.pe_scale * t.unsqueeze(1) * emb.unsqueeze(0)
        temb = self.mlp(torch.cat((emb.sin(), emb.cos()), dim=-1))
        s = s.unsqueeze(-1).repeat(1, 1, x.size(-1))
        h = torch.stack([mu, x, s], 1)
        mask = mask.unsqueeze(1)
        hiddens, masks = [], [mask]
        for r1, r2, at, ds in self.downs:
            m = masks[-1]
            h = r1(h, m, temb)
            h = r2(h, m, temb)
            h = at(h)
            hiddens.append(h)
            h = ds(h * m)
            masks.append(m[:, :, :, ::2])
        masks = masks[:-1]
        m = masks[-1]
        h = self.mid_block1(h, m, temb)
        h = self.mid_attn(h)
        h = self.mid_block2(h, m, temb)
        for r1, r2, at, us in self.ups:
            m = masks.pop()
            h = torch.cat((h, hiddens.pop()), dim=1)
            h = r1(h, m, temb)
            h = r2(h, m, temb)
            h = at(h)
            h = us(h * m)
        h = self.final_block(h, mask)
        return (self.final_conv(h * mask) * mask).squeeze(1)


def test_unet_import_parity():
    from facegantts_tpu.models.unet import GradLogPEstimator2d

    torch.manual_seed(1)
    tnet = _TUnet(dim=8, mults=(1, 2), spk_dim=16, n_feats=32).eval()
    b, f, t = 2, 32, 12
    x = torch.randn(b, f, t)
    mu = torch.randn(b, f, t)
    mask = torch.ones(b, 1, t)
    mask[1, :, 9:] = 0
    tt = torch.tensor([0.2, 0.8])
    spk = torch.randn(b, 16)
    with torch.no_grad():
        tout = tnet(x, mask, mu, tt, spk)

    # rename downsample/upsample conv keys to reference layout (<mod>.conv.*)
    sd = {k: v for k, v in tnet.state_dict().items()}
    params = ck.import_unet(sd, prefix="")
    jnet = GradLogPEstimator2d(dim=8, dim_mults=(1, 2), spk_emb_dim=16, n_feats=32)
    jout = jnet.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(mask.numpy()),
        jnp.asarray(mu.numpy()), jnp.asarray(tt.numpy()), jnp.asarray(spk.numpy()),
    )
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# HiFi-GAN
# ---------------------------------------------------------------------------

class _THifi(tnn.Module):
    """Small torch HiFi-GAN V1 generator with weight norm (bshall layout)."""

    def __init__(self, n_mels=16, ch=32, rates=(2, 2), ks=(4, 4), rks=(3, 5)):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.conv_pre = wn(tnn.Conv1d(n_mels, ch, 7, padding=3))
        self.ups = tnn.ModuleList()
        self.resblocks = tnn.ModuleList()
        for i, (r, k) in enumerate(zip(rates, ks)):
            ci, co = ch // (2**i), ch // (2 ** (i + 1))
            self.ups.append(wn(tnn.ConvTranspose1d(ci, co, k, r, (k - r) // 2)))
            for rk in rks:
                blk = tnn.Module()
                blk.convs1 = tnn.ModuleList(
                    [wn(tnn.Conv1d(co, co, rk, padding=(rk - 1) * d // 2, dilation=d)) for d in (1, 3, 5)]
                )
                blk.convs2 = tnn.ModuleList(
                    [wn(tnn.Conv1d(co, co, rk, padding=rk // 2)) for _ in (1, 3, 5)]
                )
                self.resblocks.append(blk)
        self.conv_post = wn(tnn.Conv1d(ch // (2 ** len(rates)), 1, 7, padding=3))
        self.n_res = len(rks)

    def forward(self, mel):
        x = self.conv_pre(mel)
        for i, up in enumerate(self.ups):
            x = tF.leaky_relu(x, 0.1)
            x = up(x)
            acc = None
            for j in range(self.n_res):
                blk = self.resblocks[i * self.n_res + j]
                h = x
                for c1, c2 in zip(blk.convs1, blk.convs2):
                    y = c2(tF.leaky_relu(c1(tF.leaky_relu(h, 0.1)), 0.1))
                    h = h + y
                acc = h if acc is None else acc + h
            x = acc / self.n_res
        x = tF.leaky_relu(x, 0.1)
        return torch.tanh(self.conv_post(x)).squeeze(1)


def test_hifigan_import_parity():
    from facegantts_tpu.models.hifigan import HiFiGANGenerator

    torch.manual_seed(2)
    tnet = _THifi().eval()
    mel = torch.randn(2, 16, 20)
    with torch.no_grad():
        twav = tnet(mel)

    params = ck.import_hifigan_state_dict(tnet.state_dict())
    jnet = HiFiGANGenerator(
        in_channels=16, upsample_initial_channel=32, upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4), resblock_kernel_sizes=(3, 5),
        resblock_dilations=((1, 3, 5), (1, 3, 5)),
    )
    jwav = jnet.apply({"params": params}, jnp.asarray(mel.numpy()))
    assert jwav.shape == twav.shape
    np.testing.assert_allclose(np.asarray(jwav), twav.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# SpectrogramDiscriminator
# ---------------------------------------------------------------------------

class _TDisc(tnn.Module):
    """Torch replica of the weight-normed spectrogram discriminator."""

    def __init__(self, base=8, layers=2, kh=12, kw=5, pad=6, slope=0.3):
        super().__init__()
        wn = tnn.utils.weight_norm
        self.slope = slope
        self.conv_prev = wn(tnn.Conv2d(1, base, (kh, kw), padding=(1, pad)))
        self.convs = tnn.ModuleList(
            [wn(tnn.Conv2d(base, base, (kh, kw), stride=(1, 1), padding=(1, pad)))
             for _ in range(layers)]
        )
        self.conv_post = tnn.ModuleList([
            wn(tnn.Conv2d(base, base, (3, 3), padding=(1, 1))),
            wn(tnn.Conv2d(base, 1, (3, 3), padding=(1, 1))),
        ])

    def forward(self, x):
        fmap = []
        x = tF.leaky_relu(self.conv_prev(x), self.slope)
        fmap.append(x)
        for c in self.convs:
            x = tF.leaky_relu(c(x), self.slope)
            fmap.append(x)
        x = tF.leaky_relu(self.conv_post[0](x), self.slope)
        x = self.conv_post[1](x)
        return fmap, x.flatten(1, -1)


def test_discriminator_import_parity():
    from facegantts_tpu.models.discriminator import SpectrogramDiscriminator
    from facegantts_tpu.train.checkpoint import import_discriminator

    torch.manual_seed(3)
    tnet = _TDisc().eval()
    x = torch.randn(2, 1, 128, 24)
    with torch.no_grad():
        tfmap, tlogits = tnet(x)

    params = import_discriminator(tnet.state_dict(), prefix="")
    jnet = SpectrogramDiscriminator(base_channels=8, num_layers=2, multi_speaker=0)
    jfmap, jlogits = jnet.apply(
        {"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    assert len(jfmap) == len(tfmap)
    np.testing.assert_allclose(np.asarray(jlogits), tlogits.numpy(), atol=2e-4)
