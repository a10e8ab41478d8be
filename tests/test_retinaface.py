"""RetinaFace detector: torch-replica import parity + anchor/decode/NMS.

The replica below reproduces the public Pytorch_Retinaface mobilenet0.25
module layout AND state-dict key names (body.stageN.i sequentials, fpn,
sshN, ClassHead/BboxHead/LandmarkHead module lists) so the importer's
key mapping and BN folding are exercised against real naming, with
randomized BN running stats (folding must be numerically active).
"""

import math
from itertools import product

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from facegantts_tpu.models.retinaface import (  # noqa: E402
    RetinaFace,
    RetinaFaceDetector,
    decode_boxes,
    import_retinaface,
    nms,
    prior_boxes,
)


# ---------------------------------------------------------------------------
# torch replica (upstream net.py / models/retinaface.py layout + names)
# ---------------------------------------------------------------------------

def conv_bn(inp, oup, stride=1, leaky=0.1):
    return tnn.Sequential(
        tnn.Conv2d(inp, oup, 3, stride, 1, bias=False),
        tnn.BatchNorm2d(oup),
        tnn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


def conv_bn1x1(inp, oup, stride=1, leaky=0.0):
    return tnn.Sequential(
        tnn.Conv2d(inp, oup, 1, stride, 0, bias=False),
        tnn.BatchNorm2d(oup),
        tnn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


def conv_bn_no_relu(inp, oup, stride=1):
    return tnn.Sequential(
        tnn.Conv2d(inp, oup, 3, stride, 1, bias=False),
        tnn.BatchNorm2d(oup),
    )


def conv_dw(inp, oup, stride, leaky=0.1):
    return tnn.Sequential(
        tnn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
        tnn.BatchNorm2d(inp),
        tnn.LeakyReLU(negative_slope=leaky, inplace=True),
        tnn.Conv2d(inp, oup, 1, 1, 0, bias=False),
        tnn.BatchNorm2d(oup),
        tnn.LeakyReLU(negative_slope=leaky, inplace=True),
    )


class MobileNetV1(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stage1 = tnn.Sequential(
            conv_bn(3, 8, 2, leaky=0.1), conv_dw(8, 16, 1), conv_dw(16, 32, 2),
            conv_dw(32, 32, 1), conv_dw(32, 64, 2), conv_dw(64, 64, 1))
        self.stage2 = tnn.Sequential(
            conv_dw(64, 128, 2), conv_dw(128, 128, 1), conv_dw(128, 128, 1),
            conv_dw(128, 128, 1), conv_dw(128, 128, 1), conv_dw(128, 128, 1))
        self.stage3 = tnn.Sequential(conv_dw(128, 256, 2), conv_dw(256, 256, 1))

    def forward(self, x):
        f1 = self.stage1(x)
        f2 = self.stage2(f1)
        f3 = self.stage3(f2)
        return f1, f2, f3


class TFPN(tnn.Module):
    def __init__(self, ins=(64, 128, 256), out=64):
        super().__init__()
        leaky = 0.1 if out <= 64 else 0.0
        self.output1 = conv_bn1x1(ins[0], out, 1, leaky)
        self.output2 = conv_bn1x1(ins[1], out, 1, leaky)
        self.output3 = conv_bn1x1(ins[2], out, 1, leaky)
        self.merge1 = conv_bn(out, out, leaky=leaky)
        self.merge2 = conv_bn(out, out, leaky=leaky)

    def forward(self, f1, f2, f3):
        o1, o2, o3 = self.output1(f1), self.output2(f2), self.output3(f3)
        o2 = self.merge2(o2 + F.interpolate(o3, size=o2.shape[2:], mode="nearest"))
        o1 = self.merge1(o1 + F.interpolate(o2, size=o1.shape[2:], mode="nearest"))
        return o1, o2, o3


class TSSH(tnn.Module):
    def __init__(self, inp=64, out=64):
        super().__init__()
        leaky = 0.1 if out <= 64 else 0.0
        self.conv3X3 = conv_bn_no_relu(inp, out // 2)
        self.conv5X5_1 = conv_bn(inp, out // 4, leaky=leaky)
        self.conv5X5_2 = conv_bn_no_relu(out // 4, out // 4)
        self.conv7X7_2 = conv_bn(out // 4, out // 4, leaky=leaky)
        self.conv7x7_3 = conv_bn_no_relu(out // 4, out // 4)  # upstream casing

    def forward(self, x):
        c3 = self.conv3X3(x)
        c5_1 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(c5_1)
        c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
        return F.relu(torch.cat([c3, c5, c7], dim=1))


class THead(tnn.Module):
    def __init__(self, d, inp=64, anchors=2):
        super().__init__()
        self.d = d
        self.conv1x1 = tnn.Conv2d(inp, anchors * d, 1)

    def forward(self, x):
        out = self.conv1x1(x).permute(0, 2, 3, 1).contiguous()
        return out.view(out.shape[0], -1, self.d)


class TorchRetinaFace(tnn.Module):
    def __init__(self):
        super().__init__()
        self.body = MobileNetV1()
        self.fpn = TFPN()
        self.ssh1, self.ssh2, self.ssh3 = TSSH(), TSSH(), TSSH()
        self.ClassHead = tnn.ModuleList([THead(2) for _ in range(3)])
        self.BboxHead = tnn.ModuleList([THead(4) for _ in range(3)])
        self.LandmarkHead = tnn.ModuleList([THead(10) for _ in range(3)])

    def forward(self, x):
        feats = self.fpn(*self.body(x))
        feats = [self.ssh1(feats[0]), self.ssh2(feats[1]), self.ssh3(feats[2])]
        loc = torch.cat([self.BboxHead[i](f) for i, f in enumerate(feats)], 1)
        conf = torch.cat([self.ClassHead[i](f) for i, f in enumerate(feats)], 1)
        ldm = torch.cat([self.LandmarkHead[i](f) for i, f in enumerate(feats)], 1)
        return loc, F.softmax(conf, dim=-1), ldm


def _randomized_replica(seed=0):
    torch.manual_seed(seed)
    net = TorchRetinaFace()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
            elif isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.15)
                if m.bias is not None:
                    m.bias.normal_(0, 0.1)
    return net.eval()


def test_import_parity_vs_torch_replica():
    net = _randomized_replica()
    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32) * 10
    with torch.no_grad():
        tloc, tconf, tldm = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    params = import_retinaface({k: v for k, v in net.state_dict().items()})
    jloc, jconf, jldm = RetinaFace().apply({"params": params}, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(jloc), tloc.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jconf), tconf.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jldm), tldm.numpy(), atol=2e-3, rtol=1e-3)


def test_prior_boxes_match_upstream_loop():
    h = w = 64
    # direct transcription of upstream PriorBox.forward ordering
    expected = []
    min_sizes = [[16, 32], [64, 128], [256, 512]]
    steps = [8, 16, 32]
    fmaps = [[math.ceil(h / s), math.ceil(w / s)] for s in steps]
    for k, f in enumerate(fmaps):
        for i, j in product(range(f[0]), range(f[1])):
            for ms in min_sizes[k]:
                expected.append([(j + 0.5) * steps[k] / w, (i + 0.5) * steps[k] / h,
                                 ms / w, ms / h])
    np.testing.assert_allclose(prior_boxes(h, w), np.asarray(expected, np.float32),
                               atol=1e-6)


def test_decode_and_nms():
    priors = prior_boxes(64, 64)
    # zero offsets decode to the anchors themselves (cxcywh -> xyxy)
    boxes = np.asarray(decode_boxes(jnp.zeros((priors.shape[0], 4)), jnp.asarray(priors)))
    ref = np.concatenate([priors[:, :2] - priors[:, 2:] / 2,
                          priors[:, :2] + priors[:, 2:] / 2], axis=1)
    np.testing.assert_allclose(boxes, ref, atol=1e-6)

    b = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], np.float32)
    s = np.array([0.9, 0.8, 0.7], np.float32)
    assert nms(b, s, 0.4) == [0, 2]  # near-duplicate suppressed, far box kept


def test_detector_end_to_end_smoke():
    net = _randomized_replica(seed=2)
    params = import_retinaface(dict(net.state_dict()))
    det = RetinaFaceDetector(params, input_size=64, score_threshold=0.0,
                             nms_threshold=0.4)
    img = (np.random.RandomState(3).rand(100, 80, 3) * 255).astype(np.uint8)
    out = det(img)
    assert isinstance(out, list) and len(out) >= 1
    for x1, y1, x2, y2, score in out:
        assert 0 <= x1 < x2 <= 80 and 0 <= y1 < y2 <= 100
        assert 0.0 <= score <= 1.0
    # scores are descending after NMS ordering
    scores = [b[4] for b in out]
    assert scores == sorted(scores, reverse=True)


def test_cfd_crop_routes_through_configured_detector(monkeypatch):
    from facegantts_tpu.data import cfd_crop

    calls = {}

    class Fake:
        def __call__(self, img):
            calls["img"] = img.shape
            return [(5, 5, 20, 20, 0.9), (0, 0, 50, 60, 0.8)]

    monkeypatch.setattr(cfd_crop, "_RETINA", Fake())
    monkeypatch.setattr(cfd_crop, "_RETINA_CHECKED", True)
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = cfd_crop.detect_faces(img)
    assert calls["img"] == (64, 64, 3)
    assert boxes == [(0, 0, 50, 60), (5, 5, 20, 20)]  # largest first, no scores
