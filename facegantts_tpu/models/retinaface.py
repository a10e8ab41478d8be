"""RetinaFace (MobileNetV1-0.25) face detector — architecture + importer.

The reference's speaker re-ID labeling detects faces with the RetinaFace
package (reference lrs2_preprocessing/labeling.py:6,48) and its CFD pipeline
uses the DSFD torch model (cfd_cropping/cfd_detect.py); both pull downloaded
detector weights.  No detector weights ship in this image, so by default the
framework falls back to the Haar-cascade ensemble (data/cfd_crop.py) — but
an operator who supplies the standard public ``mobilenet0.25_Final.pth``
checkpoint (biubug6/Pytorch_Retinaface state-dict layout, the torch weights
the `retinaface` pip wrappers load) gets the real detector through this
module: the full architecture in Flax/NHWC plus a state-dict importer.

TPU-first design choices vs the torch original:
- NHWC throughout; every BatchNorm is folded into the preceding conv at
  import time (detection is eval-only), so the network is a pure
  conv+leaky-relu stack that XLA fuses tightly.
- Fixed-size letterboxed input (default 640x640, must be divisible by 32):
  one compile, static shapes; anchors are precomputed host-side once.
- Box/landmark decode runs vectorized inside the jitted forward; only
  thresholding + NMS happen on host (tiny arrays).

Layer inventory mirrored from the public Pytorch_Retinaface ``net.py`` /
``models/retinaface.py``:
  MobileNetV1-0.25 body (stage1: 8-16-32-32-64-64 @ stride 8,
  stage2: 128x6 @ 16, stage3: 256x2 @ 32), FPN(out=64) with nearest
  top-down merges, three SSH context modules, and per-level 1x1
  Class/Bbox/Landmark heads with 2 anchors per cell
  (min_sizes [[16,32],[64,128],[256,512]], steps [8,16,32],
  variances [0.1, 0.2]).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # jax is always present in this image; guard keeps import cheap for docs
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
except Exception:  # pragma: no cover
    jax = None

BGR_MEAN = (104.0, 117.0, 123.0)  # detect.py preprocessing (BGR, no scaling)
MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)


# ---------------------------------------------------------------------------
# modules (BN pre-folded: plain convs with bias)
# ---------------------------------------------------------------------------


class ConvUnit(nn.Module):
    """conv(k,s, torch-style symmetric k//2 padding) [+ leaky-relu].

    ``slope``: None = linear (conv_bn_no_relu), 0.0 = relu, >0 = leaky.
    ``depthwise``: groups == in-channels (MobileNet dw conv).
    """

    out: int
    kernel: int = 3
    stride: int = 1
    slope: Optional[float] = 0.1
    depthwise: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(
            self.out,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=x.shape[-1] if self.depthwise else 1,
            name="conv",
        )(x)
        if self.slope is None:
            return x
        return nn.leaky_relu(x, negative_slope=self.slope)


class ConvDW(nn.Module):
    """MobileNet depthwise-separable block: dw3x3 + pw1x1, leaky 0.1 each."""

    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = ConvUnit(x.shape[-1], 3, self.stride, 0.1, depthwise=True, name="dw")(x)
        return ConvUnit(self.out, 1, 1, 0.1, name="pw")(x)


class SSH(nn.Module):
    """Context module: 3x3 + stacked-5x5 + stacked-7x7 branches, relu(cat)."""

    out: int
    slope: float = 0.1  # out<=64 in the mobile0.25 config

    @nn.compact
    def __call__(self, x):
        c3 = ConvUnit(self.out // 2, 3, 1, None, name="conv3x3")(x)
        c5_1 = ConvUnit(self.out // 4, 3, 1, self.slope, name="conv5x5_1")(x)
        c5 = ConvUnit(self.out // 4, 3, 1, None, name="conv5x5_2")(c5_1)
        c7_2 = ConvUnit(self.out // 4, 3, 1, self.slope, name="conv7x7_2")(c5_1)
        c7 = ConvUnit(self.out // 4, 3, 1, None, name="conv7x7_3")(c7_2)
        return nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class RetinaFace(nn.Module):
    """MobileNet0.25 body + FPN + SSH + heads.  Input: (B, H, W, 3) float32
    BGR with ``BGR_MEAN`` already subtracted, H and W divisible by 32.

    Returns (loc (B, A, 4), conf (B, A, 2) softmaxed, ldm (B, A, 10)) with
    A = 2 * (HW/64 + HW/256 + HW/1024) anchors in PriorBox order."""

    fpn_out: int = 64
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x):
        # ---- body -------------------------------------------------------
        h = ConvUnit(8, 3, 2, 0.1, name="stage1_0")(x)
        h = ConvDW(16, 1, name="stage1_1")(h)
        h = ConvDW(32, 2, name="stage1_2")(h)
        h = ConvDW(32, 1, name="stage1_3")(h)
        h = ConvDW(64, 2, name="stage1_4")(h)
        h = ConvDW(64, 1, name="stage1_5")(h)
        f1 = h  # 64ch, stride 8
        h = ConvDW(128, 2, name="stage2_0")(h)
        for i in range(1, 6):
            h = ConvDW(128, 1, name=f"stage2_{i}")(h)
        f2 = h  # 128ch, stride 16
        h = ConvDW(256, 2, name="stage3_0")(h)
        f3 = ConvDW(256, 1, name="stage3_1")(h)  # 256ch, stride 32

        # ---- FPN --------------------------------------------------------
        slope = 0.1 if self.fpn_out <= 64 else 0.0
        o1 = ConvUnit(self.fpn_out, 1, 1, slope, name="fpn_output1")(f1)
        o2 = ConvUnit(self.fpn_out, 1, 1, slope, name="fpn_output2")(f2)
        o3 = ConvUnit(self.fpn_out, 1, 1, slope, name="fpn_output3")(f3)
        o2 = o2 + _nearest_x2(o3)
        o2 = ConvUnit(self.fpn_out, 3, 1, slope, name="fpn_merge2")(o2)
        o1 = o1 + _nearest_x2(o2)
        o1 = ConvUnit(self.fpn_out, 3, 1, slope, name="fpn_merge1")(o1)

        # ---- SSH + heads ------------------------------------------------
        feats = [
            SSH(self.fpn_out, slope, name="ssh1")(o1),
            SSH(self.fpn_out, slope, name="ssh2")(o2),
            SSH(self.fpn_out, slope, name="ssh3")(o3),
        ]
        locs, confs, ldms = [], [], []
        for i, f in enumerate(feats):
            b = f.shape[0]
            # NHWC conv output already matches torch's permute(0,2,3,1);
            # reshape keeps the (cell-major, anchor-minor) PriorBox order
            loc = nn.Conv(self.num_anchors * 4, (1, 1), name=f"bbox_head{i}")(f)
            cls = nn.Conv(self.num_anchors * 2, (1, 1), name=f"class_head{i}")(f)
            ldm = nn.Conv(self.num_anchors * 10, (1, 1), name=f"ldm_head{i}")(f)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(cls.reshape(b, -1, 2))
            ldms.append(ldm.reshape(b, -1, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        ldm = jnp.concatenate(ldms, axis=1)
        return loc, conf, ldm


def _nearest_x2(x):
    """F.interpolate(mode='nearest') to exactly double H, W (inputs are
    /32-divisible so every FPN level is an exact 2x of the next)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# anchors + decode
# ---------------------------------------------------------------------------


def prior_boxes(height: int, width: int) -> np.ndarray:
    """PriorBox anchors (A, 4) as (cx, cy, w, h) in relative coords —
    cell-major within each level, anchor-minor (matches head reshape)."""
    anchors = []
    for (step, sizes) in zip(STEPS, MIN_SIZES):
        fh, fw = math.ceil(height / step), math.ceil(width / step)
        ii, jj = np.meshgrid(np.arange(fh), np.arange(fw), indexing="ij")
        cx = (jj.reshape(-1, 1) + 0.5) * step / width
        cy = (ii.reshape(-1, 1) + 0.5) * step / height
        for_cell = []
        for ms in sizes:
            skx = np.full_like(cx, ms / width, dtype=np.float64)
            sky = np.full_like(cy, ms / height, dtype=np.float64)
            for_cell.append(np.concatenate([cx, cy, skx, sky], axis=1))
        # interleave anchors per cell: (cells, n_sizes, 4)
        anchors.append(np.stack(for_cell, axis=1).reshape(-1, 4))
    return np.concatenate(anchors, axis=0).astype(np.float32)


def decode_boxes(loc, priors):
    """SSD-style decode to (x1, y1, x2, y2) relative coords (box_utils.decode)."""
    v0, v1 = VARIANCES
    xy = priors[:, :2] + loc[..., :2] * v0 * priors[:, 2:]
    wh = priors[:, 2:] * jnp.exp(loc[..., 2:] * v1)
    x1y1 = xy - wh / 2
    return jnp.concatenate([x1y1, x1y1 + wh], axis=-1)


def decode_landmarks(ldm, priors):
    v0 = VARIANCES[0]
    pts = ldm.reshape(*ldm.shape[:-1], 5, 2)
    out = priors[:, None, :2] + pts * v0 * priors[:, None, 2:]
    return out.reshape(*ldm.shape[:-1], 10)


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float = 0.4) -> List[int]:
    """Greedy IoU NMS on host (post-threshold candidate sets are tiny)."""
    order = np.argsort(-scores)
    keep: List[int] = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        x1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area = lambda b: (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])  # noqa: E731
        iou = inter / (area(boxes[i]) + area(boxes[rest]) - inter + 1e-12)
        order = rest[iou <= iou_threshold]
    return keep


# ---------------------------------------------------------------------------
# torch state-dict importer (BN folding)
# ---------------------------------------------------------------------------


def _fold(sd: Dict[str, Any], conv: str, bn: Optional[str], depthwise: bool):
    """torch conv(+BN) -> flax {'kernel','bias'}, BN folded (eval-only)."""
    w = np.asarray(sd[conv + ".weight"], np.float32)  # (O, I/g, kh, kw)
    b = (np.asarray(sd[conv + ".bias"], np.float32)
         if conv + ".bias" in sd else np.zeros(w.shape[0], np.float32))
    if bn is not None:
        gamma = np.asarray(sd[bn + ".weight"], np.float32)
        beta = np.asarray(sd[bn + ".bias"], np.float32)
        mean = np.asarray(sd[bn + ".running_mean"], np.float32)
        var = np.asarray(sd[bn + ".running_var"], np.float32)
        scale = gamma / np.sqrt(var + 1e-5)  # torch BatchNorm2d eps
        w = w * scale[:, None, None, None]
        b = beta + (b - mean) * scale
    if depthwise:
        # torch dw (C, 1, kh, kw) -> flax (kh, kw, 1, C)
        k = np.transpose(w, (2, 3, 1, 0))
    else:
        k = np.transpose(w, (2, 3, 1, 0))
    return {"kernel": k, "bias": b}


def import_retinaface(src) -> Dict[str, Any]:
    """biubug6/Pytorch_Retinaface ``mobilenet0.25`` state-dict (path or
    loaded dict) -> flax params for :class:`RetinaFace` (BN folded)."""
    if isinstance(src, (str, bytes)):
        import torch

        sd = torch.load(src, map_location="cpu", weights_only=True)
    else:
        sd = src
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}

    params: Dict[str, Any] = {}

    def conv_bn(flax_name: str, torch_seq: str):
        params[flax_name] = {"conv": _fold(sd, torch_seq + ".0", torch_seq + ".1", False)}

    def conv_dw(flax_name: str, torch_seq: str):
        params[flax_name] = {
            "dw": {"conv": _fold(sd, torch_seq + ".0", torch_seq + ".1", True)},
            "pw": {"conv": _fold(sd, torch_seq + ".3", torch_seq + ".4", False)},
        }

    conv_bn("stage1_0", "body.stage1.0")
    for i in range(1, 6):
        conv_dw(f"stage1_{i}", f"body.stage1.{i}")
    for i in range(6):
        conv_dw(f"stage2_{i}", f"body.stage2.{i}")
    for i in range(2):
        conv_dw(f"stage3_{i}", f"body.stage3.{i}")
    for name in ("output1", "output2", "output3", "merge1", "merge2"):
        conv_bn(f"fpn_{name}", f"fpn.{name}")
    for i in (1, 2, 3):
        params[f"ssh{i}"] = {
            "conv3x3": {"conv": _fold(sd, f"ssh{i}.conv3X3.0", f"ssh{i}.conv3X3.1", False)},
            "conv5x5_1": {"conv": _fold(sd, f"ssh{i}.conv5X5_1.0", f"ssh{i}.conv5X5_1.1", False)},
            "conv5x5_2": {"conv": _fold(sd, f"ssh{i}.conv5X5_2.0", f"ssh{i}.conv5X5_2.1", False)},
            "conv7x7_2": {"conv": _fold(sd, f"ssh{i}.conv7X7_2.0", f"ssh{i}.conv7X7_2.1", False)},
            # upstream's one lowercase-x key
            "conv7x7_3": {"conv": _fold(sd, f"ssh{i}.conv7x7_3.0", f"ssh{i}.conv7x7_3.1", False)},
        }
    for i in range(3):
        params[f"class_head{i}"] = _fold(sd, f"ClassHead.{i}.conv1x1", None, False)
        params[f"bbox_head{i}"] = _fold(sd, f"BboxHead.{i}.conv1x1", None, False)
        params[f"ldm_head{i}"] = _fold(sd, f"LandmarkHead.{i}.conv1x1", None, False)
    return params


# ---------------------------------------------------------------------------
# detector front-end
# ---------------------------------------------------------------------------


class RetinaFaceDetector:
    """Host-friendly detector: letterbox -> jitted forward+decode -> NMS.

    One compile for the configured ``input_size``; results are pixel-space
    (x1, y1, x2, y2, score) in the ORIGINAL image frame, largest-area first
    is NOT applied here (callers sort as needed; scores are descending)."""

    def __init__(self, ckpt, input_size: int = 640,
                 score_threshold: float = 0.8, nms_threshold: float = 0.4):
        if input_size % 32:
            raise ValueError("input_size must be divisible by 32")
        self.size = input_size
        self.score_threshold = score_threshold
        self.nms_threshold = nms_threshold
        self.params = import_retinaface(ckpt) if not isinstance(ckpt, dict) else ckpt
        self.model = RetinaFace()
        priors = jnp.asarray(prior_boxes(input_size, input_size))

        def fwd(img):  # (1, S, S, 3) mean-subtracted BGR
            loc, conf, _ = self.model.apply({"params": self.params}, img)
            return decode_boxes(loc[0], priors), conf[0, :, 1]

        self._fwd = jax.jit(fwd)

    def __call__(self, img_bgr: np.ndarray) -> List[Tuple[int, int, int, int, float]]:
        h, w = img_bgr.shape[:2]
        scale = self.size / max(h, w)
        nh, nw = max(1, round(h * scale)), max(1, round(w * scale))
        resized = _resize_bilinear(img_bgr.astype(np.float32), nh, nw)
        canvas = np.zeros((self.size, self.size, 3), np.float32)
        canvas[:nh, :nw] = resized
        canvas -= np.asarray(BGR_MEAN, np.float32)
        boxes, scores = self._fwd(canvas[None])
        boxes = np.asarray(boxes) * self.size  # letterbox pixel coords
        scores = np.asarray(scores)
        keep = scores >= self.score_threshold
        boxes, scores = boxes[keep], scores[keep]
        if not len(boxes):
            return []
        sel = nms(boxes, scores, self.nms_threshold)
        out = []
        for i in sel:
            x1, y1, x2, y2 = (boxes[i] / scale)
            x1, y1 = max(0, int(round(x1))), max(0, int(round(y1)))
            x2, y2 = min(w, int(round(x2))), min(h, int(round(y2)))
            if x2 > x1 and y2 > y1:
                out.append((x1, y1, x2, y2, float(scores[i])))
        return out


def _resize_bilinear(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """cv2-free bilinear resize (cv2 may be a headless-lite build)."""
    try:
        import cv2

        return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    except Exception:
        h, w = img.shape[:2]
        ys = (np.arange(nh) + 0.5) * h / nh - 0.5
        xs = (np.arange(nw) + 0.5) * w / nw - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        wy = np.clip(ys - y0, 0, 1)[:, None, None]
        wx = np.clip(xs - x0, 0, 1)[None, :, None]
        a = img[y0][:, x0] * (1 - wy) * (1 - wx) + img[y0][:, x1] * (1 - wy) * wx
        b = img[y1][:, x0] * wy * (1 - wx) + img[y1][:, x1] * wy * wx
        return (a + b).astype(img.dtype)
