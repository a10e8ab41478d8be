"""CFD (Chicago Face Database) face cropping CLI (reference
cfd_cropping/cfd_detect.py:21-83, C25).

Prepares MOS-test face images: walk a directory of portrait photos, detect
the face, crop it, and write ``<name>_face<i>.png`` crops.  The reference
depends on the external DSFD detector repo (a torch model that must be
downloaded); this version uses cv2's bundled Haar cascade — no model
download, no torch — with the same pipeline shape: aspect-preserving
thumbnail to <= 500 px, detect, crop, save.  When detection finds nothing,
an aspect-preserving center crop is written instead so every input yields a
usable conditioning image (``--strict`` disables that fallback).

Usage:
  python -m facegantts_tpu.data.cfd_crop source_dir=<photos> \
      target_dir=<out> [size=224] [strict=0]
"""

import os
import sys
from typing import List, Optional, Tuple

import numpy as np

from facegantts_tpu.config import parse_cli_overrides


def thumbnail(img: np.ndarray, max_side: int = 500) -> np.ndarray:
    """Aspect-preserving downscale so max(h, w) <= max_side."""
    import cv2

    h, w = img.shape[:2]
    s = max_side / max(h, w)
    if s >= 1.0:
        return img
    return cv2.resize(img, (int(w * s), int(h * s)), interpolation=cv2.INTER_AREA)


def _iou(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
    if inter == 0:
        return 0.0
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])  # noqa: E731
    return inter / float(area(a) + area(b) - inter)


_RETINA = None  # configured models.retinaface.RetinaFaceDetector
_RETINA_CHECKED = False


def configure_retinaface(ckpt: str, **kw) -> None:
    """Route ALL detect_faces calls through the real RetinaFace detector
    (models/retinaface.py) loaded from a mobilenet0.25 torch checkpoint —
    the detector the reference's labeling uses (labeling.py:6,48).  Called
    automatically when ``cfg.retinaface_ckpt`` / ``$RETINAFACE_CKPT`` is
    set; pass ``ckpt=''`` to clear back to the Haar-cascade ensemble."""
    global _RETINA, _RETINA_CHECKED
    _RETINA_CHECKED = True
    if not ckpt:
        _RETINA = None
        return
    from facegantts_tpu.models.retinaface import RetinaFaceDetector

    _RETINA = RetinaFaceDetector(ckpt, **kw)


def _retina_detector():
    global _RETINA_CHECKED
    if not _RETINA_CHECKED:
        configure_retinaface(os.environ.get("RETINAFACE_CKPT", ""))
    return _RETINA


def detect_faces(img_bgr: np.ndarray) -> List[Tuple[int, int, int, int]]:
    """Face detections as (x1, y1, x2, y2), largest first.

    With a configured RetinaFace checkpoint (``configure_retinaface`` /
    ``$RETINAFACE_CKPT``), detection is the real thing — same model family
    as the reference's labeling.py.  Otherwise: ensemble of cv2's bundled
    Haar cascades — frontal default, frontal alt2, and profile in both
    orientations — over an equalized grayscale, merged with IoU-0.4
    non-max suppression.  The reference uses RetinaFace / DSFD (downloaded
    torch models, labeling.py:35-98 / cfd_detect.py); no detector weights
    ship in this image, so the ensemble is the strongest zero-download
    fallback: alt2 recovers tilted/soft-lit faces the default cascade
    misses, the mirrored profile pass recovers side-on LRS2 frames.

    Headless-lite cv2 builds ship without the objdetect module; detection
    then returns [] and callers fall back to center crops."""
    det = _retina_detector()
    if det is not None:
        boxes = [b[:4] for b in det(img_bgr)]
        boxes.sort(key=lambda b: (b[2] - b[0]) * (b[3] - b[1]), reverse=True)
        return boxes
    import cv2

    if not hasattr(cv2, "CascadeClassifier") or not hasattr(cv2, "data"):
        return []
    gray = cv2.equalizeHist(cv2.cvtColor(img_bgr, cv2.COLOR_BGR2GRAY))
    w_img = gray.shape[1]
    boxes: List[Tuple[int, int, int, int]] = []
    for name, flip in (
        ("haarcascade_frontalface_default.xml", False),
        ("haarcascade_frontalface_alt2.xml", False),
        ("haarcascade_profileface.xml", False),
        ("haarcascade_profileface.xml", True),  # cascade is left-profile only
    ):
        cascade = cv2.CascadeClassifier(cv2.data.haarcascades + name)
        if cascade.empty():
            continue
        g = cv2.flip(gray, 1) if flip else gray
        rects = cascade.detectMultiScale(g, scaleFactor=1.1, minNeighbors=5,
                                         minSize=(48, 48))
        for x, y, w, h in rects:
            if flip:
                x = w_img - x - w
            boxes.append((x, y, x + w, y + h))
    boxes.sort(key=lambda b: (b[2] - b[0]) * (b[3] - b[1]), reverse=True)
    kept: List[Tuple[int, int, int, int]] = []
    for b in boxes:  # NMS: keep the largest of each overlapping cluster
        if all(_iou(b, k) < 0.4 for k in kept):
            kept.append(b)
    return kept


def center_square_crop(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    s = min(h, w)
    y0, x0 = (h - s) // 2, (w - s) // 2
    return img[y0:y0 + s, x0:x0 + s]


def expand_box(box, shape, margin: float = 0.25) -> Tuple[int, int, int, int]:
    """Grow the detection by `margin` on each side, clamped to the image
    (Haar boxes are tight around the eyes/mouth; conditioning wants the
    whole head like the reference's DSFD boxes)."""
    x1, y1, x2, y2 = box
    mw, mh = int((x2 - x1) * margin), int((y2 - y1) * margin)
    h, w = shape[:2]
    return (max(0, x1 - mw), max(0, y1 - mh), min(w, x2 + mw), min(h, y2 + mh))


def crop_faces(path: str, size: Optional[int] = None,
               strict: bool = False) -> List[np.ndarray]:
    """All face crops from one image (BGR arrays, optionally resized square)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        return []
    img = thumbnail(img)
    boxes = detect_faces(img)
    crops = [img[y1:y2, x1:x2] for x1, y1, x2, y2 in
             (expand_box(b, img.shape) for b in boxes)]
    if not crops and not strict:
        crops = [center_square_crop(img)]
    if size:
        crops = [cv2.resize(c, (size, size), interpolation=cv2.INTER_AREA)
                 for c in crops]
    return crops


def process_dir(source_dir: str, target_dir: str, size: Optional[int] = None,
                strict: bool = False) -> int:
    import cv2

    os.makedirs(target_dir, exist_ok=True)
    n = 0
    for base, _, files in os.walk(source_dir):
        for f in sorted(files):
            if not f.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            stem = os.path.splitext(f)[0]
            for i, crop in enumerate(crop_faces(os.path.join(base, f), size, strict)):
                out = os.path.join(target_dir, f"{stem}_face{i}.png")
                cv2.imwrite(out, crop)
                n += 1
    print(f"wrote {n} face crops -> {target_dir}")
    return n


def main(argv=None):
    kv = parse_cli_overrides(argv if argv is not None else sys.argv[1:])
    src, dst = kv.get("source_dir"), kv.get("target_dir")
    if not src or not dst:
        raise SystemExit(__doc__)
    size = int(kv["size"]) if "size" in kv else None
    process_dir(src, dst, size, strict=str(kv.get("strict", "0")) == "1")


if __name__ == "__main__":
    main()
