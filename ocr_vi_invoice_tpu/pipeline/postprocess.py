"""DB probability map -> polygon boxes (host postprocessing).

Equivalent of `src/det/test.py:20-106` with zero OpenCV/pyclipper/shapely
on the default path: contour tracing (Suzuki-Abe), Douglas-Peucker
simplification, polygon fill, and the exact Euclidean distance transform
all come from the first-party C++ module (``native/src/native_ops.cpp``),
with cv2 demoted to a fallback inside ``native`` when the shared library
cannot be built. The polygon *unclip* (outward offset by
``area*ratio/length`` with round joins) is computed in raster space —
fill the polygon in a padded local window, threshold the exact EDT at
the offset distance, and trace the expanded contour. The reference's
Vatti offset with JT_ROUND produces the same region by definition
(Minkowski sum with a disc).

An on-device (jit) box-extraction path lives in ``ops/cc.py`` for the
fused pipeline; this module is the exact-parity host reference.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ocr_vi_invoice_tpu import native
from ocr_vi_invoice_tpu.utils.config import PostProcessConfig


def box_score_fast(bitmap: np.ndarray, box: np.ndarray) -> float:
    """Mean probability inside the polygon (within its bbox window)."""
    h, w = bitmap.shape[:2]
    if len(box) == 0:
        return 0.0
    box = box.copy()
    xmin = np.clip(np.floor(box[:, 0].min()).astype(int), 0, w - 1)
    xmax = np.clip(np.ceil(box[:, 0].max()).astype(int), 0, w - 1)
    ymin = np.clip(np.floor(box[:, 1].min()).astype(int), 0, h - 1)
    ymax = np.clip(np.ceil(box[:, 1].max()).astype(int), 0, h - 1)
    box[:, 0] -= xmin
    box[:, 1] -= ymin
    mask = native.fill_poly(
        (ymax - ymin + 1, xmax - xmin + 1),
        box.astype(np.int32).astype(np.float32),  # truncate like cv2.fillPoly int cast
    )
    region = bitmap[ymin : ymax + 1, xmin : xmax + 1]
    denom = mask.sum()
    return float((region * mask).sum() / denom) if denom > 0 else 0.0


def unclip(box: np.ndarray, unclip_ratio: float = 1.5) -> Optional[np.ndarray]:
    """Outward polygon offset by d = A·ratio/L with round joins (raster)."""
    area = native.polygon_area(box)
    length = native.polygon_perimeter(box)
    if length < 1e-6:
        return None
    d = area * unclip_ratio / length
    pad = int(np.ceil(d)) + 2

    x0, y0 = np.floor(box.min(axis=0)).astype(int) - pad
    x1, y1 = np.ceil(box.max(axis=0)).astype(int) + pad
    w, h = x1 - x0 + 1, y1 - y0 + 1
    local = box.astype(np.float32) - [x0, y0]

    mask = native.fill_poly((h, w), local.astype(np.int32).astype(np.float32))
    if mask.sum() == 0:
        return None
    dist_out = native.edt(1 - mask)
    expanded = ((mask > 0) | (dist_out <= d)).astype(np.uint8)
    contours = native.find_contours(expanded)
    if not contours:
        return None
    cnt = max(contours, key=native.polygon_area)
    return cnt.astype(np.float32) + [x0, y0]


class DBPostProcessor:
    """Prob map (1, H, W) or (H, W) -> (boxes, scores)."""

    def __init__(
        self,
        thresh: float = 0.3,
        box_thresh: float = 0.6,
        max_candidates: int = 1000,
        unclip_ratio: float = 1.5,
        min_size: int = 3,
        min_area: float = 10.0,
    ):
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = min_size
        self.min_area = min_area

    @classmethod
    def from_config(cls, cfg: PostProcessConfig) -> "DBPostProcessor":
        return cls(cfg.thresh, cfg.box_thresh, cfg.max_candidates,
                   cfg.unclip_ratio, cfg.min_size, cfg.min_area)

    def __call__(self, pred: np.ndarray) -> Tuple[List[np.ndarray], List[float]]:
        pred = np.asarray(pred)
        if pred.ndim == 3:
            pred = pred[0] if pred.shape[0] == 1 else pred[..., 0]
        segmentation = (pred > self.thresh).astype(np.uint8)
        contours = native.find_contours(segmentation)
        boxes: List[np.ndarray] = []
        scores: List[float] = []
        for i, contour in enumerate(contours):
            if i >= self.max_candidates:
                break
            epsilon = 0.002 * native.polygon_perimeter(contour)
            points = native.approx_poly_dp(contour, epsilon)
            if points.shape[0] < 4:
                continue
            score = box_score_fast(pred, points)
            if score < self.box_thresh:
                continue
            if native.polygon_area(points) < self.min_area:
                continue
            expanded = unclip(points, self.unclip_ratio)
            if expanded is None or len(expanded) < 4:
                continue
            boxes.append(expanded)
            scores.append(score)
        return boxes, scores


def crop_image(img: np.ndarray, box: np.ndarray) -> np.ndarray:
    """Axis-aligned crop of the box's bounding rect (`test.py:123-130`)."""
    h, w = img.shape[:2]
    pts = box.astype(np.int64)  # truncation, matching cv2.boundingRect on int-cast boxes
    x, y = int(pts[:, 0].min()), int(pts[:, 1].min())
    bw = int(pts[:, 0].max()) - x + 1
    bh = int(pts[:, 1].max()) - y + 1
    x, y = max(0, x), max(0, y)
    bw, bh = min(bw, w - x), min(bh, h - y)
    return img[y : y + bh, x : x + bw]


def resize_image_for_det(
    image: np.ndarray, image_size: int = 960
) -> Tuple[np.ndarray, Tuple[float, float]]:
    """Resize so the larger side is ~image_size, rounded to /32
    (`test.py:109-121`; the ResNet stride)."""
    h, w = image.shape[:2]
    scale = image_size / max(h, w)
    nh = int(round(h * scale / 32) * 32)
    nw = int(round(w * scale / 32) * 32)
    nh, nw = max(nh, 32), max(nw, 32)
    resized = native.resize_bilinear(image, (nw, nh))
    return resized, (nh / h, nw / w)
