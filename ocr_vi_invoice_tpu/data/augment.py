"""Host-side data augmentation (numpy + cv2), first-party.

The reference leans on albumentations (det: `src/det/dataloader.py:49-60`;
rec: `src/rec2/dataloader.py:34-93`). That package is not a dependency
here; the same distributions are implemented directly. Augmentation runs
in input-pipeline workers on CPU — it never touches the device path.

Each transform takes/returns uint8 RGB HWC images. The det pipeline is
keypoint-aware (polygon vertices follow the geometric transforms).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np


# --------------------------------------------------------------------------- #
# Shared photometric helpers
# --------------------------------------------------------------------------- #


def _clip8(x) -> np.ndarray:
    return np.clip(x, 0, 255).astype(np.uint8)


def adjust_brightness_contrast(img, brightness=0.0, contrast=0.0):
    """factor-style: out = img * (1+contrast) + 255*brightness-ish (alb. semantics)."""
    alpha = 1.0 + contrast
    beta = 255.0 * brightness
    return _clip8(img.astype(np.float32) * alpha + beta)


def color_jitter(rng, img, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.05):
    img = adjust_brightness_contrast(
        img,
        rng.uniform(-brightness, brightness),
        rng.uniform(-contrast, contrast),
    )
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] *= 1.0 + rng.uniform(-saturation, saturation)
    hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue, hue) * 180.0) % 180.0
    return cv2.cvtColor(_clip8(hsv), cv2.COLOR_HSV2RGB)


def gauss_noise(rng, img, var_range=(10, 50)):
    var = rng.uniform(*var_range)
    noise = rng.normal(0, math.sqrt(var), img.shape)
    return _clip8(img.astype(np.float32) + noise)


def iso_noise(rng, img, color_shift=(0.01, 0.05), intensity=(0.1, 0.3)):
    inten = rng.uniform(*intensity)
    cs = rng.uniform(*color_shift)
    hls = cv2.cvtColor(img, cv2.COLOR_RGB2HLS).astype(np.float32)
    hls[..., 0] += rng.normal(0, cs * 360 * inten, hls.shape[:2])
    hls[..., 1] += rng.normal(0, inten * 30, hls.shape[:2])
    hls[..., 0] %= 360
    return cv2.cvtColor(_clip8(hls), cv2.COLOR_HLS2RGB)


def jpeg_compression(rng, img, quality_range=(50, 90)):
    q = int(rng.uniform(*quality_range))
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR) if ok else img


def clahe(img, clip_limit=4.0):
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    cl = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(8, 8))
    lab[..., 0] = cl.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)


def random_shadow(rng, img, num_range=(1, 2)):
    h, w = img.shape[:2]
    out = img.astype(np.float32)
    for _ in range(rng.randint(num_range[0], num_range[1] + 1)):
        pts = rng.randint(0, [w, h], size=(5, 2)).astype(np.int32)
        m = np.zeros((h, w), np.uint8)
        cv2.fillPoly(m, [pts], 1)
        out[m > 0] *= rng.uniform(0.4, 0.7)
    return _clip8(out)


def coarse_dropout(rng, img, max_holes=5, max_h=8, max_w=8, fill=0):
    out = img.copy()
    h, w = img.shape[:2]
    for _ in range(rng.randint(1, max_holes + 1)):
        hh = rng.randint(1, max_h + 1)
        ww = rng.randint(1, max_w + 1)
        y = rng.randint(0, max(h - hh, 1))
        x = rng.randint(0, max(w - ww, 1))
        out[y : y + hh, x : x + ww] = fill
    return out


def to_gray3(img):
    g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    return cv2.cvtColor(g, cv2.COLOR_GRAY2RGB)


def sharpen(rng, img, alpha=(0.1, 0.3), lightness=(0.7, 1.0)):
    a = rng.uniform(*alpha)
    l = rng.uniform(*lightness)
    kernel = np.array([[-1, -1, -1], [-1, 8 + l, -1], [-1, -1, -1]], np.float32)
    sharp = cv2.filter2D(img, -1, kernel / max(l, 1e-3) * (1.0 / 9))
    return _clip8(img.astype(np.float32) * (1 - a) + sharp.astype(np.float32) * a)


def downscale_upscale(rng, img, scale=(0.5, 0.8)):
    s = rng.uniform(*scale)
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * s), 1), max(int(h * s), 1)),
                       interpolation=cv2.INTER_LINEAR)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)


def motion_blur(rng, img, ksize_range=(3, 7)):
    k = rng.randint(ksize_range[0], ksize_range[1] + 1)
    kernel = np.zeros((k, k), np.float32)
    angle = rng.uniform(0, 180)
    c = (k - 1) / 2
    dx, dy = math.cos(math.radians(angle)), math.sin(math.radians(angle))
    for t in np.linspace(-c, c, k * 2):
        x, y = int(round(c + t * dx)), int(round(c + t * dy))
        if 0 <= x < k and 0 <= y < k:
            kernel[y, x] = 1
    kernel /= max(kernel.sum(), 1)
    return cv2.filter2D(img, -1, kernel)


# --------------------------------------------------------------------------- #
# Recognition: heavy augmentation pipeline (rec2/dataloader.py:34-93)
# --------------------------------------------------------------------------- #


class RecAugment:
    """Heavy degradation pipeline for text-line crops."""

    def __init__(self, seed: Optional[int] = None):
        self.rng = np.random.RandomState(seed)

    def __call__(self, img: np.ndarray,
                 rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        # An explicit rng makes augmentation a pure function of
        # (seed, epoch, idx) — loader threads then can't reorder draws,
        # so runs are bit-reproducible regardless of device count.
        rng = rng if rng is not None else self.rng
        h, w = img.shape[:2]

        # Geometric (p=0.5): affine or perspective, white border fill.
        if rng.rand() < 0.5:
            if rng.rand() < 0.5:
                angle = rng.uniform(-5, 5)
                shear = rng.uniform(-10, 10)
                scale = rng.uniform(0.9, 1.1)
                M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
                M[0, 1] += math.tan(math.radians(shear)) * 0.5
                img = cv2.warpAffine(img, M, (w, h), borderMode=cv2.BORDER_CONSTANT,
                                     borderValue=(255, 255, 255))
            else:
                s = rng.uniform(0.02, 0.06)
                src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
                dst = (src + rng.uniform(-s, s, (4, 2)) * [w, h]).astype(np.float32)
                M = cv2.getPerspectiveTransform(src, dst)
                img = cv2.warpPerspective(img, M, (w, h),
                                          borderMode=cv2.BORDER_CONSTANT,
                                          borderValue=(255, 255, 255))

        # Blur (p=0.3)
        if rng.rand() < 0.3:
            c = rng.randint(3)
            if c == 0:
                k = rng.choice([3, 5])
                img = cv2.GaussianBlur(img, (k, k), 0)
            elif c == 1:
                img = motion_blur(rng, img)
            else:
                img = cv2.medianBlur(img, 3)

        # Noise (p=0.4)
        if rng.rand() < 0.4:
            c = rng.randint(3)
            if c == 0:
                img = gauss_noise(rng, img)
            elif c == 1:
                img = iso_noise(rng, img)
            else:
                img = jpeg_compression(rng, img)

        # Color / lighting (p=0.5)
        if rng.rand() < 0.5:
            c = rng.randint(3)
            if c == 0:
                img = adjust_brightness_contrast(
                    img, rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3)
                )
            elif c == 1:
                img = color_jitter(rng, img)
            else:
                img = clahe(img)

        # Shadows / occlusion (p=0.2)
        if rng.rand() < 0.2:
            if rng.rand() < 0.5:
                img = random_shadow(rng, img)
            else:
                img = coarse_dropout(rng, img)

        # Grayscale (p=0.1)
        if rng.rand() < 0.1:
            img = to_gray3(img)

        # Sharpen (p=0.15)
        if rng.rand() < 0.15:
            img = sharpen(rng, img)

        # Downscale (p=0.15)
        if rng.rand() < 0.15:
            img = downscale_upscale(rng, img)

        return img


# --------------------------------------------------------------------------- #
# Detection: keypoint-aware geometric + color aug (det/dataloader.py:49-60)
# --------------------------------------------------------------------------- #


class DetAugment:
    """ShiftScaleRotate(p=.5) + HFlip(p=.1) + ColorJitter(p=.5), polygons
    transformed along with the image."""

    def __init__(self, seed: Optional[int] = None,
                 shift_limit=0.02, scale_limit=0.3, rotate_limit=5):
        self.rng = np.random.RandomState(seed)
        self.shift_limit = shift_limit
        self.scale_limit = scale_limit
        self.rotate_limit = rotate_limit

    def __call__(
        self, img: np.ndarray, polygons: List[np.ndarray],
        rng: Optional[np.random.RandomState] = None,
    ) -> Tuple[np.ndarray, List[np.ndarray]]:
        # See RecAugment.__call__: explicit rng => reproducible runs.
        rng = rng if rng is not None else self.rng
        h, w = img.shape[:2]

        if rng.rand() < 0.5:
            angle = rng.uniform(-self.rotate_limit, self.rotate_limit)
            scale = 1.0 + rng.uniform(-self.scale_limit, self.scale_limit)
            tx = rng.uniform(-self.shift_limit, self.shift_limit) * w
            ty = rng.uniform(-self.shift_limit, self.shift_limit) * h
            M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
            M[0, 2] += tx
            M[1, 2] += ty
            img = cv2.warpAffine(img, M, (w, h), borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=0)
            polygons = [
                (p @ M[:, :2].T + M[:, 2]).astype(np.float32) for p in polygons
            ]

        if rng.rand() < 0.1:
            img = img[:, ::-1].copy()
            polygons = [
                np.stack([w - 1 - p[:, 0], p[:, 1]], axis=1).astype(np.float32)
                for p in polygons
            ]

        if rng.rand() < 0.5:
            img = color_jitter(self.rng, img, 0.3, 0.3, 0.2, 0.05)

        return img, polygons
