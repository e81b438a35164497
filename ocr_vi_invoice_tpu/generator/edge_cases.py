"""Edge-case transforms that rewrite annotations along with the image.

Parity with `generator/det/edge_cases.py:18-235`: partial scans (crop
with annotation clipping), extreme rotations (±15-45° and upside-down
135-180°, polygons rotated with the image), textured backgrounds
(document pasted onto wood/fabric/concrete with offset annotations),
and blank pages with dust artifacts (no annotations at all).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import cv2
import numpy as np


def partial_scan(rng, img, annotations):
    """Crop 50-85% of the page; clip/drop annotations accordingly."""
    h, w = img.shape[:2]
    fh = rng.uniform(0.5, 0.85)
    fw = rng.uniform(0.5, 0.85)
    ch, cw = int(h * fh), int(w * fw)
    y0 = rng.randint(0, h - ch + 1)
    x0 = rng.randint(0, w - cw + 1)
    out = img[y0: y0 + ch, x0: x0 + cw].copy()
    new_anns: List[Dict] = []
    for ann in annotations:
        poly = np.asarray(ann["polygon"], np.float32) - [x0, y0]
        clipped = poly.copy()
        clipped[:, 0] = np.clip(clipped[:, 0], 0, cw - 1)
        clipped[:, 1] = np.clip(clipped[:, 1], 0, ch - 1)
        # keep only if a meaningful fraction of the box survives
        area = cv2.contourArea(clipped.astype(np.float32))
        orig_area = cv2.contourArea(poly.astype(np.float32))
        if orig_area > 0 and area / orig_area > 0.3 and area > 8:
            new_anns.append({"text": ann["text"], "polygon": clipped.tolist()})
    return out, new_anns


def extreme_rotation(rng, img, annotations):
    """Rotate ±(15-45)° or near-upside-down (135-180°); rotate polygons."""
    h, w = img.shape[:2]
    if rng.rand() < 0.7:
        angle = rng.uniform(15, 45) * (1 if rng.rand() < 0.5 else -1)
    else:
        angle = rng.uniform(135, 180) * (1 if rng.rand() < 0.5 else -1)
    # Expand canvas so nothing is cut off.
    rad = math.radians(angle)
    nw = int(abs(w * math.cos(rad)) + abs(h * math.sin(rad))) + 2
    nh = int(abs(w * math.sin(rad)) + abs(h * math.cos(rad))) + 2
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
    M[0, 2] += (nw - w) / 2
    M[1, 2] += (nh - h) / 2
    bg = int(rng.randint(150, 230))
    out = cv2.warpAffine(img, M, (nw, nh), borderValue=(bg, bg, bg))
    new_anns = []
    for ann in annotations:
        poly = np.asarray(ann["polygon"], np.float32)
        rotated = poly @ M[:, :2].T + M[:, 2]
        new_anns.append({"text": ann["text"], "polygon": rotated.tolist()})
    return out, new_anns


def _texture(rng, h, w) -> np.ndarray:
    kind = rng.randint(3)
    if kind == 0:  # wood: horizontal streaks
        base = np.full((h, w, 3), (92, 62, 40), np.float32)
        streaks = rng.randn(h // 3 + 1, 2).astype(np.float32)
        streaks = cv2.resize(streaks, (w, h))
        base *= 1 + streaks[..., None] * 0.15
    elif kind == 1:  # fabric: fine weave noise
        base = np.full((h, w, 3), (120, 120, 135), np.float32)
        weave = (np.indices((h, w)).sum(0) % 2).astype(np.float32) * 10
        base += weave[..., None] + rng.randn(h, w, 1) * 6
    else:  # concrete: blotchy gray
        base = np.full((h, w, 3), (160, 160, 158), np.float32)
        g = rng.randn(h // 10 + 1, w // 10 + 1).astype(np.float32)
        base *= 1 + cv2.resize(g, (w, h))[..., None] * 0.12
    return np.clip(base, 0, 255).astype(np.uint8)


def textured_background(rng, img, annotations):
    """Paste the document onto a larger textured surface; offset polygons."""
    h, w = img.shape[:2]
    pad_y = int(h * rng.uniform(0.08, 0.3))
    pad_x = int(w * rng.uniform(0.08, 0.3))
    bg = _texture(rng, h + 2 * pad_y, w + 2 * pad_x)
    y0 = rng.randint(0, 2 * pad_y + 1)
    x0 = rng.randint(0, 2 * pad_x + 1)
    out = bg.copy()
    out[y0: y0 + h, x0: x0 + w] = img
    # subtle drop shadow
    cv2.line(out, (x0 + 2, y0 + h + 1), (x0 + w + 1, y0 + h + 1), (60, 60, 60), 2)
    new_anns = [
        {"text": a["text"],
         "polygon": (np.asarray(a["polygon"], np.float32) + [x0, y0]).tolist()}
        for a in annotations
    ]
    return out, new_anns


def blank_page(rng, width_range=(300, 900)) -> Tuple[np.ndarray, List[Dict]]:
    """Empty page with dust specks — zero annotations (hard negative)."""
    w = rng.randint(*width_range)
    h = int(w * rng.uniform(1.1, 1.6))
    shade = rng.randint(228, 256)
    img = np.full((h, w, 3), shade, np.uint8)
    for _ in range(rng.randint(5, 40)):
        x, y = rng.randint(0, w), rng.randint(0, h)
        c = int(rng.randint(100, 220))
        cv2.circle(img, (x, y), rng.randint(1, 3), (c, c, c), -1)
    return img, []


_EDGE_CASES = (partial_scan, extreme_rotation, textured_background)


def apply_random_edge_case(rng, img, annotations):
    fn = _EDGE_CASES[rng.randint(len(_EDGE_CASES))]
    return fn(rng, img, annotations)
