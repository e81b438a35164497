"""Synthetic training data for the document scanner's U-2-Net.

The reference leans on rembg's pretrained U-2-Net (no training code,
`scanner.py:95`); with zero egress we instead manufacture supervision:
render an invoice, warp it with a random perspective, paste it onto a
textured surface with shading — the warped quad is the ground-truth
foreground mask. ``sample()`` returns (image uint8 RGB, mask float {0,1}).
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

from ocr_vi_invoice_tpu.generator.defects import (
    DefectSimulator,
    apply_defects_light,
)
from ocr_vi_invoice_tpu.generator.edge_cases import _texture
from ocr_vi_invoice_tpu.generator.layouts import LayoutFactory


def sample(rng: np.random.RandomState, out_h: int = 512, out_w: int = 384,
           return_corners: bool = False):
    """One composite. With ``return_corners`` also returns the ground-
    truth document quad (4, 2) float32 in (x, y), ordered tl/tr/br/bl —
    the known homography's corner images, used by the scanner's
    corner-accuracy gate (`train.scan --eval_corners`)."""
    return _sample(rng, out_h, out_w, return_corners)


def _sample(rng: np.random.RandomState, out_h: int, out_w: int,
            return_corners: bool) -> Tuple[np.ndarray, np.ndarray]:
    doc, _ = LayoutFactory.create_random(rng).generate()
    if rng.rand() < 0.4:
        doc = apply_defects_light(rng, doc)

    canvas = _texture(rng, out_h, out_w)
    if rng.rand() < 0.15:  # plain dark surface
        shade = rng.randint(20, 110)
        canvas = np.full((out_h, out_w, 3), shade, np.uint8)
        canvas = DefectSimulator.shadow(rng, canvas)

    # Fit the doc inside the canvas with margin, then perspective-jitter.
    dh, dw = doc.shape[:2]
    scale = min(out_h * rng.uniform(0.55, 0.9) / dh,
                out_w * rng.uniform(0.55, 0.9) / dw)
    nh, nw = max(int(dh * scale), 8), max(int(dw * scale), 8)
    doc_s = cv2.resize(doc, (nw, nh))

    cx = rng.randint(0, out_w - nw + 1)
    cy = rng.randint(0, out_h - nh + 1)
    src = np.float32([[0, 0], [nw, 0], [nw, nh], [0, nh]])
    jit = min(nh, nw) * rng.uniform(0.0, 0.18)
    dst = src + rng.uniform(-jit, jit, (4, 2)).astype(np.float32) + [cx, cy]
    dst[:, 0] = np.clip(dst[:, 0], 0, out_w - 1)
    dst[:, 1] = np.clip(dst[:, 1], 0, out_h - 1)

    M = cv2.getPerspectiveTransform(src, dst.astype(np.float32))
    warped = cv2.warpPerspective(doc_s, M, (out_w, out_h))
    mask = cv2.warpPerspective(
        np.ones((nh, nw), np.uint8) * 255, M, (out_w, out_h)
    )
    m = mask > 127
    out = canvas.copy()
    out[m] = warped[m]

    # Global photometric wash so the paste edge isn't trivially sharp.
    if rng.rand() < 0.6:
        out = DefectSimulator.shadow(rng, out)
    if rng.rand() < 0.4:
        out = DefectSimulator.gaussian_noise(rng, out, (3, 12))
    if return_corners:
        return out, m.astype(np.float32), dst.astype(np.float32)
    return out, m.astype(np.float32)


class ScanDataset:
    """On-the-fly composites (no disk IO; generation is the bottleneck
    anyway, and the epoch length is nominal)."""

    def __init__(self, size: int = 1000, out_hw: Tuple[int, int] = (512, 384),
                 seed: int = 0):
        self.size = size
        self.out_hw = out_hw
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int):
        rng = np.random.RandomState(self.seed + idx)
        img, mask = sample(rng, *self.out_hw)
        x = (img.astype(np.float32) / 255.0 - 0.485) / 0.229
        return {"image": x, "mask": mask[..., None]}
