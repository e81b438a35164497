"""Evaluation metrics.

* Detection: pixel-level precision/recall/F1/IoU/Dice at 0.5 threshold
  under the valid mask — exact semantics of `src/det/val.py:13-51`
  (per-batch metrics averaged over batches), computed on device.
* Recognition: CER (Levenshtein / gt chars) and exact-match accuracy —
  `src/rec2/val.py:14-30`. Edit distance runs on host (strings), backed
  by the native C++ module when built, pure-Python DP otherwise.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from ocr_vi_invoice_tpu.native import levenshtein


def det_pixel_metrics(
    pred_binary: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray, eps: float = 1e-6
) -> Dict[str, jnp.ndarray]:
    """All inputs (B, H, W, 1); returns scalar metrics for this batch."""
    pred = (pred_binary > 0.5).astype(jnp.float32) * mask
    gt = gt.astype(jnp.float32) * mask
    tp = ((pred == 1) & (gt == 1)).sum().astype(jnp.float32)
    fp = ((pred == 1) & (gt == 0)).sum().astype(jnp.float32)
    fn = ((pred == 0) & (gt == 1)).sum().astype(jnp.float32)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    return {
        "precision": precision,
        "recall": recall,
        "f1": 2 * precision * recall / (precision + recall + eps),
        "iou": tp / (tp + fp + fn + eps),
        "dice": 2 * tp / (2 * tp + fp + fn + eps),
    }


def compute_cer(predictions: Sequence[str], ground_truths: Sequence[str]) -> float:
    total_chars = 0
    total_errors = 0
    for pred, gt in zip(predictions, ground_truths):
        total_errors += levenshtein(pred, gt)
        total_chars += len(gt)
    return total_errors / max(total_chars, 1)


def compute_acc(predictions: Sequence[str], ground_truths: Sequence[str]) -> float:
    correct = sum(1 for p, g in zip(predictions, ground_truths) if p == g)
    return correct / max(len(predictions), 1)
