"""DB loss: OHEM-balanced BCE + α·Dice(thresh_binary) + β·MaskL1(thresh).

Equivalent of `/root/reference/model/det/loss.py:4-90` with one
TPU-specific change: the reference's OHEM picks the top
``3 × #positives`` negative-pixel losses with a data-dependent ``topk``
size — illegal under XLA's static shapes. Here the same selection is
expressed statically: sort all masked negative losses descending and keep
the first k via a rank mask (k is a traced value; shapes stay static).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def balanced_bce_loss(
    pred_logits: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    negative_ratio: float = 3.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """OHEM-balanced binary cross-entropy on raw logits.

    All inputs (B, H, W, 1). Positives: gt*mask; negatives: (1-gt)*mask,
    of which only the hardest ``negative_ratio * #pos`` count.
    """
    pred_logits = pred_logits.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)

    positive = gt * mask
    negative = (1.0 - gt) * mask
    pos_count = positive.sum()
    neg_count = jnp.minimum(negative.sum(), pos_count * negative_ratio)

    # BCE with logits (numerically safe form).
    loss = jnp.maximum(pred_logits, 0) - pred_logits * gt + jnp.log1p(
        jnp.exp(-jnp.abs(pred_logits))
    )

    positive_loss = (loss * positive).sum()

    # Static-shape OHEM: rank negative losses, keep the top neg_count.
    neg_loss_flat = (loss * negative).reshape(-1)
    sorted_desc = jnp.sort(neg_loss_flat)[::-1]
    rank = jnp.arange(sorted_desc.shape[0], dtype=jnp.float32)
    keep = (rank < neg_count).astype(jnp.float32)
    negative_loss = (sorted_desc * keep).sum()

    return (positive_loss + negative_loss) / (pos_count + neg_count + eps)


def dice_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
              eps: float = 1e-6) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    intersection = (pred * gt * mask).sum()
    union = (pred * mask).sum() + (gt * mask).sum() + eps
    return 1.0 - 2.0 * intersection / union


def mask_l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    return (jnp.abs(pred - gt) * mask).sum() / (mask.sum() + eps)


def db_loss(
    predictions: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    alpha: float = 5.0,
    beta: float = 10.0,
    ohem_ratio: float = 3.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """L = BCE_ohem(bin_logits) + α·Dice(thresh_binary) + β·L1(thresh).

    ``batch`` keys: gt, mask, thresh_map, thresh_mask — all (B, H, W, 1).
    """
    l_prob = balanced_bce_loss(
        predictions["bin_logits"], batch["gt"], batch["mask"], ohem_ratio
    )
    l_thresh = mask_l1_loss(
        predictions["thresh"], batch["thresh_map"], batch["thresh_mask"]
    )
    l_binary = dice_loss(predictions["thresh_binary"], batch["gt"], batch["mask"])
    loss = l_prob + alpha * l_binary + beta * l_thresh
    return loss, {
        "loss": loss,
        "l_prob": l_prob,
        "l_binary": l_binary,
        "l_thresh": l_thresh,
    }
