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

    # Static-shape OHEM without sorting: the top-k negative-loss SUM is
    # what the loss needs, not the ranked elements. Bisect a threshold t
    # (16 fixed iterations) so that count(neg_loss > t) <= neg_count, then
    # sum losses above t and fill the remainder at exactly t — equal to
    # the sorted top-k sum up to tie handling. A full jnp.sort of
    # B*H*W floats (14.7M at 960^2, batch 4) costs far more HBM traffic
    # than 16 masked reductions.
    neg_loss_flat = (loss * negative).reshape(-1)

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = (neg_loss_flat > mid).sum().astype(jnp.float32)
        lo = jnp.where(cnt > neg_count, mid, lo)
        hi = jnp.where(cnt > neg_count, hi, mid)
        return (lo, hi), None

    hi0 = neg_loss_flat.max() + 1e-3
    (lo, hi), _ = jax.lax.scan(bisect, (jnp.float32(0.0), hi0), None, length=16)
    t = hi
    above = neg_loss_flat > t
    cnt_above = above.sum().astype(jnp.float32)
    sum_above = jnp.where(above, neg_loss_flat, 0.0).sum()
    # Remaining (neg_count - cnt_above) hardest elements sit at ~t.
    negative_loss = sum_above + jnp.maximum(neg_count - cnt_above, 0.0) * t

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
