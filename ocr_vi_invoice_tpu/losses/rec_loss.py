"""SVTRv2 combined loss: CTC + λ·(CE_left + CE_right).

Mirror of `/root/reference/model/rec2/loss.py:14-86` with TPU-native
pieces: our own CTC forward-backward (ops/ctc.py) instead of native
torch CTCLoss, and a masked cross-entropy instead of
``ignore_index`` — no host-side target flattening loop.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ocr_vi_invoice_tpu.data.tokenizer import BLANK_ID, PAD_ID
from ocr_vi_invoice_tpu.ops.ctc import ctc_loss


def masked_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_id: int = PAD_ID
) -> jnp.ndarray:
    """Mean CE over positions whose target != ignore_id (torch
    ``CrossEntropyLoss(ignore_index=...)`` semantics)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != ignore_id).astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def svtrv2_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    sgm_output: Optional[Dict[str, jnp.ndarray]] = None,
    input_lengths: Optional[jnp.ndarray] = None,
    target_lengths: Optional[jnp.ndarray] = None,
    lambda_sgm: float = 0.1,
    blank_id: int = BLANK_ID,
    pad_id: int = PAD_ID,
):
    """Total loss and a metrics dict.

    Args:
      log_probs: (B, T, C) CTC log-probs (batch-major).
      targets: (B, L) padded label ids.
      sgm_output: optional dict with 'sgm_left'/'sgm_right'/'sgm_targets'.
    """
    B, T, _ = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, dtype=jnp.int32)
    if target_lengths is None:
        target_lengths = (targets != pad_id).sum(axis=1).astype(jnp.int32)

    loss_ctc = ctc_loss(log_probs, targets, input_lengths, target_lengths, blank_id)
    metrics = {"loss_ctc": loss_ctc}
    total = loss_ctc

    if sgm_output is not None:
        sgm_t = sgm_output["sgm_targets"]
        l_left = masked_cross_entropy(sgm_output["sgm_left"], sgm_t, pad_id)
        l_right = masked_cross_entropy(sgm_output["sgm_right"], sgm_t, pad_id)
        total = loss_ctc + lambda_sgm * (l_left + l_right)
        metrics.update({"loss_sgm_left": l_left, "loss_sgm_right": l_right})

    metrics["loss"] = total
    return total, metrics
