"""CTC loss and greedy decoding, implemented natively in JAX.

Replaces the reference's dependence on ``torch.nn.CTCLoss`` (native
cuDNN/C++, `model/rec2/loss.py:25,63`) with a log-semiring forward
recursion expressed as a ``lax.scan`` over time — one compiled XLA
program, batched over B, no host loops.

Semantics match ``torch.nn.CTCLoss(blank=0, reduction='mean',
zero_infinity=True)``:
  * per-sample loss = -log p(target | logits) over the extended
    blank-interleaved label sequence;
  * 'mean' divides each sample's loss by its target length, then averages
    over the batch;
  * zero_infinity zeroes non-finite losses (unreachable alignments, e.g.
    target longer than input frames).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    all_ninf = m <= NEG_INF
    m_safe = jnp.where(all_ninf, 0.0, m)
    s = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    # Keep log's input away from 0 where the result is masked anyway —
    # otherwise backward produces 0-cotangent * inf-derivative = NaN.
    s = jnp.where(all_ninf, 1.0, s)
    return jnp.where(all_ninf, NEG_INF, m_safe + jnp.log(s))


def ctc_neg_log_likelihood(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
) -> jnp.ndarray:
    """Per-sample CTC negative log-likelihood.

    Args:
      log_probs: (B, T, C) log-softmaxed frame predictions (batch-major).
      targets: (B, L) label ids, padded arbitrarily past ``target_lengths``.
      input_lengths: (B,) valid frame counts (≤ T).
      target_lengths: (B,) valid label counts (≤ L).

    Returns:
      (B,) float32 NLL. Unreachable alignments yield ``inf``.
    """
    log_probs = log_probs.astype(jnp.float32)
    B, T, C = log_probs.shape
    L = targets.shape[1]
    S = 2 * L + 1

    # Extended sequence: blank, y1, blank, y2, ..., blank.
    s_idx = jnp.arange(S)
    label_pos = (s_idx - 1) // 2
    is_label = (s_idx % 2) == 1
    ext = jnp.where(
        is_label[None, :],
        jnp.take_along_axis(
            targets, jnp.clip(label_pos, 0, L - 1)[None, :].repeat(B, 0), axis=1
        ),
        blank_id,
    )  # (B, S)

    # Skip transition s-2 -> s allowed when ext[s] is a label differing from
    # ext[s-2].
    ext_shift2 = jnp.concatenate(
        [jnp.full((B, 2), -1, dtype=ext.dtype), ext[:, :-2]], axis=1
    )
    can_skip = is_label[None, :] & (ext != ext_shift2)  # (B, S)

    # Positions beyond the valid extended length are masked out.
    valid_s = s_idx[None, :] < (2 * target_lengths[:, None] + 1)

    # Emission log-probs per (t, s): gather class ext[s] at each frame.
    # (B, T, S) would be materialized by the scan one step at a time.
    def step(alpha, lp_t):
        # lp_t: (B, C) frame log-probs; alpha: (B, S)
        emit = jnp.take_along_axis(lp_t, ext, axis=1)  # (B, S)
        a_prev1 = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), alpha[:, :-1]], axis=1
        )
        a_prev2 = jnp.concatenate(
            [jnp.full((B, 2), NEG_INF), alpha[:, :-2]], axis=1
        )
        a_prev2 = jnp.where(can_skip, a_prev2, NEG_INF)
        new = _logaddexp3(alpha, a_prev1, a_prev2) + emit
        return jnp.where(valid_s, new, NEG_INF)

    # Init at t=0: alpha[0] = lp[0, blank], alpha[1] = lp[0, y1].
    init = jnp.full((B, S), NEG_INF)
    emit0 = jnp.take_along_axis(log_probs[:, 0], ext, axis=1)
    init = init.at[:, 0].set(emit0[:, 0])
    init = init.at[:, 1].set(jnp.where(target_lengths > 0, emit0[:, 1], NEG_INF))
    init = jnp.where(valid_s, init, NEG_INF)

    def scan_body(carry, xs):
        alpha, t = carry
        lp_t = xs
        new_alpha = step(alpha, lp_t)
        # Freeze alpha past each sample's input length.
        active = (t < input_lengths)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        return (alpha, t + 1), None

    (alpha, _), _ = jax.lax.scan(
        scan_body, (init, jnp.asarray(1)), log_probs[:, 1:].transpose(1, 0, 2)
    )

    # Final: logsumexp of the last two valid extended positions.
    endL = 2 * target_lengths  # blank after last label
    end_last = jnp.take_along_axis(alpha, endL[:, None], axis=1)[:, 0]
    end_prev = jnp.take_along_axis(
        alpha, jnp.maximum(endL - 1, 0)[:, None], axis=1
    )[:, 0]
    end_prev = jnp.where(target_lengths > 0, end_prev, NEG_INF)
    total = jnp.logaddexp(
        jnp.maximum(end_last, NEG_INF), jnp.maximum(end_prev, NEG_INF)
    )
    nll = -total
    return jnp.where(total <= NEG_INF / 2, jnp.inf, nll)


def ctc_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    blank_id: int = 0,
    zero_infinity: bool = True,
) -> jnp.ndarray:
    """Batch-mean CTC loss with torch ``reduction='mean'`` semantics."""
    nll = ctc_neg_log_likelihood(
        log_probs, targets, input_lengths, target_lengths, blank_id
    )
    denom = jnp.maximum(target_lengths, 1).astype(jnp.float32)
    per_sample = nll / denom
    if zero_infinity:
        per_sample = jnp.where(jnp.isfinite(per_sample), per_sample, 0.0)
    return per_sample.mean()


def greedy_ids(log_probs: jnp.ndarray) -> jnp.ndarray:
    """Per-frame argmax ids, (B, T) int32. Collapse happens on host
    (`Tokenizer.decode_ctc_greedy`) or on device via `collapse_repeats`."""
    return jnp.argmax(log_probs, axis=-1).astype(jnp.int32)


def collapse_repeats(ids: jnp.ndarray, blank_id: int = 0) -> jnp.ndarray:
    """On-device CTC collapse: repeats and blanks become ``blank_id`` but
    positions are kept (static shape); host decode drops blanks."""
    prev = jnp.concatenate(
        [jnp.full_like(ids[:, :1], -1), ids[:, :-1]], axis=1
    )
    keep = (ids != blank_id) & (ids != prev)
    return jnp.where(keep, ids, blank_id)
