"""On-device DB postprocessing: connected components -> scored boxes.

The reference's box extraction is inherently sequential host code
(cv2.findContours / approxPolyDP / pyclipper, `src/det/test.py:55-106`).
For the fused TPU pipeline the same decisions are recast as data-parallel
primitives under fixed capacity K:

  1. *Labeling*: every foreground pixel starts as its own label (its flat
     index); repeated {8-neighbour min-propagation + pointer jumping
     (label <- label[label])} converges in O(log diameter) sweeps.
  2. *Extraction*: component roots are rank-compacted to dense ids with a
     cumulative sum, then bbox / area / mean-probability come from
     segment reductions.
  3. *Unclip*: DB's offset d = A·ratio / L applied to the box (A, L from
     the box rectangle) — axis-aligned, which is exactly what the
     reference pipeline consumes downstream anyway (crops use
     cv2.boundingRect, `test.py:123-130`).

Box-level parity with the exact host path (pipeline/postprocess.py) is
validated in tests; the host path remains the golden reference.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

BIG = jnp.int32(2 ** 30)


def _neighbor_min(lab: jnp.ndarray) -> jnp.ndarray:
    """8-neighbourhood minimum via shifted minima (labels padded BIG)."""
    p = jnp.pad(lab, 1, constant_values=BIG)
    out = lab
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            out = jnp.minimum(out, p[1 + dy: 1 + dy + lab.shape[0],
                                     1 + dx: 1 + dx + lab.shape[1]])
    return out


def _segmented_min_scan(vals: jnp.ndarray, mask: jnp.ndarray, axis: int,
                        reverse: bool) -> jnp.ndarray:
    """Running minimum along ``axis`` restricted to contiguous foreground
    runs (background resets the scan). Associative, so it runs as a
    log-depth ``associative_scan``."""
    reset = ~mask

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    out, _ = jax.lax.associative_scan(
        combine, (vals, reset), axis=axis, reverse=reverse
    )
    return jnp.where(mask, out, BIG)


@partial(jax.jit, static_argnames=("num_iters",))
def connected_components(mask: jnp.ndarray, num_iters: int = 8) -> jnp.ndarray:
    """Label foreground pixels of a bool (H, W) mask.

    Returns int32 (H, W): for foreground pixels, the flat index of their
    component's root pixel; BIG for background.

    Each iteration: segmented min-scans along rows and columns (labels
    cross entire straight runs at once), an 8-neighbour min (diagonal
    connectivity), and pointer jumping (path compression). Convergence
    needs roughly one iteration per "turn" in a component's geometry —
    text regions converge in 2-3; ``num_iters=8`` covers pathological
    spirals at DB map sizes.
    """
    H, W = mask.shape
    flat_idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(mask, flat_idx, BIG)

    def body(_, lab):
        for axis, reverse in ((1, False), (1, True), (0, False), (0, True)):
            lab = jnp.minimum(lab, _segmented_min_scan(lab, mask, axis, reverse))
        nb = _neighbor_min(lab)
        lab = jnp.where(mask, jnp.minimum(lab, nb), BIG)
        # pointer jumping: follow the label one hop (background-safe)
        safe = jnp.clip(lab, 0, H * W - 1)
        jumped = jnp.take(lab.reshape(-1), safe)
        lab = jnp.where(mask & (jumped < lab), jumped, lab)
        return lab

    return jax.lax.fori_loop(0, num_iters, body, lab)


@partial(jax.jit, static_argnames=("max_boxes", "num_iters"))
def extract_boxes(
    prob: jnp.ndarray,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    unclip_ratio: float = 1.5,
    min_area: float = 10.0,
    max_boxes: int = 256,
    num_iters: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(H, W) probability map -> (boxes (K,4) xyxy, scores (K,), valid (K,)).

    Decision parity with DBPostProcessor: threshold at ``thresh``, score =
    mean probability inside the component, reject score < box_thresh or
    area < min_area, expand by d = A·unclip_ratio/L.
    """
    H, W = prob.shape
    mask = prob > thresh
    lab = connected_components(mask, num_iters)
    flat_lab = lab.reshape(-1)
    flat_idx = jnp.arange(H * W, dtype=jnp.int32)

    is_root = (flat_lab == flat_idx) & mask.reshape(-1)
    # Dense component ids by rank of the root (first max_boxes kept).
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    root_rank = jnp.where(is_root, rank, max_boxes)  # indexed at root pixels
    safe_lab = jnp.clip(flat_lab, 0, H * W - 1)
    comp_id = jnp.where(
        mask.reshape(-1), jnp.take(root_rank, safe_lab), max_boxes
    )
    comp_id = jnp.minimum(comp_id, max_boxes)  # overflow bucket

    ys = (flat_idx // W).astype(jnp.float32)
    xs = (flat_idx % W).astype(jnp.float32)
    n_seg = max_boxes + 1
    ones = mask.reshape(-1).astype(jnp.float32)

    area = jax.ops.segment_sum(ones, comp_id, n_seg)
    psum = jax.ops.segment_sum(prob.reshape(-1) * ones, comp_id, n_seg)
    xmin = -jax.ops.segment_max(jnp.where(ones > 0, -xs, -jnp.inf), comp_id, n_seg)
    xmax = jax.ops.segment_max(jnp.where(ones > 0, xs, -jnp.inf), comp_id, n_seg)
    ymin = -jax.ops.segment_max(jnp.where(ones > 0, -ys, -jnp.inf), comp_id, n_seg)
    ymax = jax.ops.segment_max(jnp.where(ones > 0, ys, -jnp.inf), comp_id, n_seg)

    area = area[:max_boxes]
    score = psum[:max_boxes] / jnp.maximum(area, 1.0)
    xmin, xmax = xmin[:max_boxes], xmax[:max_boxes]
    ymin, ymax = ymin[:max_boxes], ymax[:max_boxes]

    bw = xmax - xmin + 1.0
    bh = ymax - ymin + 1.0
    # DB unclip on the box rectangle: d = A*r/L
    d = (bw * bh) * unclip_ratio / jnp.maximum(2.0 * (bw + bh), 1e-6)

    valid = (area >= min_area) & (score >= box_thresh) & (area > 0)
    boxes = jnp.stack(
        [
            jnp.clip(xmin - d, 0, W - 1),
            jnp.clip(ymin - d, 0, H - 1),
            jnp.clip(xmax + d, 0, W - 1),
            jnp.clip(ymax + d, 0, H - 1),
        ],
        axis=1,
    )
    boxes = jnp.where(valid[:, None], boxes, 0.0)
    score = jnp.where(valid, score, 0.0)
    return boxes, score, valid
