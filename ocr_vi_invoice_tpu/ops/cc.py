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


@partial(jax.jit, static_argnames=("max_boxes", "max_runs", "max_overlap",
                                   "max_union_iters", "max_runs_per_row"))
def extract_boxes(
    prob: jnp.ndarray,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    unclip_ratio: float = 1.5,
    min_area: float = 10.0,
    max_boxes: int = 256,
    max_runs: int = 4096,
    max_overlap: int = 8,
    max_union_iters: int = 32,
    max_runs_per_row: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(H, W) probability map -> (boxes (K,4) xyxy, scores (K,), valid (K,)).

    Decision parity with DBPostProcessor: threshold at ``thresh``, score =
    mean probability inside the component, reject score < box_thresh or
    area < min_area, expand by d = A·unclip_ratio/L.

    TPU-first formulation: run-length connected components. The per-pixel
    work is only elementwise ops, two prefix sums and two top_k
    compactions — no scatters, no 1M-element gathers. Union-find then runs
    over at most ``max_runs`` horizontal runs (thousands, not millions):

      1. runs = maximal horizontal foreground segments; starts/ends by
         comparing each pixel with its left/right neighbour;
      2. compact run start/end indices in TWO stages: per-row batched
         top_k over W columns (the j-th leftmost start in a row pairs
         with the j-th leftmost end — runs never nest), then ONE global
         top_k over the H*max_runs_per_row candidate slots. A single
         global top_k over all H*W pixels costs ~2 ms at 960²; the
         two-stage form is ~0.3 ms (measured, v5e);
      3. per-run probability mass = difference of a row-major prefix sum
         at the run's endpoints (no segment_sum over pixels);
      4. 8-connectivity: run A (row y) touches run B (row y±1) iff their
         x-intervals overlap with ±1 slack; neighbours are found with a
         searchsorted into the globally sorted (row, x1) keys, at most
         ``max_overlap`` per side;
      5. min-label propagation + pointer jumping over runs (a few
         microseconds at this size) with early exit on convergence.

    Capacity notes: maps with more than ``max_runs`` runs drop the excess
    runs, and rows with more than ``max_runs_per_row`` runs drop their
    rightmost excess (raise either for pathological noise); components
    beyond ``max_boxes`` land in an overflow bucket and are dropped, as
    before.
    """
    H, W = prob.shape
    RPR = min(max_runs_per_row, (W + 1) // 2)  # a row holds <= ceil(W/2) runs
    R = min(max_runs, H * RPR)
    mask = prob > thresh
    probm = jnp.where(mask, prob, 0.0).reshape(-1)

    left = jnp.pad(mask, ((0, 0), (1, 0)))[:, :W]
    right = jnp.pad(mask, ((0, 0), (0, 1)))[:, 1:]

    # Stage-1 compaction, per row: the j-th leftmost start in a row pairs
    # with the j-th leftmost end (runs are row-local and never nest), so
    # batched top_k over the W columns keeps start/end slots aligned.
    col = jnp.arange(W, dtype=jnp.int32)
    vr_s, cs = jax.lax.top_k(jnp.where(mask & ~left, W - col, 0), RPR)
    _, ce = jax.lax.top_k(jnp.where(mask & ~right, W - col, 0), RPR)
    rowi = jnp.arange(H, dtype=jnp.int32)[:, None]
    si_c = (rowi * W + cs).reshape(-1)  # (H*RPR,) flat start indices
    ei_c = (rowi * W + ce).reshape(-1)
    slot_ok = (vr_s > 0).reshape(-1)

    # Stage-2 compaction, global: one top_k over H*RPR candidate slots
    # (not H*W pixels) orders runs by flat start index; starts and ends
    # travel together through the same permutation.
    vals_s, order = jax.lax.top_k(
        jnp.where(slot_ok, jnp.int32(H * W) - si_c, 0), R)
    run_valid = vals_s > 0
    si = jnp.where(run_valid, si_c[order], H * W - 1).astype(jnp.int32)
    ei = jnp.where(run_valid, ei_c[order], H * W - 1).astype(jnp.int32)
    row = jnp.where(run_valid, si // W, H).astype(jnp.int32)
    x0 = (si % W).astype(jnp.int32)
    x1 = (ei % W).astype(jnp.int32)
    length = jnp.where(run_valid, x1 - x0 + 1, 0)

    cprob = jnp.cumsum(probm)
    run_psum = jnp.where(run_valid, cprob[ei] - cprob[si] + probm[si], 0.0)

    # ---- neighbour runs in the rows above/below (searchsorted ranges) ----
    BIGK = jnp.int32(H * W + W)
    keyx1 = jnp.where(run_valid, row * W + x1, BIGK)  # ascending for valid

    def neighbors(drow):
        target = (row + drow) * W + jnp.maximum(x0 - 1, -1)
        lo = jnp.searchsorted(keyx1, target, side="left").astype(jnp.int32)
        idx = jnp.minimum(lo[:, None] + jnp.arange(max_overlap)[None, :], R - 1)
        ok = (
            run_valid[:, None]
            & run_valid[idx]
            & (row[idx] == (row + drow)[:, None])
            & (x0[idx] <= (x1 + 1)[:, None])
        )
        return idx, ok

    up_idx, up_ok = neighbors(-1)
    dn_idx, dn_ok = neighbors(+1)
    nb_idx = jnp.concatenate([up_idx, dn_idx], axis=1)
    nb_ok = jnp.concatenate([up_ok, dn_ok], axis=1)

    # ---- min-label propagation + pointer jumping over runs ----
    L0 = jnp.arange(R, dtype=jnp.int32)

    def cond(state):
        _, changed, t = state
        return changed & (t < max_union_iters)

    def body(state):
        L, _, t = state
        nbL = jnp.where(nb_ok, L[nb_idx], R)
        Lr = jnp.minimum(L, nbL.min(axis=1).astype(jnp.int32))
        Lj = jnp.minimum(Lr, Lr[Lr])  # pointer jump (labels are indices <= own)
        return Lj, jnp.any(Lj != L), t + 1

    L, _, _ = jax.lax.while_loop(cond, body, (L0, jnp.bool_(True), 0))

    # ---- dense component ids + per-component reductions over runs ----
    is_root = (L == L0) & run_valid
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    root_rank = jnp.where(is_root, rank, max_boxes)
    comp_id = jnp.where(run_valid, root_rank[L], max_boxes)
    comp_id = jnp.minimum(comp_id, max_boxes)

    # Per-component reductions as ONE-HOT contractions instead of
    # jax.ops.segment_*: segment sums/maxes lower to scatters, which
    # serialize per update on TPU (measured ~4 ms of the 5.9 ms
    # extract_boxes total at R=4096). The (R, S) one-hot membership
    # matrix is ~1M elements — the two sums ride the MXU as a single
    # (2, R) x (R, S) matmul and the four extrema are masked VPU
    # reductions over the same broadcast, all scatter-free.
    n_seg = max_boxes + 1
    fr = run_valid
    member = comp_id[:, None] == jnp.arange(n_seg, dtype=jnp.int32)[None, :]
    sums = jnp.stack(
        [length.astype(jnp.float32), run_psum]
    ) @ member.astype(jnp.float32)  # (2, S)
    area, psum = sums[0], sums[1]
    x0f, x1f = x0.astype(jnp.float32), x1.astype(jnp.float32)
    rowf = row.astype(jnp.float32)
    mem_fr = member & fr[:, None]
    NEG = jnp.float32(-jnp.inf)
    xmin = -jnp.max(jnp.where(mem_fr, -x0f[:, None], NEG), axis=0)
    xmax = jnp.max(jnp.where(mem_fr, x1f[:, None], NEG), axis=0)
    ymin = -jnp.max(jnp.where(mem_fr, -rowf[:, None], NEG), axis=0)
    ymax = jnp.max(jnp.where(mem_fr, rowf[:, None], NEG), axis=0)

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
