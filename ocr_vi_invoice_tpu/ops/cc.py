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
                                   "max_union_iters", "max_runs_per_row",
                                   "min_size", "with_quads", "with_overflow"))
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
    min_size: float = 0.0,
    with_quads: bool = False,
    with_overflow: bool = False,
):
    """(H, W) probability map -> (boxes (K,4) xyxy, scores (K,), valid (K,))
    — plus unclipped rotated quads (K,4,2) when ``with_quads=True``.

    Decision parity with DBPostProcessor: threshold at ``thresh``, score =
    mean probability inside the component, reject score < box_thresh or
    area < min_area, expand by d = A·unclip_ratio/L.

    ``min_size``: shortest-side gate on the component's ROTATED extent
    (pre-unclip), like standard DBNet post-processing. The reference
    defines ``min_size=3`` but its ``__call__`` never applies it
    (`src/det/test.py:52` vs `:64-83` — dead parameter), so the default
    here is 0 (off) to keep decision parity; pass > 0 to enable.

    ``with_quads``: additionally return (K, 4, 2) rotated quadrilaterals
    (tl, tr, br, bl in the component frame), the min-area-rect analogue of
    the reference's polygon outputs for rotated text: per-component
    orientation from exact second moments of the foreground pixels
    (closed-form per horizontal run, reduced by the same one-hot MXU
    contraction), extents from run-endpoint projections, expanded by the
    same unclip ``d``. The axis-aligned ``boxes`` stay the crop/compare
    currency (the reference crops axis-aligned too, `test.py:123-130`).

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
    beyond ``max_boxes`` land in an overflow bucket and are dropped.
    ``with_overflow=True`` appends an int32 (3,) vector counting exactly
    that truncation — (runs dropped at row capacity, runs dropped at
    global capacity, components dropped at box capacity) — so a
    pathological page (e.g. sand-grain noise, `generator/defects.py`)
    degrades *visibly*: the fused pipeline and serve JSON surface these
    counters instead of silently returning a clean-looking result.
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

    if with_overflow:
        # truncation counters (see docstring); computed before any capacity
        # clipping so they count what was actually dropped
        n_row_starts = jnp.sum((mask & ~left).astype(jnp.int32), axis=1)
        runs_row_dropped = jnp.sum(jnp.maximum(n_row_starts - RPR, 0))
        n_slots = jnp.sum(slot_ok.astype(jnp.int32))
        runs_global_dropped = jnp.maximum(n_slots - R, 0)
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
    if with_overflow:
        comps_dropped = jnp.maximum(
            jnp.sum(is_root.astype(jnp.int32)) - max_boxes, 0)
        overflow = jnp.stack(
            [runs_row_dropped, runs_global_dropped, comps_dropped])
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
    # HIGHEST precision: the TPU default truncates f32 matmul inputs to
    # bf16, which perturbs area/score enough to flip borderline
    # box_thresh/min_area decisions (the one-hot matrix is exact, so full
    # precision restores segment_sum-level accuracy while staying on MXU).
    sums = jnp.matmul(
        jnp.stack([length.astype(jnp.float32), run_psum]),
        member.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )  # (2, S)
    area, psum = sums[0], sums[1]
    x0f, x1f = x0.astype(jnp.float32), x1.astype(jnp.float32)
    rowf = row.astype(jnp.float32)
    mem_fr = member & fr[:, None]
    NEG = jnp.float32(-jnp.inf)

    def seg_min(vals_r):
        return -jnp.max(jnp.where(mem_fr, -vals_r[:, None], NEG), axis=0)

    def seg_max(vals_r):
        return jnp.max(jnp.where(mem_fr, vals_r[:, None], NEG), axis=0)

    xminF, xmaxF = seg_min(x0f), seg_max(x1f)
    yminF, ymaxF = seg_min(rowf), seg_max(rowf)

    need_rot = with_quads or min_size > 0
    if need_rot:
        # ---- per-component orientation from exact pixel second moments ----
        # Coordinates are CENTERED at the component's bbox center before
        # squaring (gathered per run via comp_id) so the f32 contraction
        # keeps ~7 significant digits at 960² map sizes. Per-run closed
        # forms over x in [x0, x1]: sum k, sum k², with y constant = row.
        cmax = max_boxes  # comp_id is clipped to [0, max_boxes]
        cx_r = (xminF[comp_id] + xmaxF[comp_id]) * 0.5
        cy_r = (yminF[comp_id] + ymaxF[comp_id]) * 0.5
        cx_r = jnp.where(run_valid & (comp_id < cmax), cx_r, 0.0)
        cy_r = jnp.where(run_valid & (comp_id < cmax), cy_r, 0.0)
        Lf = length.astype(jnp.float32)
        dx0 = x0f - cx_r
        dy = rowf - cy_r
        sx = Lf * dx0 + Lf * (Lf - 1.0) * 0.5
        sxx = (Lf * dx0 * dx0 + dx0 * Lf * (Lf - 1.0)
               + (Lf - 1.0) * Lf * (2.0 * Lf - 1.0) / 6.0)
        sy = Lf * dy
        syy = Lf * dy * dy
        sxy = dy * sx
        msums = jnp.matmul(
            jnp.stack([sx, sy, sxx, syy, sxy]),
            member.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )  # (5, S)
        n_px = jnp.maximum(area, 1.0)
        mx, my = msums[0] / n_px, msums[1] / n_px
        cxx = msums[2] / n_px - mx * mx
        cyy = msums[3] / n_px - my * my
        cxy = msums[4] / n_px - mx * my
        theta = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)
        ct, st = jnp.cos(theta), jnp.sin(theta)

        # ---- rotated extents from run-endpoint projections ----
        # u/v are monotonic in x within a row, so per-row extremes sit at
        # run endpoints; endpoint projections cover the whole component.
        ct_r, st_r = ct[comp_id], st[comp_id]
        dx1 = x1f - cx_r
        pu0 = dx0 * ct_r + dy * st_r
        pu1 = dx1 * ct_r + dy * st_r
        pv0 = -dx0 * st_r + dy * ct_r
        pv1 = -dx1 * st_r + dy * ct_r
        uminF = seg_min(jnp.minimum(pu0, pu1))
        umaxF = seg_max(jnp.maximum(pu0, pu1))
        vminF = seg_min(jnp.minimum(pv0, pv1))
        vmaxF = seg_max(jnp.maximum(pv0, pv1))

    area = area[:max_boxes]
    score = psum[:max_boxes] / jnp.maximum(area, 1.0)
    xmin, xmax = xminF[:max_boxes], xmaxF[:max_boxes]
    ymin, ymax = yminF[:max_boxes], ymaxF[:max_boxes]

    # DB unclip, matching the HOST path's raster semantics (string-level
    # fused-vs-host parity): the host polygon traces pixel CENTERS, so by
    # Pick's theorem its shoelace area ~= pixel_count - B/2 - 1 with
    # boundary B ~= the rect perimeter 2(ew+eh) over pixel-center extents
    # (exact for solid rectangles: (ew+1)(eh+1) - (ew+eh) - 1 = ew*eh),
    # and the raster-EDT dilation includes pixels at integer distance
    # <= d, i.e. the bbox grows by floor(d) per side. Measured on shipped
    # detector maps: floor(d) here equals the host's in ~88% of
    # components (vs 0% for the naive inclusive-rect A = bw*bh formula,
    # which overshoots by 1px on every side).
    ew = xmax - xmin  # pixel-center extents (degenerate runs give d = 0,
    eh = ymax - ymin  # exactly like the host's zero-area polygon)
    a_pick = jnp.maximum(area - (ew + eh) - 1.0, 0.0)
    d = jnp.floor(a_pick * unclip_ratio / jnp.maximum(2.0 * (ew + eh), 1e-6))

    valid = (area >= min_area) & (score >= box_thresh) & (area > 0)
    if need_rot:
        umin, umax = uminF[:max_boxes], umaxF[:max_boxes]
        vmin, vmax = vminF[:max_boxes], vmaxF[:max_boxes]
        eu = jnp.maximum(umax - umin, 0.0)
        ev = jnp.maximum(vmax - vmin, 0.0)
    if min_size > 0:
        # Shortest side of the rotated extent (pre-unclip), pixel count.
        valid = valid & (jnp.minimum(eu, ev) + 1.0 >= min_size)
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
    if not with_quads:
        if with_overflow:
            return boxes, score, valid, overflow
        return boxes, score, valid

    # ---- rotated quad corners (tl, tr, br, bl in the component frame) ----
    # Same unclip distance applied along the principal axes; the quad is
    # the min-area-rect analogue of the host's unclipped polygon.
    ctk, stk = ct[:max_boxes], st[:max_boxes]
    bcx = (xmin + xmax) * 0.5
    bcy = (ymin + ymax) * 0.5
    # The quad's unclip distance uses the ROTATED extents: the host's
    # polygon area/perimeter are rotation-invariant, while the AABB-based
    # d above underestimates for rotated components (AABB perimeter >
    # rotated perimeter). At 0 rotation the two coincide.
    d_rot = jnp.floor(
        jnp.maximum(area - (eu + ev) - 1.0, 0.0) * unclip_ratio
        / jnp.maximum(2.0 * (eu + ev), 1e-6))
    hu = eu * 0.5 + d_rot
    hv = ev * 0.5 + d_rot
    ccx = bcx + ctk * (umin + umax) * 0.5 - stk * (vmin + vmax) * 0.5
    ccy = bcy + stk * (umin + umax) * 0.5 + ctk * (vmin + vmax) * 0.5
    signs = jnp.asarray(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]], jnp.float32)
    qx = (ccx[:, None] + signs[None, :, 0] * (ctk * hu)[:, None]
          - signs[None, :, 1] * (stk * hv)[:, None])
    qy = (ccy[:, None] + signs[None, :, 0] * (stk * hu)[:, None]
          + signs[None, :, 1] * (ctk * hv)[:, None])
    quads = jnp.stack(
        [jnp.clip(qx, 0, W - 1), jnp.clip(qy, 0, H - 1)], axis=-1)
    quads = jnp.where(valid[:, None, None], quads, 0.0)
    if with_overflow:
        return boxes, score, valid, quads, overflow
    return boxes, score, valid, quads
