"""End-to-end throughput benchmark (run on real TPU by the driver).

Benches the REAL fused pipeline program (`pipeline/fused.py`): DBNet++
(ResNet50+DCN, bf16) at 960x960 -> on-device box extraction (ops/cc) ->
batched crop gather (ops/warp) -> SVTRv2 recognition over the full
max_boxes=256 crop capacity -> greedy argmax. Weights are the shipped
trained checkpoints (newest shipped leg per `checkpoint.shipped_candidates`) so
data-dependent paths
(Pallas DCN tap skipping, component sweeps) see trained-magnitude
offsets, not zeros; the input is a rendered synthetic invoice, not
noise. Component forwards are reported alongside. Prints ONE JSON line:

  {"metric": "e2e_invoices_per_sec", "value": N, "unit": "invoices/s/chip",
   "vs_baseline": N}

Timing methodology: this session's TPU sits behind an async execution
relay — dispatch returns immediately and ``block_until_ready`` does not
force execution, while a host fetch carries ~30ms fixed RPC overhead.
So each program runs inside a ``lax.fori_loop`` with a TRACED trip
count (one compile, no unrolling, genuine carry dependence so the body
can't be hoisted), forced by a scalar fetch; per-iteration time is the
difference between a long and a short loop. Validated against a
known-cost matmul (~200 TFLOP/s bf16 on v5e ≈ peak).

Baseline: the reference publishes no throughput (BASELINE.md). The
constant below is the PyTorch-CPU reference measured on this image:
SVTRv2-base (actual reference code) 2.28 s / 8 crops single-thread; DBNet++
cannot run here (torchvision absent) and is estimated from its FLOPs ratio.
rec 64 crops ~18.2 s + det @960^2 ~21.6 s => ~0.025 invoices/s.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

BASELINE_INVOICES_PER_SEC = 0.025

DET_SIZE = 960
REC_BATCH = 32



def _random_like_shapes(tree, scale=0.05):
    """Realistic-magnitude random params (NOT zeros: zero offsets/weights
    are the Pallas DCN kernel's best case and would flatter the numbers)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(jax.random.PRNGKey(0), max(len(leaves), 1))
    out = [
        (jax.random.normal(k, l.shape, jnp.float32) * scale).astype(l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating)
        else jnp.zeros(l.shape, l.dtype)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def _load_vars(ckpt_dirs, fallback_shapes_fn):
    """(variables, meta) from the first shipped checkpoint that exists
    (best-first), else random params."""
    for ckpt_dir in ckpt_dirs:
        if ckpt_dir.exists():
            from ocr_vi_invoice_tpu.train.checkpoint import load_weights

            r = load_weights(ckpt_dir)
            return {"params": r["params"], "batch_stats": r["batch_stats"]}, r
    import jax

    return _random_like_shapes(jax.eval_shape(fallback_shapes_fn)), {}


def _bench_input():
    """A rendered synthetic invoice in the 960x960 det bucket (float32
    0..255) — realistic text density for the box-extraction stage."""
    import numpy as np

    try:
        from ocr_vi_invoice_tpu.generator.generator import (
            SyntheticInvoiceGenerator,
        )
        from ocr_vi_invoice_tpu.pipeline.postprocess import resize_image_for_det

        gen = SyntheticInvoiceGenerator(seed=7)
        img, _, _ = gen.generate_realistic()
        resized, _ = resize_image_for_det(img, DET_SIZE)
        canvas = np.zeros((DET_SIZE, DET_SIZE, 3), np.float32)
        canvas[: resized.shape[0], : resized.shape[1]] = resized
        return canvas
    except Exception:
        rng = np.random.RandomState(0)
        return rng.uniform(0, 255, (DET_SIZE, DET_SIZE, 3)).astype(np.float32)


def _measure(fn, args, n, repeats):
    import jax.numpy as jnp

    ts = []
    for _ in range(repeats):
        t0 = time.time()
        float(fn(*args, jnp.int32(n)))
        ts.append(time.time() - t0)
    return ts


def _timed(fn, *args, n_lo=2, n_hi=12, repeats=3, max_scale=16,
           budget_s=120):
    """Loop-differenced per-iteration time, robust to a NOISY shared TPU.

    Estimator: min over repeats of the long-loop wall time minus min over
    repeats of the short-loop wall time (other tenants' load only ADDS
    time, so per-length minima approximate the uncontended cost — cf.
    timeit's min; differencing cancels the fixed dispatch/fetch
    overhead). If the differenced signal does not dominate the observed
    jitter (min-to-median spread of the raw measurements), the long trip
    count is doubled and the measurement repeated, up to ``max_scale``x —
    in a contention window the relay adds multi-SECOND queue waits that
    drown a sub-second signal (observed: the same compiled rec program at
    5.4 and 29.4 ms/iter half an hour apart while a matmul calibration in
    between hit 191 TFLOP/s ~= v5e peak; det @960 "0.0 ms" when a
    contended short run made the pair diff negative). Escalation is free
    on a healthy machine (first round accepts immediately) and is bounded
    by ``budget_s`` wall-clock so the whole bench always finishes inside
    its watchdog even on a near-stalled relay — on budget exhaustion the
    round with the best signal-to-jitter ratio wins, best-effort."""
    import jax.numpy as jnp

    float(fn(*args, jnp.int32(n_lo)))  # compile + warm
    start = time.time()
    scale = 1
    best_ratio, best_est = -1.0, 1e-9
    while True:
        hi = n_lo + (n_hi - n_lo) * scale
        float(fn(*args, jnp.int32(hi)))  # warm this trip count
        lo_ts = _measure(fn, args, n_lo, repeats)
        hi_ts = _measure(fn, args, hi, repeats)
        diff = min(hi_ts) - min(lo_ts)
        jitter = (sorted(lo_ts)[len(lo_ts) // 2] - min(lo_ts)) + (
            sorted(hi_ts)[len(hi_ts) // 2] - min(hi_ts))
        est = max(diff, 1e-9) / (hi - n_lo)
        ratio = diff / max(jitter, 1e-12)
        if ratio > best_ratio:
            best_ratio, best_est = ratio, est
        if diff > 4 * jitter:
            return est
        if scale >= max_scale or time.time() - start > budget_s:
            return best_est
        scale *= 2


def _calibrate():
    """Known-cost bf16 matmul, timed with the same loop differencing.
    Reported in the output JSON so a contended/degraded TPU session is
    visible in the recorded bench (v5e peak is ~200 TFLOP/s; healthy
    runs measure ~190)."""
    import jax
    import jax.numpy as jnp

    N = 4096
    x = jax.random.normal(jax.random.PRNGKey(0), (N, N), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16)

    @jax.jit
    def mm_loop(x, w, n):
        def body(i, c):
            return (c @ w) * jnp.bfloat16(1e-3)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    t = _timed(mm_loop, x, w, n_lo=10, n_hi=210, repeats=3, budget_s=60)
    return 2 * N**3 / t / 1e12


def _arm_watchdog(seconds: int = 1500) -> None:
    """Hard wall-clock bound: the dev TPU sits behind a relay that can
    wedge (device calls block forever, unkillable by timeout(1) because
    the hang is in a worker thread). SIGALRM aborts the process instead
    of hanging the driver's bench run."""
    import signal

    def _abort(signum, frame):
        print(json.dumps({
            "metric": "e2e_invoices_per_sec", "value": 0.0,
            "unit": "invoices/s/chip", "vs_baseline": 0.0,
            "error": f"watchdog: device unresponsive after {seconds}s",
        }), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, _abort)
    signal.alarm(seconds)


def main(watchdog_s: int = 1500):
    _arm_watchdog(watchdog_s)
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode
    from ocr_vi_invoice_tpu.utils.config import PipelineConfig

    key = jax.random.PRNGKey(0)
    cfg = PipelineConfig(det_image_size=DET_SIZE)
    pp = cfg.postprocess
    pp.box_thresh = 0.5
    pp.unclip_ratio = 1.6
    K = cfg.max_boxes
    rec_h, rec_w = cfg.rec_img_size

    # Trained checkpoints; DCN path per the checkpoint's recorded training
    # mode, upgraded 'local' -> Pallas kernel on TPU (identical semantics).
    det_probe = DBNetPP(dcn=True, dtype=jnp.bfloat16)
    det_x = jnp.zeros((1, DET_SIZE, DET_SIZE, 3), jnp.bfloat16)
    from ocr_vi_invoice_tpu.train.checkpoint import (
        shipped_candidates, shipped_checkpoint)

    det_vars, det_meta = _load_vars(
        shipped_candidates("det"), lambda: det_probe.init(key, det_x))
    dcn_mode = inference_dcn_mode(det_meta.get("dcn_mode", "pallas"))
    det = DBNetPP(dcn=det_meta.get("dcn", True), dcn_mode=dcn_mode,
                  dtype=jnp.bfloat16)

    rec_probe = SVTRv2(variant="base", dtype=jnp.bfloat16)
    rec_x = jnp.zeros((REC_BATCH, rec_h, rec_w, 3), jnp.bfloat16)
    rec_vars, rec_meta = _load_vars(
        shipped_candidates("rec"), lambda: rec_probe.init(key, rec_x))
    rec = SVTRv2(variant=rec_meta.get("variant", "base"), dtype=jnp.bfloat16)

    # Serve-path precision: big kernels pre-cast to bf16 once (what the
    # pipelines do at construction). Passing raw f32 checkpoints as jit
    # ARGUMENTS re-casts ~190 MB of params inside every call: measured
    # 270 ms/iter vs 44 ms for the same fused program on v5e.
    from ocr_vi_invoice_tpu.utils.precision import cast_inference_params

    det_vars = cast_inference_params(det_vars, jnp.bfloat16)
    rec_vars = cast_inference_params(rec_vars, jnp.bfloat16)

    image = jnp.asarray(_bench_input())

    # ---- component forwards -------------------------------------------- #
    @jax.jit
    def det_loop(v, x, n):
        def body(i, carry):
            out = det.apply(v, carry)["binary"]
            return carry + out.astype(carry.dtype) * jnp.bfloat16(1e-3)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    @jax.jit
    def rec_loop(v, x, n):
        def body(i, carry):
            lp = rec.apply(v, carry)
            return carry + jnp.mean(lp).astype(carry.dtype) * jnp.bfloat16(1e-4)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    det_in = ((image / 255.0 - mean) / std)[None].astype(jnp.bfloat16)
    rec_in = jnp.tile(det_in[0, :32, :rec_w][None], (REC_BATCH, 1, 1, 1))

    # ---- the FUSED program: det -> boxes -> crops -> rec -> argmax ------ #
    # THE shipped program (pipeline/fused.py FusedOCR._run — incl. its
    # chunked-rec tile skipping), wrapped in a carried loop so the relay's
    # async dispatch can't fake the timing.
    from ocr_vi_invoice_tpu.pipeline.fused import FusedOCR

    fused = FusedOCR(det_vars, rec_vars, cfg,
                     rec_variant=rec_meta.get("variant", "base"),
                     dtype=jnp.bfloat16, dcn_mode=dcn_mode)

    @jax.jit
    def fused_loop(dv, rv, img, n):
        def body(i, carry):
            boxes, scores, valid, quads, ids, _ovf = fused._run(dv, rv, carry)
            feedback = (jnp.sum(boxes) * 1e-12 + jnp.sum(quads) * 1e-12
                        + jnp.sum(ids).astype(jnp.float32) * 1e-12)
            return carry + feedback

        return jnp.sum(jax.lax.fori_loop(0, n, body, img))

    # ---- batched serving: the production mode (pipeline/serve.py) ------ #
    # FusedOCR.batch's program: det vmapped over a stack of 8 invoices,
    # box slots compacted valid-first ACROSS the batch so recognition pays
    # for the batch's actual text lines, not 8 x max_boxes capacity. Batch
    # conv occupancy + amortized per-call overhead make this the best
    # per-invoice rate on one chip.
    BATCH = 8
    batch_imgs = jnp.stack(
        [image * (1.0 - 0.01 * i) for i in range(BATCH)])

    @jax.jit
    def batch_loop(dv, rv, imgs, n):
        def body(i, carry):
            boxes, scores, valid, quads, ids, _ovf = fused._run_batch(dv, rv, carry)
            feedback = (jnp.sum(boxes) * 1e-12 + jnp.sum(quads) * 1e-12
                        + jnp.sum(ids).astype(jnp.float32) * 1e-12)
            return carry + feedback

        return jnp.sum(jax.lax.fori_loop(0, n, body, imgs))

    # Two measurement passes, minutes apart, min per quantity: the shared
    # chip shows minutes-long windows of 3-6x slowdown from other tenants
    # (the matmul calibration reads ~190 TFLOP/s in the SAME bench run
    # whose fused measurement lands in a slow window). Min over attempts
    # spread across the run is the only estimator that survives this.
    det_t = rec_t = fused_t = float("inf")
    # every individual pass is recorded in the detail so the min-over-
    # windows estimator is auditable (round-3 advisor: a composite of
    # per-quantity minima can't be checked without the raw passes)
    passes = {"det": [], "rec": [], "fused": [], "batch8": []}
    for budgets in ((90, 90, 120), (45, 45, 75)):
        d = _timed(det_loop, det_vars, det_in, n_lo=2, n_hi=20,
                   budget_s=budgets[0])
        passes["det"].append(round(d * 1000, 3))
        det_t = min(det_t, d)
        # rec-32 is ~5 ms: needs a long loop to clear the ~30 ms relay RPC
        # jitter (r02 briefly reported 0.0 ms from a 12-iteration diff)
        r = _timed(rec_loop, rec_vars, rec_in, n_lo=4, n_hi=84,
                   budget_s=budgets[1])
        passes["rec"].append(round(r * 1000, 3))
        rec_t = min(rec_t, r)
        f = _timed(fused_loop, det_vars, rec_vars, image, n_lo=2, n_hi=18,
                   budget_s=budgets[2])
        passes["fused"].append(round(f * 1000, 3))
        fused_t = min(fused_t, f)
    # A third, delayed fused attempt: the headline number must not be
    # hostage to one multi-minute contention window (observed: both fused
    # passes of a run landing 3.5x high while det/rec/calib in the SAME
    # run read clean — recorded 165 ms vs 47 ms re-measured later).
    f = _timed(fused_loop, det_vars, rec_vars, image, n_lo=2, n_hi=18,
               budget_s=75)
    passes["fused"].append(round(f * 1000, 3))
    fused_t = min(fused_t, f)
    # The fused program CONTAINS the det forward: fused_t < det_t is a
    # physically impossible reading (residual relay noise), so clamp to
    # the det time rather than report an absurd headline.
    fused_t = max(fused_t, det_t)

    # Batched serving rate (guarded: the headline must survive a batch-
    # path compile/exec failure on a degraded chip).
    batch_t = float("inf")
    try:
        for budget in (75, 60):
            b = _timed(batch_loop, det_vars, rec_vars, batch_imgs,
                       n_lo=1, n_hi=8, budget_s=budget)
            passes["batch8"].append(round(b * 1000, 3))
            batch_t = min(batch_t, b)
        batch_t = max(batch_t, det_t)  # contains >= one det forward
    except Exception as e:  # pragma: no cover - chip-state dependent
        print(f"# batch path skipped: {e}", flush=True)
    calib_tflops = _calibrate()

    # A third, delayed batch attempt (same treatment as fused): the
    # calibration above separates it in time from the first two windows,
    # so one contention window cannot sink the batch-serving number.
    if np.isfinite(batch_t):
        try:
            b = _timed(batch_loop, det_vars, rec_vars, batch_imgs,
                       n_lo=1, n_hi=8, budget_s=60)
            passes["batch8"].append(round(b * 1000, 3))
            batch_t = min(batch_t, b)
            batch_t = max(batch_t, det_t)
        except Exception as e:  # pragma: no cover - chip-state dependent
            print(f"# batch retry skipped: {e}", flush=True)
    batch_per_invoice = batch_t / BATCH

    invoices_per_sec = max(1.0 / fused_t,
                           0.0 if not np.isfinite(batch_per_invoice)
                           else 1.0 / batch_per_invoice)

    print(
        json.dumps(
            {
                "metric": "e2e_invoices_per_sec",
                "value": round(invoices_per_sec, 3),
                "unit": "invoices/s/chip",
                "vs_baseline": round(invoices_per_sec / BASELINE_INVOICES_PER_SEC, 1),
                "detail": {
                    "fused_e2e_ms": round(fused_t * 1000, 3),
                    "batch8_per_invoice_ms": (
                        round(batch_per_invoice * 1000, 3)
                        if np.isfinite(batch_per_invoice) else None),
                    "det_960_ms": round(det_t * 1000, 3),
                    "rec_batch32_ms": round(rec_t * 1000, 3),
                    "max_boxes": K,
                    "calib_matmul_tflops": round(calib_tflops, 1),
                    "dcn_mode": dcn_mode,
                    "passes_ms": passes,
                    "weights": ("trained" if shipped_checkpoint("det")
                                else "random"),
                },
            }
        )
    )


def _main_with_retry():
    """The dev TPU relay can drop a request mid-run (observed:
    FAILED_PRECONDITION on a host fetch during an otherwise healthy
    session). One retry rides out a transient; a persistent fault still
    produces ONE parseable JSON line (value 0 + error) instead of a bare
    traceback, so the driver's bench record never comes back empty. The
    SIGALRM watchdog separately bounds hangs."""
    try:
        main()
        return
    except Exception as e:  # noqa: BLE001 — anything device-side
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); "
              "retrying once", flush=True)
    time.sleep(30)
    try:
        # Shorter bound on the retry: the first attempt already spent a
        # watchdog window, and a relay that failed twice won't recover.
        main(watchdog_s=900)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({
            "metric": "e2e_invoices_per_sec", "value": 0.0,
            "unit": "invoices/s/chip", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }), flush=True)


if __name__ == "__main__":
    _main_with_retry()
