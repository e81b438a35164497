"""Batch serving runner: stream a directory through the fused pipeline.

Production-shaped counterpart of the reference's per-image loop
(`pipeline2.py:279`): images are decoded/resized by host prefetch threads
while the previous image's fused program (det -> boxes -> crops -> rec)
runs on the TPU, so host IO and device compute overlap. Emits one JSON
per image plus an aggregate invoices/sec figure.

Size buckets: the reference resizes every image to its own /32 geometry
(`src/det/test.py:109-121`) — one compile per distinct size under XLA.
Here images route to a small set of detection buckets (``--det_sizes``,
e.g. 640,960,1280): each image goes to the smallest bucket that holds
its longest side (aspect-preserving letterbox, like the host path), one
compiled ``FusedOCR`` program per bucket (built lazily, so a directory
that only needs one bucket pays one compile), batches grouped per
bucket. Mixed-size corpora pay neither global distortion nor
worst-case-bucket padding.

Per-image JSON: ``{"results": [...], "bucket": N, "overflow": [r, g, c]}``
where ``overflow`` counts capacity truncation inside `ops/cc.extract_boxes`
(runs dropped at row capacity, runs dropped at global capacity,
components dropped at box capacity) — all zeros on normal pages; nonzero
means the box list is incomplete (pathological pages, e.g. sand-grain
noise) and the page should be retried with larger ``--max_boxes``.

  python -m ocr_vi_invoice_tpu.pipeline.serve --input_dir imgs \
      --det_ckpt weights/det/best_model --rec_ckpt weights/rec2/best_model
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from ocr_vi_invoice_tpu.pipeline.postprocess import resize_image_for_det
from ocr_vi_invoice_tpu.utils.config import PipelineConfig


def pick_bucket(h: int, w: int, det_sizes: List[int]) -> int:
    """Smallest bucket that holds the image's longest side without
    upscaling-from-bucket distortion; images larger than every bucket
    downscale into the largest (same as the single-bucket behavior)."""
    long_side = max(h, w)
    for s in sorted(det_sizes):
        if long_side <= s:
            return s
    return max(det_sizes)


def _prefetch(paths: List[Path], det_sizes, q: "queue.Queue",
              threads: int = 2):
    """det_sizes: an int (single bucket, back-compat) or a list of bucket
    sizes; each queue item carries the chosen bucket."""
    if isinstance(det_sizes, int):
        det_sizes = [det_sizes]
    idx_q: "queue.Queue" = queue.Queue()
    for p in paths:
        idx_q.put(p)

    def work():
        while True:
            try:
                p = idx_q.get_nowait()
            except queue.Empty:
                return
            bgr = cv2.imread(str(p))
            if bgr is None:
                q.put((p, None, None, 0))
                continue
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            bucket = pick_bucket(rgb.shape[0], rgb.shape[1], det_sizes)
            resized, scales = resize_image_for_det(rgb, bucket)
            canvas = np.zeros((bucket, bucket, 3), np.float32)
            canvas[: resized.shape[0], : resized.shape[1]] = resized
            q.put((p, canvas,
                   (scales, resized.shape[:2], rgb.shape[:2]), bucket))

    workers = [threading.Thread(target=work, daemon=True) for _ in range(threads)]
    for w in workers:
        w.start()

    def closer():
        for w in workers:
            w.join()
        q.put(None)

    threading.Thread(target=closer, daemon=True).start()


def main(argv=None):
    ap = argparse.ArgumentParser(description="Fused-pipeline batch serving")
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--det_ckpt", default=None)
    ap.add_argument("--rec_ckpt", default=None)
    ap.add_argument("--output_dir", default="outputs/serve")
    ap.add_argument("--det_size", type=int, default=960,
                    help="single detection bucket (back-compat; ignored "
                         "when --det_sizes is given)")
    ap.add_argument("--det_sizes", default=None,
                    help="comma-separated bucket sizes, e.g. 640,960,1280: "
                         "each image routes to the smallest bucket holding "
                         "its longest side; one compiled program per bucket")
    ap.add_argument("--max_boxes", type=int, default=256)
    ap.add_argument("--box_thresh", type=float, default=0.5)
    ap.add_argument("--unclip_ratio", type=float, default=1.6)
    ap.add_argument("--rec_variant", default="base")
    ap.add_argument("--prefetch_threads", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=1,
                    help=">1: run the fused program vmapped over image "
                         "stacks sharded across the device mesh's data "
                         "axis (must be a multiple of the data-axis size); "
                         "batches group per bucket")
    args = ap.parse_args(argv)

    if args.det_sizes:
        det_sizes = sorted({int(s) for s in args.det_sizes.split(",")})
    else:
        det_sizes = [args.det_size]
    for s in det_sizes:
        if s % 32 != 0:
            raise SystemExit(f"bucket size {s} must be a multiple of 32")

    from ocr_vi_invoice_tpu.train.checkpoint import shipped_checkpoint

    args.det_ckpt = args.det_ckpt or shipped_checkpoint("det")
    args.rec_ckpt = args.rec_ckpt or shipped_checkpoint("rec")
    print(f"det ckpt: {args.det_ckpt or 'random weights'} | "
          f"rec ckpt: {args.rec_ckpt or 'random weights'}")

    import jax
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.pipeline.fused import FusedOCR
    from ocr_vi_invoice_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    def load_or_zeros(ckpt, build):
        if ckpt:
            from ocr_vi_invoice_tpu.train.checkpoint import load_weights

            r = load_weights(ckpt)
            return {"params": r["params"], "batch_stats": r["batch_stats"]}, r
        shapes = jax.eval_shape(build)
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        ), {}

    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2

    key = jax.random.PRNGKey(0)
    det_vars, det_meta = load_or_zeros(
        args.det_ckpt,
        lambda: DBNetPP(dcn=True, dtype=jnp.bfloat16).init(
            key, jnp.zeros((1, det_sizes[0], det_sizes[0], 3), jnp.bfloat16)
        ),
    )
    rec_vars, rec_meta = load_or_zeros(
        args.rec_ckpt,
        lambda: SVTRv2(variant=args.rec_variant, dtype=jnp.bfloat16).init(
            key, jnp.zeros((1, 32, 256, 3), jnp.bfloat16)
        ),
    )
    from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode

    mesh = None
    if args.batch_size > 1:
        from ocr_vi_invoice_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()  # all devices on the data axis
        if args.batch_size % mesh.shape["data"] != 0:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be a multiple of the "
                f"mesh data axis ({mesh.shape['data']})")

    engines: Dict[int, FusedOCR] = {}

    def engine(bucket: int) -> FusedOCR:
        # lazy per-bucket construction: a directory that only ever routes
        # to one bucket pays exactly one compile
        if bucket not in engines:
            cfg = PipelineConfig(det_image_size=bucket,
                                 max_boxes=args.max_boxes)
            cfg.postprocess.box_thresh = args.box_thresh
            cfg.postprocess.unclip_ratio = args.unclip_ratio
            engines[bucket] = FusedOCR(
                det_vars, rec_vars, cfg,
                rec_variant=rec_meta.get("variant", args.rec_variant),
                dcn_mode=inference_dcn_mode(det_meta.get("dcn_mode", "gather")),
                mesh=mesh,
            )
        return engines[bucket]

    paths = sorted(
        p for p in Path(args.input_dir).iterdir()
        if p.suffix.lower() in {".jpg", ".jpeg", ".png"}
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    q: "queue.Queue" = queue.Queue(maxsize=4)
    _prefetch(paths, det_sizes, q, args.prefetch_threads)

    n_done = 0
    t0 = time.time()
    bucket_stats: Dict[int, Dict[str, float]] = {
        s: {"images": 0, "seconds": 0.0} for s in det_sizes}

    def emit(p, results, meta, bucket, overflow):
        nonlocal n_done, t0
        # rescale boxes from bucket coords to original image coords
        (sh, sw), (rh, rw), (oh, ow) = meta
        for r in results:
            x0, y0, x1, y1 = r["box"]
            r["box"] = [
                float(np.clip(x0 / sw, 0, ow - 1)),
                float(np.clip(y0 / sh, 0, oh - 1)),
                float(np.clip(x1 / sw, 0, ow - 1)),
                float(np.clip(y1 / sh, 0, oh - 1)),
            ]
        doc = {"results": results, "bucket": bucket,
               "overflow": [int(v) for v in overflow]}
        if any(doc["overflow"]):
            print(f"{p.name}: capacity overflow {doc['overflow']} "
                  f"(runs@row, runs@global, components) — box list is "
                  f"incomplete; retry with larger --max_boxes")
        with open(out_dir / f"{p.stem}.json", "w", encoding="utf-8") as f:
            json.dump(doc, f, ensure_ascii=False)
        n_done += 1
        if n_done == 1:
            t0 = time.time()  # exclude compile from the rate

    # Each bucket's FIRST flush pays that engine's lazy XLA compile; fold
    # it into neither the per-bucket seconds nor the aggregate steady-state
    # rate (mid-stream compiles of later buckets would otherwise pollute
    # both — only the very first image's compile was excluded before).
    compiled_buckets: set = set()
    excluded_seconds = 0.0

    def flush(bucket: int, group: List):
        nonlocal excluded_seconds
        eng = engine(bucket)
        first_flush = bucket not in compiled_buckets
        compiled_buckets.add(bucket)
        mid_stream = n_done > 0
        tb = time.time()
        if args.batch_size <= 1:
            for p, canvas, meta in group:
                results = eng(canvas)
                emit(p, results, meta, bucket, eng.last_overflow)
        else:
            real = len(group)
            stack = np.stack(
                [g[1] for g in group]
                + [np.zeros((bucket, bucket, 3), np.float32)]
                * (args.batch_size - real)
            )
            batched = eng.batch(stack)
            for (p, _, meta), results, ovf in zip(
                    group, batched[:real], eng.last_overflow[:real]):
                emit(p, results, meta, bucket, ovf)
        dur = time.time() - tb
        if first_flush:
            if mid_stream:
                excluded_seconds += dur
        else:
            bucket_stats[bucket]["images"] += len(group)
            bucket_stats[bucket]["seconds"] += dur

    groups: Dict[int, List] = {s: [] for s in det_sizes}
    group_size = max(args.batch_size, 1)
    while True:
        item = q.get()
        if item is not None:
            p, canvas, meta, bucket = item
            if canvas is None:
                print(f"{p.name}: unreadable, skipped")
                continue
            groups[bucket].append((p, canvas, meta))
            if len(groups[bucket]) == group_size:
                flush(bucket, groups[bucket])
                groups[bucket] = []
        else:
            for bucket, group in groups.items():
                if group:
                    flush(bucket, group)
            break

    dt = max(time.time() - t0 - excluded_seconds, 1e-9)
    rate = max(n_done - 1, 0) / dt
    summary = {
        "images": n_done,
        "invoices_per_sec": round(rate, 3),
        "buckets": {
            str(s): {
                "images": int(v["images"]),
                "invoices_per_sec": round(
                    v["images"] / v["seconds"], 3) if v["seconds"] else None,
            }
            for s, v in bucket_stats.items() if v["images"]
        },
    }
    print(f"Processed {n_done}/{len(paths)} images; "
          f"steady-state {rate:.2f} invoices/s")
    print(json.dumps(summary))
    with open(out_dir / "_summary.json", "w", encoding="utf-8") as f:
        json.dump(summary, f)


if __name__ == "__main__":
    main()
