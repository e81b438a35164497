"""Batch serving runner: stream a directory through the fused pipeline.

Production-shaped counterpart of the reference's per-image loop
(`pipeline2.py:279`): images are decoded/resized by host prefetch threads
into the fixed detection bucket while the previous image's fused program
(det -> boxes -> crops -> rec) runs on the TPU, so host IO and device
compute overlap. Emits one JSON per image plus an aggregate
invoices/sec figure.

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
from typing import List, Optional

import cv2
import numpy as np

from ocr_vi_invoice_tpu.pipeline.postprocess import resize_image_for_det
from ocr_vi_invoice_tpu.utils.config import PipelineConfig


def _prefetch(paths: List[Path], det_size: int, q: "queue.Queue", threads: int = 2):
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
                q.put((p, None, None))
                continue
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            resized, scales = resize_image_for_det(rgb, det_size)
            canvas = np.zeros((det_size, det_size, 3), np.float32)
            canvas[: resized.shape[0], : resized.shape[1]] = resized
            q.put((p, canvas, (scales, resized.shape[:2], rgb.shape[:2])))

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
    ap.add_argument("--det_size", type=int, default=960)
    ap.add_argument("--max_boxes", type=int, default=256)
    ap.add_argument("--box_thresh", type=float, default=0.5)
    ap.add_argument("--unclip_ratio", type=float, default=1.6)
    ap.add_argument("--rec_variant", default="base")
    ap.add_argument("--prefetch_threads", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=1,
                    help=">1: run the fused program vmapped over image "
                         "stacks sharded across the device mesh's data "
                         "axis (must be a multiple of the data-axis size)")
    args = ap.parse_args(argv)

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

    cfg = PipelineConfig(det_image_size=args.det_size, max_boxes=args.max_boxes)
    cfg.postprocess.box_thresh = args.box_thresh
    cfg.postprocess.unclip_ratio = args.unclip_ratio

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
            key, jnp.zeros((1, args.det_size, args.det_size, 3), jnp.bfloat16)
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
    fused = FusedOCR(
        det_vars, rec_vars, cfg,
        rec_variant=rec_meta.get("variant", args.rec_variant),
        dcn_mode=inference_dcn_mode(det_meta.get("dcn_mode", "gather")),
        mesh=mesh,
    )

    paths = sorted(
        p for p in Path(args.input_dir).iterdir()
        if p.suffix.lower() in {".jpg", ".jpeg", ".png"}
    )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    q: "queue.Queue" = queue.Queue(maxsize=4)
    _prefetch(paths, args.det_size, q, args.prefetch_threads)

    n_done = 0
    t0 = time.time()

    def emit(p, results, meta):
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
        with open(out_dir / f"{p.stem}.json", "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False)
        n_done += 1
        if n_done == 1:
            t0 = time.time()  # exclude compile from the rate

    group: List = []  # (path, canvas, meta) awaiting a full batch
    while True:
        item = q.get()
        if item is not None:
            p, canvas, meta = item
            if canvas is None:
                print(f"{p.name}: unreadable, skipped")
                continue
            if args.batch_size <= 1:
                emit(p, fused(canvas), meta)
                continue
            group.append((p, canvas, meta))
        if item is None or len(group) == args.batch_size:
            if group:
                # pad the final partial group with blank canvases, then
                # drop the padded rows' results
                real = len(group)
                stack = np.stack(
                    [g[1] for g in group]
                    + [np.zeros_like(group[0][1])] * (args.batch_size - real)
                )
                for (p, _, meta), results in zip(
                        group, fused.batch(stack)[:real]):
                    emit(p, results, meta)
                group = []
            if item is None:
                break

    dt = max(time.time() - t0, 1e-9)
    rate = max(n_done - 1, 0) / dt
    print(f"Processed {n_done}/{len(paths)} images; "
          f"steady-state {rate:.2f} invoices/s")


if __name__ == "__main__":
    main()
