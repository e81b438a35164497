"""Detection-only inference CLI (equivalent of `src/det/test.py:109-313`).

Single image or directory: DBNet++ forward -> DBPostProcessor -> boxes,
optional crop dumps and visualization. Shares the jitted detector with
the full pipeline.

  python -m ocr_vi_invoice_tpu.pipeline.detect --image x.jpg \
      --model weights/det/best_model --visualize --save_crops
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import cv2
import numpy as np

from ocr_vi_invoice_tpu.pipeline.ocr import OCRPipeline
from ocr_vi_invoice_tpu.pipeline.postprocess import crop_image
from ocr_vi_invoice_tpu.utils.config import PipelineConfig


def main(argv=None):
    ap = argparse.ArgumentParser(description="DBNet++ inference (TPU)")
    ap.add_argument("--image", type=str, default=None)
    ap.add_argument("--input_dir", type=str, default=None)
    ap.add_argument("--model", type=str, default=None,
                    help="detector checkpoint dir (defaults to the newest "
                         "shipped weights/det* best_model)")
    ap.add_argument("--image_size", type=int, default=960)
    ap.add_argument("--thresh", type=float, default=0.3)
    ap.add_argument("--box_thresh", type=float, default=0.6)
    ap.add_argument("--unclip_ratio", type=float, default=1.5)
    ap.add_argument("--min_area", type=float, default=10.0)
    ap.add_argument("--preprocess", action="store_true",
                    help="run the document scanner first")
    ap.add_argument("--visualize", action="store_true")
    ap.add_argument("--save_crops", action="store_true")
    ap.add_argument("--output_dir", type=str, default="outputs/det")
    args = ap.parse_args(argv)

    from ocr_vi_invoice_tpu.train.checkpoint import shipped_checkpoint

    args.model = args.model or shipped_checkpoint("det")
    print(f"det ckpt: {args.model or 'random weights'}")

    cfg = PipelineConfig(det_image_size=args.image_size,
                         preprocess=args.preprocess)
    cfg.postprocess.thresh = args.thresh
    cfg.postprocess.box_thresh = args.box_thresh
    cfg.postprocess.unclip_ratio = args.unclip_ratio
    cfg.postprocess.min_area = args.min_area

    # Reuse the pipeline's detector half (rec stays unloaded/zeros).
    pipe = OCRPipeline(det_ckpt=args.model, rec_ckpt=None, cfg=cfg,
                       rec_variant="tiny")

    paths = []
    if args.image:
        paths = [Path(args.image)]
    elif args.input_dir:
        paths = sorted(p for p in Path(args.input_dir).iterdir()
                       if p.suffix.lower() in {".jpg", ".jpeg", ".png"})
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for p in paths:
        bgr = cv2.imread(str(p))
        if bgr is None:
            print(f"Failed to load {p}")
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if args.preprocess:
            rgb = pipe._preprocess_scan(rgb)
        t0 = time.time()
        boxes, scores = pipe.detect(rgb)
        print(f"{p.name}: {len(boxes)} regions ({time.time() - t0:.3f}s)")

        with open(out_dir / f"{p.stem}_boxes.json", "w") as f:
            json.dump(
                [{"box": b.tolist(), "score": float(s)}
                 for b, s in zip(boxes, scores)], f,
            )
        if args.visualize:
            viz = rgb.copy()
            for b in boxes:
                cv2.polylines(viz, [b.astype(np.int32)], True, (0, 255, 0), 2)
            cv2.imwrite(str(out_dir / f"{p.stem}_viz.jpg"),
                        cv2.cvtColor(viz, cv2.COLOR_RGB2BGR))
        if args.save_crops:
            for i, b in enumerate(boxes):
                crop = crop_image(rgb, b)
                if crop.size:
                    cv2.imwrite(str(out_dir / f"{p.stem}_crop{i:03d}.jpg"),
                                cv2.cvtColor(crop, cv2.COLOR_RGB2BGR))


if __name__ == "__main__":
    main()
