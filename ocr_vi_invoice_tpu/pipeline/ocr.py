"""End-to-end OCR pipeline: (scan) -> detect -> crop -> recognize.

Mirror of `src/pipeline/pipeline2.py:33-409` with TPU-shaped execution:
both model forwards are jitted once at fixed shapes (det at the /32
rounded size bucket, recognition at a fixed crop batch), crops are padded
to the batch capacity so no recompiles happen per image.

CLI:
  python -m ocr_vi_invoice_tpu.pipeline.ocr --image x.jpg \
      --det_ckpt weights/det/best_model --rec_ckpt weights/rec2/best_model
Random-weight smoke mode (no checkpoints) is allowed for plumbing tests.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ocr_vi_invoice_tpu.pipeline.postprocess import (
    DBPostProcessor,
    crop_image,
    resize_image_for_det,
)
from ocr_vi_invoice_tpu.utils.config import PipelineConfig

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class OCRPipeline:
    def __init__(
        self,
        det_ckpt: Optional[str] = None,
        rec_ckpt: Optional[str] = None,
        cfg: Optional[PipelineConfig] = None,
        rec_variant: str = "base",
        dtype=None,
        dcn_mode: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
        from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
        from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer
        from ocr_vi_invoice_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg or PipelineConfig()
        self.dtype = dtype or jnp.bfloat16
        self.tokenizer = Tokenizer()

        key = jax.random.PRNGKey(0)
        s = self.cfg.det_image_size
        det_x = jnp.zeros((1, s, s, 3), self.dtype)
        rec_h, rec_w = self.cfg.rec_img_size
        rec_x = jnp.zeros((self.cfg.rec_batch_size, rec_h, rec_w, 3), self.dtype)

        def load_or_zeros(ckpt, make_model, *args):
            if ckpt:
                from ocr_vi_invoice_tpu.train.checkpoint import load_weights

                restored = load_weights(ckpt)
                return make_model(restored), {
                    "params": restored["params"],
                    "batch_stats": restored["batch_stats"],
                }
            # No checkpoint: zero weights from shape inference only (cheap —
            # avoids compiling an init program). Smoke/plumbing mode.
            model = make_model({})
            shapes = jax.eval_shape(lambda: model.init(key, *args))
            return model, jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes
            )

        def make_det(meta):
            # Honor the sampling path the checkpoint was trained with
            # (train/det.py records dcn_mode in meta), unless overridden;
            # 'local' upgrades to the equivalent-but-faster Pallas kernel
            # on TPU backends.
            from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode

            mode = inference_dcn_mode(dcn_mode or meta.get("dcn_mode", "gather"))
            return DBNetPP(dcn=meta.get("dcn", True), dcn_mode=mode,
                           dtype=self.dtype)

        self.det, self.det_vars = load_or_zeros(det_ckpt, make_det, det_x)
        self.rec, self.rec_vars = load_or_zeros(
            rec_ckpt,
            lambda meta: SVTRv2(variant=meta.get("variant", rec_variant),
                                dtype=self.dtype),
            rec_x,
        )
        # Pre-cast big kernels to the compute dtype once instead of inside
        # every jitted call (bit-identical — see utils/precision.py).
        from ocr_vi_invoice_tpu.utils.precision import cast_inference_params

        self.det_vars = cast_inference_params(self.det_vars, self.dtype)
        self.rec_vars = cast_inference_params(self.rec_vars, self.dtype)

        self._det_fwd = jax.jit(lambda v, x: self.det.apply(v, x)["binary"])
        self._rec_fwd = jax.jit(
            lambda v, x: jnp.argmax(self.rec.apply(v, x), axis=-1).astype(jnp.int32)
        )
        self.post = DBPostProcessor.from_config(self.cfg.postprocess)
        self._scanner = None

    # ------------------------------------------------------------------ #

    def _preprocess_scan(self, image_rgb: np.ndarray) -> np.ndarray:
        """U-2-Net document scan; falls back to the original image."""
        try:
            from ocr_vi_invoice_tpu.pipeline.scanner import preprocess_image

            out = preprocess_image(image_rgb, enhance=self.cfg.enhance)
            return out if out is not None else image_rgb
        except Exception as e:
            print(f"Preprocessing unavailable/failed ({e}); using original image.")
            return image_rgb

    def detect(self, image_rgb: np.ndarray) -> Tuple[List[np.ndarray], List[float]]:
        """Boxes (in original image coords) + scores."""
        import jax.numpy as jnp

        s = self.cfg.det_image_size
        resized, (sh, sw) = resize_image_for_det(image_rgb, s)
        nh, nw = resized.shape[:2]
        norm = (resized.astype(np.float32) / 255.0 - _MEAN) / _STD
        # Pad into the fixed s x s bucket so the jitted program is reused;
        # padded area is zeros (mean pixel) and rarely produces boxes, which
        # are clipped below anyway.
        canvas = np.zeros((s, s, 3), np.float32)
        canvas[:nh, :nw] = norm
        prob = np.asarray(
            self._det_fwd(self.det_vars, jnp.asarray(canvas[None], self.dtype)),
            np.float32,
        )[0, :nh, :nw, 0]
        boxes, scores = self.post(prob)
        out_boxes = []
        for b in boxes:
            b = b.astype(np.float32)
            b[:, 0] = np.clip(b[:, 0] / sw, 0, image_rgb.shape[1] - 1)
            b[:, 1] = np.clip(b[:, 1] / sh, 0, image_rgb.shape[0] - 1)
            out_boxes.append(b)
        return out_boxes, scores

    def _prep_crop(self, crop: np.ndarray) -> np.ndarray:
        th, tw = self.cfg.rec_img_size
        h, w = crop.shape[:2]
        if h == 0 or w == 0:
            return np.zeros((th, tw, 3), np.float32)
        scale = th / h
        nw = int(w * scale)
        if nw > tw:
            crop = cv2.resize(crop, (tw, th))
        else:
            crop = cv2.resize(crop, (max(nw, 1), th))
            if tw - crop.shape[1] > 0:
                crop = cv2.copyMakeBorder(
                    crop, 0, 0, 0, tw - crop.shape[1], cv2.BORDER_CONSTANT,
                    value=(255, 255, 255),
                )
        return (crop.astype(np.float32) / 255.0 - _MEAN) / _STD

    def recognize(self, crops: List[np.ndarray]) -> List[str]:
        import jax.numpy as jnp

        if not crops:
            return []
        bs = self.cfg.rec_batch_size
        th, tw = self.cfg.rec_img_size
        texts: List[str] = []
        for i in range(0, len(crops), bs):
            chunk = crops[i : i + bs]
            batch = np.zeros((bs, th, tw, 3), np.float32)
            for j, c in enumerate(chunk):
                batch[j] = self._prep_crop(c)
            ids = np.asarray(self._rec_fwd(self.rec_vars, jnp.asarray(batch, self.dtype)))
            texts.extend(self.tokenizer.decode_ctc_greedy(ids[: len(chunk)]))
        return texts

    def __call__(self, image_rgb: np.ndarray, preprocess: Optional[bool] = None
                 ) -> List[Dict]:
        do_scan = self.cfg.preprocess if preprocess is None else preprocess
        if do_scan:
            image_rgb = self._preprocess_scan(image_rgb)
        boxes, scores = self.detect(image_rgb)
        crops = [crop_image(image_rgb, b) for b in boxes]
        keep = [i for i, c in enumerate(crops) if c.size > 0]
        texts = self.recognize([crops[i] for i in keep])
        results = []
        for t_idx, i in enumerate(keep):
            results.append(
                {
                    "box": boxes[i].tolist(),
                    "score": float(scores[i]),
                    "text": texts[t_idx],
                }
            )
        return results


def draw_boxes_with_text(image_rgb: np.ndarray, results: List[Dict]) -> np.ndarray:
    viz = image_rgb.copy()
    for r in results:
        box = np.asarray(r["box"], np.int32)
        cv2.polylines(viz, [box], True, (0, 255, 0), 2)
        x, y = box.min(axis=0)
        cv2.putText(viz, r["text"][:24], (int(x), max(int(y) - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 0, 0), 1, cv2.LINE_AA)
    return viz


def main():
    ap = argparse.ArgumentParser(description="End-to-end invoice OCR (TPU)")
    ap.add_argument("--image", type=str, default=None)
    ap.add_argument("--input_dir", type=str, default=None)
    ap.add_argument("--det_ckpt", type=str, default=None)
    ap.add_argument("--rec_ckpt", type=str, default=None)
    ap.add_argument("--output_dir", type=str, default="outputs")
    ap.add_argument("--det_size", type=int, default=960)
    ap.add_argument("--thresh", type=float, default=0.3)
    ap.add_argument("--box_thresh", type=float, default=0.5)
    ap.add_argument("--unclip_ratio", type=float, default=1.6)
    ap.add_argument("--min_area", type=float, default=10.0)
    ap.add_argument("--rec_variant", type=str, default="base")
    ap.add_argument("--preprocess", action="store_true")
    ap.add_argument("--visualize", action="store_true")
    args = ap.parse_args()

    from ocr_vi_invoice_tpu.train.checkpoint import shipped_checkpoint

    det_ckpt = args.det_ckpt or shipped_checkpoint("det")
    rec_ckpt = args.rec_ckpt or shipped_checkpoint("rec")
    print(f"det ckpt: {det_ckpt or 'random weights'} | "
          f"rec ckpt: {rec_ckpt or 'random weights'}")

    cfg = PipelineConfig(det_image_size=args.det_size, preprocess=args.preprocess)
    cfg.postprocess.thresh = args.thresh
    cfg.postprocess.box_thresh = args.box_thresh
    cfg.postprocess.unclip_ratio = args.unclip_ratio
    cfg.postprocess.min_area = args.min_area

    pipe = OCRPipeline(det_ckpt, rec_ckpt, cfg, rec_variant=args.rec_variant)

    paths: List[Path] = []
    if args.image:
        paths = [Path(args.image)]
    elif args.input_dir:
        paths = sorted(
            p for p in Path(args.input_dir).iterdir()
            if p.suffix.lower() in {".jpg", ".jpeg", ".png"}
        )
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    for p in paths:
        bgr = cv2.imread(str(p))
        if bgr is None:
            print(f"Failed to load {p}, skipping.")
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        t0 = time.time()
        results = pipe(rgb)
        print(f"{p.name}: {len(results)} regions in {time.time() - t0:.2f}s")
        with open(out_dir / f"{p.stem}.json", "w", encoding="utf-8") as f:
            json.dump(results, f, ensure_ascii=False, indent=1)
        if args.visualize:
            viz = draw_boxes_with_text(rgb, results)
            cv2.imwrite(str(out_dir / f"{p.stem}_viz.jpg"),
                        cv2.cvtColor(viz, cv2.COLOR_RGB2BGR))


if __name__ == "__main__":
    main()
