"""Per-stage timing of the fused OCR program on the real TPU.

Uses bench.py's loop-differencing methodology (the relay's async dispatch
makes naive block_until_ready timing meaningless) to split the fused
program into cumulative prefixes:

  det forward -> +extract_boxes -> full fused

plus a standalone "capacity crop" reference (det+extract+crop_resize_batch
over all max_boxes slots) — the cost the fused program NO LONGER pays now
that the chunked recognizer gathers each tile's crops lazily from the
source image (ops/warp.crop_resize_from_stack).

Run: python tools/profile_fused.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench
from ocr_vi_invoice_tpu.train.checkpoint import shipped_candidates  # noqa: E402  (reuse loaders + timing)


def main():
    bench._arm_watchdog(2400)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.ops.cc import extract_boxes
    from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode
    from ocr_vi_invoice_tpu.ops.warp import crop_resize_batch
    from ocr_vi_invoice_tpu.utils.config import PipelineConfig

    key = jax.random.PRNGKey(0)
    cfg = PipelineConfig(det_image_size=bench.DET_SIZE)
    pp = cfg.postprocess
    pp.box_thresh = 0.5
    pp.unclip_ratio = 1.6
    K = cfg.max_boxes
    rec_h, rec_w = cfg.rec_img_size

    det_probe = DBNetPP(dcn=True, dtype=jnp.bfloat16)
    det_x = jnp.zeros((1, bench.DET_SIZE, bench.DET_SIZE, 3), jnp.bfloat16)
    det_vars, det_meta = bench._load_vars(
        shipped_candidates("det"),
        lambda: det_probe.init(key, det_x),
    )
    dcn_mode = inference_dcn_mode(det_meta.get("dcn_mode", "pallas"))
    det = DBNetPP(dcn=det_meta.get("dcn", True), dcn_mode=dcn_mode,
                  dtype=jnp.bfloat16)

    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2

    rec_probe = SVTRv2(variant="base", dtype=jnp.bfloat16)
    rec_x = jnp.zeros((32, rec_h, rec_w, 3), jnp.bfloat16)
    rec_vars, rec_meta = bench._load_vars(
        shipped_candidates("rec"),
        lambda: rec_probe.init(key, rec_x),
    )

    from ocr_vi_invoice_tpu.utils.precision import cast_inference_params

    det_vars = cast_inference_params(det_vars, jnp.bfloat16)
    rec_vars = cast_inference_params(rec_vars, jnp.bfloat16)

    image = jnp.asarray(bench._bench_input())
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)

    def prob_of(img):
        norm = (img / 255.0 - mean) / std
        return det.apply(det_vars, norm[None].astype(jnp.bfloat16))[
            "binary"][0, :, :, 0]

    def boxes_of(img):
        return extract_boxes(prob_of(img), pp.thresh, pp.box_thresh,
                             pp.unclip_ratio, pp.min_area, max_boxes=K)

    @jax.jit
    def det_loop(img, n):
        def body(i, carry):
            p = prob_of(carry)
            return carry + jnp.sum(p).astype(carry.dtype) * 1e-12

        return jnp.sum(jax.lax.fori_loop(0, n, body, img))

    @jax.jit
    def boxes_loop(img, n):
        def body(i, carry):
            b, s, v = boxes_of(carry)
            return carry + jnp.sum(b) * 1e-12

        return jnp.sum(jax.lax.fori_loop(0, n, body, img))

    @jax.jit
    def crops_loop(img, n):
        def body(i, carry):
            b, s, v = boxes_of(carry)
            crops = crop_resize_batch(carry, b, v, rec_h, rec_w)
            return carry + jnp.sum(crops.astype(jnp.float32)) * 1e-12

        return jnp.sum(jax.lax.fori_loop(0, n, body, img))

    from ocr_vi_invoice_tpu.pipeline.fused import FusedOCR

    fused = FusedOCR(det_vars, rec_vars, cfg,
                     rec_variant=rec_meta.get("variant", "base"),
                     dtype=jnp.bfloat16, dcn_mode=dcn_mode)

    @jax.jit
    def fused_loop(img, n):
        def body(i, carry):
            boxes, scores, valid, quads, ids, _ovf = fused._run(det_vars, rec_vars, carry)
            return carry + (jnp.sum(boxes) * 1e-12 + jnp.sum(quads) * 1e-12
                            + jnp.sum(ids).astype(jnp.float32) * 1e-12)

        return jnp.sum(jax.lax.fori_loop(0, n, body, img))

    # how many boxes does the bench image actually produce?
    b, s, v = jax.jit(boxes_of)(image)
    n_valid = int(jnp.sum(v))

    t_det = bench._timed(det_loop, image, n_lo=2, n_hi=20)
    t_boxes = bench._timed(boxes_loop, image, n_lo=2, n_hi=20)
    t_crops = bench._timed(crops_loop, image, n_lo=2, n_hi=20)
    t_fused = bench._timed(fused_loop, image, n_lo=2, n_hi=12)

    print(json.dumps({
        "n_valid_boxes": n_valid,
        "det_ms": round(t_det * 1000, 2),
        "det+extract_ms": round(t_boxes * 1000, 2),
        "fused_ms": round(t_fused * 1000, 2),
        "extract_ms": round((t_boxes - t_det) * 1000, 2),
        "capacity_crop_ref_ms": round((t_crops - t_boxes) * 1000, 2),
        "rec_and_lazy_crops_ms": round((t_fused - t_boxes) * 1000, 2),
        "dcn_mode": dcn_mode,
    }))


if __name__ == "__main__":
    main()
