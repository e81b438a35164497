"""Per-component timing of the detection path on the real TPU.

Splits the fused program's dominant cost — the 960² DBNet++ forward —
into backbone variants (Pallas DCN vs gather DCN vs plain conv) and
separates extract_boxes into cumulative sub-stage prefixes, so kernel
work targets the measured bottleneck instead of a guess.

Uses bench.py's loop-differencing methodology (the relay's async
dispatch makes naive block_until_ready timing meaningless).

Run: python tools/profile_det.py
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
    bench._arm_watchdog(3000)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.ops.cc import extract_boxes
    from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode
    from ocr_vi_invoice_tpu.utils.config import PipelineConfig
    from ocr_vi_invoice_tpu.utils.precision import cast_inference_params

    key = jax.random.PRNGKey(0)
    S = bench.DET_SIZE
    cfg = PipelineConfig(det_image_size=S)
    pp = cfg.postprocess
    pp.box_thresh = 0.5
    pp.unclip_ratio = 1.6

    det_probe = DBNetPP(dcn=True, dtype=jnp.bfloat16)
    det_x = jnp.zeros((1, S, S, 3), jnp.bfloat16)
    det_vars, det_meta = bench._load_vars(
        shipped_candidates("det"),
        lambda: det_probe.init(key, det_x),
    )
    det_vars = cast_inference_params(det_vars, jnp.bfloat16)
    dcn_mode = inference_dcn_mode(det_meta.get("dcn_mode", "pallas"))

    image = jnp.asarray(bench._bench_input())
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    det_in = ((image / 255.0 - mean) / std)[None].astype(jnp.bfloat16)

    results = {}

    # ---- model variants -------------------------------------------------- #
    def model_loop(model, vars_):
        @jax.jit
        def loop(v, x, n):
            def body(i, carry):
                out = model.apply(v, carry)["binary"]
                return carry + out.astype(carry.dtype) * jnp.bfloat16(1e-3)

            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

        return loop, vars_

    variants = {
        "det_pallas": DBNetPP(dcn=True, dcn_mode=dcn_mode, dtype=jnp.bfloat16),
        "det_gather": DBNetPP(dcn=True, dcn_mode="gather", dtype=jnp.bfloat16),
    }
    for name, model in variants.items():
        loop, v = model_loop(model, det_vars)
        results[name + "_ms"] = round(
            bench._timed(loop, v, det_in, n_lo=2, n_hi=20, budget_s=90) * 1e3, 3)

    # plain-conv model: fresh init (different param tree)
    plain = DBNetPP(dcn=False, dtype=jnp.bfloat16)
    pv = bench._random_like_shapes(
        jax.eval_shape(lambda: plain.init(key, det_x)))
    pv = cast_inference_params(pv, jnp.bfloat16)
    loop, v = model_loop(plain, pv)
    results["det_noDCN_ms"] = round(
        bench._timed(loop, v, det_in, n_lo=2, n_hi=20, budget_s=90) * 1e3, 3)

    # backbone only (with DCN, pallas) — isolates neck+head cost
    from ocr_vi_invoice_tpu.models.resnet import ResNet

    bb = ResNet(name_="resnet50", dcn=True, dcn_mode=dcn_mode,
                dtype=jnp.bfloat16)
    bbv = {"params": det_vars["params"]["backbone"],
           "batch_stats": det_vars["batch_stats"]["backbone"]}

    @jax.jit
    def bb_loop(v, x, n):
        def body(i, carry):
            feats = bb.apply(v, carry)
            # consume EVERY pyramid level: feeding back only c2 lets XLA
            # dead-code-eliminate stages 2-4 (and all the DCN with them)
            fb = sum(jnp.mean(f).astype(carry.dtype) for f in feats)
            return carry + fb * jnp.bfloat16(1e-3)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    results["backbone_pallas_ms"] = round(
        bench._timed(bb_loop, bbv, det_in, n_lo=2, n_hi=20, budget_s=90) * 1e3, 3)

    # ---- extract_boxes sub-stages ---------------------------------------- #
    det_jit = jax.jit(lambda v, x: variants["det_pallas"].apply(v, x)["binary"])
    prob = det_jit(det_vars, det_in)[0, :, :, 0].astype(jnp.float32)
    prob = jax.block_until_ready(prob)

    def eb_loop(fn):
        @jax.jit
        def loop(p, n):
            def body(i, carry):
                r = fn(carry)
                return carry + r * 1e-9

            return jnp.sum(jax.lax.fori_loop(0, n, body, p))

        return loop

    H, W = prob.shape
    RPR = 64
    R = 4096

    def stage_runs(p):
        """mask + per-row top_k compaction + global top_k (stages 1-2)."""
        mask = p > pp.thresh
        left = jnp.pad(mask, ((0, 0), (1, 0)))[:, :W]
        right = jnp.pad(mask, ((0, 0), (0, 1)))[:, 1:]
        col = jnp.arange(W, dtype=jnp.int32)
        vr_s, cs = jax.lax.top_k(jnp.where(mask & ~left, W - col, 0), RPR)
        _, ce = jax.lax.top_k(jnp.where(mask & ~right, W - col, 0), RPR)
        rowi = jnp.arange(H, dtype=jnp.int32)[:, None]
        si_c = (rowi * W + cs).reshape(-1)
        ei_c = (rowi * W + ce).reshape(-1)
        slot_ok = (vr_s > 0).reshape(-1)
        vals_s, order = jax.lax.top_k(
            jnp.where(slot_ok, jnp.int32(H * W) - si_c, 0), R)
        return (jnp.sum(vals_s) + jnp.sum(si_c[order]) + jnp.sum(ei_c)
                ).astype(jnp.float32)

    def stage_psum(p):
        """the full-map cumsum + run mass gathers on top of stage_runs."""
        mask = p > pp.thresh
        probm = jnp.where(mask, p, 0.0).reshape(-1)
        cprob = jnp.cumsum(probm)
        return cprob[12345] + cprob[H * W - 1]

    def full(p):
        boxes, score, valid = extract_boxes(
            p, pp.thresh, pp.box_thresh, pp.unclip_ratio, pp.min_area,
            max_boxes=cfg.max_boxes)
        return jnp.sum(boxes) + jnp.sum(score)

    for name, fn in (("eb_runs_topk", stage_runs), ("eb_cumsum", stage_psum),
                     ("eb_full", full)):
        loop = eb_loop(fn)
        results[name + "_ms"] = round(
            bench._timed(loop, prob, n_lo=2, n_hi=42, budget_s=90) * 1e3, 3)

    results["calib_matmul_tflops"] = round(bench._calibrate(), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
