"""End-to-end throughput benchmark (run on real TPU by the driver).

Workload mirrors the reference pipeline's per-invoice compute
(`src/pipeline/pipeline2.py:279-343`): one DBNet++ (ResNet50+DCN, bf16)
forward at 960x960 + SVTRv2-base recognition over 64 crops (two batches
of 32) + greedy argmax. Prints ONE JSON line:

  {"metric": "e2e_invoices_per_sec", "value": N, "unit": "invoices/s/chip",
   "vs_baseline": N}

Timing methodology: this session's TPU sits behind an async execution
relay — dispatch returns immediately and ``block_until_ready`` does not
force execution, while a host fetch carries ~30ms fixed RPC overhead.
So each model is timed as a ``lax.fori_loop`` of the forward INSIDE one
jit (with a genuine carry dependence so XLA cannot hoist the body), and
per-iteration time is the difference between a long and a short loop.
Validated against a known-cost matmul (reports ~200 TFLOP/s bf16 on
v5e ~= peak).

Baseline: the reference publishes no throughput (BASELINE.md). The
constant below is the PyTorch-CPU reference measured on this image:
SVTRv2-base (real reference code) 2.28 s / 8 crops single-thread; DBNet++
cannot run (torchvision absent) and is estimated from its FLOPs ratio.
"""

from __future__ import annotations

import json
import time
from functools import partial

# PyTorch-CPU reference: rec 64 crops ~18.2 s + det @960^2 ~21.6 s (FLOPs
# scaled) => ~0.025 invoices/s. See module docstring.
BASELINE_INVOICES_PER_SEC = 0.025

DET_SIZE = 960
CROPS_PER_INVOICE = 64
REC_BATCH = 32


def _timed_loop(fn_loop, *args, n_lo=2, n_hi=10):
    """Per-iteration seconds via loop-count differencing."""
    float(fn_loop(*args, n_lo))  # compile + warm (forced by host fetch)
    float(fn_loop(*args, n_hi))
    t0 = time.time()
    float(fn_loop(*args, n_lo))
    t_lo = time.time() - t0
    t0 = time.time()
    float(fn_loop(*args, n_hi))
    t_hi = time.time() - t0
    return max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)


def main():
    import jax
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2

    det = DBNetPP(dcn=True, dtype=jnp.bfloat16)
    rec = SVTRv2(variant="base", dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    det_x = jax.random.normal(key, (1, DET_SIZE, DET_SIZE, 3), jnp.bfloat16)
    rec_x = jax.random.normal(key, (REC_BATCH, 32, 256, 3), jnp.bfloat16)
    det_vars = det.init(key, det_x)
    rec_vars = rec.init(key, rec_x)

    @partial(jax.jit, static_argnums=2)
    def det_loop(v, x, n):
        def body(i, carry):
            out = det.apply(v, carry)["binary"]
            # carry dependence (tiny perturbation) so the body can't be hoisted
            return carry + out.astype(carry.dtype) * jnp.bfloat16(1e-3)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    @partial(jax.jit, static_argnums=2)
    def rec_loop(v, x, n):
        def body(i, carry):
            lp = rec.apply(v, carry)  # (B, T, C) float32 log-probs
            bump = jnp.mean(lp).astype(carry.dtype) * jnp.bfloat16(1e-4)
            return carry + bump

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    det_t = _timed_loop(det_loop, det_vars, det_x)
    rec_t = _timed_loop(rec_loop, rec_vars, rec_x)

    per_invoice = det_t + rec_t * (CROPS_PER_INVOICE // REC_BATCH)
    invoices_per_sec = 1.0 / per_invoice

    print(
        json.dumps(
            {
                "metric": "e2e_invoices_per_sec",
                "value": round(invoices_per_sec, 3),
                "unit": "invoices/s/chip",
                "vs_baseline": round(invoices_per_sec / BASELINE_INVOICES_PER_SEC, 1),
                "detail": {
                    "det_960_ms": round(det_t * 1000, 3),
                    "rec_batch32_ms": round(rec_t * 1000, 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
