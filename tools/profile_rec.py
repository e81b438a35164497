"""Per-stage timing of the SVTRv2 recognizer on the real TPU.

Splits the rec-tile cost (the fused pipeline's second-largest component
after the det forward) into stem / stage1..3 / FRM+head prefixes, and
microbenches the LocalMixing grouped conv against a block-diagonal
DENSE conv at the same shapes — grouped convs (feature_group_count) are
a known weak spot of the XLA:TPU conv emitter, while a dense 3x3 conv
with a block-diagonal kernel computes the identical function at full
MXU occupancy (4x the nominal FLOPs, but FLOPs are not the bottleneck
at these sizes).

Uses bench.py's loop-differencing methodology (async execution relay —
see bench.py docstring).

Run: python tools/profile_rec.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench
from ocr_vi_invoice_tpu.train.checkpoint import shipped_candidates  # noqa: E402


def main():
    bench._arm_watchdog(2400)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from flax import linen as nn

    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.utils.precision import cast_inference_params

    key = jax.random.PRNGKey(0)
    B, H, W = 64, 32, 256  # one fused rec tile

    rec_probe = SVTRv2(variant="base", dtype=jnp.bfloat16)
    x = jax.random.normal(key, (B, H, W, 3), jnp.bfloat16)
    rec_vars, rec_meta = bench._load_vars(
        shipped_candidates("rec"), lambda: rec_probe.init(key, x))
    rec_vars = cast_inference_params(rec_vars, jnp.bfloat16)
    rec = SVTRv2(variant=rec_meta.get("variant", "base"), dtype=jnp.bfloat16)

    results = {"tile": [B, H, W]}

    def timed_loop(fn, *args, scale=1e-4, n_lo=4, n_hi=84, budget=75):
        """args = (*static_args, carried_input). The carried input feeds
        fn each iteration and absorbs a scaled feedback of the result, so
        the loop body has a genuine data dependence and can't be hoisted."""

        @jax.jit
        def loop(*a):
            *xs, n = a

            def body(i, carry):
                r = fn(*xs[:-1], carry)
                return carry + jnp.mean(r).astype(carry.dtype) * jnp.asarray(
                    scale, carry.dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, n, body, xs[-1]).astype(jnp.float32))

        return bench._timed(loop, *args, n_lo=n_lo, n_hi=n_hi,
                            budget_s=budget)

    # ---- full model ------------------------------------------------------ #
    results["rec64_full_ms"] = round(
        timed_loop(lambda v, img: rec.apply(v, img), rec_vars, x) * 1e3, 3)

    # ---- grouped vs block-diag dense LocalMixing conv -------------------- #
    # Real shapes: stage1 dim=128 on (B, 8, 64, .), stage2 dim=256 on
    # (B, 4, 64, .). 2 convs per LocalMixing, 3+2 local blocks in 'base'.
    for dim, h in ((128, 8), (256, 4)):
        g = dim // 32
        xi = jax.random.normal(key, (B, h, 64, dim), jnp.bfloat16)
        wg = jax.random.normal(key, (3, 3, 32, dim), jnp.bfloat16) * 0.05
        # Block-diagonal embedding of wg: the dense conv computes the
        # IDENTICAL function to the grouped conv (zeros off-block), so the
        # timing doubles as a drop-in correctness check.
        wd = jnp.zeros((3, 3, dim, dim), jnp.bfloat16)
        for gi in range(g):
            wd = wd.at[:, :, gi * 32:(gi + 1) * 32, gi * 32:(gi + 1) * 32].set(
                wg[:, :, :, gi * 32:(gi + 1) * 32])

        def conv_grouped(w, xi):
            return jax.lax.conv_general_dilated(
                xi, w, (1, 1), [(1, 1), (1, 1)], feature_group_count=g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def conv_dense(w, xi):
            return jax.lax.conv_general_dilated(
                xi, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        results[f"grouped_conv_d{dim}_ms"] = round(
            timed_loop(conv_grouped, wg, xi, scale=1e-3, n_hi=164) * 1e3, 3)
        results[f"dense_conv_d{dim}_ms"] = round(
            timed_loop(conv_dense, wd, xi, scale=1e-3, n_hi=164) * 1e3, 3)

    # ---- MHSA + MLP reference points at stage shapes ---------------------- #
    # (what the non-local blocks cost, for the split)
    for dim, h, label in ((128, 8, "s1"), (256, 4, "s2"), (384, 2, "s3")):
        seq = jax.random.normal(key, (B, h * 64, dim), jnp.bfloat16)
        dense = nn.Dense(3 * dim, dtype=jnp.bfloat16)
        dvars = dense.init(key, seq)

        def attn_proxy(v, s):
            return dense.apply(v, s)

        results[f"qkv_dense_{label}_ms"] = round(
            timed_loop(attn_proxy, dvars, seq, scale=1e-3, n_hi=164) * 1e3, 3)

    results["calib_matmul_tflops"] = round(bench._calibrate(), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
