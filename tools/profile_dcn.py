"""Per-layer-shape timing of the DCN sampling paths on the real TPU.

The det forward is ~2/3 DCN cost (tools/profile_det.py: noDCN 6.6 ms vs
DCN 20+ ms at 960²), so this isolates each of the three DCN layer shapes
(c3/c4/c5, stride 1 and 2) and times:

  * pallas  — the fused shift-decomposition kernel (dcn_kernel.py)
  * gather  — XLA patch-gather with clipped offsets (ops/dcn)
  * conv    — a plain 3x3 conv at the same shape (the MXU floor)

for two offset regimes: trained-like small offsets (|Δ| ~ 0.5 px) and
adversarial large ones (|Δ| ~ R), because the Pallas kernel's (tap, cell)
guards fire per row tile — small clustered offsets skip most cells,
spread ones do not.

Run: python tools/profile_dcn.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main():
    bench._arm_watchdog(3000)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.ops.dcn import deform_conv2d
    from ocr_vi_invoice_tpu.ops.pallas.dcn_kernel import (
        deform_conv2d_pallas,
        deform_conv2d_s2_pallas,
    )

    key = jax.random.PRNGKey(0)
    R = 3

    # (label, Ho, Cin, stride) at 960² det input; Ho is the OUTPUT size
    # (offset-grid size), the input is Ho*stride; Cout == Cin (bottleneck
    # 3x3). Stride-2 goes through the parity-view Pallas forward.
    shapes = [
        ("c3_s1", 120, 128, 1),
        ("c4_s1", 60, 256, 1),
        ("c5_s1", 30, 512, 1),
        ("c3_s2", 120, 128, 2),
        ("c4_s2", 60, 256, 2),
        ("c5_s2", 30, 512, 2),
    ]

    results = {}

    for label, Ho, C, stride in shapes:
        H = Ho * stride
        x = jax.random.normal(key, (1, H, H, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        mask = jax.nn.sigmoid(
            jax.random.normal(key, (1, Ho, Ho, 9), jnp.bfloat16))
        for reg, sigma in (("small", 0.5), ("large", 2.0)):
            off = (jax.random.normal(key, (1, Ho, Ho, 18), jnp.bfloat16)
                   * sigma)

            def pal(xi, off, mask, w, stride=stride):
                if stride == 1:
                    return deform_conv2d_pallas(xi, off, mask, w, 1, 1, R)
                return deform_conv2d_s2_pallas(xi, off, mask, w, 1, R)

            def gat(xi, off, mask, w, stride=stride):
                return deform_conv2d(
                    xi, jnp.clip(off, -R, R), mask, w,
                    stride=stride, padding=1)

            for name, fn in (("pallas", pal), ("gather", gat)):
                # serialize iterations through a scalar feedback into the
                # input (output shape != input shape at stride 2, so the
                # stride-1 carry-the-input trick doesn't apply)
                @jax.jit
                def loop(x, off, mask, w, n, fn=fn):
                    def body(i, acc):
                        xi = x * (1 + acc[0, 0, 0, 0] * jnp.bfloat16(1e-6))
                        return acc + fn(xi, off, mask, w) * jnp.bfloat16(1e-3)

                    acc0 = jnp.zeros((1, Ho, Ho, C), jnp.bfloat16)
                    return jnp.sum(
                        jax.lax.fori_loop(0, n, body, acc0)
                        .astype(jnp.float32))

                ms = bench._timed(loop, x, off, mask, w,
                                  n_lo=2, n_hi=42, budget_s=60) * 1e3
                results[f"{label}_{reg}_{name}_ms"] = round(ms, 3)

        # plain conv floor
        @jax.jit
        def conv_loop(x, w, n, stride=stride):
            def body(i, acc):
                xi = x * (1 + acc[0, 0, 0, 0] * jnp.bfloat16(1e-6))
                r = jax.lax.conv_general_dilated(
                    xi, w, (stride, stride), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return acc + r * jnp.bfloat16(1e-3)

            acc0 = jnp.zeros((1, Ho, Ho, C), jnp.bfloat16)
            return jnp.sum(jax.lax.fori_loop(0, n, body, acc0)
                           .astype(jnp.float32))

        results[f"{label}_conv_ms"] = round(
            bench._timed(conv_loop, x, w, n_lo=2, n_hi=82, budget_s=60) * 1e3,
            3)

    results["calib_matmul_tflops"] = round(bench._calibrate(), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
