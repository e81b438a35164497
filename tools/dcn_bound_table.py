"""Per-layer DCN accounting at the TRAINED offset distribution.

Round-3 verdict item 1's alternative 'Done': a per-layer measured table
showing every DCN layer within ~1.2x of its computed VPU-byte bound.
For each of the 13 DCN layers of the shipped detector on a real
synthetic invoice:

  1. capture the offset/mask conv outputs (flax capture_intermediates)
     from a 960² forward of the shipped checkpoint;
  2. replay the Pallas kernel's guard logic in numpy to count exactly
     which (row-tile, cell, tap) MACs fire and which row slices load at
     those offsets — the kernel's work is fully determined by these
     counts;
  3. convert counts to VMEM bytes: each fired MAC is an f32 acc
     read-modify-write (2x) plus the broadcast multiply's operand read,
     each row-hit loads + converts a (tile, Wp, Cin) bf16 slice;
  4. measure an effective VMEM byte rate by timing the SAME kernel at a
     dense iid-offset configuration of known byte count (this folds the
     real per-op overheads into the rate instead of quoting a paper
     bandwidth);
  5. time the kernel at the trained offsets; ratio = measured / bound.

Emits one JSON line: per-layer {firings, rows, bytes_mb, bound_ms,
measured_ms, ratio} plus the calibration byte rate and matmul TFLOP/s.

Run AFTER training legs finish (timings are contention-sensitive):
  python tools/dcn_bound_table.py [--ckpt weights/det960d/best_model]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

R = 3
K = 9
TILE = 8


def firing_counts(dy, dx, tile_h=TILE):
    """Replay the kernel guards in numpy: returns (row_hits, cell_hits,
    mac_firings, parity_rows) summed over row tiles. dy/dx: (Ho, Wo, K)
    f32 already clipped.

    Round 5: the kernels now guard on per-tap SCALAR offset ranges
    (min/max per tile, interval-vs-open-support tests) instead of
    max-reducing full hat maps — see `dcn_kernel.py`. The replay mirrors
    that exactly, so counts include the conservative firings where a
    tile's offsets straddle a cell's support without entering it.
    `parity_rows` counts column-parity slice loads for the stride-2
    kernel (each fired sy loads only the parity views some cell of which
    fired; 1 or 2 per fired sy)."""
    import numpy as np

    Ho = dy.shape[0]
    Sy = 3 + 2 * R + 1
    Sx = 3 + 2 * R + 1
    n_tiles = -(-Ho // tile_h)
    rows = cells = macs = par_rows = 0
    ti = (np.arange(K) // 3).astype(np.float32)
    tj = (np.arange(K) % 3).astype(np.float32)
    for i in range(n_tiles):
        d_y = dy[i * tile_h:(i + 1) * tile_h].reshape(-1, K)  # (th*Wo, K)
        d_x = dx[i * tile_h:(i + 1) * tile_h].reshape(-1, K)
        dymin, dymax = d_y.min(axis=0), d_y.max(axis=0)
        dxmin, dxmax = d_x.min(axis=0), d_x.max(axis=0)
        for sy in range(Sy):
            cy = sy - R - ti
            row_ok = (dymax > cy - 1.0) & (dymin < cy + 1.0)
            if not row_ok.any():
                continue
            rows += 1
            par_need = [False, False]
            for sx in range(Sx):
                cx = sx - R - tj
                cell_ok = row_ok & (dxmax > cx - 1.0) & (dxmin < cx + 1.0)
                n = int(cell_ok.sum())
                if n:
                    cells += 1
                    macs += n
                    par_need[sx % 2] = True
            par_rows += int(par_need[0]) + int(par_need[1])
    return rows, cells, macs, par_rows


def layer_bytes(rows, macs, Wo, Wp, Cin):
    """VMEM bytes the stride-1 kernel must move at these counts (per
    image): fired MAC = acc RMW f32 (2x) + xs operand read f32;
    row hit = bf16 load + f32 store of the converted (tile, Wp, Cin)."""
    mac_b = macs * 3 * TILE * Wo * Cin * 4
    row_b = rows * TILE * Wp * Cin * (2 + 4)
    return mac_b + row_b


def layer_bytes_s2(par_rows, macs, Wo, Cin):
    """Stride-2 parity-view kernel byte model. The guard replay is
    stride-AGNOSTIC (same tap lattice over sy/sx in 0..Sy-1, split by
    parity inside the kernel), so `firing_counts` applies unchanged.
    Round 5: the kernel slices each column-parity view LAZILY — only the
    parities with a fired cell load at a given sy — so the row term uses
    the replayed `parity_rows` count ((tile, vc, Cin) bf16 load + f32
    convert each, vc = 8-aligned Wo + (Sx+1)//2). MAC bytes are
    identical to stride-1."""
    Sx = 3 + 2 * R + 1
    vc = -(-(Wo + (Sx + 1) // 2) // 8) * 8
    mac_b = macs * 3 * TILE * Wo * Cin * 4
    row_b = par_rows * TILE * vc * Cin * (2 + 4)
    return mac_b + row_b


def main():
    bench._arm_watchdog(3600)
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--image_size", type=int, default=960)
    ap.add_argument("--counts_only", action="store_true",
                    help="skip device timing (CPU-safe): emit firing "
                         "counts + bytes only")
    args = ap.parse_args()

    import jax

    if args.counts_only:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from ocr_vi_invoice_tpu.generator.generator import (
        GenerationScenario,
        SyntheticInvoiceGenerator,
    )
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.ops.pallas.dcn_kernel import (
        deform_conv2d_pallas,
        deform_conv2d_s2_pallas,
    )
    from ocr_vi_invoice_tpu.pipeline.postprocess import resize_image_for_det
    from ocr_vi_invoice_tpu.train.checkpoint import (
        load_weights,
        shipped_checkpoint,
    )

    ckpt = args.ckpt or shipped_checkpoint("det")
    restored = load_weights(ckpt)
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    model = DBNetPP(dcn=True, dcn_mode="gather", dtype=jnp.bfloat16)

    gen = SyntheticInvoiceGenerator.from_scenario(
        GenerationScenario.MIXED, seed=123)
    img, _, _ = gen.generate_sample()
    resized, _ = resize_image_for_det(img, args.image_size)
    canvas = np.zeros((args.image_size, args.image_size, 3), np.float32)
    canvas[: resized.shape[0], : resized.shape[1]] = resized
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    x = ((canvas / 255.0 - mean) / std)[None].astype(jnp.bfloat16)

    _, inter = model.apply(
        variables, jnp.asarray(x), capture_intermediates=(
            lambda mdl, _: mdl.name == "offset_mask_conv"))

    # collect (path, om) sorted by path for stable layer naming
    oms = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(inter):
        arr = np.asarray(leaf, np.float32)
        if arr.ndim == 4 and arr.shape[-1] == 3 * K:
            name = "/".join(
                getattr(p, "key", getattr(p, "name", str(p)))
                for p in path
                if str(getattr(p, "key", getattr(p, "name", p)))
                not in ("intermediates", "__call__"))
            oms.append((name, arr[0]))
    oms.sort(key=lambda t: t[0])
    print(f"captured {len(oms)} DCN offset maps from {ckpt}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    results = {"ckpt": str(ckpt), "layers": {}}

    def time_kernel(xin, off, mask, w, stride):
        Ho = off.shape[1]
        Cin = xin.shape[-1]

        def fn(xi, off, mask, w):
            if stride == 1:
                return deform_conv2d_pallas(xi, off, mask, w, 1, 1, R)
            return deform_conv2d_s2_pallas(xi, off, mask, w, 1, R)

        @jax.jit
        def loop(xin, off, mask, w, n):
            def body(i, acc):
                xi = xin * (1 + acc[0, 0, 0, 0] * jnp.bfloat16(1e-6))
                return acc + fn(xi, off, mask, w) * jnp.bfloat16(1e-3)

            acc0 = jnp.zeros((1, Ho, Ho, Cin), jnp.bfloat16)
            return jnp.sum(jax.lax.fori_loop(0, n, body, acc0)
                           .astype(jnp.float32))

        return bench._timed(loop, xin, off, mask, w,
                            n_lo=2, n_hi=42, budget_s=45) * 1e3

    if args.counts_only:
        for name, om in oms:
            Ho, Wo = om.shape[0], om.shape[1]
            o1, o2, m_raw = np.split(om, 3, axis=-1)
            offset = np.concatenate([o1, o2], axis=-1)
            dy = np.clip(offset[..., 0::2], -R, R)
            dx = np.clip(offset[..., 1::2], -R, R)
            rows, cells, macs, prows = firing_counts(dy, dx)
            Cin = {120: 128, 60: 256, 30: 512}[Ho]
            stride = 2 if "block0" in name else 1
            Wp = -(-(Wo + 2 * R + 3) // 8) * 8
            byt = (layer_bytes_s2(prows, macs, Wo, Cin) if stride == 2
                   else layer_bytes(rows, macs, Wo, Wp, Cin))
            results["layers"][name] = {
                "res": Ho, "cin": Cin, "stride": stride,
                "rows": rows, "cells": cells, "mac_firings": macs,
                "bytes_mb": round(byt / 1e6, 1),
            }
        print(json.dumps(results))
        return

    # ---- effective byte rate from a dense iid configuration ---------- #
    cal = {}
    for Ho, Cin in ((120, 128), (60, 256)):
        xin = jax.random.normal(key, (1, Ho, Ho, Cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, Cin, Cin), jnp.bfloat16) * 0.05
        off = jax.random.normal(key, (1, Ho, Ho, 18), jnp.bfloat16) * 0.5
        mask = jax.nn.sigmoid(
            jax.random.normal(key, (1, Ho, Ho, 9), jnp.bfloat16))
        offn = np.asarray(off, np.float32)
        dyc = np.clip(offn[0, ..., 0::2], -R, R)
        dxc = np.clip(offn[0, ..., 1::2], -R, R)
        rows, cells, macs, prows = firing_counts(dyc, dxc)
        Wp = -(-(Ho + 2 * R + 3) // 8) * 8
        byt = layer_bytes(rows, macs, Ho, Wp, Cin)
        ms = time_kernel(xin, off, mask, w, 1)
        cal[f"calib_c{Ho}"] = {"bytes_mb": round(byt / 1e6, 1),
                               "ms": round(ms, 3),
                               "gbps": round(byt / ms / 1e6, 1)}
    rate = max(v["gbps"] for v in cal.values()) * 1e9  # bytes/s
    # Separate calibration for the stride-2 parity-view kernel (its own
    # per-op overheads: two view loads per fired row, two parity loops) so
    # s2 bounds are measured against the s2 kernel's OWN dense rate, not
    # the stride-1 kernel's (round-4 weak #4: no published measured/bound
    # for the three stride-2 layers).
    for Ho, Cin in ((60, 256),):
        xin = jax.random.normal(key, (1, 2 * Ho, 2 * Ho, Cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, Cin, Cin), jnp.bfloat16) * 0.05
        off = jax.random.normal(key, (1, Ho, Ho, 18), jnp.bfloat16) * 0.5
        mask = jax.nn.sigmoid(
            jax.random.normal(key, (1, Ho, Ho, 9), jnp.bfloat16))
        offn = np.asarray(off, np.float32)
        dyc = np.clip(offn[0, ..., 0::2], -R, R)
        dxc = np.clip(offn[0, ..., 1::2], -R, R)
        rows, cells, macs, prows = firing_counts(dyc, dxc)
        byt = layer_bytes_s2(prows, macs, Ho, Cin)
        ms = time_kernel(xin, off, mask, w, 2)
        cal[f"calib_s2_c{Ho}"] = {"bytes_mb": round(byt / 1e6, 1),
                                  "ms": round(ms, 3),
                                  "gbps": round(byt / ms / 1e6, 1)}
    rate_s2 = cal["calib_s2_c60"]["gbps"] * 1e9
    results["calibration"] = cal
    results["byte_rate_gbps"] = round(rate / 1e9, 1)
    results["byte_rate_s2_gbps"] = round(rate_s2 / 1e9, 1)

    # ---- per-layer table at the trained offsets ---------------------- #
    for name, om in oms:
        Ho, Wo = om.shape[0], om.shape[1]
        o1, o2, m_raw = np.split(om, 3, axis=-1)
        offset = np.concatenate([o1, o2], axis=-1)
        dy = np.clip(offset[..., 0::2], -R, R)
        dx = np.clip(offset[..., 1::2], -R, R)
        rows, cells, macs, prows = firing_counts(dy, dx)
        # infer layer geometry: stride-2 layers have input 2*Ho
        # (offset grid == output grid); Cin from the captured conv input
        # is not retained, so look it up by resolution+name convention
        stage = {120: 128, 60: 256, 30: 512}[Ho]
        Cin = stage
        Wp = -(-(Wo + 2 * R + 3) // 8) * 8
        # the first block of each DCN stage is stride 2 (resnet.py:
        # stage{i}_block0 downsamples); offset grids are at OUTPUT res
        stride = 2 if "block0" in name else 1
        byt = (layer_bytes_s2(prows, macs, Wo, Cin) if stride == 2
               else layer_bytes(rows, macs, Wo, Wp, Cin))
        H_in = Ho * stride
        xin = jax.random.normal(key, (1, H_in, H_in, Cin), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, Cin, Cin), jnp.bfloat16) * 0.05
        ms = time_kernel(xin,
                         jnp.asarray(offset[None], jnp.bfloat16),
                         jnp.asarray(1 / (1 + np.exp(-m_raw))[None],
                                     jnp.bfloat16),
                         w, stride)
        bound_ms = byt / (rate_s2 if stride == 2 else rate) * 1e3
        results["layers"][name] = {
            "res": Ho, "cin": Cin, "stride": stride,
            "rows": rows, "cells": cells, "mac_firings": macs,
            "bytes_mb": round(byt / 1e6, 1),
            "bound_ms": round(bound_ms, 3),
            "measured_ms": round(ms, 3),
            "ratio": round(ms / max(bound_ms, 1e-9), 2),
        }
        print(json.dumps({name: results["layers"][name]}), file=sys.stderr)

    results["calib_matmul_tflops"] = round(bench._calibrate(), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
