"""Kernel-variant tuning for the stride-1 Pallas DCN forward.

Measures candidate restructurings of `ops/pallas/dcn_kernel._dcn_kernel`
against the shipped baseline at the det layer shapes, with correctness
checked against the baseline output first. Variants:

  * base        — shipped kernel (dcn_kernel.deform_conv2d_pallas)
  * hat3d       — hat weights kept (tile, Wo, 1)-shaped so the broadcast
                  against the (tile, Wo, Cin) input slice needs no
                  lane->sublane relayout per (tap, cell) firing
  * hat3d_bf16  — + bfloat16 accumulator (halves VMEM traffic of the
                  dominant read-modify-write; each slot sums <= 4 hat
                  contributions so the rounding stays ~1e-3 relative)
  * hat3d_t16   — + tile_h 16 (fewer acc zero/matmul passes, looser
                  guards)

Run: python tools/tune_dcn.py
"""

from __future__ import annotations

import functools
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def make_variant2(hat3d: bool, rowsplit: int, bf16_mac: bool, tile_h: int):
    """Round-4 candidates on top of the shipped kernel:

      * hoisting (always on here): per-tap ROW hat weights computed once
        per sy instead of once per (sy, sx) cell, and the whole sy body
        (including the rows slice + f32 convert) guarded by a row-level
        support test — trained offsets are small, so ~half the Sy
        iterations have no tap with row support at all.
      * hat3d: keep hat maps (tile, Wo, 1)-shaped (no lane->sublane
        relayout when broadcasting against the (tile, Wo, Cin) slice).
      * rowsplit: split each fired (tap, cell) MAC into `rowsplit`
        row chunks, each behind its own chunk-level max guard — finer
        sparsity granularity without shrinking the grid tile.
      * bf16_mac: keep xs in bf16 and accumulate in bf16 (hat weights
        still computed in f32, cast at the multiply) — halves the RMW
        bytes of the dominant accumulation; each slot sums <= 4 hat
        contributions so rounding stays ~1e-2 relative worst-case.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    acc_dtype = jnp.bfloat16 if bf16_mac else jnp.float32

    def kern(x_ref, dy_ref, dx_ref, mask_ref, w_ref, out_ref, acc_ref, *,
             R, K, kh, kw, th, Wo, Cin, Cout):
        i = pl.program_id(1)
        row_base = i * th
        dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)
        dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
        m = mask_ref[0].astype(jnp.float32)
        Sy = kh + 2 * R + 1
        Sx = kw + 2 * R + 1
        acc_ref[...] = jnp.zeros((th, Wo, K * Cin), acc_ref.dtype)
        chunk = th // rowsplit

        def sy_body(sy, _):
            syf = sy.astype(jnp.float32)
            wys, rhits = [], []
            for t in range(K):
                ti = t // kw
                if hat3d:
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(dy[..., t:t + 1] - (syf - R - ti)))
                else:
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(dy[..., t] - (syf - R - ti)))
                wys.append(wy)
                rhits.append(jnp.max(wy))
            row_hit = functools.reduce(jnp.maximum, rhits)

            @pl.when(row_hit > 0.0)
            def _():
                rows = x_ref[0, pl.ds(row_base + sy, th), :, :]
                if not bf16_mac:
                    rows_c = rows.astype(jnp.float32)
                else:
                    rows_c = rows
                for sx in range(Sx):
                    w2s, hits = [], []
                    for t in range(K):
                        tj = t % kw
                        if hat3d:
                            wx = jnp.maximum(
                                0.0,
                                1.0 - jnp.abs(dx[..., t:t + 1]
                                              - (sx - R - tj)))
                            w2s.append(wys[t] * wx * m[..., t:t + 1])
                        else:
                            wx = jnp.maximum(
                                0.0,
                                1.0 - jnp.abs(dx[..., t] - (sx - R - tj)))
                            w2s.append((wys[t] * wx * m[..., t])[..., None])
                        hits.append(jnp.max(w2s[-1]))
                    any_hit = functools.reduce(jnp.maximum, hits)

                    @pl.when(any_hit > 0.0)
                    def _(sx=sx, w2s=w2s, hits=hits):
                        xs = rows_c[:, sx:sx + Wo, :]
                        for t in range(K):
                            sl = slice(t * Cin, (t + 1) * Cin)
                            w2t = w2s[t].astype(acc_ref.dtype)
                            if rowsplit == 1:
                                @pl.when(hits[t] > 0.0)
                                def _(t=t, w2t=w2t, sl=sl):
                                    acc_ref[:, :, sl] += w2t * xs
                            else:
                                for h0 in range(0, th, chunk):
                                    hc = jnp.max(w2s[t][h0:h0 + chunk])

                                    @pl.when(hc > 0.0)
                                    def _(t=t, w2t=w2t, sl=sl, h0=h0):
                                        acc_ref[h0:h0 + chunk, :, sl] += (
                                            w2t[h0:h0 + chunk]
                                            * xs[h0:h0 + chunk])
            return 0

        jax.lax.fori_loop(0, Sy, sy_body, 0)
        out = jax.lax.dot_general(
            acc_ref[...].reshape(th * Wo, K * Cin).astype(jnp.float32),
            w_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = out.reshape(th, Wo, Cout).astype(out_ref.dtype)

    def fwd(x, offset, mask, weight, padding=1, radius=3):
        B, H, W, Cin = x.shape
        kh, kw, _, Cout = weight.shape
        K = kh * kw
        Ho, Wo = offset.shape[1], offset.shape[2]
        R = radius
        n_tiles = -(-Ho // tile_h)
        Ho_pad = n_tiles * tile_h
        pad_lo = R + padding
        need_rows = Ho_pad + 2 * R + kh
        need_cols = Wo + 2 * R + kw
        need_cols = -(-need_cols // 8) * 8
        xp = jnp.pad(x, ((0, 0),
                         (pad_lo, max(need_rows - pad_lo - H, 0)),
                         (pad_lo, max(need_cols - pad_lo - W, 0)),
                         (0, 0)))
        Hp, Wp = xp.shape[1], xp.shape[2]
        if Ho_pad != Ho:
            offset = jnp.pad(offset, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        dy = offset[..., 0::2]
        dx = offset[..., 1::2]
        kernel = functools.partial(
            kern, R=R, K=K, kh=kh, kw=kw, th=tile_h, Wo=Wo, Cin=Cin, Cout=Cout)
        out = pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, Hp, Wp, Cin), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K * Cin, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, Wo, Cout),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Ho_pad, Wo, Cout), x.dtype),
            scratch_shapes=[pltpu.VMEM((tile_h, Wo, K * Cin), acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xp, dy, dx, mask, weight.reshape(K * Cin, Cout))
        return out[:, :Ho]

    return fwd


def make_variant(hat3d: bool, acc_dtype_name: str, tile_h: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    acc_dtype = jnp.dtype(acc_dtype_name)

    def kern(x_ref, dy_ref, dx_ref, mask_ref, w_ref, out_ref, acc_ref, *,
             R, K, kh, kw, th, Wo, Cin, Cout):
        i = pl.program_id(1)
        row_base = i * th
        dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)
        dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
        m = mask_ref[0].astype(jnp.float32)
        Sy = kh + 2 * R + 1
        Sx = kw + 2 * R + 1
        acc_ref[...] = jnp.zeros((th, Wo, K * Cin), acc_ref.dtype)

        def sy_body(sy, _):
            rows = x_ref[0, pl.ds(row_base + sy, th), :, :]
            syf = sy.astype(jnp.float32)
            for sx in range(Sx):
                w2s, hits = [], []
                for t in range(K):
                    ti, tj = t // kw, t % kw
                    if hat3d:
                        wy = jnp.maximum(
                            0.0, 1.0 - jnp.abs(dy[..., t:t + 1] - (syf - R - ti)))
                        wx = jnp.maximum(
                            0.0, 1.0 - jnp.abs(dx[..., t:t + 1] - (sx - R - tj)))
                        w2s.append(wy * wx * m[..., t:t + 1])
                    else:
                        wy = jnp.maximum(
                            0.0, 1.0 - jnp.abs(dy[..., t] - (syf - R - ti)))
                        wx = jnp.maximum(
                            0.0, 1.0 - jnp.abs(dx[..., t] - (sx - R - tj)))
                        w2s.append((wy * wx * m[..., t])[..., None])
                    hits.append(jnp.max(w2s[-1]))
                any_hit = functools.reduce(jnp.maximum, hits)

                @pl.when(any_hit > 0.0)
                def _(sx=sx, w2s=w2s, hits=hits):
                    xs = rows[:, sx:sx + Wo, :].astype(jnp.float32)
                    for t in range(K):
                        @pl.when(hits[t] > 0.0)
                        def _(t=t, xs=xs, w2s=w2s):
                            sl = slice(t * Cin, (t + 1) * Cin)
                            acc_ref[:, :, sl] += (w2s[t] * xs).astype(
                                acc_ref.dtype)
            return 0

        jax.lax.fori_loop(0, Sy, sy_body, 0)
        out = jax.lax.dot_general(
            acc_ref[...].reshape(th * Wo, K * Cin),
            w_ref[:].astype(acc_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = out.reshape(th, Wo, Cout).astype(out_ref.dtype)

    def fwd(x, offset, mask, weight, padding=1, radius=3):
        B, H, W, Cin = x.shape
        kh, kw, _, Cout = weight.shape
        K = kh * kw
        Ho, Wo = offset.shape[1], offset.shape[2]
        R = radius
        n_tiles = -(-Ho // tile_h)
        Ho_pad = n_tiles * tile_h
        pad_lo = R + padding
        need_rows = Ho_pad + 2 * R + kh
        need_cols = Wo + 2 * R + kw
        need_cols = -(-need_cols // 8) * 8
        xp = jnp.pad(x, ((0, 0),
                         (pad_lo, max(need_rows - pad_lo - H, 0)),
                         (pad_lo, max(need_cols - pad_lo - W, 0)),
                         (0, 0)))
        Hp, Wp = xp.shape[1], xp.shape[2]
        if Ho_pad != Ho:
            offset = jnp.pad(offset, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        dy = offset[..., 0::2]
        dx = offset[..., 1::2]
        kernel = functools.partial(
            kern, R=R, K=K, kh=kh, kw=kw, th=tile_h, Wo=Wo, Cin=Cin, Cout=Cout)
        out = pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, Hp, Wp, Cin), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K * Cin, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, Wo, Cout),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Ho_pad, Wo, Cout), x.dtype),
            scratch_shapes=[pltpu.VMEM((tile_h, Wo, K * Cin), acc_dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xp, dy, dx, mask, weight.reshape(K * Cin, Cout))
        return out[:, :Ho]

    return fwd


def make_chw_variant(tile_h: int):
    """x carried as (B, Hp, Cin, Wp): Cin in SUBLANES, Wp in lanes, Hp a
    free dim (dynamic row start stays free). The per-firing hat broadcast
    w2[:, None, :] then replicates across sublanes — cheap — instead of
    transposing Wo from lanes to sublanes per (tap, cell). Accumulator is
    (th, K*Cin, Wo); one swapaxes per tile feeds the MXU contraction."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, dy_ref, dx_ref, mask_ref, w_ref, out_ref, acc_ref, *,
             R, K, kh, kw, th, Wo, Cin, Cout):
        i = pl.program_id(1)
        row_base = i * th
        dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)
        dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
        m = mask_ref[0].astype(jnp.float32)
        Sy = kh + 2 * R + 1
        Sx = kw + 2 * R + 1
        acc_ref[...] = jnp.zeros((th, K * Cin, Wo), acc_ref.dtype)

        def sy_body(sy, _):
            rows = x_ref[0, pl.ds(row_base + sy, th), :, :]  # (th, Cin, Wp)
            syf = sy.astype(jnp.float32)
            for sx in range(Sx):
                w2s, hits = [], []
                for t in range(K):
                    ti, tj = t // kw, t % kw
                    wy = jnp.maximum(
                        0.0, 1.0 - jnp.abs(dy[..., t] - (syf - R - ti)))
                    wx = jnp.maximum(
                        0.0, 1.0 - jnp.abs(dx[..., t] - (sx - R - tj)))
                    w2s.append(wy * wx * m[..., t])
                    hits.append(jnp.max(w2s[-1]))
                any_hit = functools.reduce(jnp.maximum, hits)

                @pl.when(any_hit > 0.0)
                def _(sx=sx, w2s=w2s, hits=hits):
                    xs = rows[:, :, sx:sx + Wo].astype(jnp.float32)
                    for t in range(K):
                        @pl.when(hits[t] > 0.0)
                        def _(t=t, xs=xs, w2s=w2s):
                            sl = slice(t * Cin, (t + 1) * Cin)
                            acc_ref[:, sl, :] += w2s[t][:, None, :] * xs
            return 0

        jax.lax.fori_loop(0, Sy, sy_body, 0)
        acc = jnp.swapaxes(acc_ref[...], 1, 2)  # (th, Wo, K*Cin)
        out = jax.lax.dot_general(
            acc.reshape(th * Wo, K * Cin),
            w_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = out.reshape(th, Wo, Cout).astype(out_ref.dtype)

    def fwd(x, offset, mask, weight, padding=1, radius=3):
        B, H, W, Cin = x.shape
        kh, kw, _, Cout = weight.shape
        K = kh * kw
        Ho, Wo = offset.shape[1], offset.shape[2]
        R = radius
        n_tiles = -(-Ho // tile_h)
        Ho_pad = n_tiles * tile_h
        pad_lo = R + padding
        need_rows = Ho_pad + 2 * R + kh
        need_cols = Wo + 2 * R + kw
        need_cols = -(-need_cols // 8) * 8
        xp = jnp.pad(x, ((0, 0),
                         (pad_lo, max(need_rows - pad_lo - H, 0)),
                         (pad_lo, max(need_cols - pad_lo - W, 0)),
                         (0, 0)))
        xp = jnp.swapaxes(xp, 2, 3)  # (B, Hp, Cin, Wp)
        Hp, Wp = xp.shape[1], xp.shape[3]
        if Ho_pad != Ho:
            offset = jnp.pad(offset, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        dy = offset[..., 0::2]
        dx = offset[..., 1::2]
        kernel = functools.partial(
            kern, R=R, K=K, kh=kh, kw=kw, th=tile_h, Wo=Wo, Cin=Cin, Cout=Cout)
        out = pl.pallas_call(
            kernel,
            grid=(B, n_tiles),
            in_specs=[
                pl.BlockSpec((1, Hp, Cin, Wp), lambda b, i: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_h, Wo, K), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K * Cin, Cout), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile_h, Wo, Cout),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Ho_pad, Wo, Cout), x.dtype),
            scratch_shapes=[pltpu.VMEM((tile_h, K * Cin, Wo), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(xp, dy, dx, mask, weight.reshape(K * Cin, Cout))
        return out[:, :Ho]

    return fwd


def main():
    bench._arm_watchdog(3000)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from ocr_vi_invoice_tpu.ops.pallas.dcn_kernel import deform_conv2d_pallas

    key = jax.random.PRNGKey(0)
    R = 3
    shapes = [("c3", 120, 128), ("c4", 60, 256)]
    # Round-3 experiments (t4 / chw_*) are kept above for the record;
    # round 4 measures the hoist/hat3d/rowsplit/bf16 family.
    variants = {
        "hoist": make_variant2(False, 1, False, 8),
        "hoist_h3": make_variant2(True, 1, False, 8),
        "hoist_h3_rs2": make_variant2(True, 2, False, 8),
        "hoist_h3_rs4": make_variant2(True, 4, False, 8),
        "hoist_h3_rs2_bf16": make_variant2(True, 2, True, 8),
    }

    def smooth_offsets(k, H, W, sigma):
        """Low-frequency offsets (8x-upsampled coarse noise): the
        trained-offset regime — large but spatially smooth, so row-tile
        guards see clustered support."""
        coarse = jax.random.normal(k, (1, H // 8 + 1, W // 8 + 1, 18))
        up = jax.image.resize(coarse, (1, H + 8, W + 8, 18), "linear")
        return (up[:, :H, :W] * sigma).astype(jnp.bfloat16)

    results = {}
    for label, H, C in shapes:
        W = H
        x = jax.random.normal(key, (1, H, W, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05
        mask = jax.nn.sigmoid(jax.random.normal(key, (1, H, W, 9), jnp.bfloat16))
        regimes = {
            "iid05": jax.random.normal(key, (1, H, W, 18), jnp.bfloat16) * 0.5,
            "smooth2": smooth_offsets(key, H, W, 2.0),
        }

        def time_fn(fn, off):
            @jax.jit
            def loop(x, off, mask, w, n):
                def body(i, carry):
                    r = fn(carry, off, mask, w)
                    return carry + r * jnp.bfloat16(1e-3)

                return jnp.sum(
                    jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

            return bench._timed(loop, x, off, mask, w,
                                n_lo=2, n_hi=42, budget_s=60) * 1e3

        def base_fn(carry, off, mask, w):
            return deform_conv2d_pallas(carry, off, mask, w, 1, 1, R)

        for reg, off in regimes.items():
            ref = np.asarray(
                jax.jit(lambda *a: deform_conv2d_pallas(*a, 1, 1, R))(
                    x, off, mask, w), np.float32)
            results[f"{label}_{reg}_base_ms"] = round(
                time_fn(base_fn, off), 3)
            for name, fwd in variants.items():
                out = np.asarray(jax.jit(fwd)(x, off, mask, w), np.float32)
                err = (np.max(np.abs(out - ref))
                       / max(np.max(np.abs(ref)), 1e-6))
                results[f"{label}_{reg}_{name}_relerr"] = float(f"{err:.2e}")

                def var_fn(carry, off, mask, w, fwd=fwd):
                    return fwd(carry, off, mask, w)

                results[f"{label}_{reg}_{name}_ms"] = round(
                    time_fn(var_fn, off), 3)
            print(json.dumps({k: v for k, v in results.items()
                              if k.startswith(f"{label}_{reg}")}),
                  file=sys.stderr)

    results["calib_matmul_tflops"] = round(bench._calibrate(), 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
