"""Pallas TPU kernel for bounded-offset deformable convolution.

Fuses the shift-decomposition of `ops/dcn.deform_conv2d_local` into one
VMEM-resident kernel: as plain XLA that formulation loses to the gather
because every (tap, cell) partial product round-trips through HBM
(measured 221 ms vs 31 ms for the full 960² DBNet forward); here the
padded input feature map stays resident in VMEM (all DBNet DCN stages
fit: <=9 MB), the hat-weighted accumulations run on the VPU over row
tiles, and the final (K·Cin)→Cout contraction feeds the MXU — zero
intermediate HBM traffic.

Loop order matters for Mosaic's scoped-VMEM stack: slices of the input
are indexed by the *combined* shift ``s = tap + cell`` so each of the
(kh+2R+1)·(kw+2R+1) ≈ 100 window slices is cut once and shared by all
taps, instead of (2R+2)²·K ≈ 576 per-tap slices (which blew the 16 MB
scoped-vmem stack). K accumulators stay live; everything else is
transient.

Grid: (batch, row_tiles); the input block's index map ignores the row
dimension so Pallas keeps it resident across sequential row tiles.
Offsets are clamped to ``radius`` exactly like deform_conv2d_local
(identical math; exact vs torchvision for |offset| <= radius).

Only stride 1 is expressible as static window slices (Mosaic rejects
strided vector slices); ``deform_conv2d_pallas`` requires stride=1 and
the model wiring falls back to the clipped-offset gather path for the
three stride-2 DCN layers (same bounded-offset semantics — bilinear
interpolation of a clipped offset IS the hat decomposition).

Forward only; the custom VJP routes the backward through the XLA
formulation (same math, autodiff'd).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dcn_kernel(x_ref, dy_ref, dx_ref, mask_ref, w_ref, out_ref, acc_ref, *,
                R: int, K: int, kh: int, kw: int,
                tile_h: int, Wo: int, Cin: int, Cout: int):
    # x_ref:   (1, Hp, Wp, Cin) — whole padded image, VMEM-resident
    # dy/dx/mask: (1, tile_h, Wo, K) for this row tile
    # w_ref:   (K*Cin, Cout)
    # out_ref: (1, tile_h, Wo, Cout)
    # acc_ref: (tile_h, Wo, K*Cin) f32 scratch — accumulating IN PLACE via
    #   the ref (rather than a chain of SSA adds) is what keeps Mosaic's
    #   VMEM allocation flat: the unrolled add-chain version allocated a
    #   fresh buffer per accumulation step (242 MB for 576 steps).
    i = pl.program_id(1)
    row_base = i * tile_h

    dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)   # (tile_h, Wo, K)
    dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
    m = mask_ref[0].astype(jnp.float32)

    Sy = kh + 2 * R + 1   # combined row shifts s = ti + u + R
    Sx = kw + 2 * R + 1

    acc_ref[...] = jnp.zeros((tile_h, Wo, K * Cin), jnp.float32)

    # The shift loops are lax loops, NOT python-unrolled: 576 unrolled
    # multiply-accumulates made Mosaic materialize a distinct VMEM buffer
    # per product (239 MB). As fori_loops the body's transients are a few
    # hundred KB, reused every iteration. hat() is zero whenever the
    # (tap, shift) pair is out of the bilinear support, so no masking or
    # static skipping is needed for correctness.
    def sy_body(sy, _):
        # rows r of this tile sample padded row (row_base + r) + sy; the
        # row dim is a non-tiled dim so a dynamic start is free. Column
        # shifts are UNROLLED static slices: a dynamic column start would
        # need sublane (x8) alignment, and a second fori level costs more
        # in per-iteration loop overhead than the slices cost in VMEM.
        rows = x_ref[0, pl.ds(row_base + sy, tile_h), :, :].astype(jnp.float32)
        syf = sy.astype(jnp.float32)

        for sx in range(Sx):
            # Per-tap bilinear hat weights for this shift cell. Most are
            # identically zero — a tap only has support on the ≤4 cells
            # bracketing its (small, trained) offset — so the expensive
            # (tile_h, Wo, Cin) multiply-accumulates are guarded by scalar
            # tests on the weight maxima; the weight maps themselves are
            # tiny (tile_h, Wo) tensors, cheap to compute every cell.
            w2s = []
            hits = []
            for t in range(K):
                ti, tj = t // kw, t % kw
                # u = sy - R - ti, v = sx - R - tj
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy[..., t] - (syf - R - ti)))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx[..., t] - (sx - R - tj)))
                w2s.append(wy * wx * m[..., t])
                hits.append(jnp.max(w2s[-1]))
            any_hit = functools.reduce(jnp.maximum, hits)

            @pl.when(any_hit > 0.0)
            def _(sx=sx, w2s=w2s, hits=hits):
                xs = rows[:, sx:sx + Wo, :]
                for t in range(K):
                    @pl.when(hits[t] > 0.0)
                    def _(t=t, xs=xs, w2s=w2s):
                        sl = slice(t * Cin, (t + 1) * Cin)
                        acc_ref[:, :, sl] += w2s[t][..., None] * xs

        return 0

    jax.lax.fori_loop(0, Sy, sy_body, 0)

    out = jax.lax.dot_general(
        acc_ref[...].reshape(tile_h * Wo, K * Cin),
        w_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(tile_h, Wo, Cout).astype(out_ref.dtype)


def _dcn_pallas_fwd(x, offset, mask, weight, padding, radius, tile_h):
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius

    n_tiles = -(-Ho // tile_h)
    Ho_pad = n_tiles * tile_h

    # Output row i samples padded rows i + s, s in [0, kh-1 + 2R + 1];
    # padded row i corresponds to original row i - padding - R.
    pad_lo = R + padding
    need_rows = Ho_pad + 2 * R + kh
    need_cols = Wo + 2 * R + kw
    # keep the (sublane) column dim 8-aligned for clean VMEM tiling
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
        _dcn_kernel, R=R, K=K, kh=kh, kw=kw,
        tile_h=tile_h, Wo=Wo, Cin=Cin, Cout=Cout,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            # whole image; row-tile index ignored => stays resident
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
        scratch_shapes=[pltpu.VMEM((tile_h, Wo, K * Cin), jnp.float32)],
    )(xp, dy, dx, mask, weight.reshape(K * Cin, Cout))
    return out[:, :Ho]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def deform_conv2d_pallas(x, offset, mask, weight, stride=1, padding=1,
                         radius=3, tile_h=8):
    """Bounded-offset DCN, Pallas forward (stride 1 only). See module
    docstring; for stride 2 use the clipped-offset gather path."""
    if stride != 1:
        raise ValueError("deform_conv2d_pallas supports stride=1 only")
    return _dcn_pallas_fwd(x, offset, mask, weight, padding, radius, tile_h)


def _fwd(x, offset, mask, weight, stride, padding, radius, tile_h):
    # Under jax.grad this rule runs INSTEAD of the primal above, so the
    # stride guard must live here too — otherwise stride=2 would silently
    # compute a stride-1 forward while _bwd differentiates the stride-N
    # local formulation.
    if stride != 1:
        raise ValueError("deform_conv2d_pallas supports stride=1 only")
    out = _dcn_pallas_fwd(x, offset, mask, weight, padding, radius, tile_h)
    return out, (x, offset, mask, weight)


def _bwd(stride, padding, radius, tile_h, res, g):
    from ocr_vi_invoice_tpu.ops.dcn import deform_conv2d_local

    x, offset, mask, weight = res
    _, vjp = jax.vjp(
        lambda x_, o_, m_, w_: deform_conv2d_local(
            x_, o_, m_, w_, stride=stride, padding=padding, radius=radius
        ),
        x, offset, mask, weight,
    )
    return vjp(g)


deform_conv2d_pallas.defvjp(_fwd, _bwd)
