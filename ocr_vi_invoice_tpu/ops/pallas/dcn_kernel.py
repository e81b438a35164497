"""Pallas TPU kernel for bounded-offset deformable convolution.

Fuses the shift-decomposition of `ops/dcn.deform_conv2d_local` into one
VMEM-resident kernel: as plain XLA that formulation loses to the gather
because every (tap, cell) partial product round-trips through HBM; here
the padded input feature map stays resident in VMEM (all DBNet DCN
stages fit: <=4 MB), the (2R+2)²·K hat-weighted accumulations run on the
VPU over row tiles, and the final (K·Cin)→Cout contraction feeds the MXU
— zero intermediate HBM traffic.

Grid: (batch, row_tiles); the input block's index map ignores the row
dimension so Pallas keeps it resident across sequential row tiles.
Offsets are clamped to ``radius`` exactly like deform_conv2d_local
(identical math; exact vs torchvision for |offset| <= radius).

Forward only; the custom VJP routes the backward through the XLA
formulation (same math, autodiff'd).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dcn_kernel(x_ref, dy_ref, dx_ref, mask_ref, w_ref, out_ref, *,
                R: int, K: int, kh: int, kw: int, stride: int,
                tile_h: int, Wo: int, Cin: int, Cout: int):
    # x_ref:   (1, Hp, Wp, Cin) — whole padded image, VMEM-resident
    # dy/dx/mask: (1, tile_h, Wo, K) for this row tile
    # w_ref:   (K*Cin, Cout)
    # out_ref: (1, tile_h, Wo, Cout)
    i = pl.program_id(1)
    row_base = i * tile_h * stride

    dy = jnp.clip(dy_ref[0].astype(jnp.float32), -R, R)   # (tile_h, Wo, K)
    dx = jnp.clip(dx_ref[0].astype(jnp.float32), -R, R)
    m = mask_ref[0].astype(jnp.float32)

    rows_needed = (tile_h - 1) * stride + kh + 2 * R + 1
    # One dynamic row slab per tile; all cell/tap slices below are static
    # within it.
    slab = x_ref[0, pl.ds(row_base, rows_needed), :, :]

    parts = []
    for t in range(K):
        ti, tj = t // kw, t % kw
        dyt = dy[..., t]
        dxt = dx[..., t]
        acc = jnp.zeros((tile_h, Wo, Cin), jnp.float32)
        for u in range(-R, R + 2):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(dyt - u))
            for v in range(-R, R + 2):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(dxt - v))
                w2 = wy * wx
                oy = ti + u + R
                ox = tj + v + R
                xs = jax.lax.slice(
                    slab,
                    (oy, ox, 0),
                    (oy + (tile_h - 1) * stride + 1,
                     ox + (Wo - 1) * stride + 1, Cin),
                    (stride, stride, 1),
                ).astype(jnp.float32)
                acc = acc + w2[..., None] * xs
        parts.append(acc * m[..., t:t + 1])

    sampled = jnp.concatenate(parts, axis=-1)  # (tile_h, Wo, K*Cin)
    out = jax.lax.dot_general(
        sampled.reshape(tile_h * Wo, K * Cin),
        w_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(tile_h, Wo, Cout).astype(out_ref.dtype)


def _dcn_pallas_fwd(x, offset, mask, weight, stride, padding, radius, tile_h):
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius

    n_tiles = -(-Ho // tile_h)
    Ho_pad = n_tiles * tile_h

    # Row/col index used in-kernel: base + (ti|tj) + u + R with
    # u in [-R, R+1], i.e. offsets 0 .. kh-1 + 2R + 1 relative to
    # i*stride - padding - R in original coords -> pad by R + padding low;
    # high side must cover (Ho_pad-1)*stride - padding + kh-1 + R + 1.
    pad_lo = R + padding
    pad_hi_y = (Ho_pad - 1) * stride + (kh + 2 * R) - padding - (H - 1)
    pad_hi_x = (Wo - 1) * stride + (kw + 2 * R) - padding - (W - 1)
    xp = jnp.pad(x, ((0, 0), (pad_lo, max(pad_hi_y, 0) + 1),
                     (pad_lo, max(pad_hi_x, 0) + 1), (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]

    if Ho_pad != Ho:
        offset = jnp.pad(offset, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, Ho_pad - Ho), (0, 0), (0, 0)))

    dy = offset[..., 0::2]
    dx = offset[..., 1::2]

    kernel = functools.partial(
        _dcn_kernel, R=R, K=K, kh=kh, kw=kw, stride=stride,
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
    )(xp, dy, dx, mask, weight.reshape(K * Cin, Cout))
    return out[:, :Ho]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def deform_conv2d_pallas(x, offset, mask, weight, stride=1, padding=1,
                         radius=3, tile_h=8):
    """Bounded-offset DCN, Pallas forward. See module docstring."""
    return _dcn_pallas_fwd(x, offset, mask, weight, stride, padding, radius,
                           tile_h)


def _fwd(x, offset, mask, weight, stride, padding, radius, tile_h):
    out = _dcn_pallas_fwd(x, offset, mask, weight, stride, padding, radius,
                          tile_h)
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
