"""Deformable Convolution v2 for TPU.

The reference reaches DCNv2 through torchvision's native CUDA op
(`model/det/dcn.py:48-57`). On TPU there is no such op; this module
expresses modulated deformable conv as XLA-friendly dataflow:

  1. a regular conv produces per-position offsets (2 per tap) and a
     sigmoid mask (1 per tap) — 27 channels for a 3x3 kernel;
  2. each of the K=kh*kw taps bilinear-samples the input at
     ``base_grid + learned offset`` (4 gathers + lerp weights);
  3. sampled taps are modulated by the mask and contracted with the
     kernel as one (B, H, W, K*Cin) x (K*Cin, Cout) matmul — the MXU
     does the heavy lifting, the VPU the interpolation.

Offset channel layout matches torchvision: channel 2t is Δy of tap t,
channel 2t+1 is Δx (tap order row-major over the kernel window), so
ported checkpoints behave identically. Gradients flow through offsets,
mask, input and weights via XLA autodiff of this graph — no custom VJP
needed at these sizes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` (H, W, C) at fractional (ys, xs) of shape S... with
    zero padding outside. Returns (S..., C)."""
    H, W, C = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = img.reshape(H * W, C)
        v = jnp.take(flat, yc * W + xc, axis=0)
        return v * valid[..., None].astype(img.dtype)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(img.dtype)
    wx = wx[..., None].astype(img.dtype)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Modulated deformable convolution (NHWC).

    Args:
      x: (B, H, W, Cin) input.
      offset: (B, Ho, Wo, 2K) learned offsets, torchvision layout
        (2t: Δy, 2t+1: Δx for tap t).
      mask: (B, Ho, Wo, K) modulation in [0, 1] (already sigmoided).
      weight: (kh, kw, Cin, Cout) kernel (flax HWIO layout).

    Returns:
      (B, Ho, Wo, Cout).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]

    # Base sampling grid per output position and tap.
    oy = jnp.arange(Ho) * stride - padding
    ox = jnp.arange(Wo) * stride - padding
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    base_y = oy[:, None, None] + ky.repeat(kw)[None, None, :]  # (Ho, 1, K)
    base_x = ox[None, :, None] + jnp.tile(kx, kh)[None, :, None].transpose(0, 2, 1)

    dy = offset[..., 0::2].astype(jnp.float32)  # (B, Ho, Wo, K)
    dx = offset[..., 1::2].astype(jnp.float32)
    ys = base_y.astype(jnp.float32)[None, :, :, :] + dy  # broadcasting (1,Ho,1,K)
    xs = base_x.astype(jnp.float32)[None, :, :, :] + dx

    def per_image(img, ys_i, xs_i, m_i):
        s = _bilinear_gather(img, ys_i, xs_i)  # (Ho, Wo, K, Cin)
        return s * m_i[..., None].astype(img.dtype)

    sampled = jax.vmap(per_image)(x, ys, xs, mask)  # (B, Ho, Wo, K, Cin)
    sampled = sampled.reshape(B, Ho, Wo, K * Cin)
    w2 = weight.transpose(0, 1, 2, 3).reshape(K * Cin, Cout)
    # One big MXU matmul over the flattened taps.
    return jax.lax.dot_general(
        sampled,
        w2.astype(sampled.dtype),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
