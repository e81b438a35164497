"""On-device image/feature resize primitives with torch-parity semantics.

XLA's ``jax.image.resize`` uses half-pixel sampling, but the reference
relies on torch semantics in two places the outputs are sensitive to:
  * FPN top-down pathway: ``F.interpolate(mode='nearest')``
    (`model/det/neck.py:36`) — floor-indexed nearest;
  * ASF fusion: ``F.interpolate(mode='bilinear', align_corners=True)``
    (`model/det/neck.py:65`).
Both are implemented here as static gathers so checkpoint porting is
bit-faithful and XLA can fuse them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') on NHWC: src = floor(dst*in/out)."""
    B, H, W, C = x.shape
    if out_h % H == 0 and out_w % W == 0:
        # Integer factor: pure repeat — cheapest form for XLA.
        return jnp.repeat(jnp.repeat(x, out_h // H, axis=1), out_w // W, axis=2)
    iy = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) on NHWC."""
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x

    def coords(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    fy = coords(H, out_h)
    fx = coords(W, out_w)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (fy - y0.astype(jnp.float32)).astype(x.dtype)[None, :, None, None]
    wx = (fx - x0.astype(jnp.float32)).astype(x.dtype)[None, None, :, None]

    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [0,255] NHWC -> ImageNet-normalized float."""
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype=jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype=jnp.float32)
    x = x.astype(jnp.float32) / 255.0
    return (x - mean) / std
