"""Batched on-device crop + resize for the fused OCR pipeline.

Replaces the host round-trip between detection and recognition
(`pipeline2.py:92-128`: per-box numpy crop -> cv2.resize -> pad). Each
of K boxes is sampled directly from the full image into a fixed
(rec_h, rec_w) tile — height scaled to rec_h preserving aspect ratio,
right-padded white — as one vmapped bilinear gather; the result feeds
the recognizer without leaving the chip.

`crop_resize_from_stack` additionally takes a per-box image index into
a (B, H, W, 3) stack, so the fused pipeline's chunked recognizer can
gather ONLY the crops of the tile it is about to run — boxes (K x 4
floats) are compacted/permuted instead of materialized crop tensors
(K x rec_h x rec_w x 3), which removes the largest HBM round-trip from
the batch serving path.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def _bilinear_flat(flat, H, W, base, ys, xs):
    """Sample a flattened (B*H*W, C) image stack at fractional coords,
    clamped borders; ``base`` is the flat offset of the source image."""
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)

    def g(yy, xx):
        return jnp.take(flat, base + yy * W + xx, axis=0)

    return (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )


def crop_resize_from_stack(
    images: jnp.ndarray,
    img_idx: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    rec_h: int = 32,
    rec_w: int = 256,
) -> jnp.ndarray:
    """images (B, H, W, 3) float [0..255]; img_idx (K,) int32 source image
    per box; boxes (K, 4) xyxy -> (K, rec_h, rec_w, 3) ImageNet-normalized
    crops. Aspect-preserving height fit; the area right of the scaled
    width is white, like the host resize_pad."""
    images = images.astype(jnp.float32)
    B, H, W, C = images.shape
    flat = images.reshape(B * H * W, C)

    def one(idx, box, ok):
        x0, y0, x1, y1 = box
        bw = jnp.maximum(x1 - x0 + 1.0, 1.0)
        bh = jnp.maximum(y1 - y0 + 1.0, 1.0)
        scale = bh / rec_h
        out_w = jnp.minimum(bw / scale, float(rec_w))  # scaled content width
        ii = jnp.arange(rec_h, dtype=jnp.float32)
        jj = jnp.arange(rec_w, dtype=jnp.float32)
        # If content wider than rec_w, squeeze to fit (host path resizes to
        # exactly (rec_w, rec_h) in that case).
        x_step = jnp.where(bw / scale > rec_w, bw / rec_w, scale)
        ys = y0 + (ii[:, None] + 0.5) * scale - 0.5 + jnp.zeros((1, rec_w))
        xs = x0 + (jj[None, :] + 0.5) * x_step - 0.5 + jnp.zeros((rec_h, 1))
        crop = _bilinear_flat(flat, H, W, idx * (H * W), ys, xs)
        pad = jj[None, :, None] >= out_w
        crop = jnp.where(pad, 255.0, crop)
        crop = (crop / 255.0 - _MEAN) / _STD
        white = (jnp.ones(3) - _MEAN) / _STD
        return jnp.where(ok, crop, white[None, None, :])

    return jax.vmap(one)(
        img_idx.astype(jnp.int32), boxes.astype(jnp.float32), valid)


@partial(jax.jit, static_argnames=("rec_h", "rec_w"))
def crop_resize_batch(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    rec_h: int = 32,
    rec_w: int = 256,
) -> jnp.ndarray:
    """image (H, W, 3) float [0..255]; boxes (K, 4) xyxy -> (K, rec_h, rec_w, 3)
    ImageNet-normalized crops (single-image wrapper of
    `crop_resize_from_stack`)."""
    K = boxes.shape[0]
    return crop_resize_from_stack(
        image[None], jnp.zeros((K,), jnp.int32), boxes, valid, rec_h, rec_w)
