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

TPU formulation: bilinear sampling is SEPARABLE, so instead of 4
per-pixel gathers (TPU gathers are scalar-ish; measured ~10 ms for a
64-crop tile from a 960² image) each crop is resampled as two small
MATMULS on the MXU: a (rec_h, B·H) row-interpolation matrix — two
one-hot diagonals weighted by the bilinear fractions, which also folds
the source-image selection — times the flattened image stack, then a
column-interpolation matrix on the right. Same clamped-border
semantics as the gather, ~20x faster (measured ~0.5 ms/tile, B=1).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def _interp_matrix(coords, offset, n, size):
    """(M,) fractional sample coordinates -> (M, size) bilinear
    interpolation matrix: row i has weight (1-frac) at clip(floor(c_i))
    and frac at clip(floor(c_i)+1) — exactly the clamped-border gather
    semantics, expressed as a matrix so the resample runs on the MXU.
    ``offset``/``n`` place the diagonals inside a flattened stack of
    ``size`` = B*n rows (source-image selection folded into the matmul)."""
    c0 = jnp.floor(coords)
    w = (coords - c0)[:, None]
    i0 = offset + jnp.clip(c0.astype(jnp.int32), 0, n - 1)
    i1 = offset + jnp.clip(c0.astype(jnp.int32) + 1, 0, n - 1)
    iota = jnp.arange(size, dtype=jnp.int32)[None, :]
    return ((i0[:, None] == iota) * (1.0 - w)
            + (i1[:, None] == iota) * w)


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
    rows = images.reshape(B * H, W * C)

    def one(idx, box, ok):
        # Host-exact crop semantics (pipeline/ocr._prep_crop + crop_image):
        # the host int-TRUNCATES box corners (inclusive extents), quantizes
        # the scaled content width to nw = int(w * rec_h/h), resamples with
        # the half-pixel convention at steps (h/rec_h, w/nw), and cv2-clamps
        # sample coordinates inside the CROP rect (not the image). String-
        # level fused-vs-host parity depends on matching all four.
        x0, y0, x1, y1 = box
        x0 = jnp.floor(x0)
        y0 = jnp.floor(y0)
        bw = jnp.maximum(jnp.floor(x1) - x0 + 1.0, 1.0)
        bh = jnp.maximum(jnp.floor(y1) - y0 + 1.0, 1.0)
        scale = bh / rec_h
        out_w = jnp.maximum(jnp.floor(bw * (rec_h / bh)), 1.0)
        ii = jnp.arange(rec_h, dtype=jnp.float32)
        jj = jnp.arange(rec_w, dtype=jnp.float32)
        # If content wider than rec_w, squeeze to fit (host path resizes to
        # exactly (rec_w, rec_h) in that case).
        content_w = jnp.minimum(out_w, float(rec_w))
        x_step = bw / content_w
        ys = y0 + jnp.clip((ii + 0.5) * scale - 0.5, 0.0, bh - 1.0)
        xs = x0 + jnp.clip((jj + 0.5) * x_step - 0.5, 0.0, bw - 1.0)
        # Separable bilinear resample as two MXU matmuls: rows first
        # (collapses B*H source rows to rec_h and selects the image via
        # the idx*H offset), then columns.
        # Precision.HIGH (bf16x3) ~= f32: the TPU default would truncate
        # the f32 pixels/weights to one bf16 pass (~1% error, visible in
        # parity vs the exact gather); HIGH is still ~MXU rate here.
        wy = _interp_matrix(ys, idx * H, H, B * H)          # (rec_h, B*H)
        wx = _interp_matrix(xs, 0, W, W)                    # (rec_w, W)
        band = jnp.dot(wy, rows,
                       precision=jax.lax.Precision.HIGH).reshape(rec_h, W, C)
        crop = jnp.einsum("hwc,jw->hjc", band, wx,
                          precision=jax.lax.Precision.HIGH)
        pad = jj[None, :, None] >= content_w
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
