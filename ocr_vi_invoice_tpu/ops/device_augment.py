"""On-device (jitted) batched augmentation for recognition training.

TPU-native replacement for the host-side ``data/augment.py:RecAugment``
pipeline (itself mirroring the reference's albumentations recipe,
`src/rec2/dataloader.py:34-93`). On this single-core host the per-image
cv2 pipeline costs ~45 ms/sample — at batch 64 that is ~3 s/step of CPU
work serialized against the input pipeline, 6x slower than the TPU train
step it feeds. Moving augmentation into the jitted train step makes it
effectively free: every transform below is expressed as dense batched
arithmetic (shifted adds, matmuls, bilinear gathers) that XLA fuses, and
the host only decodes + resizes line crops.

Design rules (XLA semantics):
  * no data-dependent control flow — every transform is computed for the
    whole batch and blended in with per-sample Bernoulli masks
    (`jnp.where`); at 32x256 the redundant compute is microseconds;
  * random *sizes* (blur kernel, downscale factor) become random
    *weights* over a fixed support (7x7 taps, fixed scale set), so all
    shapes stay static;
  * geometric warps are inverse-mapped per-sample homographies applied
    with one vectorized bilinear gather.

Distribution parity with ``RecAugment`` (probabilities, ranges, branch
choices) with three documented approximations: CLAHE -> per-image luma
autocontrast, JPEG -> 8x8 DCT quantization (the actual compression
artifact, sans entropy coding), ISO noise -> luma+chroma Gaussian in
YCbCr instead of HLS.

Images are float32 RGB in [0, 1], shape (B, H, W, 3). Returns the same.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------- #
# small helpers
# --------------------------------------------------------------------------- #


def _uniform(key, B, lo, hi):
    return jax.random.uniform(key, (B,), jnp.float32, lo, hi)


def _bern(key, B, p):
    return jax.random.uniform(key, (B,), jnp.float32) < p


def _blend(mask_b, new, old):
    """Per-sample select: mask (B,) broadcast over (B, H, W, C)."""
    return jnp.where(mask_b[:, None, None, None], new, old)


def _rgb_to_ycbcr(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 0.5 + (b - y) * 0.564
    cr = 0.5 + (r - y) * 0.713
    return jnp.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(img):
    y, cb, cr = img[..., 0], img[..., 1] - 0.5, img[..., 2] - 0.5
    r = y + 1.403 * cr
    b = y + 1.773 * cb
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return jnp.stack([r, g, b], axis=-1)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.max(img, axis=-1)
    mn = jnp.min(img, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    ) / 6.0
    h = jnp.where(d > 0, h, 0.0)
    s = jnp.where(mx > 0, d / jnp.maximum(mx, 1e-12), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(img):
    h, s, v = img[..., 0] % 1.0, img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------- #
# generic 7x7 per-sample filtering as 49 shifted adds
# --------------------------------------------------------------------------- #


def _apply_kernel7(img, kernels, pad_val=0.0):
    """Depthwise-filter each sample with its own 7x7 kernel.

    img: (B, H, W, C); kernels: (B, 7, 7). Implemented as 49 statically
    shifted views weighted by per-sample scalars — no convs with dynamic
    per-sample weights, everything fuses into one elementwise program.
    """
    B, H, W, C = img.shape
    padded = jnp.pad(img, ((0, 0), (3, 3), (3, 3), (0, 0)),
                     constant_values=pad_val)
    out = jnp.zeros_like(img)
    for dy in range(7):
        for dx in range(7):
            w = kernels[:, dy, dx][:, None, None, None]
            out = out + w * jax.lax.dynamic_slice(
                padded, (0, dy, dx, 0), (B, H, W, C))
    return out


def _gaussian_kernel7(sigma, active7):
    """(B,) sigma -> (B, 7, 7) normalized Gaussian; ``active7`` (B,) bool
    selects 7-tap support vs 5-tap (outer ring zeroed) to model the host
    pipeline's random kernel size."""
    r = jnp.arange(7, dtype=jnp.float32) - 3.0
    d2 = r[:, None] ** 2 + r[None, :] ** 2  # (7, 7)
    k = jnp.exp(-d2[None] / (2.0 * (sigma[:, None, None] ** 2) + 1e-8))
    ring = (jnp.maximum(jnp.abs(r[:, None]), jnp.abs(r[None, :])) <= 2.0)
    k = jnp.where(active7[:, None, None], k, k * ring[None])
    return k / jnp.sum(k, axis=(1, 2), keepdims=True)


def _motion_kernel7(angle, length, pixwidth=0.75):
    """Soft line kernel: weight falls off with distance to the line
    through the center at ``angle`` (B,), support radius ``length`` (B,)."""
    r = jnp.arange(7, dtype=jnp.float32) - 3.0
    yy, xx = jnp.meshgrid(r, r, indexing="ij")  # (7, 7)
    ca, sa = jnp.cos(angle)[:, None, None], jnp.sin(angle)[:, None, None]
    # distance to the line (perpendicular) and along the line
    perp = jnp.abs(-sa * xx[None] + ca * yy[None])
    along = jnp.abs(ca * xx[None] + sa * yy[None])
    k = jnp.maximum(0.0, 1.0 - perp / pixwidth)
    k = k * (along <= length[:, None, None])
    return k / jnp.maximum(jnp.sum(k, axis=(1, 2), keepdims=True), 1e-8)


def _median3(img):
    """Exact 3x3 median: sort 9 shifted views (edge-replicated)."""
    B, H, W, C = img.shape
    padded = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    taps = [
        jax.lax.dynamic_slice(padded, (0, dy, dx, 0), (B, H, W, C))
        for dy in range(3) for dx in range(3)
    ]
    return jnp.median(jnp.stack(taps, axis=0), axis=0)


# --------------------------------------------------------------------------- #
# geometric warps
# --------------------------------------------------------------------------- #


def _bilinear_warp(img, inv_h, fill=1.0):
    """Inverse-map warp: per-sample 3x3 homography mapping OUTPUT pixel
    coords -> INPUT coords, bilinear sample, out-of-bounds -> ``fill``.

    img: (B, H, W, C), inv_h: (B, 3, 3).
    """
    B, H, W, C = img.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    ones = jnp.ones_like(xx)
    pts = jnp.stack([xx, yy, ones], axis=0).reshape(3, -1)  # (3, H*W)
    src = jnp.einsum("bij,jn->bin", inv_h, pts)  # (B, 3, H*W)
    sx = src[:, 0] / jnp.maximum(jnp.abs(src[:, 2]), 1e-8) * jnp.sign(src[:, 2])
    sy = src[:, 1] / jnp.maximum(jnp.abs(src[:, 2]), 1e-8) * jnp.sign(src[:, 2])

    inb = (sx >= 0) & (sx <= W - 1) & (sy >= 0) & (sy <= H - 1)  # (B, H*W)
    x0 = jnp.clip(jnp.floor(sx), 0, W - 1)
    y0 = jnp.clip(jnp.floor(sy), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    fx = jnp.clip(sx - x0, 0.0, 1.0)
    fy = jnp.clip(sy - y0, 0.0, 1.0)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    flat = img.reshape(B, H * W, C)

    def take(yi, xi):
        idx = yi * W + xi  # (B, H*W)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B,H*W,C)

    v00, v01 = take(y0i, x0i), take(y0i, x1i)
    v10, v11 = take(y1i, x0i), take(y1i, x1i)
    fx_, fy_ = fx[..., None], fy[..., None]
    out = (v00 * (1 - fx_) * (1 - fy_) + v01 * fx_ * (1 - fy_)
           + v10 * (1 - fx_) * fy_ + v11 * fx_ * fy_)
    out = jnp.where(inb[..., None], out, fill)
    return out.reshape(B, H, W, C)


def _affine_inverse(angle_deg, shear_deg, scale, cx, cy):
    """Per-sample inverse of cv2.getRotationMatrix2D(center, angle, scale)
    with the host pipeline's post-hoc shear term M[0,1] += tan(shear)/2.
    Returns (B, 3, 3) output->input homographies."""
    a = scale * jnp.cos(jnp.deg2rad(angle_deg))
    b = scale * jnp.sin(jnp.deg2rad(angle_deg))
    m00, m01 = a, b + jnp.tan(jnp.deg2rad(shear_deg)) * 0.5
    m10, m11 = -b, a
    m02 = (1 - a) * cx - b * cy
    m12 = b * cx + (1 - a) * cy
    det = m00 * m11 - m01 * m10
    det = jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
    i00, i01 = m11 / det, -m01 / det
    i10, i11 = -m10 / det, m00 / det
    i02 = -(i00 * m02 + i01 * m12)
    i12 = -(i10 * m02 + i11 * m12)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([i00, i01, i02], -1),
        jnp.stack([i10, i11, i12], -1),
        jnp.stack([z, z, o], -1),
    ], axis=-2)


def _homography_from_points(src, dst):
    """Solve per-sample 4-point homography mapping src->dst.

    src, dst: (B, 4, 2). Returns (B, 3, 3) (h22 = 1). Standard 8x8 DLT
    system solved with jnp.linalg.solve (batched)."""
    B = src.shape[0]
    x, y = src[..., 0], src[..., 1]  # (B, 4)
    u, v = dst[..., 0], dst[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, o, z, z, z, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([z, z, z, x, y, o, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=1)  # (B, 8, 8)
    bvec = jnp.concatenate([u, v], axis=1)  # (B, 8)
    h = jnp.linalg.solve(A, bvec[..., None])[..., 0]  # (B, 8)
    ones = jnp.ones((B, 1), h.dtype)
    return jnp.concatenate([h, ones], axis=1).reshape(B, 3, 3)


# --------------------------------------------------------------------------- #
# JPEG artifact simulation: 8x8 DCT quantization
# --------------------------------------------------------------------------- #

# standard JPEG luminance quantization table
_JPEG_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], np.float32)


def _dct_matrix(n=8):
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None] + 1) * k[:, None] / (2 * n))
    m[0] /= np.sqrt(2.0)
    return m.astype(np.float32)


def _jpeg_sim(img, quality):
    """Blockwise DCT-quantize luma+chroma; ``quality`` (B,) in [1, 100].

    The visible JPEG artifacts (block edges, ringing) come from exactly
    this step; entropy coding is lossless and irrelevant here.
    """
    B, H, W, C = img.shape
    D = jnp.asarray(_dct_matrix())
    q = jnp.asarray(_JPEG_Q)
    scale = jnp.where(quality < 50, 5000.0 / jnp.maximum(quality, 1.0),
                      200.0 - 2.0 * quality)  # libjpeg scaling
    qt = jnp.clip(q[None] * scale[:, None, None] / 100.0, 1.0, 255.0)
    qt = qt[:, None, None, :, :, None]  # (B,1,1,8,8,1)

    ycc = _rgb_to_ycbcr(img) * 255.0 - 128.0
    blocks = ycc.reshape(B, H // 8, 8, W // 8, 8, C).transpose(0, 1, 3, 2, 4, 5)
    coef = jnp.einsum("ij,bhwjkc,lk->bhwilc", D, blocks, D)
    coef = jnp.round(coef / qt) * qt
    rec = jnp.einsum("ji,bhwjkc,kl->bhwilc", D, coef, D)
    rec = rec.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    return jnp.clip(_ycbcr_to_rgb((rec + 128.0) / 255.0), 0.0, 1.0)


# --------------------------------------------------------------------------- #
# the pipeline
# --------------------------------------------------------------------------- #


@partial(jax.jit, static_argnames=())
def augment_rec_batch(key, images):
    """Batched RecAugment on device. images: (B, H, W, 3) f32 in [0, 1]."""
    B, H, W, _ = images.shape
    img = images.astype(jnp.float32)
    k = jax.random.split(key, 24)

    # ---- geometric (p=0.5): affine or perspective, white fill ---------- #
    p_geo = _bern(k[0], B, 0.5)
    pick_aff = _bern(k[1], B, 0.5)
    angle = _uniform(k[2], B, -5.0, 5.0)
    shear = _uniform(k[3], B, -10.0, 10.0)
    scale = _uniform(k[4], B, 0.9, 1.1)
    inv_aff = _affine_inverse(angle, shear, scale,
                              jnp.full((B,), W / 2.0), jnp.full((B,), H / 2.0))
    s = _uniform(k[5], B, 0.02, 0.06)[:, None, None]
    src = jnp.asarray([[0.0, 0.0], [W, 0.0], [W, H], [0.0, H]], jnp.float32)
    src = jnp.broadcast_to(src, (B, 4, 2))
    jitter = jax.random.uniform(k[6], (B, 4, 2), jnp.float32, -1.0, 1.0)
    dst = src + jitter * s * jnp.asarray([W, H], jnp.float32)
    inv_persp = _homography_from_points(dst, src)  # output->input
    inv_h = jnp.where(pick_aff[:, None, None], inv_aff, inv_persp)
    img = _blend(p_geo, _bilinear_warp(img, inv_h, fill=1.0), img)

    # ---- blur (p=0.3): gaussian / motion / median ---------------------- #
    p_blur = _bern(k[7], B, 0.3)
    c_blur = jax.random.randint(k[8], (B,), 0, 3)
    big = _bern(k[9], B, 0.5)  # gaussian 5-tap vs 7-tap support
    # cv2 sigma-from-ksize: 0.3*((k-1)*0.5 - 1) + 0.8 -> 0.8 (k=3) / 1.1 (k=5)
    sigma = jnp.where(big, 1.1, 0.8)
    gk = _gaussian_kernel7(sigma, big)
    mlen = _uniform(k[10], B, 1.0, 3.0)  # line half-length (k 3..7)
    mang = _uniform(k[11], B, 0.0, math.pi)
    mk = _motion_kernel7(mang, mlen)
    blur_k = jnp.where((c_blur == 0)[:, None, None], gk, mk)
    blurred = _apply_kernel7(img, blur_k, pad_val=1.0)
    blurred = jnp.where((c_blur == 2)[:, None, None, None],
                        _median3(img), blurred)
    img = _blend(p_blur, blurred, img)

    # ---- noise (p=0.4): gauss / iso(YCbCr) / jpeg-sim ------------------ #
    p_noise = _bern(k[12], B, 0.4)
    c_noise = jax.random.randint(k[13], (B,), 0, 3)
    var = _uniform(k[14], B, 10.0, 50.0)
    gnoise = jax.random.normal(k[15], img.shape) * (
        jnp.sqrt(var)[:, None, None, None] / 255.0)
    with_gauss = jnp.clip(img + gnoise, 0.0, 1.0)
    inten = _uniform(k[16], B, 0.1, 0.3)
    ycc = _rgb_to_ycbcr(img)
    ln = jax.random.normal(k[17], (B, H, W)) * (inten * 30.0 / 255.0)[:, None, None]
    cn = jax.random.normal(k[18], (B, H, W, 2)) * (
        inten * 8.0 / 255.0)[:, None, None, None]
    ycc = ycc.at[..., 0].add(ln).at[..., 1:].add(cn)
    with_iso = jnp.clip(_ycbcr_to_rgb(ycc), 0.0, 1.0)
    quality = _uniform(k[19], B, 50.0, 90.0)
    with_jpeg = _jpeg_sim(img, quality)
    noised = jnp.where((c_noise == 0)[:, None, None, None], with_gauss,
                       jnp.where((c_noise == 1)[:, None, None, None],
                                 with_iso, with_jpeg))
    img = _blend(p_noise, noised, img)

    # ---- color / lighting (p=0.5) -------------------------------------- #
    kk = jax.random.split(k[20], 8)
    p_col = _bern(kk[0], B, 0.5)
    c_col = jax.random.randint(kk[1], (B,), 0, 3)
    br = _uniform(kk[2], B, -0.3, 0.3)[:, None, None, None]
    ct = _uniform(kk[3], B, -0.3, 0.3)[:, None, None, None]
    with_bc = jnp.clip(img * (1.0 + ct) + br, 0.0, 1.0)
    # color_jitter: brightness/contrast 0.2, saturation 0.2, hue 0.05
    br2 = _uniform(kk[4], B, -0.2, 0.2)[:, None, None, None]
    ct2 = _uniform(kk[5], B, -0.2, 0.2)[:, None, None, None]
    jit = jnp.clip(img * (1.0 + ct2) + br2, 0.0, 1.0)
    hsv = _rgb_to_hsv(jit)
    sat = 1.0 + _uniform(kk[6], B, -0.2, 0.2)
    hue = _uniform(kk[7], B, -0.05, 0.05)
    hsv = hsv.at[..., 1].mul(sat[:, None, None])
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1], 0.0, 1.0))
    hsv = hsv.at[..., 0].add(hue[:, None, None])
    with_jit = jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)
    # CLAHE approximation: per-image luma autocontrast (2%..98% stretch)
    ycc2 = _rgb_to_ycbcr(img)
    luma = ycc2[..., 0].reshape(B, -1)
    lo = jnp.quantile(luma, 0.02, axis=1)[:, None, None]
    hi = jnp.quantile(luma, 0.98, axis=1)[:, None, None]
    stretched = (ycc2[..., 0] - lo) / jnp.maximum(hi - lo, 1e-3)
    ycc2 = ycc2.at[..., 0].set(jnp.clip(stretched, 0.0, 1.0))
    with_ac = jnp.clip(_ycbcr_to_rgb(ycc2), 0.0, 1.0)
    colored = jnp.where((c_col == 0)[:, None, None, None], with_bc,
                        jnp.where((c_col == 1)[:, None, None, None],
                                  with_jit, with_ac))
    img = _blend(p_col, colored, img)

    # ---- shadows / occlusion (p=0.2) ----------------------------------- #
    kk = jax.random.split(k[21], 6)
    p_occ = _bern(kk[0], B, 0.2)
    pick_shadow = _bern(kk[1], B, 0.5)
    # shadow: darken inside the intersection of 3 random half-planes
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    nrm = jax.random.normal(kk[2], (B, 3, 2))
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
    cpt = jax.random.uniform(kk[3], (B, 3, 2)) * jnp.asarray(
        [W, H], jnp.float32)
    inside = jnp.ones((B, H, W), bool)
    for i in range(3):
        d = (nrm[:, i, 0][:, None, None] * (xs - cpt[:, i, 0][:, None, None])
             + nrm[:, i, 1][:, None, None] * (ys - cpt[:, i, 1][:, None, None]))
        inside = inside & (d <= 0)
    dark = _uniform(kk[4], B, 0.4, 0.7)[:, None, None, None]
    with_shadow = jnp.where(inside[..., None], img * dark, img)
    # coarse dropout: 5 candidate holes <=8x8, each active w.p. ~0.6
    kh = jax.random.split(kk[5], 4)
    hy = jax.random.uniform(kh[0], (B, 5)) * (H - 8)
    hx = jax.random.uniform(kh[1], (B, 5)) * (W - 8)
    hs = jax.random.uniform(kh[2], (B, 5, 2), jnp.float32, 1.0, 8.0)
    act = jax.random.uniform(kh[3], (B, 5)) < 0.6
    hole = jnp.zeros((B, H, W), bool)
    for i in range(5):
        yy0 = hy[:, i][:, None, None]
        xx0 = hx[:, i][:, None, None]
        inh = ((ys >= yy0) & (ys < yy0 + hs[:, i, 0][:, None, None])
               & (xs >= xx0) & (xs < xx0 + hs[:, i, 1][:, None, None]))
        hole = hole | (inh & act[:, i][:, None, None])
    with_drop = jnp.where(hole[..., None], 0.0, img)
    occluded = _blend(pick_shadow, with_shadow, with_drop)
    img = _blend(p_occ, occluded, img)

    # ---- grayscale (p=0.1) --------------------------------------------- #
    kk = jax.random.split(k[22], 6)
    p_gray = _bern(kk[0], B, 0.1)
    luma3 = jnp.repeat(_rgb_to_ycbcr(img)[..., :1], 3, axis=-1)
    img = _blend(p_gray, luma3, img)

    # ---- sharpen (p=0.15): host-parity 3x3 kernel ----------------------- #
    p_sh = _bern(kk[1], B, 0.15)
    alpha = _uniform(kk[2], B, 0.1, 0.3)[:, None, None, None]
    light = _uniform(kk[3], B, 0.7, 1.0)
    # kernel [[-1..],[-1,8+l,-1],..] / (9*l) as in augment.py:sharpen
    sk = jnp.full((B, 7, 7), 0.0)
    base = -1.0 / (9.0 * light)
    for dy in range(2, 5):
        for dx in range(2, 5):
            sk = sk.at[:, dy, dx].set(base)
    sk = sk.at[:, 3, 3].set((8.0 + light) / (9.0 * light))
    sharp = jnp.clip(_apply_kernel7(img, sk, pad_val=1.0), 0.0, 1.0)
    img = _blend(p_sh, jnp.clip(img * (1 - alpha) + sharp * alpha, 0, 1), img)

    # ---- downscale artifacts (p=0.15): fixed scale set ------------------ #
    p_dn = _bern(kk[4], B, 0.15)
    c_dn = jax.random.randint(kk[5], (B,), 0, 3)
    downs = []
    for f in (0.5, 0.625, 0.75):
        hh, ww = max(int(H * f), 1), max(int(W * f), 1)
        small = jax.image.resize(img, (B, hh, ww, 3), "bilinear")
        downs.append(jax.image.resize(small, (B, H, W, 3), "bilinear"))
    downed = jnp.where((c_dn == 0)[:, None, None, None], downs[0],
                       jnp.where((c_dn == 1)[:, None, None, None],
                                 downs[1], downs[2]))
    img = _blend(p_dn, downed, img)

    return jnp.clip(img, 0.0, 1.0)
