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

import jax
import jax.numpy as jnp


def inference_dcn_mode(mode: str) -> str:
    """Pick the fastest semantically-equivalent DCN path for inference.

    'local' and 'pallas' compute the same bounded-offset shift
    decomposition (equal up to conv precision: 'local' moves data through
    conv_general_dilated_patches, which XLA runs at bf16 input precision
    on TPU, while the Pallas kernel slices in VMEM — so 'pallas' is both
    faster and slightly *more* precise); 'local' is the plain-XLA
    fallback, but at inference it loses badly to the Pallas kernel
    (extra HBM round-trips per shift). Checkpoints trained with 'local'
    therefore serve through 'pallas' on TPU backends, and 'pallas'
    checkpoints serve through 'local' everywhere else (the kernel has no
    CPU lowering, and both compute the same decomposition). 'gather' has
    different numerics at unbounded offsets, so it is never remapped.
    """
    if mode in ("local", "pallas"):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        return "pallas" if on_tpu else "local"
    return mode


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


def _patch_gather_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                           ) -> jnp.ndarray:
    """Bilinear sample via ONE 2x2xC patch gather per point (instead of 4
    row gathers): img (H, W, C), ys/xs (...,) -> (..., C). Zero padding
    outside handled by pre-padding + index clamping."""
    H, W, C = img.shape
    # pad by 1 top/left and 2 bottom/right: patch start clamped to
    # [0, H+1] so the 2x2 window always reads in-bounds; the pad ring is 0.
    imgp = jnp.pad(img, ((1, 2), (1, 2), (0, 0)))
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    wy = (ys - y0f)[..., None].astype(img.dtype)
    wx = (xs - x0f)[..., None].astype(img.dtype)
    y0 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, H + 1)
    x0 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, W + 1)
    # out-of-range samples (completely outside) must contribute 0: the pad
    # ring is zero and clamping keeps fully-outside patches in the ring
    # only when |coord| <= 1 beyond the edge; mask the rest explicitly.
    inside = (
        (ys > -1.0) & (ys < H) & (xs > -1.0) & (xs < W)
    )[..., None].astype(img.dtype)

    idx = jnp.stack([y0, x0], axis=-1)  # (..., 2)
    patches = jax.lax.gather(
        imgp,
        idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=tuple(range(idx.ndim - 1, idx.ndim + 2)),
            collapsed_slice_dims=(),
            start_index_map=(0, 1),
        ),
        slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (..., 2, 2, C)
    top = patches[..., 0, 0, :] * (1 - wx) + patches[..., 0, 1, :] * wx
    bot = patches[..., 1, 0, :] * (1 - wx) + patches[..., 1, 1, :] * wx
    return (top * (1 - wy) + bot * wy) * inside


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    use_patch_gather: bool = True,
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
        if use_patch_gather:
            s = _patch_gather_bilinear(img, ys_i, xs_i)
        else:
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


# --------------------------------------------------------------------------- #
# Bounded-offset DCN: gather-free shift decomposition (TPU fast path)
# --------------------------------------------------------------------------- #


def deform_conv2d_local(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    stride: int = 1,
    padding: int = 1,
    radius: int = 3,
) -> jnp.ndarray:
    """Modulated deformable conv with offsets bounded to ``[-radius, radius]``.

    TPU has no fast per-lane gather (XLA lowers DCN's bilinear gather to
    scalar loads — measured 22 ms of a 29 ms DBNet++ forward at 960²).
    Bounding the learned offsets makes sampling *local*, so the gather
    becomes data-independent work the VPU is built for:

        x(p + k + Δ) = Σ_{u,v∈[-R,R+1]} hat(Δy−u)·hat(Δx−v) · shift_{u,v}(x)(p+k)

    i.e. a per-position bilinear-weighted sum over (2R+2)² statically
    shifted copies of the input (hat(t)=max(0,1−|t|) selects ≤4 nonzero
    terms). Shifts are pads/slices XLA fuses; no dynamic indexing exists
    anywhere. Offsets are clamped with a hard clip; the VJP through clip
    gives zero gradient outside the bound, which empirically keeps
    offsets small (they start at zero via the zero-init offset conv).

    This changes DCN semantics only when |offset| > radius — a deliberate
    architecture choice for from-scratch TPU training. Use
    ``deform_conv2d`` for exact torchvision semantics.

    Status: the VMEM-resident Pallas fusion of this recurrence
    (`ops/pallas/dcn_kernel.py`) is the fast path for BOTH inference
    (beats the gather ~10% at 960²) and, since round 2, training (its
    own backward kernels; `train/det.py` defaults to mode='pallas').
    As plain XLA this formulation loses to the gather in the forward
    (per-shift intermediates round-trip through HBM) and its transposed
    program is ~8x the forward — it remains as the portable non-TPU
    reference and the semantic oracle for kernel tests. Note it moves
    data through conv_general_dilated_patches, which XLA runs at bf16
    conv input precision on TPU-like backends (~4e-3 relative noise vs
    the exact gather); the Pallas kernels do not.

    Only stride 1/2 with 3x3 kernels (the DBNet use case) are exercised.
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius
    compute = x.dtype

    dy = jnp.clip(offset[..., 0::2].astype(jnp.float32), -R, R)  # (B,Ho,Wo,K)
    dx = jnp.clip(offset[..., 1::2].astype(jnp.float32), -R, R)

    # Integer shift lattice: sample row = i*stride - padding + (ti + u),
    # ti in [0,kh), u in [-R, R+1] => delta in [-R, kh-1+R+1]; same for x.
    Sy = 2 * R + kh + 1
    Sx = 2 * R + kw + 1
    d0 = -R  # first delta value

    # hat weights per tap and delta, one broadcast op per axis:
    # WY[..., t, s] = max(0, 1 - |dy_t - (delta_s - ti)|)
    ti = (jnp.arange(K) // kw).astype(jnp.float32)
    tj = (jnp.arange(K) % kw).astype(jnp.float32)
    dys = jnp.arange(Sy, dtype=jnp.float32) + d0
    dxs = jnp.arange(Sx, dtype=jnp.float32) + d0
    WY = jnp.maximum(
        0.0, 1.0 - jnp.abs(dy[..., None] - (dys[None, :] - ti[:, None]))
    ).astype(compute)  # (B,Ho,Wo,K,Sy)
    WX = jnp.maximum(
        0.0, 1.0 - jnp.abs(dx[..., None] - (dxs[None, :] - tj[:, None]))
    ).astype(compute)  # (B,Ho,Wo,K,Sx)
    WX = WX * mask[..., None].astype(compute)  # fold modulation in

    # Pad so row/col windows are in range: row index i*stride - padding + d,
    # d in [d0, d0+Sy).
    pad_lo = padding + R
    pad_hi_y = (Ho - 1) * stride + d0 + Sy - 1 - padding - (H - 1)
    pad_hi_x = (Wo - 1) * stride + d0 + Sx - 1 - padding - (W - 1)
    xp = jnp.pad(
        x, ((0, 0), (pad_lo, max(pad_hi_y, 0)), (pad_lo, max(pad_hi_x, 0)),
            (0, 0))
    )
    Wp = xp.shape[2]

    # Row shift sy selects xp rows sy + stride*i — i.e. row q = sy//stride
    # of the stride-parity view p = sy%stride. Pre-cutting the (static)
    # parity views lets the row-shift loop below be a lax.scan with one
    # dynamic_slice per iteration instead of Sy unrolled strided slices.
    # Loop-as-scan matters beyond aesthetics: unrolled, the det train
    # step's fwd+bwd HLO reached a 68 MB executable (10 DCN layers x Sy
    # shifts x K taps), which the TPU runtime choked on; as a scan the
    # program is ~Sy x smaller with identical math and summation order.
    q_max = (Sy - 1) // stride
    par_rows = q_max + Ho  # rows needed per parity view
    views = []
    for p in range(stride):
        v = xp[:, p::stride]
        views.append(jnp.pad(v, ((0, 0), (0, max(par_rows - v.shape[1], 0)),
                                 (0, 0), (0, 0)))[:, :par_rows])
    xv = jnp.stack(views)  # (stride, B, par_rows, Wp, Cin)

    WYs = jnp.moveaxis(WY, -1, 0)  # (Sy, B, Ho, Wo, K)

    def body(sampled, inp):
        sy, wy_sy = inp
        rows = jax.lax.dynamic_slice(
            xv, (sy % stride, 0, sy // stride, 0, 0),
            (1, B, Ho, Wp, Cin),
        )[0]  # (B, Ho, Wp, Cin)
        # column patches: (B, Ho, Wo, Cin*Sx), channel-major (c, sx)
        px = jax.lax.conv_general_dilated_patches(
            rows, (1, Sx), (1, stride), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(B, Ho, Wo, Cin, Sx)
        # contract column shifts per tap on the VPU (explicit mul-sum —
        # a batched (9x10)@(10xC) einsum under-fills the MXU and loses).
        per_tap = []
        for t in range(K):
            wts = (WX[..., t, :] * wy_sy[..., t:t + 1])[..., None, :]
            per_tap.append((wts * px).sum(-1))  # (B,Ho,Wo,Cin)
        return sampled + jnp.stack(per_tap, axis=3), None

    # checkpoint the body: without it scan stacks each iteration's
    # residuals (the 2R+kw+1-wide column patches are Sx x the input) for
    # the backward pass — rematerializing them from the carried inputs is
    # far cheaper than the HBM round-trip.
    sampled = jnp.zeros((B, Ho, Wo, K, Cin), compute)
    sampled, _ = jax.lax.scan(jax.checkpoint(body), sampled,
                              (jnp.arange(Sy), WYs))

    out = jax.lax.dot_general(
        sampled.reshape(B, Ho, Wo, K * Cin),
        weight.reshape(K * Cin, Cout).astype(compute),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out
