"""DBNet++ text detector: ResNet(+DCN) → FPN+ASF → DB head.

Re-design of `/root/reference/model/det/{dbnet,neck,head}.py` in
flax.linen, NHWC. ``__call__`` returns the same five maps as the
reference head (`head.py:36-48`): sigmoided ``binary``/``thresh``, the
differentiable binarization ``thresh_binary`` = sigmoid(k·(binary−thresh)),
and raw ``bin_logits``/``thresh_logits`` for numerically-safe BCE.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
from flax import linen as nn

from ocr_vi_invoice_tpu.models.layers import ConvBN, kaiming_out_init
from ocr_vi_invoice_tpu.models.resnet import ResNet
from ocr_vi_invoice_tpu.ops.image import (
    resize_bilinear_align_corners,
    upsample_nearest,
)

Dtype = Any


class FPN_ASF(nn.Module):
    """Top-down FPN with Adaptive Scale Fusion (`neck.py:6-79`).

    Laterals (1x1, bias) + nearest upsample + 3x3 smooth; then all four
    levels are bilinear-upsampled (align_corners) to p2 size, concatenated,
    a 1x1 conv + softmax yields per-level attention, and the weighted sum
    gives the (B, H/4, W/4, inner) fused feature.
    """

    inner_channels: int = 256
    num_levels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        C = self.inner_channels
        laterals = [
            nn.Conv(C, (1, 1), use_bias=True, kernel_init=kaiming_out_init,
                    dtype=self.dtype, name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # Top-down accumulation (c5 -> c2).
        results = [None] * len(feats)
        last = laterals[-1]
        results[-1] = ConvBN(C, 3, 1, 1, act="relu", dtype=self.dtype,
                             name=f"fpn{len(feats) - 1}")(last, train)
        for i in range(len(feats) - 2, -1, -1):
            h, w = laterals[i].shape[1], laterals[i].shape[2]
            last = laterals[i] + upsample_nearest(last, h, w)
            results[i] = ConvBN(C, 3, 1, 1, act="relu", dtype=self.dtype,
                                name=f"fpn{i}")(last, train)

        # Adaptive Scale Fusion at p2 resolution.
        h, w = results[0].shape[1], results[0].shape[2]
        ups = [results[0]] + [
            resize_bilinear_align_corners(r, h, w) for r in results[1:]
        ]
        concat = jnp.concatenate(ups, axis=-1)
        score = nn.Conv(self.num_levels, (1, 1), use_bias=True,
                        kernel_init=kaiming_out_init, dtype=self.dtype,
                        name="conv_atten")(concat)
        score = nn.softmax(score.astype(jnp.float32), axis=-1).astype(concat.dtype)
        out = sum(ups[i] * score[..., i:i + 1] for i in range(self.num_levels))
        return out


class _DBBranch(nn.Module):
    """ConvBnRelu → 2x(ConvTranspose stride 2) upsampling H/4 → H, 1 channel."""

    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.in_channels // 4
        x = ConvBN(mid, 3, 1, 1, act="relu", dtype=self.dtype, name="conv")(x, train)
        # transpose_kernel=True == torch ConvTranspose2d semantics (no
        # spatial flip), keeping checkpoint porting 1:1.
        x = nn.ConvTranspose(mid, (2, 2), strides=(2, 2), padding="VALID",
                             use_bias=True, kernel_init=kaiming_out_init,
                             transpose_kernel=True,
                             dtype=self.dtype, name="up1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="up1_bn")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), padding="VALID",
                             use_bias=True, kernel_init=kaiming_out_init,
                             transpose_kernel=True,
                             dtype=self.dtype, name="up2")(x)
        return x


class DBHead(nn.Module):
    """Differentiable-binarization head (`head.py:5-48`)."""

    in_channels: int = 256
    k: float = 50.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        bin_logits = _DBBranch(self.in_channels, dtype=self.dtype,
                               name="bin_conv")(x, train)
        thresh_logits = _DBBranch(self.in_channels, dtype=self.dtype,
                                  name="thresh_conv")(x, train)
        bin_logits = bin_logits.astype(jnp.float32)
        thresh_logits = thresh_logits.astype(jnp.float32)
        binary = nn.sigmoid(bin_logits)
        thresh = nn.sigmoid(thresh_logits)
        thresh_binary = nn.sigmoid(self.k * (binary - thresh))
        return {
            "binary": binary,
            "thresh": thresh,
            "thresh_binary": thresh_binary,
            "bin_logits": bin_logits,
            "thresh_logits": thresh_logits,
        }


class DBNetPP(nn.Module):
    """Full detector. Input NHWC image; outputs dict of (B, H, W, 1) maps."""

    backbone: str = "resnet50"
    inner_channels: int = 256
    k: float = 50.0
    dcn: bool = True
    dcn_mode: str = "gather"  # exact torchvision semantics, works on any
    # backend; "pallas" (TPU) is ~10% faster and "local" is its XLA
    # equivalent — both use bounded (radius-clipped) offsets
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        feats = ResNet(name_=self.backbone, dcn=self.dcn,
                       dcn_mode=self.dcn_mode, dtype=self.dtype,
                       name="backbone")(x, train)
        fused = FPN_ASF(self.inner_channels, dtype=self.dtype, name="neck")(
            feats, train
        )
        return DBHead(self.inner_channels, self.k, dtype=self.dtype, name="head")(
            fused, train
        )
