"""ResNet backbone with optional Deformable Conv v2 (flax.linen, NHWC).

TPU-native equivalent of the reference's torchvision-based backbone
(`/root/reference/model/det/backbone.py:8-60`): ResNet-50 (v1.5 —
stride on the 3x3 bottleneck conv, matching torchvision) or ResNet-18,
returning pyramid features [c2, c3, c4, c5]. With ``dcn=True`` the 3x3
conv of every bottleneck in stages c3-c5 becomes a DCNv2 whose
offset/mask conv is zero-initialized (identity sampling at init), like
`model/det/dcn.py:28-29`.

No ImageNet-pretrained weights ship with this package; use
``tools/port_torch.py`` to port torchvision weights, or train from
scratch.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ocr_vi_invoice_tpu.models.layers import kaiming_out_init, torch_pad
from ocr_vi_invoice_tpu.ops.dcn import deform_conv2d, deform_conv2d_local

Dtype = Any


class DeformableConv2d(nn.Module):
    """DCNv2 layer: offset/mask conv (zero-init) + deformable sampling.

    ``mode='gather'`` (default) is the exact torchvision-semantics path,
    currently also the fastest measured (XLA patch gather, 22 ms of the
    29.6 ms 960² DBNet forward). ``mode='local'`` is the bounded-offset
    shift-decomposition variant (ops/dcn.deform_conv2d_local) — gather-
    free and mathematically identical for |offset| <= radius, but XLA
    materializes its intermediates; it becomes the fast path once fused
    as a Pallas kernel.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    mode: str = "gather"
    radius: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size * self.kernel_size
        om = nn.Conv(
            3 * K,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=torch_pad(self.kernel_size, self.padding),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=True,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="offset_mask_conv",
        )(x)
        # torch chunk(3): first 2K channels are offsets, last K the mask.
        o1, o2, m = jnp.split(om, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = nn.sigmoid(m)
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0 / (1 + 1), "fan_in", "uniform"),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        if self.mode == "pallas" and self.dilation == 1 and self.strides == 1:
            from ocr_vi_invoice_tpu.ops.pallas.dcn_kernel import (
                deform_conv2d_pallas,
            )

            out = deform_conv2d_pallas(
                x, offset, mask, weight.astype(self.dtype),
                self.strides, self.padding, self.radius,
            )
        elif self.mode == "pallas" and self.dilation == 1 and self.strides == 2:
            # Stride-2 DCN layers (first bottleneck of each stage): the
            # FORWARD is the parity-view Pallas kernel (four (row%2,
            # col%2) views of the padded input turn every stride-2 access
            # into a stride-free slice — Mosaic can't express strided
            # window slices directly); semantics equal bilinear sampling
            # of a radius-clipped offset, so the whole 'pallas' model is
            # one consistent function of the parameters. The BACKWARD
            # routes through the stride-1 Pallas kernels on the
            # 2x-upsampled offset grid (same file) — the gather's
            # transpose scatters cost ~1 s/layer/step at 960².
            from ocr_vi_invoice_tpu.ops.pallas.dcn_kernel import (
                deform_conv2d_s2_pallas,
            )

            out = deform_conv2d_s2_pallas(
                x, offset, mask, weight.astype(self.dtype),
                self.padding, self.radius,
            )
        elif self.mode == "local" and self.dilation == 1:
            out = deform_conv2d_local(
                x, offset, mask, weight.astype(self.dtype),
                stride=self.strides, padding=self.padding, radius=self.radius,
            )
        else:
            out = deform_conv2d(
                x, offset, mask, weight.astype(self.dtype),
                stride=self.strides, padding=self.padding,
                dilation=self.dilation,
            )
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


def _conv(features, kernel, stride, padding, dtype, name):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=torch_pad(kernel, padding),
        use_bias=False,
        kernel_init=kaiming_out_init,
        dtype=dtype,
        name=name,
    )


def _bn(train, dtype, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype,
        name=name,
    )


class Bottleneck(nn.Module):
    """torchvision-style bottleneck: 1x1 -> 3x3(stride) -> 1x1, expansion 4."""

    mid: int
    stride: int = 1
    downsample: bool = False
    dcn: bool = False
    dcn_mode: str = "gather"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.mid, 1, 1, 0, self.dtype, "conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        if self.dcn:
            out = DeformableConv2d(
                self.mid, 3, self.stride, 1, mode=self.dcn_mode,
                dtype=self.dtype, name="conv2",
            )(out)
        else:
            out = _conv(self.mid, 3, self.stride, 1, self.dtype, "conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.mid * 4, 1, 1, 0, self.dtype, "conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out)
        if self.downsample:
            identity = _conv(self.mid * 4, 1, self.stride, 0, self.dtype, "ds_conv")(x)
            identity = _bn(train, self.dtype, "ds_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """ResNet-18/34 block: two 3x3 convs."""

    mid: int
    stride: int = 1
    downsample: bool = False
    dcn: bool = False
    dcn_mode: str = "gather"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(self.mid, 3, self.stride, 1, self.dtype, "conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        if self.dcn:
            out = DeformableConv2d(self.mid, 3, 1, 1, mode=self.dcn_mode,
                                   dtype=self.dtype, name="conv2")(out)
        else:
            out = _conv(self.mid, 3, 1, 1, self.dtype, "conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        if self.downsample:
            identity = _conv(self.mid, 1, self.stride, 0, self.dtype, "ds_conv")(x)
            identity = _bn(train, self.dtype, "ds_bn")(identity)
        return nn.relu(out + identity)


_CONFIGS = {
    "resnet18": {"block": BasicBlock, "layers": (2, 2, 2, 2),
                 "out_channels": (64, 128, 256, 512)},
    "resnet50": {"block": Bottleneck, "layers": (3, 4, 6, 3),
                 "out_channels": (256, 512, 1024, 2048)},
}


class _StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, optionally run as its space-to-depth
    reparameterization: a 3-input-channel conv packs the MXU's 128-wide
    contraction dim at 3/128, so the identical linear map is re-expressed
    as a 4x4/stride-1 conv over the 2x2-space-to-depth input (12
    channels). The PARAMETER stays the torchvision-layout (7, 7, 3, 64)
    kernel — checkpoints are unchanged; the 4x4 kernel is a fixed
    permutation/zero-pad of it computed inside the jitted apply:
      out(i,j) = sum_{a,b} w7[a,b] x(2i+a-3, 2j+b-3)
               = sum_{A,B,p,q} w7[2A+p+3, 2B+q+3] x2(i+A, j+B, (p,q,·))
    with (A+2) = (a+1)//2, p = (a+1)%2 and asymmetric padding (2, 1).
    """

    s2d: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w7 = self.param("kernel", kaiming_out_init, (7, 7, 3, 64))
        w7 = w7.astype(self.dtype)
        if not self.s2d:
            return jax.lax.conv_general_dilated(
                x, w7, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        B, H, W, C = x.shape
        if H % 2 or W % 2:  # odd sizes: keep the direct form
            return jax.lax.conv_general_dilated(
                x, w7, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x2 = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        w8 = jnp.zeros((8, 8, 3, 64), self.dtype).at[1:8, 1:8].set(w7)
        w4 = w8.reshape(4, 2, 4, 2, 3, 64).transpose(
            0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)
        return jax.lax.conv_general_dilated(
            x2, w4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    """Pyramid feature extractor: returns [c2, c3, c4, c5].

    ``dcn=True`` swaps the 3x3 conv in every block of stages 2-4
    (c3, c4, c5) for DCNv2 — same placement as the reference
    (`backbone.py:29-32`).
    """

    name_: str = "resnet50"
    dcn: bool = False
    dcn_mode: str = "gather"
    stem_s2d: bool = True
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return _CONFIGS[self.name_]["out_channels"]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = _CONFIGS[self.name_]
        block_cls, layers = cfg["block"], cfg["layers"]

        x = _StemConv(s2d=self.stem_s2d, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        mids = (64, 128, 256, 512)
        for stage in range(4):
            use_dcn = self.dcn and stage >= 1  # stages c3, c4, c5
            for b in range(layers[stage]):
                stride = 2 if (stage > 0 and b == 0) else 1
                downsample = b == 0 and (
                    stride != 1 or (stage == 0 and block_cls is Bottleneck)
                )
                x = block_cls(
                    mids[stage], stride=stride, downsample=downsample,
                    dcn=use_dcn, dcn_mode=self.dcn_mode, dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train)
            feats.append(x)
        return feats
