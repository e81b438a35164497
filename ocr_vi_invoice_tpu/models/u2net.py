"""U-2-Net salient-object segmentation (flax.linen, NHWC).

The reference reaches U-2-Net through the ``rembg`` package's bundled
onnxruntime model (`src/preprocess/scanner.py:11,95`) for document/
background separation. Here the architecture (Qin et al. 2020 —
RSU-block encoder/decoder with side outputs) is implemented natively in
JAX so the scanner is one jitted program on TPU with no ONNX dependency.

Two variants:
  * ``u2net``  — full model (~44M params), layout-compatible with the
    public ``u2net.pth``/``u2net.onnx`` weights for porting
    (tools/port_torch.py);
  * ``u2netp`` — small (~1.1M) variant, practical to train from scratch
    on synthetic invoice composites from the data generator.

Forward returns ``(d0, [d1..d6])``: the fused saliency map and the six
side maps, all sigmoided, at input resolution.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ocr_vi_invoice_tpu.ops.image import upsample_nearest

Dtype = Any


class REBNCONV(nn.Module):
    """conv3x3(dilation d) + BN + ReLU."""

    out_ch: int
    dirate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_ch, (3, 3),
            padding=((self.dirate, self.dirate), (self.dirate, self.dirate)),
            kernel_dilation=(self.dirate, self.dirate),
            use_bias=True, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _maxpool2(x):
    # ceil_mode=True maxpool 2x2 stride 2 (torch U2Net uses ceil_mode)
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up_to(x, ref):
    return upsample_nearest(x, ref.shape[1], ref.shape[2])


class RSU(nn.Module):
    """Residual U-block of depth L with pooling."""

    depth: int  # e.g. 7 for RSU-7
    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out_ch, 1, dtype=self.dtype, name="rebnconvin")(x, train)

        # Encoder
        enc: List[jnp.ndarray] = []
        hx = hxin
        for i in range(1, self.depth):
            hx = REBNCONV(self.mid_ch, 1, dtype=self.dtype,
                          name=f"rebnconv{i}")(hx, train)
            enc.append(hx)
            if i < self.depth - 1:
                hx = _maxpool2(hx)
        # Bottom (dilated)
        hx = REBNCONV(self.mid_ch, 2, dtype=self.dtype,
                      name=f"rebnconv{self.depth}")(hx, train)

        # Decoder
        for i in range(self.depth - 1, 1, -1):
            hx = REBNCONV(
                self.mid_ch if i > 2 else self.mid_ch, 1, dtype=self.dtype,
                name=f"rebnconv{i}d",
            )(jnp.concatenate([hx, enc[i - 1]], axis=-1), train)
            hx = _up_to(hx, enc[i - 2])
        hx = REBNCONV(self.out_ch, 1, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([hx, enc[0]], axis=-1), train
        )
        return hx + hxin


class RSU4F(nn.Module):
    """Dilation-only residual U-block (no pooling)."""

    mid_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hxin = REBNCONV(self.out_ch, 1, dtype=self.dtype, name="rebnconvin")(x, train)
        h1 = REBNCONV(self.mid_ch, 1, dtype=self.dtype, name="rebnconv1")(hxin, train)
        h2 = REBNCONV(self.mid_ch, 2, dtype=self.dtype, name="rebnconv2")(h1, train)
        h3 = REBNCONV(self.mid_ch, 4, dtype=self.dtype, name="rebnconv3")(h2, train)
        h4 = REBNCONV(self.mid_ch, 8, dtype=self.dtype, name="rebnconv4")(h3, train)
        h3d = REBNCONV(self.mid_ch, 4, dtype=self.dtype, name="rebnconv3d")(
            jnp.concatenate([h4, h3], axis=-1), train)
        h2d = REBNCONV(self.mid_ch, 2, dtype=self.dtype, name="rebnconv2d")(
            jnp.concatenate([h3d, h2], axis=-1), train)
        h1d = REBNCONV(self.out_ch, 1, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([h2d, h1], axis=-1), train)
        return h1d + hxin


# (block type, depth, mid, out) per stage; decoder mirrors encoder.
_CONFIGS = {
    "u2net": {
        "enc": [("rsu", 7, 32, 64), ("rsu", 6, 32, 128), ("rsu", 5, 64, 256),
                ("rsu", 4, 128, 512), ("rsu4f", 0, 256, 512), ("rsu4f", 0, 256, 512)],
        "dec": [("rsu4f", 0, 256, 512), ("rsu", 4, 128, 256), ("rsu", 5, 64, 128),
                ("rsu", 6, 32, 64), ("rsu", 7, 16, 64)],
    },
    "u2netp": {
        "enc": [("rsu", 7, 16, 64), ("rsu", 6, 16, 64), ("rsu", 5, 16, 64),
                ("rsu", 4, 16, 64), ("rsu4f", 0, 16, 64), ("rsu4f", 0, 16, 64)],
        "dec": [("rsu4f", 0, 16, 64), ("rsu", 4, 16, 64), ("rsu", 5, 16, 64),
                ("rsu", 6, 16, 64), ("rsu", 7, 16, 64)],
    },
}


def _make_block(kind, depth, mid, out, dtype, name):
    if kind == "rsu4f":
        return RSU4F(mid, out, dtype=dtype, name=name)
    return RSU(depth, mid, out, dtype=dtype, name=name)


class U2Net(nn.Module):
    """Full U^2-Net. Input (B, H, W, 3) with H, W divisible by 32."""

    variant: str = "u2net"
    out_ch: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        cfg = _CONFIGS[self.variant]
        x = x.astype(self.dtype)

        # Encoder with pooling between stages.
        feats = []
        hx = x
        for i, (kind, depth, mid, out) in enumerate(cfg["enc"]):
            hx = _make_block(kind, depth, mid, out, self.dtype, f"stage{i + 1}")(
                hx, train)
            feats.append(hx)
            if i < len(cfg["enc"]) - 1:
                hx = _maxpool2(hx)

        # Decoder: start from deepest encoder output, concat with skips.
        sides = []
        hx = feats[-1]  # stage6 output at 1/32
        hx_up = _up_to(hx, feats[-2])
        sides.append(hx)  # side6 from stage6
        d = hx_up
        for i, (kind, depth, mid, out) in enumerate(cfg["dec"]):
            skip = feats[len(feats) - 2 - i]
            d = _make_block(kind, depth, mid, out, self.dtype, f"stage{5 - i}d")(
                jnp.concatenate([d, skip], axis=-1), train)
            sides.append(d)
            if i < len(cfg["dec"]) - 1:
                d = _up_to(d, feats[len(feats) - 3 - i])

        # Side outputs (deepest first in `sides`: [s6, s5d, s4d, s3d, s2d, s1d])
        H, W = x.shape[1], x.shape[2]
        side_maps = []
        for j, s in enumerate(reversed(sides)):  # s1d..s6
            m = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"side{j + 1}")(s)
            if m.shape[1] != H or m.shape[2] != W:
                m = upsample_nearest(m, H, W)
            side_maps.append(m)

        fused = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="outconv")(
            jnp.concatenate(side_maps, axis=-1)
        )
        d0 = nn.sigmoid(fused.astype(jnp.float32))
        ds = [nn.sigmoid(m.astype(jnp.float32)) for m in side_maps]
        return d0, ds


def u2net_bce_loss(d0, side_maps, target):
    """Multi-head BCE: fused + all sides against the same mask (paper eq. 1)."""
    def bce(pred, gt):
        pred = jnp.clip(pred, 1e-6, 1 - 1e-6)
        return -(gt * jnp.log(pred) + (1 - gt) * jnp.log(1 - pred)).mean()

    loss = bce(d0, target)
    for m in side_maps:
        loss = loss + bce(m, target)
    return loss
