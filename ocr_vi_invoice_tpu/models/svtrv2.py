"""SVTRv2 scene-text recognizer (flax.linen, NHWC, batch-major CTC).

TPU-first re-design of the reference implementation
(`/root/reference/model/rec2/svtrv2.py:28-536`):

* activations are NHWC so convs/matmuls tile onto the MXU;
* CTC outputs are batch-major (B, T, C) — no (T, B, C) permutes;
* SGM context windows are built with a vectorized gather instead of the
  reference's Python loop over label positions (`svtrv2.py:356-367`);
* all shapes are static: target capacity L is pinned by config, images
  are fixed 32x256 -> T = 64 frames.

Architecture: ConvStem (÷4) → 3 stages of local(grouped-conv)/global(MHSA)
mixing blocks with PatchMerging (height ÷2) between stages → LayerNorm →
FRM (row self-attn + column select-token cross-attn) → linear CTC head.
SGM branch (train only) classifies each label position from its left and
right character context cross-attended to the visual features.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ocr_vi_invoice_tpu.data.tokenizer import PAD_ID
from ocr_vi_invoice_tpu.models.layers import MLP, ConvBN, mha, trunc_normal_init

Dtype = Any

# (dims, blocks, local blocks per stage) — `model/rec2/svtrv2.py:391-407`.
VARIANTS = {
    "tiny": {"dims": (64, 128, 256), "num_blocks": (3, 6, 3), "num_local": (3, 3, 0)},
    "small": {"dims": (96, 192, 256), "num_blocks": (3, 6, 6), "num_local": (3, 3, 0)},
    "base": {"dims": (128, 256, 384), "num_blocks": (3, 6, 6), "num_local": (3, 2, 0)},
}


class LocalMixing(nn.Module):
    """Two grouped 3x3 conv+BN+GELU blocks on the (H, W) grid."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = max(self.dim // 32, 1)
        x = ConvBN(self.dim, 3, 1, 1, groups=groups, use_bias=True, act="gelu",
                   dtype=self.dtype, name="conv1")(x, train)
        x = ConvBN(self.dim, 3, 1, 1, groups=groups, use_bias=True, act="gelu",
                   dtype=self.dtype, name="conv2")(x, train)
        return x


class GlobalMixing(nn.Module):
    """Vanilla MHSA over the flattened H*W sequence (≤512 tokens)."""

    dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, D = x.shape
        seq = x.reshape(B, H * W, D)
        qkv = nn.Dense(3 * D, kernel_init=trunc_normal_init, dtype=self.dtype,
                       name="qkv")(seq)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = max(D // 32, 1)
        out = mha(q, k, v, heads)
        out = nn.Dense(D, kernel_init=trunc_normal_init, dtype=self.dtype,
                       name="proj")(out)
        return out.reshape(B, H, W, D)


class MixingBlock(nn.Module):
    """Pre-LN → mixer → residual → Pre-LN → MLP → residual."""

    dim: int
    is_local: bool
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mixer: nn.Module
        if self.is_local:
            mixer = LocalMixing(self.dim, dtype=self.dtype, name="mixer")
        else:
            mixer = GlobalMixing(self.dim, self.dropout, dtype=self.dtype, name="mixer")
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + mixer(y, train)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + MLP(self.dim, 4.0, self.dropout, dtype=self.dtype, name="mlp")(y, train)
        return x


class ConvStem(nn.Module):
    """Two stride-2 3x3 convs: (B, H, W, C) → (B, H/4, W/4, D0)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_dim // 2
        x = ConvBN(mid, 3, 2, 1, use_bias=True, act="gelu", dtype=self.dtype,
                   name="conv1")(x, train)
        x = ConvBN(self.out_dim, 3, 2, 1, use_bias=True, act="gelu", dtype=self.dtype,
                   name="conv2")(x, train)
        return x


class PatchMerging(nn.Module):
    """3x3 conv with stride (2, 1): height ÷2, width kept, dim_in → dim_out."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBN(self.out_dim, 3, (2, 1), 1, use_bias=True, act=None,
                      dtype=self.dtype, name="conv")(x, train)


class FRM(nn.Module):
    """Feature Rearrangement Module.

    1. Row-wise self-attention: each of the H rows attends over its W
       positions (batched as B*H sequences).
    2. Column-wise cross-attention: a learnable selecting token queries the
       H features of each column, collapsing height → (B, W, D).
    """

    dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, D = x.shape
        heads = max(D // 32, 1)

        # -- horizontal: (B*H, W, D) self-attention --
        rows = x.reshape(B * H, W, D)
        y = nn.LayerNorm(dtype=self.dtype, name="h_norm")(rows)
        qkv = nn.Dense(3 * D, kernel_init=trunc_normal_init, dtype=self.dtype,
                       name="h_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rows = rows + nn.Dense(D, kernel_init=trunc_normal_init, dtype=self.dtype,
                               name="h_proj")(mha(q, k, v, heads))
        y = nn.LayerNorm(dtype=self.dtype, name="h_norm2")(rows)
        rows = rows + MLP(D, 4.0, self.dropout, dtype=self.dtype, name="h_mlp")(y, train)

        # -- vertical: select-token cross-attention per column --
        cols = rows.reshape(B, H, W, D).transpose(0, 2, 1, 3).reshape(B * W, H, D)
        t = self.param("select_token", trunc_normal_init, (1, 1, D))
        t = jnp.broadcast_to(t.astype(cols.dtype), (B * W, 1, D))
        tq = nn.LayerNorm(dtype=self.dtype, name="v_norm_q")(t)
        kvn = nn.LayerNorm(dtype=self.dtype, name="v_norm_kv")(cols)
        q = nn.Dense(D, kernel_init=trunc_normal_init, dtype=self.dtype, name="v_q")(tq)
        kv = nn.Dense(2 * D, kernel_init=trunc_normal_init, dtype=self.dtype,
                      name="v_kv")(kvn)
        k, v = jnp.split(kv, 2, axis=-1)
        t = t + nn.Dense(D, kernel_init=trunc_normal_init, dtype=self.dtype,
                         name="v_proj")(mha(q, k, v, heads))
        y = nn.LayerNorm(dtype=self.dtype, name="v_norm2")(t)
        t = t + MLP(D, 4.0, self.dropout, dtype=self.dtype, name="v_mlp")(y, train)
        return t.reshape(B, W, D)


class SGM(nn.Module):
    """Semantic Guidance Module (training only; dropped at inference).

    For each label position, encodes the ``context_window`` characters to
    its left and right (direction-tagged, small transformer encoder,
    mean-pooled), cross-attends the encodings to the visual features, and
    classifies the center character from each side.
    """

    dim: int
    num_classes: int
    context_window: int = 3
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        D = self.dim
        self.char_embed = nn.Embed(self.num_classes, D,
                                   embedding_init=trunc_normal_init, dtype=self.dtype)
        self.context_norm = nn.LayerNorm(dtype=self.dtype)
        self.context_qkv = nn.Dense(3 * D, kernel_init=trunc_normal_init, dtype=self.dtype)
        self.context_out = nn.Dense(D, kernel_init=trunc_normal_init, dtype=self.dtype)
        self.context_norm2 = nn.LayerNorm(dtype=self.dtype)
        self.context_mlp = MLP(D, 2.0, self.dropout, dtype=self.dtype)
        self.left_token = self.param("left_token", trunc_normal_init, (1, 1, D))
        self.right_token = self.param("right_token", trunc_normal_init, (1, 1, D))
        self.cross_q = nn.Dense(D, kernel_init=trunc_normal_init, dtype=self.dtype)
        self.cross_kv = nn.Dense(2 * D, kernel_init=trunc_normal_init, dtype=self.dtype)
        self.cross_proj = nn.Dense(D, kernel_init=trunc_normal_init, dtype=self.dtype)
        self.cross_norm_q = nn.LayerNorm(dtype=self.dtype)
        self.cross_norm_kv = nn.LayerNorm(dtype=self.dtype)
        self.sgm_head = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                                 dtype=self.dtype)

    def _encode_context(self, ctx_ids, direction_token, train):
        B, L, Wc = ctx_ids.shape
        D = self.dim
        e = self.char_embed(ctx_ids) + direction_token.astype(self.dtype)
        e = e.reshape(B * L, Wc, D)
        y = self.context_norm(e)
        q, k, v = jnp.split(self.context_qkv(y), 3, axis=-1)
        heads = max(D // 32, 1)
        e = e + self.context_out(mha(q, k, v, heads))
        e = e + self.context_mlp(self.context_norm2(e), train)
        return e.mean(axis=1).reshape(B, L, D)

    def _cross_attend(self, queries, visual):
        B, L, D = queries.shape
        q = self.cross_q(self.cross_norm_q(queries))
        k, v = jnp.split(self.cross_kv(self.cross_norm_kv(visual)), 2, axis=-1)
        heads = max(D // 32, 1)
        return self.cross_proj(mha(q, k, v, heads))

    def __call__(self, visual, targets, train: bool = False, pad_id: int = PAD_ID):
        B, L = targets.shape
        ws = self.context_window
        padded = jnp.pad(targets, ((0, 0), (ws, ws)), constant_values=pad_id)
        # Vectorized sliding windows: position i sees padded[i : i+ws] on the
        # left and padded[i+ws+1 : i+2ws+1] on the right.
        base = jnp.arange(L)[:, None] + jnp.arange(ws)[None, :]
        left_ctx = padded[:, base]            # (B, L, ws)
        right_ctx = padded[:, base + ws + 1]  # (B, L, ws)

        left_enc = self._encode_context(left_ctx, self.left_token, train)
        right_enc = self._encode_context(right_ctx, self.right_token, train)
        left_feat = left_enc + self._cross_attend(left_enc, visual)
        right_feat = right_enc + self._cross_attend(right_enc, visual)
        return {
            "sgm_left": self.sgm_head(left_feat),
            "sgm_right": self.sgm_head(right_feat),
            "sgm_targets": targets,
        }


class SVTRv2(nn.Module):
    """Full recognizer. ``__call__(images)`` → (B, T, C) log-probs;
    with ``targets`` and ``train=True`` also returns the SGM dict."""

    variant: str = "base"
    num_classes: int = 232
    dropout: float = 0.0
    context_window: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        targets: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        cfg = VARIANTS[self.variant]
        dims, num_blocks, num_local = cfg["dims"], cfg["num_blocks"], cfg["num_local"]

        x = x.astype(self.dtype)
        x = ConvStem(dims[0], dtype=self.dtype, name="stem")(x, train)
        for i in range(3):
            for j in range(num_blocks[i]):
                x = MixingBlock(
                    dims[i], is_local=j < num_local[i], dropout=self.dropout,
                    dtype=self.dtype, name=f"stage{i}_block{j}",
                )(x, train)
            if i < 2:
                x = PatchMerging(dims[i + 1], dtype=self.dtype, name=f"merge{i}")(x, train)

        x = nn.LayerNorm(dtype=self.dtype, name="backbone_norm")(x)
        B, H, W, D = x.shape

        sgm_output = None
        if targets is not None and train:
            sgm_output = SGM(
                D, self.num_classes, self.context_window, self.dropout,
                dtype=self.dtype, name="sgm",
            )(x.reshape(B, H * W, D), targets, train)

        feats = FRM(D, self.dropout, dtype=self.dtype, name="frm")(x, train)  # (B, W, D)
        logits = nn.Dense(self.num_classes, kernel_init=trunc_normal_init,
                          dtype=self.dtype, name="head")(feats)
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        if sgm_output is not None:
            return log_probs, sgm_output
        return log_probs


def create_svtrv2(variant: str = "base", dtype=jnp.float32, num_classes: int = 232):
    return SVTRv2(variant=variant, num_classes=num_classes, dtype=dtype)
