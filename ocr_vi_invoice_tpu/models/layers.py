"""Shared neural building blocks (flax.linen, NHWC).

Convolutions use explicit torch-style padding (not XLA 'SAME') so that
spatial sampling positions match the reference exactly — this keeps
checkpoint porting bit-faithful for even input sizes, where SAME pads
asymmetrically. Reference blocks: ConvBnRelu `model/det/layers.py:4-18`,
ConvStem GELU variant `model/rec2/svtrv2.py:106-122`.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch nn.Linear-style init (reference overrides to trunc_normal(0.02)):
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)
# torch kaiming_normal(fan_out, relu) used for convs in the reference.
kaiming_out_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def torch_pad(kernel_size: int, padding: int) -> Sequence[Tuple[int, int]]:
    del kernel_size
    return ((padding, padding), (padding, padding))


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + optional activation (NHWC).

    ``act``: None | 'relu' | 'gelu'. Equivalent of the reference's
    ConvBnRelu and the GELU conv blocks in SVTRv2's stem/mixers.
    """

    features: int
    kernel_size: int = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: int = 1
    groups: int = 1
    use_bias: bool = False
    act: Optional[str] = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        strides = (
            (self.strides, self.strides) if isinstance(self.strides, int) else self.strides
        )
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=strides,
            padding=torch_pad(self.kernel_size, self.padding),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
            name="bn",
        )(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "gelu":
            x = nn.gelu(x, approximate=False)
        return x


class MLP(nn.Module):
    """Transformer feed-forward with expansion ratio (svtrv2.py:28-39)."""

    dim: int
    expansion: float = 4.0
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.dim * self.expansion)
        x = nn.Dense(hidden, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=trunc_normal_init, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


def mha(q, k, v, num_heads: int, dropout: float = 0.0, *, train: bool = False,
        dropout_rng=None):
    """Plain multi-head attention on (B, N, D) tensors.

    One fused softmax(QK^T/sqrt(d))V — sequence lengths here are tiny
    (≤512), so a flash-style kernel buys nothing; XLA fuses this fine.
    """
    B, Nq, D = q.shape
    Nk = k.shape[1]
    hd = D // num_heads
    q = q.reshape(B, Nq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, Nk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, Nk, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = attn * (hd ** -0.5)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    if dropout > 0.0 and train and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, attn.shape)
        attn = attn * keep / (1.0 - dropout)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(B, Nq, D)
