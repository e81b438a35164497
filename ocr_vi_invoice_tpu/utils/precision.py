"""Inference-time parameter precision tools.

``cast_inference_params`` casts the LARGE model parameters (conv/dense
kernels and other ndim>=2 leaves, ~99% of the parameter bytes) from
float32 to the model's compute dtype ONCE, instead of on every call.

Why this exists: checkpoints store float32 master params (training keeps
f32 for the optimizer), but every model here computes in bfloat16 —
flax's ``promote_dtype`` casts each kernel f32->bf16 inside EVERY apply.
Under ``jit`` those casts are real HBM traffic on every invocation
(~190 MB of det+rec params per fused-pipeline call); measured on a
v5e chip this made the weights-as-arguments fused program 270 ms/iter
vs 44 ms with pre-cast bf16 kernels (see bench.py).

Bit-identical by construction: only leaves that the modules themselves
cast to the compute dtype are pre-cast —

* ndim>=2 float32 leaves (conv/dense/embedding kernels, token params):
  flax ``promote_dtype`` or an explicit ``.astype(self.dtype)``
  (e.g. the DCN weight, resnet.py) casts these to bf16 at every apply,
  so casting them once upfront yields the same bits;
* ndim<=1 leaves (biases, LayerNorm/BatchNorm scales and biases) and the
  ``batch_stats`` collection stay float32: they are tiny (no per-call
  cost worth saving), and at least one op relies on their f32 dtype for
  its numerics (the DCN bias add at resnet.py:114 promotes its output
  to f32 — casting that bias would change results).

Reference parity note: the PyTorch reference serves in f32/AMP-f16 with
weights already in the compute dtype (`/root/reference/src/pipeline/
pipeline2.py` loads .half()/float checkpoints directly); this restores
the same load-once-serve-many behavior for the TPU pipelines.
"""

from __future__ import annotations

from typing import Any, Dict


def cast_inference_params(variables: Dict[str, Any], dtype) -> Dict[str, Any]:
    """Return ``variables`` with float32 params of ndim>=2 cast to ``dtype``.

    Leaves other collections (``batch_stats`` etc.) and small params
    untouched. Safe for inference only — do NOT train on the result
    (optimizers need f32 master params).
    """
    import jax
    import jax.numpy as jnp

    if "params" not in variables:
        return variables

    def cast(leaf):
        if leaf.dtype == jnp.float32 and getattr(leaf, "ndim", 0) >= 2:
            return leaf.astype(dtype)
        return leaf

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(cast, variables["params"])
    return out
