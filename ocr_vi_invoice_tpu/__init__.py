"""ocr_vi_invoice_tpu — TPU-native Vietnamese invoice OCR framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch stack (ZenHKD/ocr-vi-invoice): document scanning (U-2-Net),
text detection (DBNet++ with deformable convolutions), and text recognition
(SVTRv2 with CTC), plus the synthetic invoice data factory, training
harnesses, and a fused on-device inference pipeline.

Design principles
-----------------
* NHWC activations, bf16 compute / f32 params — maps onto the TPU MXU.
* Everything in the compute path is jit-able: static shapes, capacity
  padding + masks for variable-length structures (boxes, crops, targets).
* Scaling via ``jax.sharding.Mesh`` + NamedSharding (data parallel over
  ICI; optional model axis for large heads) — no hand-written collectives.
* Host-side runtime (data pipeline hot loops, geometry, edit distance)
  backed by a first-party C++ module (``native/``) with pure-Python
  fallbacks so the package always imports.
"""

__version__ = "0.1.0"

from ocr_vi_invoice_tpu.data.vocab import VOCAB  # noqa: F401
from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer  # noqa: F401
