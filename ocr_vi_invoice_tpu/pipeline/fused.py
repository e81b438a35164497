"""Fused on-device OCR program: detect -> boxes -> crops -> recognize.

The reference crosses the device boundary 3x per image plus a host
round-trip between detection and recognition (SURVEY.md §3.1). Here the
whole post-preprocessing pipeline is ONE jitted XLA program with static
capacity ``max_boxes``:

    image (H, W, 3) uint8/float
      -> DBNet++ probability map                      [MXU convs]
      -> connected components + scored boxes (ops/cc) [VPU]
      -> batched crop/resize gather (ops/warp)        [VPU]
      -> SVTRv2 over K crops                          [MXU]
      -> greedy per-frame argmax ids

Only the final (K, T) id matrix and (K, 4) boxes return to the host,
where the tokenizer maps ids to strings.

Batched, multi-chip serving: the same program vmapped over a stack of
same-bucket images and sharded over the mesh's ``data`` axis — each chip
runs the whole per-image pipeline on its shard of the batch (model vars
replicated, zero cross-chip communication inside the program, so
throughput scales linearly over ICI). See ``FusedOCR.batch`` and
``pipeline.serve --batch_size``.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ocr_vi_invoice_tpu.utils.config import PipelineConfig


class FusedOCR:
    """One-program OCR at a fixed detection size bucket."""

    def __init__(
        self,
        det_vars,
        rec_vars,
        cfg: Optional[PipelineConfig] = None,
        rec_variant: str = "base",
        dtype=None,
        dcn_mode: str = "gather",
        mesh=None,
    ):
        """``mesh``: optional `jax.sharding.Mesh` with a ``data`` axis;
        enables `batch()` with the image stack sharded over it (batch
        size must then be a multiple of the data-axis size)."""
        import jax
        import jax.numpy as jnp

        from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
        from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
        from ocr_vi_invoice_tpu.ops.cc import extract_boxes
        from ocr_vi_invoice_tpu.ops.warp import crop_resize_batch
        from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer

        self.cfg = cfg or PipelineConfig()
        self.dtype = dtype or jnp.bfloat16
        self.tokenizer = Tokenizer()
        det = DBNetPP(dcn=True, dcn_mode=dcn_mode, dtype=self.dtype)
        rec = SVTRv2(variant=rec_variant, dtype=self.dtype)
        self.det_vars = det_vars
        self.rec_vars = rec_vars
        pp = self.cfg.postprocess
        K = self.cfg.max_boxes
        rec_h, rec_w = self.cfg.rec_img_size

        def run(det_vars, rec_vars, image_f32):
            # image_f32: (H, W, 3) float32 0..255, already size-bucketed
            mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
            norm = (image_f32 / 255.0 - mean) / std
            prob = det.apply(det_vars, norm[None].astype(self.dtype))["binary"]
            prob = prob[0, :, :, 0]
            boxes, scores, valid = extract_boxes(
                prob, pp.thresh, pp.box_thresh, pp.unclip_ratio, pp.min_area,
                max_boxes=K,
            )
            crops = crop_resize_batch(image_f32, boxes, valid, rec_h, rec_w)
            log_probs = rec.apply(rec_vars, crops.astype(self.dtype))
            ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            return boxes, scores, valid, ids

        self._program = jax.jit(run)
        self.mesh = mesh
        # Batched variant: vmap over the image stack. Every per-image op
        # is independent, so under a data-axis sharding the SPMD
        # partitioner emits zero collectives — linear scaling over chips.
        vmapped = jax.vmap(run, in_axes=(None, None, 0))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(mesh, PartitionSpec())
            data = NamedSharding(mesh, PartitionSpec("data"))
            self._batch_program = jax.jit(
                vmapped, in_shardings=(repl, repl, data), out_shardings=data
            )
            self._data_size = mesh.shape["data"]
        else:
            self._batch_program = jax.jit(vmapped)
            self._data_size = 1

    def __call__(self, image_rgb: np.ndarray) -> List[Dict]:
        """Run on one image (already resized to the det bucket)."""
        import jax.numpy as jnp

        boxes, scores, valid, ids = self._program(
            self.det_vars, self.rec_vars,
            jnp.asarray(image_rgb, jnp.float32),
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        ids = np.asarray(ids)
        texts = self.tokenizer.decode_ctc_greedy(ids)
        return [
            {"box": boxes[i].tolist(), "score": float(scores[i]),
             "text": texts[i]}
            for i in range(len(valid)) if valid[i]
        ]

    def batch(self, images_rgb: np.ndarray) -> List[List[Dict]]:
        """Run on a stack of same-bucket images (B, H, W, 3).

        With a mesh, B must be a multiple of the mesh's data-axis size
        (pad with blank images and drop the extras — see
        `pipeline.serve`); the stack is sharded over chips and each chip
        runs the full per-image pipeline on its shard.
        """
        import jax.numpy as jnp

        if images_rgb.shape[0] % self._data_size != 0:
            raise ValueError(
                f"batch size {images_rgb.shape[0]} must be a multiple of "
                f"the mesh data axis ({self._data_size})")
        boxes, scores, valid, ids = self._batch_program(
            self.det_vars, self.rec_vars,
            jnp.asarray(images_rgb, jnp.float32),
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        ids = np.asarray(ids)
        out: List[List[Dict]] = []
        for b in range(images_rgb.shape[0]):
            texts = self.tokenizer.decode_ctc_greedy(ids[b])
            out.append([
                {"box": boxes[b, i].tolist(), "score": float(scores[b, i]),
                 "text": texts[i]}
                for i in range(valid.shape[1]) if valid[b, i]
            ])
        return out
