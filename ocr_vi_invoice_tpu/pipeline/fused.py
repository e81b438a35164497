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

Crops never materialize at capacity: the chunked recognizer gathers
each CH-crop tile from the source image(s) right before running it
(`ops/warp.crop_resize_from_stack`), so tiles past the last valid box
pay neither the bilinear crop gather nor recognition.

Batched, multi-chip serving: detection vmaps over a stack of same-bucket
images, then every box slot in the (local) batch is compacted
valid-first — permuting K x 4 box floats plus an image index, NOT
K x rec_h x rec_w x 3 crop tensors — so the chunked recognizer pays for
the batch's actual text lines, not B x max_boxes capacity. Under a mesh
the stack is sharded over the ``data`` axis with `shard_map` — each chip
runs the whole per-image pipeline plus its own compaction on its shard
(model vars replicated, zero cross-chip communication, so throughput
scales linearly over ICI). See ``FusedOCR.batch`` and
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
        rec_chunk: Optional[int] = 64,
    ):
        """``mesh``: optional `jax.sharding.Mesh` with a ``data`` axis;
        enables `batch()` with the image stack sharded over it (batch
        size must then be a multiple of the data-axis size).
        ``rec_chunk``: tile size for data-dependent recognition skipping
        (None disables; inactive unless it divides ``cfg.max_boxes``)."""
        import jax
        import jax.numpy as jnp

        from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
        from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
        from ocr_vi_invoice_tpu.ops.cc import extract_boxes
        from ocr_vi_invoice_tpu.ops.warp import crop_resize_from_stack
        from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer
        from ocr_vi_invoice_tpu.utils.precision import cast_inference_params

        self.cfg = cfg or PipelineConfig()
        self.dtype = dtype or jnp.bfloat16
        self.tokenizer = Tokenizer()
        det = DBNetPP(dcn=True, dcn_mode=dcn_mode, dtype=self.dtype)
        rec = SVTRv2(variant=rec_variant, dtype=self.dtype)
        # Pre-cast the big kernels to the compute dtype ONCE (bit-identical
        # to flax's per-apply promote_dtype cast; measured 270 -> 44 ms/call
        # on v5e with f32 checkpoints — see utils/precision.py).
        self.det_vars = cast_inference_params(det_vars, self.dtype)
        self.rec_vars = cast_inference_params(rec_vars, self.dtype)
        pp = self.cfg.postprocess
        K = self.cfg.max_boxes
        rec_h, rec_w = self.cfg.rec_img_size

        # Recognition chunking: a typical invoice fills ~40-80 of the K=256
        # crop slots, and component ids from `extract_boxes` are rank-ordered,
        # so slots past the last valid index are guaranteed empty. Running
        # rec over CH-crop tiles inside a fori_loop and skipping tiles past
        # the last valid box (lax.cond — a real XLA conditional on TPU, both
        # branches compiled but only one executed) cuts the dominant rec cost
        # from the crop capacity to ceil(n_valid/CH)*CH without leaving the
        # device or breaking static shapes. The crop gather itself lives
        # INSIDE the tile, so skipped tiles also skip the bilinear sampling
        # and no (N, rec_h, rec_w, 3) tensor ever hits HBM.
        CH = rec_chunk or 0
        T = rec_w // 4  # SVTRv2 CTC frames: stem /4, width kept thereafter

        def rec_ids(rec_vars, images, img_idx, boxes, valid):
            """images (B, H, W, 3) f32 stack; boxes (N, 4) with all valid
            entries at the FRONT (guaranteed by extract_boxes rank order /
            the batch-path compaction); img_idx (N,) source image per box
            -> (N, T) greedy ids."""
            N = boxes.shape[0]

            def crops_of(idx_c, box_c, val_c):
                return crop_resize_from_stack(
                    images, idx_c, box_c, val_c, rec_h, rec_w
                ).astype(self.dtype)

            if CH <= 0 or N <= CH or N % CH != 0:
                log_probs = rec.apply(
                    rec_vars, crops_of(img_idx, boxes, valid))
                return jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
            last = jnp.max(
                jnp.where(valid, jnp.arange(N, dtype=jnp.int32), -1))

            def body(c, ids_acc):
                start = c * CH

                def do(_):
                    box_c = jax.lax.dynamic_slice_in_dim(boxes, start, CH, 0)
                    idx_c = jax.lax.dynamic_slice_in_dim(
                        img_idx, start, CH, 0)
                    val_c = jax.lax.dynamic_slice_in_dim(valid, start, CH, 0)
                    lp = rec.apply(rec_vars, crops_of(idx_c, box_c, val_c))
                    return jnp.argmax(lp, axis=-1).astype(jnp.int32)

                ids_c = jax.lax.cond(
                    start <= last, do,
                    lambda _: jnp.zeros((CH, T), jnp.int32), None)
                return jax.lax.dynamic_update_slice_in_dim(
                    ids_acc, ids_c, start, 0)

            return jax.lax.fori_loop(
                0, N // CH, body, jnp.zeros((N, T), jnp.int32))

        def per_image(det_vars, image_f32):
            # image_f32: (H, W, 3) float32 0..255, already size-bucketed
            mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
            norm = (image_f32 / 255.0 - mean) / std
            prob = det.apply(det_vars, norm[None].astype(self.dtype))["binary"]
            prob = prob[0, :, :, 0]
            # min_size=0 for decision parity: the reference defines
            # min_size=3 but never applies it (`src/det/test.py:52`);
            # with_quads adds the rotated-quad outputs the reference's
            # polygon path provides for rotated text.
            return extract_boxes(
                prob, pp.thresh, pp.box_thresh, pp.unclip_ratio, pp.min_area,
                max_boxes=K, with_quads=True, with_overflow=True,
            )

        def run(det_vars, rec_vars, image_f32):
            boxes, scores, valid, quads, overflow = per_image(
                det_vars, image_f32)
            ids = rec_ids(rec_vars, image_f32[None],
                          jnp.zeros((K,), jnp.int32), boxes, valid)
            return boxes, scores, valid, quads, ids, overflow

        def run_batch(det_vars, rec_vars, images_f32):
            """(B, H, W, 3) stack. Detection vmaps over the stack; then all
            B*K box slots are COMPACTED (stable argsort, valid first) so
            the chunked recognizer pays for the batch's actual text lines,
            not B×max_boxes capacity — e.g. 8 invoices × ~50 lines runs
            7 rec tiles of 64 instead of 32. Only (K, 4) boxes and an
            image index are permuted; each tile's crops are gathered from
            the image stack inside the tile. The inverse permutation
            scatters ids back to per-image slots, so results are
            position-identical to the uncompacted program."""
            B = images_f32.shape[0]
            boxes, scores, valid, quads, overflow = jax.vmap(
                per_image, in_axes=(None, 0))(det_vars, images_f32)
            N = B * K
            boxes_f = boxes.reshape(N, 4)
            valid_f = valid.reshape(N)
            order = jnp.argsort(jnp.logical_not(valid_f), stable=True)
            img_idx = (order // K).astype(jnp.int32)
            ids_sorted = rec_ids(rec_vars, images_f32, img_idx,
                                 boxes_f[order], valid_f[order])
            inv = jnp.argsort(order)
            ids = ids_sorted[inv].reshape(B, K, T)
            return boxes, scores, valid, quads, ids, overflow

        self._run = run  # unjitted; bench.py wraps it in a timing loop
        self._run_batch = run_batch  # unjitted, for the bench batch loop
        self._program = jax.jit(run)
        self.mesh = mesh
        # Batched serving: each chip runs the whole per-image pipeline on
        # its shard of the image stack (model vars replicated) — zero
        # cross-chip communication inside the program, linear scaling over
        # ICI. shard_map (not plain sharded jit) so the compaction sorts
        # and the tile-skip lax.cond stay PER-CHIP: a global sort would
        # all-gather every crop, and vmap-lowered cond would run all tiles.
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            self._batch_program = jax.jit(jax.shard_map(
                run_batch, mesh=mesh,
                in_specs=(P(), P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            ))
            self._data_size = mesh.shape["data"]
        else:
            self._batch_program = jax.jit(run_batch)
            self._data_size = 1

    def __call__(self, image_rgb: np.ndarray) -> List[Dict]:
        """Run on one image (already resized to the det bucket).

        Capacity-truncation counters from `extract_boxes` (runs dropped at
        row/global capacity, components dropped at box capacity) land in
        ``self.last_overflow`` (int (3,)) after every call — all zeros on
        normal pages; nonzero means the box list is incomplete (e.g.
        sand-grain-noise defects) and the caller should retry with larger
        capacities or flag the page.
        """
        import jax.numpy as jnp

        boxes, scores, valid, quads, ids, overflow = self._program(
            self.det_vars, self.rec_vars,
            jnp.asarray(image_rgb, jnp.float32),
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        quads = np.asarray(quads)
        ids = np.asarray(ids)
        self.last_overflow = np.asarray(overflow)
        texts = self.tokenizer.decode_ctc_greedy(ids)
        return [
            {"box": boxes[i].tolist(), "quad": quads[i].tolist(),
             "score": float(scores[i]), "text": texts[i]}
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
        boxes, scores, valid, quads, ids, overflow = self._batch_program(
            self.det_vars, self.rec_vars,
            jnp.asarray(images_rgb, jnp.float32),
        )
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        quads = np.asarray(quads)
        ids = np.asarray(ids)
        self.last_overflow = np.asarray(overflow)  # (B, 3)
        out: List[List[Dict]] = []
        for b in range(images_rgb.shape[0]):
            texts = self.tokenizer.decode_ctc_greedy(ids[b])
            out.append([
                {"box": boxes[b, i].tolist(), "quad": quads[b, i].tolist(),
                 "score": float(scores[b, i]), "text": texts[i]}
                for i in range(valid.shape[1]) if valid[b, i]
            ])
        return out
