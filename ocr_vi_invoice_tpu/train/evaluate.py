"""Standalone evaluation CLIs (equivalents of `src/det/val.py:139-194`
and `src/rec2/val.py:96-163` run as scripts).

  python -m ocr_vi_invoice_tpu.train.evaluate det --data_dir data/val_det \
      --model weights/det/best_model
  python -m ocr_vi_invoice_tpu.train.evaluate rec --annotation val.txt \
      --img_dir imgs --model weights/rec2/best_model
"""

from __future__ import annotations

import argparse


def _subset_indices(n: int, subset: int, seed: int):
    """Deterministic seeded subsample: the SAME (n, subset, seed) triple
    always selects the same items, independent of device/platform — so a
    degraded-hardware round's CPU-subset numbers are reproducible and
    comparable across machines (round-4 weak #7: the 12-image fallback
    methodology lived only in README prose)."""
    import numpy as np

    if not subset or subset >= n:
        return None
    rng = np.random.RandomState(seed)
    return sorted(rng.permutation(n)[:subset].tolist())


def eval_det(args):
    import jax
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.data.det_dataset import DetectionDataset
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.parallel.mesh import make_mesh
    from ocr_vi_invoice_tpu.train.checkpoint import load_weights
    from ocr_vi_invoice_tpu.train.det import evaluate
    from ocr_vi_invoice_tpu.train.steps import TrainState, make_det_eval_step
    import optax

    mesh = make_mesh()
    ds = DetectionDataset(args.data_dir, args.image_size, is_training=False)
    idx = _subset_indices(len(ds), args.subset, args.seed)
    if idx is not None:
        ds.samples = [ds.samples[i] for i in idx]
        print(f"Subset {len(ds)} of the full set (seed {args.seed})")
    print(f"Eval on {len(ds)} samples")
    restored = load_weights(args.model)
    model = DBNetPP(dcn=restored.get("dcn", not args.no_dcn),
                    dcn_mode=restored.get("dcn_mode", "gather"),
                    dtype=jnp.bfloat16)
    state = TrainState.create(
        restored["params"], restored["batch_stats"], optax.identity()
    )
    step = jax.jit(make_det_eval_step(model))
    m = evaluate(model, state, ds, args.batch_size, mesh, step)
    print(f"Loss: {m['loss']:.4f}  Precision: {m['precision']:.4f}  "
          f"Recall: {m['recall']:.4f}  F1: {m['f1']:.4f}  "
          f"IoU: {m['iou']:.4f}  Dice: {m['dice']:.4f}")
    return m


def eval_rec(args):
    import jax
    import jax.numpy as jnp
    import optax

    from ocr_vi_invoice_tpu.data.rec_dataset import (
        RecognitionDataset,
        load_mcocr_samples,
        load_vietocr_samples,
    )
    from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.parallel.mesh import make_mesh
    from ocr_vi_invoice_tpu.train.checkpoint import load_weights
    from ocr_vi_invoice_tpu.train.rec import evaluate
    from ocr_vi_invoice_tpu.train.steps import TrainState, make_rec_eval_step

    mesh = make_mesh()
    if args.annotation:
        samples = load_mcocr_samples(args.annotation, args.img_dir)
    else:
        samples = load_vietocr_samples(args.img_dir)
    idx = _subset_indices(len(samples), args.subset, args.seed)
    if idx is not None:
        samples = [samples[i] for i in idx]
        print(f"Subset {len(samples)} of the full set (seed {args.seed})")
    ds = RecognitionDataset(samples, (args.img_height, args.img_width),
                            max_label_len=args.max_label_len)
    print(f"Eval on {len(ds)} samples")
    restored = load_weights(args.model)
    variant = restored.get("variant", args.variant)
    model = SVTRv2(variant=variant, dtype=jnp.bfloat16)
    state = TrainState.create(
        restored["params"], restored["batch_stats"], optax.identity()
    )
    step = jax.jit(make_rec_eval_step(model))
    m = evaluate(state, ds, args.batch_size, mesh, step, Tokenizer())
    print(f"Loss: {m['loss']:.4f}  CER: {m['cer']:.4f}  "
          f"Accuracy: {m['accuracy']:.4f}")
    return m


def main(argv=None):
    ap = argparse.ArgumentParser(description="Evaluate det/rec checkpoints")
    sub = ap.add_subparsers(dest="task", required=True)

    d = sub.add_parser("det")
    d.add_argument("--data_dir", required=True)
    d.add_argument("--model", required=True)
    d.add_argument("--image_size", type=int, default=960)
    d.add_argument("--batch_size", type=int, default=4)
    d.add_argument("--no_dcn", action="store_true")

    r = sub.add_parser("rec")
    for p in (d, r):
        p.add_argument("--subset", type=int, default=0,
                       help="evaluate a deterministic seeded subsample of "
                            "N items (0 = full set) — the reproducible "
                            "off-chip fallback path for degraded-hardware "
                            "rounds")
        p.add_argument("--seed", type=int, default=0,
                       help="seed for --subset selection")
        p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                       help="cpu forces the host platform (slow but "
                            "works when the TPU tunnel is down)")
    r.add_argument("--annotation", default=None,
                   help="MC-OCR style annotation file (else VietOCR dir)")
    r.add_argument("--img_dir", required=True)
    r.add_argument("--model", required=True)
    r.add_argument("--variant", default="base")
    r.add_argument("--img_height", type=int, default=32)
    r.add_argument("--img_width", type=int, default=256)
    r.add_argument("--max_label_len", type=int, default=48)
    r.add_argument("--batch_size", type=int, default=64)

    args = ap.parse_args(argv)
    if args.device == "cpu":
        # must land before the first backend touch (sitecustomize imports
        # jax with JAX_PLATFORMS=axon at interpreter start; env vars set
        # now would be too late, config updates are not)
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.task == "det":
        eval_det(args)
    else:
        eval_rec(args)


if __name__ == "__main__":
    main()
