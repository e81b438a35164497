"""SVTRv2 training CLI.

Recipe parity with `src/rec2/train.py:96-279`: VietOCR train / MC-OCR
val+test, AdamW wd=0.05 + per-step OneCycle (pct 0.075, div 25/1000),
grad clip 5.0, NaN-skip, λ_sgm=0.1, best-by-val-accuracy + every-5
checkpoints, reference CSV columns, ``--augment`` switches the save dir
to ``weights/rec2_aug``, ``--resume`` loads weights only.

  python -m ocr_vi_invoice_tpu.train.rec --vietocr_dir data/vietocr
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import numpy as np


def evaluate(state, dataset, batch_size, mesh, eval_step, tokenizer):
    """CTC loss + CER + exact-match accuracy (`rec2/val.py:33-163`)."""
    from ocr_vi_invoice_tpu.data.loader import iterate
    from ocr_vi_invoice_tpu.parallel.mesh import shard_batch
    from ocr_vi_invoice_tpu.train.metrics import compute_acc, compute_cer

    total_loss, n = 0.0, 0
    preds, gts = [], []
    for batch in iterate(dataset, batch_size, shuffle=False):
        texts = batch.pop("text")
        real = batch["image"].shape[0]
        if real != batch_size:
            pad = batch_size - real
            batch = {
                k: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
                for k, v in batch.items()
            }
        out = eval_step(state, shard_batch(mesh, batch))
        # Average over REAL samples only: a zero-padded sample's CTC loss
        # (empty target -> all-blank likelihood) is not zero and would
        # bias the reported loss on the final partial batch.
        total_loss += float(np.asarray(out["loss_per_sample"])[:real].sum())
        n += real
        ids = np.asarray(out["pred_ids"])[:real]
        preds.extend(tokenizer.decode_ctc_greedy(ids))
        gts.extend(texts)
    return {
        "loss": total_loss / max(n, 1),
        "cer": compute_cer(preds, gts),
        "accuracy": compute_acc(preds, gts),
    }


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from ocr_vi_invoice_tpu.data.loader import iterate, num_batches
    from ocr_vi_invoice_tpu.data.rec_dataset import create_datasets
    from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.parallel.mesh import device_prefetch, make_mesh
    from ocr_vi_invoice_tpu.train.checkpoint import CheckpointManager, load_weights
    from ocr_vi_invoice_tpu.train.schedules import adamw_onecycle
    from ocr_vi_invoice_tpu.train.steps import (
        TrainState,
        make_rec_eval_step,
        make_rec_train_step,
    )
    from ocr_vi_invoice_tpu.utils.logging import CSVLogger, REC_COLUMNS

    ap = argparse.ArgumentParser(description="Train SVTRv2 (TPU)")
    ap.add_argument("--vietocr_dir", type=str, default="data/vietocr")
    ap.add_argument("--val_annotation", type=str,
                    default="data/archive/text_recognition_train_data.txt")
    ap.add_argument("--val_img_dir", type=str,
                    default="data/archive/text_recognition_mcocr_data/text_recognition_mcocr_data")
    ap.add_argument("--test_annotation", type=str,
                    default="data/archive/text_recognition_val_data.txt")
    ap.add_argument("--test_img_dir", type=str, default=None,
                    help="image dir for --test_annotation (default: val_img_dir)")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=6.5e-4)
    ap.add_argument("--img_height", type=int, default=32)
    ap.add_argument("--img_width", type=int, default=256)
    ap.add_argument("--variant", type=str, default="base",
                    choices=["tiny", "small", "base"])
    ap.add_argument("--max_label_len", type=int, default=48)
    ap.add_argument("--lambda_sgm", type=float, default=0.1)
    ap.add_argument("--augment", action="store_true",
                    help="host-side RecAugment in the input pipeline "
                         "(reference recipe; ~45 ms/sample of CPU)")
    ap.add_argument("--device_augment", action="store_true",
                    help="same augmentation distributions jitted into the "
                         "train step (ops/device_augment.py) — use on TPU "
                         "where the host core can't feed RecAugment")
    ap.add_argument("--save_dir", type=str, default="weights/rec2")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--auto_resume", action="store_true",
                    help="continue from <save_dir>/last_state (FULL train "
                         "state incl. optimizer/schedule and epoch/step) if "
                         "present; --save_every_steps then rolls last_state. "
                         "Elastic recovery — pair with train.supervisor")
    ap.add_argument("--checkpoint_every", type=int, default=5)
    ap.add_argument("--max_steps_per_epoch", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=100,
                    help="print step progress every N steps (0=off)")
    ap.add_argument("--save_every_steps", type=int, default=0,
                    help="mid-epoch rolling 'last_step' checkpoint every N "
                         "steps (0=off); for preemptible/flaky devices")
    ap.add_argument("--n_devices", type=int, default=0,
                    help="mesh over the first N devices (0 = all); used by "
                         "the multi-vs-single-device equivalence test")
    ap.add_argument("--crash_after_steps", type=int, default=0,
                    help="fault injection: hard-exit(17) after step N of "
                         "this process (post-checkpoint), to test the "
                         "auto_resume/supervisor recovery path")
    args = ap.parse_args(argv)

    if (args.augment or args.device_augment) and args.save_dir == "weights/rec2":
        args.save_dir = "weights/rec2_aug"

    mesh = make_mesh(jax.devices()[: args.n_devices] if args.n_devices else None)
    print(f"Devices: {jax.devices()}; mesh {dict(mesh.shape)}")

    train_ds, val_ds, test_ds = create_datasets(
        vietocr_dir=args.vietocr_dir,
        val_annotation=args.val_annotation,
        val_img_dir=args.val_img_dir,
        test_annotation=args.test_annotation,
        test_img_dir=args.test_img_dir,
        img_size=(args.img_height, args.img_width),
        augment=args.augment,
        max_label_len=args.max_label_len,
        uint8_transfer=args.device_augment,
    )
    print(f"Train {len(train_ds)} / val {len(val_ds)}"
          + (f" / test {len(test_ds)}" if test_ds else ""))

    tokenizer = Tokenizer()
    model = SVTRv2(variant=args.variant, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(42)
    # Init on batch 1: param shapes are batch-independent and flax init
    # runs a full forward, so this keeps the init program small.
    x = jnp.zeros((1, args.img_height, args.img_width, 3), jnp.bfloat16)
    t = jnp.ones((1, args.max_label_len), jnp.int32)
    variables = jax.jit(
        lambda r, x_, t_: model.init(r, x_, targets=t_, train=True)
    )(rng, x, t)
    if args.resume:
        restored = load_weights(args.resume)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        print(f"Loaded weights from {args.resume} (fresh optimizer/schedule)")

    steps_per_epoch = num_batches(len(train_ds), args.batch_size, drop_last=True)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    total_steps = steps_per_epoch * args.epochs
    tx = adamw_onecycle(args.lr, total_steps)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    def current_lr(epoch_done: int) -> float:
        """Schedule LR at the end of ``epoch_done``, logged per epoch like
        the reference (`src/rec2/train.py:197-201`). Same schedule
        construction as ``adamw_onecycle`` above; clamped to the last
        APPLIED count (optax one-cycle is NaN exactly at total_steps)."""
        from ocr_vi_invoice_tpu.train.schedules import (
            onecycle,
            schedule_applied_lr,
        )

        s = (epoch_done + 1) * steps_per_epoch
        return schedule_applied_lr(
            onecycle(args.lr, total_steps), s, total_steps)

    ckpt = CheckpointManager(args.save_dir, every=args.checkpoint_every)

    start_epoch, start_step, best_acc = 0, 0, 0.0
    resumed = None
    if args.auto_resume:
        resumed = ckpt.restore_state(state)
    if resumed is not None:
        state = resumed["state"]
        start_epoch = int(resumed.get("epoch", 0))
        start_step = int(resumed.get("step", 0))
        best_acc = float(resumed.get("best_acc", 0.0))
        if start_step >= steps_per_epoch:  # saved at the epoch's last batch
            start_epoch, start_step = start_epoch + 1, 0
        print(f"Auto-resumed full train state at epoch {start_epoch} "
              f"step {start_step} (best acc {best_acc:.4f})")

    train_step = jax.jit(make_rec_train_step(
        model, args.lambda_sgm, device_augment=args.device_augment))
    eval_step = jax.jit(make_rec_eval_step(model))

    log = CSVLogger(Path(args.save_dir) / "training_log.csv", REC_COLUMNS,
                    resume=bool(args.resume) or resumed is not None)

    def _device_batches(epoch, skip=0):
        # strip host-only fields before the device upload
        def gen():
            for batch in iterate(train_ds, args.batch_size, shuffle=True,
                                 seed=42, epoch=epoch, drop_last=True,
                                 start_batch=skip):
                batch.pop("text", None)
                yield batch
        return device_prefetch(gen(), mesh)

    base_rng = jax.random.PRNGKey(7)
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        skip = start_step if epoch == start_epoch else 0
        total_loss, steps, counted = 0.0, skip, 0
        pending = None  # lag the loss fetch one step (see train/det.py)
        for dev_batch in _device_batches(epoch, skip):
            # fold_in on the global step: deterministic across restarts
            sub = jax.random.fold_in(base_rng, epoch * steps_per_epoch + steps)
            state, metrics = train_step(state, dev_batch, sub)
            if pending is not None:
                total_loss += float(pending["loss"])
            pending = metrics
            steps += 1
            counted += 1
            if args.log_every and steps % args.log_every == 0:
                rate = counted / max(time.time() - t0, 1e-9)
                print(f"  step {steps}/{steps_per_epoch} | "
                      f"loss {total_loss / counted:.4f} | {rate:.2f} it/s",
                      flush=True)
            if args.save_every_steps and steps % args.save_every_steps == 0:
                if args.auto_resume:
                    ckpt.save_state(epoch, steps, state,
                                    {"best_acc": best_acc,
                                     "variant": args.variant})
                else:
                    ckpt.save_step(epoch, steps, state.params,
                                   state.batch_stats,
                                   {"variant": args.variant})
            if args.crash_after_steps and steps == args.crash_after_steps:
                print(f"  [fault injection] crashing after step {steps}",
                      flush=True)
                os._exit(17)
            if args.max_steps_per_epoch and steps >= args.max_steps_per_epoch:
                break
        if pending is not None:
            total_loss += float(pending["loss"])
        train_loss = total_loss / max(counted, 1)

        val = evaluate(state, val_ds, args.batch_size, mesh, eval_step, tokenizer)
        print(
            f"Epoch {epoch + 1:3d} | {time.time() - t0:.0f}s | "
            f"Train {train_loss:.4f} | Val {val['loss']:.4f} | "
            f"CER {val['cer']:.4f} | Acc {val['accuracy']:.4f}"
        )
        log.append({
            "epoch": epoch + 1, "lr": f"{current_lr(epoch):.6f}",
            "train_loss": f"{train_loss:.4f}",
            "val_loss": f"{val['loss']:.4f}", "val_cer": f"{val['cer']:.4f}",
            "val_accuracy": f"{val['accuracy']:.4f}",
        })

        # epoch 0 always ships a best_model (see train/det.py)
        if val["accuracy"] > best_acc or epoch == 0:
            best_acc = val["accuracy"]
            ckpt.save_best(epoch, state.params, state.batch_stats, best_acc,
                           {"variant": args.variant})
            print(f"  -> saved best model (Acc {best_acc:.4f})")
        ckpt.maybe_save_periodic(epoch, state.params, state.batch_stats, best_acc,
                                 {"variant": args.variant})
        if args.auto_resume:  # epoch boundary: resume at (epoch+1, step 0)
            ckpt.save_state(epoch + 1, 0, state,
                            {"best_acc": float(best_acc),
                             "variant": args.variant})

    if test_ds is not None:
        test = evaluate(state, test_ds, args.batch_size, mesh, eval_step, tokenizer)
        print(f"Test: loss {test['loss']:.4f} CER {test['cer']:.4f} "
              f"Acc {test['accuracy']:.4f}")
    print(f"Training done. Best val accuracy {best_acc:.4f}")


if __name__ == "__main__":
    main()
