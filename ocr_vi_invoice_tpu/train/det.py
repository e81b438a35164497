"""DBNet++ training CLI.

Recipe parity with `src/det/train.py:90-313`: synthetic train /
SROIE val / SROIE test dirs, AdamW wd=0.05 + per-step OneCycle, grad clip
5.0, NaN-skip, backbone frozen for the first ``freeze_epochs`` then a
fresh optimizer with differential LR, best-F1 + every-5-epoch
checkpoints, reference-compatible CSV log, final test eval.

TPU-native execution: one jitted train step, batch sharded over the
mesh's data axis (the gradient all-reduce is XLA's), bf16 compute.

  python -m ocr_vi_invoice_tpu.train.det --train_dir data/train_det \
      --val_dir data/val_det_sroie --test_dir data/test_det_sroie
"""

from __future__ import annotations

import argparse
import os
import time
from functools import partial
from pathlib import Path

import numpy as np


def evaluate(model, state, dataset, batch_size, mesh, eval_step):
    """Batch-averaged pixel metrics + loss (matching `det/val.py:54-194`)."""
    import jax

    from ocr_vi_invoice_tpu.data.loader import iterate
    from ocr_vi_invoice_tpu.parallel.mesh import shard_batch

    sums: dict = {}
    n = 0
    for batch in iterate(dataset, batch_size, shuffle=False):
        real = batch["image"].shape[0]
        if real != batch_size:
            pad = batch_size - real
            batch = {
                k: np.concatenate([v, np.zeros((pad, *v.shape[1:]), v.dtype)])
                for k, v in batch.items()
            }
        metrics = eval_step(state, shard_batch(mesh, batch))
        metrics = {k: float(v) for k, v in metrics.items()}
        # Padded samples carry mask=0 so they add nothing to the pixel
        # counts or the (globally-normalized) loss; weight each batch by
        # its REAL sample count so the final partial batch doesn't get the
        # same vote as a full one.
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + v * real
        n += real
    return {k: v / max(n, 1) for k, v in sums.items()}


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ocr_vi_invoice_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from ocr_vi_invoice_tpu.data.det_dataset import DetectionDataset
    from ocr_vi_invoice_tpu.data.loader import iterate, num_batches
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.parallel.mesh import device_prefetch, make_mesh
    from ocr_vi_invoice_tpu.train.checkpoint import CheckpointManager, load_weights
    from ocr_vi_invoice_tpu.train.schedules import (
        det_finetune_phase_head_schedule,
        det_finetune_phase_optimizer,
        det_freeze_phase_head_schedule,
        det_freeze_phase_optimizer,
        schedule_applied_lr,
    )
    from ocr_vi_invoice_tpu.train.steps import (
        TrainState,
        make_det_eval_step,
        make_det_train_step,
    )
    from ocr_vi_invoice_tpu.utils.logging import CSVLogger, DET_COLUMNS

    ap = argparse.ArgumentParser(description="Train DBNet++ (TPU)")
    ap.add_argument("--train_dir", type=str, default="data/train_det")
    ap.add_argument("--val_dir", type=str, default="data/val_det_sroie")
    ap.add_argument("--test_dir", type=str, default="data/test_det_sroie")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--freeze_epochs", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--image_size", type=int, default=960)
    ap.add_argument("--save_dir", type=str, default="weights/det")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--init_backbone_from", type=str, default="auto",
                    help="warm-start ONLY the backbone (params+batch_stats) "
                         "from another det checkpoint or a backbone artifact "
                         "(tools/export_backbone.py), neck/head fresh — the "
                         "TPU-side analogue of the reference's ImageNet-"
                         "pretrained ResNet50 init (backbone.py:13-18). "
                         "'auto' (default): use weights/backbone_pretrained "
                         "when it exists and no --resume is given; 'none': "
                         "force cold init")
    ap.add_argument("--auto_resume", action="store_true",
                    help="continue from <save_dir>/last_state (FULL train "
                         "state: optimizer moments + schedule position + "
                         "epoch/step) if it exists; --save_every_steps then "
                         "rolls last_state instead of the weights-only "
                         "last_step. Elastic recovery for preemptible or "
                         "flaky hosts — pair with train.supervisor")
    ap.add_argument("--checkpoint_every", type=int, default=5)
    ap.add_argument("--no_dcn", action="store_true")
    ap.add_argument("--dcn_mode", default="pallas",
                    choices=["local", "gather", "pallas"],
                    help="DCN sampling path; 'pallas' (bounded offsets, "
                         "first-party fwd+bwd kernels) trains ~3x faster "
                         "than 'local' and ~9x faster than exact 'gather' "
                         "on TPU; use 'local'/'gather' off-TPU")
    ap.add_argument("--max_steps_per_epoch", type=int, default=0,
                    help="debug: cap steps per epoch")
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

    mesh = make_mesh(jax.devices()[: args.n_devices] if args.n_devices else None)
    print(f"Devices: {jax.devices()}; mesh {dict(mesh.shape)}")

    # uint8 transfer: 4x smaller host->device batches (103 MB -> 26 MB at
    # 960/bs4), dequantized inside the jitted steps; essential behind this
    # environment's device relay (measured 3.4 s/step of upload at f32).
    train_ds = DetectionDataset(args.train_dir, args.image_size,
                                is_training=True, uint8_transfer=True,
                                bitpack=True)
    val_ds = DetectionDataset(args.val_dir, args.image_size,
                              is_training=False, uint8_transfer=True,
                              bitpack=True)
    test_ds = (
        DetectionDataset(args.test_dir, args.image_size, is_training=False,
                         uint8_transfer=True, bitpack=True)
        if args.test_dir and Path(args.test_dir).is_dir()
        else None
    )
    print(f"Train {len(train_ds)} / val {len(val_ds)}"
          + (f" / test {len(test_ds)}" if test_ds else ""))

    model = DBNetPP(dcn=not args.no_dcn, dcn_mode=args.dcn_mode,
                    dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(42)
    # jit the init: one compiled program instead of hundreds of eager
    # device calls (matters behind a high-latency device relay). Init on
    # a tiny spatial sample — conv/BN param shapes don't depend on image
    # size or batch, and flax init executes a full forward, so this makes
    # the init program ~100x smaller than initing at train resolution.
    sample = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    variables = jax.jit(partial(model.init, train=True))(rng, sample)
    if args.init_backbone_from in ("auto", "none"):
        # default warm source: the exported backbone artifact (the
        # reference always starts from a pretrained backbone,
        # `model/det/backbone.py:13-18`; round-3 A/B: +0.19 F1 at equal
        # budget). 'none' forces a cold backbone for A/B runs.
        default_bb = Path("weights/backbone_pretrained")
        args.init_backbone_from = (
            str(default_bb)
            if args.init_backbone_from == "auto" and default_bb.is_dir()
            and not args.resume and not args.no_dcn
            else None)
    if args.resume:
        restored = load_weights(args.resume)
        variables = {
            "params": restored["params"],
            "batch_stats": restored["batch_stats"],
        }
        print(f"Loaded weights from {args.resume} (fresh optimizer/schedule)")
    elif args.init_backbone_from:
        restored = load_weights(args.init_backbone_from)
        variables = {
            "params": {**variables["params"],
                       "backbone": restored["params"]["backbone"]},
            "batch_stats": {**variables["batch_stats"],
                            "backbone": restored["batch_stats"]["backbone"]},
        }
        print(f"Warm-started backbone from {args.init_backbone_from} "
              "(neck/head fresh)")

    steps_per_epoch = num_batches(len(train_ds), args.batch_size, drop_last=True)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    freeze = max(args.freeze_epochs, 0)
    phase1_steps = steps_per_epoch * (freeze if freeze > 0 else args.epochs)

    ckpt = CheckpointManager(args.save_dir, every=args.checkpoint_every)

    def build_tx(epoch: int):
        """The optimizer/schedule the loop would be running at ``epoch`` —
        deterministic in the CLI args, so a resumed process rebuilds the
        identical tree and the restored optimizer leaves drop in."""
        if freeze > 0 and epoch < freeze:
            return det_freeze_phase_optimizer(args.lr, phase1_steps)
        if freeze > 0:
            return det_finetune_phase_optimizer(
                args.lr, steps_per_epoch * (args.epochs - freeze))
        # no freeze phase: run at args.lr exactly — scale pinned to 1.0
        # rather than divided away, so a change to the default
        # unfreeze_lr_scale cannot silently shift this branch
        return det_finetune_phase_optimizer(
            args.lr, steps_per_epoch * args.epochs, unfreeze_lr_scale=1.0)

    start_epoch, start_step, best_f1 = 0, 0, 0.0
    resumed = None
    if args.auto_resume:
        meta = ckpt.peek("last_state")
        if meta is not None:
            tx = build_tx(meta.get("epoch", 0))
            template = TrainState.create(
                variables["params"], variables["batch_stats"], tx)
            resumed = ckpt.restore_state(template)
    resumed_in_finetune = False
    if resumed is not None:
        state = resumed["state"]
        saved_epoch = int(resumed.get("epoch", 0))
        resumed_in_finetune = freeze > 0 and saved_epoch >= freeze
        start_epoch = saved_epoch
        start_step = int(resumed.get("step", 0))
        best_f1 = float(resumed.get("best_f1", 0.0))
        if start_step >= steps_per_epoch:  # saved at the epoch's last batch
            start_epoch, start_step = start_epoch + 1, 0
        print(f"Auto-resumed full train state at epoch {start_epoch} "
              f"step {start_step} (best F1 {best_f1:.4f})")
    else:
        state = TrainState.create(
            variables["params"], variables["batch_stats"], build_tx(0))

    train_step = jax.jit(make_det_train_step(model))
    eval_step = jax.jit(make_det_eval_step(model))

    def current_lr(epoch_done: int) -> float:
        """Head-group LR at the end of ``epoch_done`` — the same schedule
        position the optimizer just stepped to (deterministic in the CLI
        args, like build_tx), logged per epoch like the reference
        (`src/det/train.py:192-196`). Derived from the SAME schedule
        constructors the optimizers are built from (schedules.py
        `det_*_phase_head_schedule`), so a schedule-constant change can't
        silently diverge the logged column."""
        if freeze > 0 and epoch_done < freeze:
            s = (epoch_done + 1) * steps_per_epoch
            return schedule_applied_lr(
                det_freeze_phase_head_schedule(args.lr, phase1_steps),
                s, phase1_steps)
        if freeze > 0:
            total = steps_per_epoch * (args.epochs - freeze)
            s = (epoch_done + 1 - freeze) * steps_per_epoch
            return schedule_applied_lr(
                det_finetune_phase_head_schedule(args.lr, total), s, total)
        total = steps_per_epoch * args.epochs
        s = (epoch_done + 1) * steps_per_epoch
        return schedule_applied_lr(
            det_finetune_phase_head_schedule(
                args.lr, total, unfreeze_lr_scale=1.0), s, total)

    log = CSVLogger(Path(args.save_dir) / "training_log.csv", DET_COLUMNS,
                    resume=bool(args.resume) or resumed is not None)

    for epoch in range(start_epoch, args.epochs):
        # At the unfreeze boundary, rebuild the optimizer — unless this
        # process resumed a state whose optimizer is ALREADY the finetune
        # one (saved at or after the boundary).
        if freeze > 0 and epoch == freeze and not (
                resumed_in_finetune and epoch == start_epoch):
            state = state.replace_tx(
                det_finetune_phase_optimizer(
                    args.lr, steps_per_epoch * (args.epochs - freeze)
                )
            )
            print(f"  Backbone unfrozen: differential LR "
                  f"(backbone {args.lr * 0.05:.6f}, head {args.lr * 0.5:.6f})")

        t0 = time.time()
        skip = start_step if epoch == start_epoch else 0
        total_loss, steps, counted = 0.0, skip, 0
        pending = None  # lag the loss fetch one step so the device never
        #                 idles on the host's metric round-trip
        for dev_batch in device_prefetch(
            iterate(train_ds, args.batch_size, shuffle=True,
                    seed=42, epoch=epoch, drop_last=True,
                    start_batch=skip), mesh):
            state, metrics = train_step(state, dev_batch)
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
                extra = {"dcn_mode": args.dcn_mode, "dcn": not args.no_dcn}
                if args.auto_resume:
                    ckpt.save_state(epoch, steps, state,
                                    {"best_f1": best_f1, **extra})
                else:
                    ckpt.save_step(epoch, steps, state.params,
                                   state.batch_stats, extra)
            if args.crash_after_steps and steps == args.crash_after_steps:
                print(f"  [fault injection] crashing after step {steps}",
                      flush=True)
                os._exit(17)
            if args.max_steps_per_epoch and steps >= args.max_steps_per_epoch:
                break
        if pending is not None:
            total_loss += float(pending["loss"])
        train_loss = total_loss / max(counted, 1)

        val = evaluate(model, state, val_ds, args.batch_size, mesh, eval_step)
        phase = "freeze" if epoch < freeze else "finetune"
        print(
            f"Epoch {epoch + 1:3d} [{phase:8s}] | {time.time() - t0:.0f}s | "
            f"Train {train_loss:.4f} | Val {val['loss']:.4f} | "
            f"P {val['precision']:.4f} R {val['recall']:.4f} "
            f"F1 {val['f1']:.4f} IoU {val['iou']:.4f} Dice {val['dice']:.4f}"
        )
        log.append({
            "epoch": epoch + 1, "lr": f"{current_lr(epoch):.6f}",
            "train_loss": f"{train_loss:.4f}",
            "val_loss": f"{val['loss']:.4f}",
            "val_precision": f"{val['precision']:.4f}",
            "val_recall": f"{val['recall']:.4f}", "val_f1": f"{val['f1']:.4f}",
            "val_iou": f"{val['iou']:.4f}", "val_dice": f"{val['dice']:.4f}",
        })

        # epoch 0 always ships a best_model: an all-zero first val (F1
        # 0.0) otherwise leaves the final test-eval restore with no
        # checkpoint to load.
        if val["f1"] > best_f1 or epoch == 0:
            best_f1 = val["f1"]
            ckpt.save_best(epoch, state.params, state.batch_stats, best_f1,
                           {"val_metrics": {k: float(v) for k, v in val.items()},
                            "dcn_mode": args.dcn_mode, "dcn": not args.no_dcn})
            print(f"  -> saved best model (F1 {best_f1:.4f})")
        ckpt.maybe_save_periodic(epoch, state.params, state.batch_stats, best_f1)
        if args.auto_resume:  # epoch boundary: resume at (epoch+1, step 0)
            ckpt.save_state(epoch + 1, 0, state,
                            {"best_f1": float(best_f1),
                             "dcn_mode": args.dcn_mode,
                             "dcn": not args.no_dcn})

    print(f"Training done. Best F1 {best_f1:.4f}")
    if test_ds is not None:
        restored = ckpt.load("best_model")
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        test = evaluate(model, state, test_ds, args.batch_size, mesh, eval_step)
        print(
            f"Test (SROIE): loss {test['loss']:.4f} P {test['precision']:.4f} "
            f"R {test['recall']:.4f} F1 {test['f1']:.4f} "
            f"IoU {test['iou']:.4f} Dice {test['dice']:.4f}"
        )


if __name__ == "__main__":
    main()
