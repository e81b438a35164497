"""Train the document scanner's U-2-Net on synthetic composites.

Produces ``weights/u2netp/best_model`` which `pipeline/scanner.py` picks
up automatically (OVI_U2NET_WEIGHTS env var overrides). The reference had
no scanner training at all — it shipped rembg's onnx weights; this makes
the capability self-contained.

  python -m ocr_vi_invoice_tpu.train.scan --steps 2000 --batch_size 8
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ocr_vi_invoice_tpu.generator.scan_data import ScanDataset
    from ocr_vi_invoice_tpu.models.u2net import U2Net, u2net_bce_loss
    from ocr_vi_invoice_tpu.parallel.mesh import make_mesh, shard_batch
    from ocr_vi_invoice_tpu.train.checkpoint import CheckpointManager
    from ocr_vi_invoice_tpu.train.steps import TrainState
    from ocr_vi_invoice_tpu.utils.profiling import enable_compilation_cache

    ap = argparse.ArgumentParser(description="Train U-2-Net scanner (TPU)")
    ap.add_argument("--variant", default="u2netp", choices=["u2netp", "u2net"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--save_dir", default="weights/u2netp")
    ap.add_argument("--save_every", type=int, default=500)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    enable_compilation_cache()
    mesh = make_mesh()
    model = U2Net(variant=args.variant, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(args.seed)
    # batch 1: param shapes are batch-independent; keeps init small.
    x0 = jnp.zeros((1, args.height, args.width, 3), jnp.bfloat16)
    variables = jax.jit(lambda r, x_: model.init(r, x_, train=True))(rng, x0)
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(optax.cosine_onecycle_schedule(args.steps, args.lr),
                    weight_decay=1e-4),
    )
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)

    def loss_fn(params, batch_stats, batch):
        (d0, sides), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        loss = u2net_bce_loss(d0, sides, batch["mask"])
        iou = (((d0 > 0.5) & (batch["mask"] > 0.5)).sum()
               / jnp.maximum(((d0 > 0.5) | (batch["mask"] > 0.5)).sum(), 1))
        return loss, (iou, mut["batch_stats"])

    @jax.jit
    def train_step(state, batch):
        (loss, (iou, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ok = jnp.isfinite(loss)
        pick = lambda n, o: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), n, o)
        return state.replace(
            step=state.step + 1, params=pick(params, state.params),
            opt_state=pick(opt_state, state.opt_state),
            batch_stats=pick(new_bs, state.batch_stats),
        ), loss, iou

    ds = ScanDataset(size=args.steps * args.batch_size,
                     out_hw=(args.height, args.width), seed=args.seed)
    ckpt = CheckpointManager(args.save_dir, every=1)
    t0 = time.time()
    best_iou = 0.0
    for step in range(args.steps):
        idxs = range(step * args.batch_size, (step + 1) * args.batch_size)
        samples = [ds[i] for i in idxs]
        batch = shard_batch(mesh, {
            "image": np.stack([s["image"] for s in samples]),
            "mask": np.stack([s["mask"] for s in samples]),
        })
        state, loss, iou = train_step(state, batch)
        if (step + 1) % args.log_every == 0:
            print(f"step {step + 1:5d} | loss {float(loss):.4f} | "
                  f"IoU {float(iou):.3f} | {(time.time() - t0):.0f}s")
        if (step + 1) % args.save_every == 0 or step == args.steps - 1:
            cur = float(iou)
            ckpt.save_best(step, state.params, state.batch_stats, cur,
                           {"variant": args.variant})
            best_iou = max(best_iou, cur)
    print(f"Done. Last IoU {best_iou:.3f}; weights in {args.save_dir}")


if __name__ == "__main__":
    main()
