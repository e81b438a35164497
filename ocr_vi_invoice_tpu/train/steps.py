"""Jitted training/eval steps for detection and recognition.

Each builder returns a pure ``step(state, batch, rng) -> (state, metrics)``
function suitable for ``jax.jit`` with sharded inputs. Data parallelism
comes from sharding ``batch`` dim 0 over the mesh's 'data' axis — XLA
inserts the gradient all-reduce; there is no explicit collective code
(SURVEY.md §2.5).

Reference semantics preserved:
  * NaN/Inf loss skips the update (`src/det/train.py:60-62`) — expressed
    as a ``jnp.where`` over the update pytree, branch-free;
  * global-norm clip 5.0 inside the optax chain;
  * BatchNorm statistics updated through flax's ``batch_stats`` mutable
    collection (frozen-backbone phase still updates BN stats, matching
    torch where ``requires_grad=False`` does not stop BN running stats).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from ocr_vi_invoice_tpu.losses.db_loss import db_loss
from ocr_vi_invoice_tpu.losses.rec_loss import svtrv2_loss
from ocr_vi_invoice_tpu.train.metrics import det_pixel_metrics

# ImageNet normalization, applied ON DEVICE when the input pipeline ships
# uint8 (see DetectionDataset(uint8_transfer=True): 4x smaller host->TPU
# payloads; the f32 det batch at 960/bs4 is 103 MB and dominated the step
# behind this dev harness's device relay).
_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def prep_det_batch(batch: Dict[str, jnp.ndarray],
                   compute_dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Dequantize a uint8-transferred det batch inside jit (no-op on f32).

    image: uint8 RGB -> normalized compute dtype; maps: uint8 (x255
    quantized) -> f32 in [0, 1].
    """
    out = dict(batch)
    img = batch["image"]
    if img.dtype == jnp.uint8:
        x = img.astype(jnp.float32) / 255.0
        out["image"] = ((x - _IMAGENET_MEAN) / _IMAGENET_STD).astype(
            compute_dtype)
    W = img.shape[-2]
    for k in ("gt", "mask", "thresh_map", "thresh_mask"):
        if k in batch and batch[k].dtype == jnp.uint8:
            m = batch[k]
            if m.shape[-2] * 8 == W:  # bit-packed binary map (dataset
                #                        bitpack=True): unpack on device
                bits = jnp.right_shift(
                    m[..., None], jnp.arange(7, -1, -1, dtype=jnp.uint8)
                ) & jnp.uint8(1)  # (B, H, W/8, 1, 8), big-endian order
                m = bits.transpose(0, 1, 2, 4, 3).reshape(
                    m.shape[0], m.shape[1], W, 1)
                out[k] = m.astype(jnp.float32)
            else:
                out[k] = m.astype(jnp.float32) / 255.0
    return out


def prep_rec_batch(batch: Dict[str, jnp.ndarray],
                   compute_dtype=jnp.bfloat16,
                   aug_key=None) -> Dict[str, jnp.ndarray]:
    """Dequantize a uint8-transferred rec batch inside jit (no-op on f32).

    With ``aug_key``, the on-device augmentation pipeline
    (`ops/device_augment.py`) runs between dequantize and normalize —
    the TPU-native replacement for host-side RecAugment (which costs
    ~3 s/step of single-core CPU at batch 64)."""
    out = dict(batch)
    img = batch["image"]
    if img.dtype == jnp.uint8:
        x = img.astype(jnp.float32) / 255.0
        if aug_key is not None:
            from ocr_vi_invoice_tpu.ops.device_augment import augment_rec_batch
            x = augment_rec_batch(aug_key, x)
        out["image"] = ((x - _IMAGENET_MEAN) / _IMAGENET_STD).astype(
            compute_dtype)
    return out


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    def replace_tx(self, tx):
        """Fresh optimizer/schedule (the det unfreeze rebuild,
        `train.py:205-226`; rec --resume keeps weights only)."""
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=tx.init(self.params),
            tx=tx,
        )


def _apply_updates_if_finite(state: TrainState, grads, loss):
    """Optimizer step, skipped (identity) when loss is non-finite."""
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    ok = jnp.isfinite(loss)

    def pick(new, old):
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old
        )

    return state.replace(
        step=state.step + ok.astype(jnp.int32),
        params=pick(new_params, state.params),
        opt_state=pick(new_opt_state, state.opt_state),
    )


# --------------------------------------------------------------------------- #
# Detection
# --------------------------------------------------------------------------- #


def make_det_train_step(
    model, alpha: float = 5.0, beta: float = 10.0, ohem_ratio: float = 3.0
) -> Callable:
    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        batch = prep_det_batch(batch)

        def loss_fn(params):
            preds, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            loss, metrics = db_loss(preds, batch, alpha, beta, ohem_ratio)
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = _apply_updates_if_finite(state, grads, loss)
        ok = jnp.isfinite(loss)
        state = state.replace(
            batch_stats=jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new_bs, state.batch_stats
            )
        )
        return state, metrics

    return step


def make_det_eval_step(model, alpha=5.0, beta=10.0, ohem_ratio=3.0) -> Callable:
    def step(state: TrainState, batch):
        batch = prep_det_batch(batch)
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False,
        )
        loss, _ = db_loss(preds, batch, alpha, beta, ohem_ratio)
        metrics = det_pixel_metrics(preds["binary"], batch["gt"], batch["mask"])
        metrics["loss"] = loss
        return metrics

    return step


# --------------------------------------------------------------------------- #
# Recognition
# --------------------------------------------------------------------------- #


def make_rec_train_step(model, lambda_sgm: float = 0.1,
                        device_augment: bool = False) -> Callable:
    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        if device_augment:
            rng, aug_key = jax.random.split(rng)
            batch = prep_rec_batch(batch, aug_key=aug_key)
        else:
            batch = prep_rec_batch(batch)

        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], targets=batch["target"], train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            log_probs, sgm_output = out
            loss, metrics = svtrv2_loss(
                log_probs, batch["target"], sgm_output,
                batch.get("input_length"), batch.get("target_length"),
                lambda_sgm=lambda_sgm,
            )
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = _apply_updates_if_finite(state, grads, loss)
        ok = jnp.isfinite(loss)
        state = state.replace(
            batch_stats=jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new_bs, state.batch_stats
            )
        )
        return state, metrics

    return step


def make_rec_eval_step(model) -> Callable:
    """Eval: CTC-only loss + greedy argmax ids (decode to strings on host)."""

    def step(state: TrainState, batch):
        from ocr_vi_invoice_tpu.ops.ctc import ctc_neg_log_likelihood

        batch = prep_rec_batch(batch)
        log_probs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False,
        )
        loss, _ = svtrv2_loss(
            log_probs, batch["target"], None,
            batch.get("input_length"), batch.get("target_length"),
        )
        # Per-sample losses too, so the host eval loop can exclude the
        # zero-padded tail of the final partial batch from the average
        # (a padded sample's empty-target CTC loss is NOT zero).
        B, T, _ = log_probs.shape
        in_len = batch.get("input_length")
        if in_len is None:
            in_len = jnp.full((B,), T, dtype=jnp.int32)
        tgt_len = batch.get("target_length")
        if tgt_len is None:
            from ocr_vi_invoice_tpu.data.tokenizer import PAD_ID

            tgt_len = (batch["target"] != PAD_ID).sum(axis=1).astype(jnp.int32)
        nll = ctc_neg_log_likelihood(log_probs, batch["target"], in_len, tgt_len)
        per_sample = nll / jnp.maximum(tgt_len, 1)
        per_sample = jnp.where(jnp.isfinite(per_sample), per_sample, 0.0)
        ids = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)
        return {"loss": loss, "loss_per_sample": per_sample,
                "pred_ids": ids}

    return step
