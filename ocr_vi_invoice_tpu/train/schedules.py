"""Learning-rate schedules and optimizer builders.

Mirrors the reference recipes (`src/det/train.py:169-226`,
`src/rec2/train.py:195-203`): AdamW(wd=0.05) + per-step OneCycle with
cosine annealing, global-norm gradient clip 5.0, and for detection a
two-phase plan — backbone frozen for the first N epochs, then a fresh
optimizer with differential LR (backbone at lr/10, overall lr halved,
gentler warmup).

On TPU there is no GradScaler: bf16 has fp32 dynamic range, so the
reference's AMP scale/back-off machinery (`train.py:73-81`) has no
equivalent and the schedule simply steps every update.
"""

from __future__ import annotations

import jax
import optax


def onecycle(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.075,
    div_factor: float = 25.0,
    final_div_factor: float = 1000.0,
) -> optax.Schedule:
    """torch OneCycleLR(anneal_strategy='cos') equivalent.

    Tiny-total guard: optax's cosine_onecycle divides by the warmup
    interval's width in STEPS, so ``pct_start * total_steps < 1`` makes a
    zero-width integer interval and the WHOLE schedule evaluates to NaN
    (measured: every count NaN for total_steps <= 13 at pct_start 0.075)
    — which silently NaN-poisons a short smoke run's optimizer. Widen
    the warmup to at least one step; production totals are unaffected.
    """
    total_steps = max(total_steps, 2)
    pct_start = max(pct_start, 1.0 / total_steps)
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def adamw_onecycle(
    max_lr: float,
    total_steps: int,
    weight_decay: float = 0.05,
    grad_clip: float = 5.0,
    pct_start: float = 0.075,
    div_factor: float = 25.0,
    final_div_factor: float = 1000.0,
) -> optax.GradientTransformation:
    """Single-group optimizer: clip → AdamW on a OneCycle schedule."""
    sched = onecycle(max_lr, total_steps, pct_start, div_factor, final_div_factor)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def _label_backbone(params) -> dict:
    """Label top-level 'backbone' subtree vs everything else."""
    return {
        k: jax.tree_util.tree_map(lambda _: "backbone" if k == "backbone" else "other", v)
        for k, v in params.items()
    }


def schedule_applied_lr(sched, step_count: int, total_steps: int) -> float:
    """LR the optimizer last APPLIED after ``step_count`` steps.

    optax's one-cycle schedules return NaN when evaluated exactly at
    ``count == total_steps`` (the final join interval has zero width);
    the optimizer itself only ever evaluates counts 0..total-1, so LR
    logging must clamp the same way — otherwise the final epoch's CSV
    row logs NaN (caught by test_train_cli at 1-step-per-epoch sizes).
    """
    return float(sched(min(step_count, total_steps - 1)))


def det_freeze_phase_head_schedule(lr: float, steps: int):
    """The head-group schedule `det_freeze_phase_optimizer` applies —
    exposed so LR logging derives from the SAME object the optimizer is
    built from (no constant duplication)."""
    return onecycle(lr, steps, pct_start=0.075, div_factor=25,
                    final_div_factor=1000)


def det_finetune_phase_head_schedule(lr: float, steps: int,
                                     unfreeze_lr_scale: float = 0.5):
    """The head-group ('other') schedule `det_finetune_phase_optimizer`
    applies; same single-source-of-truth role as above."""
    return onecycle(lr * unfreeze_lr_scale, steps, pct_start=0.1,
                    div_factor=10, final_div_factor=1000)


def det_freeze_phase_optimizer(
    lr: float,
    steps: int,
    weight_decay: float = 0.05,
    grad_clip: float = 5.0,
) -> optax.GradientTransformation:
    """Phase 1 (`train.py:138-178`): backbone frozen (zero updates),
    neck+head on OneCycle at ``lr``."""
    sched = det_freeze_phase_head_schedule(lr, steps)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {
                "backbone": optax.set_to_zero(),
                "other": optax.adamw(sched, weight_decay=weight_decay),
            },
            _label_backbone,
        ),
    )


def det_finetune_phase_optimizer(
    lr: float,
    steps: int,
    weight_decay: float = 0.05,
    grad_clip: float = 5.0,
    backbone_lr_scale: float = 0.1,
    unfreeze_lr_scale: float = 0.5,
) -> optax.GradientTransformation:
    """Phase 2 (`train.py:205-226`): fresh AdamW, backbone at
    lr*0.5/10, rest at lr*0.5; warmup pct 0.1, div_factor 10."""
    finetune_lr = lr * unfreeze_lr_scale
    kw = dict(pct_start=0.1, div_factor=10, final_div_factor=1000)
    sched_bb = onecycle(finetune_lr * backbone_lr_scale, steps, **kw)
    sched_other = det_finetune_phase_head_schedule(lr, steps,
                                                   unfreeze_lr_scale)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.multi_transform(
            {
                "backbone": optax.adamw(sched_bb, weight_decay=weight_decay),
                "other": optax.adamw(sched_other, weight_decay=weight_decay),
            },
            _label_backbone,
        ),
    )
