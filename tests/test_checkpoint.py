import jax
import jax.numpy as jnp
import numpy as np

from ocr_vi_invoice_tpu.train.checkpoint import CheckpointManager, load_weights


def _tree():
    return {
        "params": {"dense": {"kernel": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}},
        "bs": {"bn": {"mean": jnp.ones((3,))}},
    }


def test_best_save_load_roundtrip(tmp_path):
    m = CheckpointManager(tmp_path, every=5)
    t = _tree()
    m.save_best(3, t["params"], t["bs"], 0.77, {"variant": "base"})
    restored = m.load("best_model")
    np.testing.assert_array_equal(
        restored["params"]["dense"]["kernel"], np.arange(6).reshape(2, 3)
    )
    assert restored["best_metric"] == 0.77
    assert restored["epoch"] == 3
    assert restored["variant"] == "base"


def test_periodic_save_policy(tmp_path):
    m = CheckpointManager(tmp_path, every=5)
    t = _tree()
    for epoch in range(10):
        m.maybe_save_periodic(epoch, t["params"], t["bs"], 0.0)
    assert (tmp_path / "checkpoint_epoch_5").exists()
    assert (tmp_path / "checkpoint_epoch_10").exists()
    assert not (tmp_path / "checkpoint_epoch_3").exists()


def test_best_overwrite(tmp_path):
    m = CheckpointManager(tmp_path, every=5)
    t = _tree()
    m.save_best(0, t["params"], t["bs"], 0.1)
    m.save_best(1, t["params"], t["bs"], 0.2)
    assert m.load("best_model")["best_metric"] == 0.2


def test_step_checkpoint_rolls(tmp_path):
    m = CheckpointManager(tmp_path)
    t = _tree()
    m.save_step(0, 500, t["params"], t["bs"], {"dcn_mode": "local"})
    m.save_step(0, 1000, t["params"], t["bs"], {"dcn_mode": "local"})
    restored = m.load("last_step")
    assert restored["step"] == 1000
    assert restored["dcn_mode"] == "local"
    assert not (tmp_path / "last_step_500").exists()  # single rolling dir


def test_load_weights_function(tmp_path):
    m = CheckpointManager(tmp_path)
    t = _tree()
    m.save_best(0, t["params"], t["bs"], 0.5)
    restored = load_weights(tmp_path / "best_model")
    assert "params" in restored and "batch_stats" in restored


def test_full_state_roundtrip(tmp_path):
    """save_state/restore_state: optimizer moments, schedule position and
    the step counter survive a process death exactly."""
    import optax

    from ocr_vi_invoice_tpu.train.steps import TrainState

    t = _tree()
    tx = optax.chain(optax.clip_by_global_norm(5.0),
                     optax.adamw(optax.linear_schedule(1e-3, 0.0, 100)))
    state = TrainState.create(t["params"], t["bs"], tx)

    # take a few real optimizer steps so moments/count are nontrivial
    grads = jax.tree_util.tree_map(jnp.ones_like, state.params)
    for _ in range(3):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        state = state.replace(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
            step=state.step + 1,
        )

    m = CheckpointManager(tmp_path, every=5)
    assert m.restore_state(state) is None  # nothing saved yet
    m.save_state(epoch=1, step=42, state=state, extra={"best_f1": 0.5})
    assert m.peek("last_state") == {"epoch": 1, "step": 42, "best_f1": 0.5}

    template = TrainState.create(t["params"], t["bs"], tx)  # fresh process
    r = m.restore_state(template)
    assert r["epoch"] == 1 and r["step"] == 42 and r["best_f1"] == 0.5
    restored = r["state"]
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from restored must match continuing from the original
    u1, _ = tx.update(grads, restored.opt_state, restored.params)
    u2, _ = tx.update(grads, state.opt_state, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(u1), jax.tree_util.tree_leaves(u2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_backbone_artifact_roundtrip(tmp_path):
    """tools/export_backbone.py produces a backbone-only artifact whose
    subtrees merge into a fresh det init (the --init_backbone_from
    contract), matching the reference's pretrained-backbone warm start
    (`model/det/backbone.py:13-18`)."""
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import export_backbone

    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.train.checkpoint import (
        CheckpointManager,
        load_weights,
    )

    model = DBNetPP(dcn=False, backbone="resnet18", dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    mgr = CheckpointManager(tmp_path / "src")
    mgr.save_best(0, variables["params"], variables["batch_stats"], 0.5,
                  extra={"dcn_mode": "gather"})

    dst = tmp_path / "backbone_pretrained"
    export_backbone.main([str(tmp_path / "src" / "best_model"), str(dst)])

    art = load_weights(dst)
    assert set(art["params"].keys()) == {"backbone"}
    assert set(art["batch_stats"].keys()) == {"backbone"}
    assert art["kind"] == "backbone_pretrained"

    # merge exactly like train.det's --init_backbone_from branch
    fresh = model.init(jax.random.PRNGKey(1),
                       jnp.zeros((1, 64, 64, 3), jnp.float32))
    merged = {
        "params": {**fresh["params"], "backbone": art["params"]["backbone"]},
        "batch_stats": {**fresh["batch_stats"],
                        "backbone": art["batch_stats"]["backbone"]},
    }
    lhs = jax.tree_util.tree_leaves(merged["params"]["backbone"])
    rhs = jax.tree_util.tree_leaves(variables["params"]["backbone"])
    assert all((a == b).all() for a, b in zip(lhs, rhs))


def test_onecycle_finite_at_all_counts_and_tiny_totals():
    """optax's cosine_onecycle is NaN at every count when
    pct_start*total < 1 (zero-width integer warmup interval) and NaN at
    count == total for any size; schedules.onecycle and
    schedule_applied_lr must stay finite everywhere the trainer and the
    CSV logger evaluate them (caught live: 1-step-per-epoch smoke runs
    trained on a NaN-poisoned optimizer)."""
    import math

    from ocr_vi_invoice_tpu.train.schedules import (
        onecycle,
        schedule_applied_lr,
    )

    for total in (1, 2, 3, 10, 13, 14, 100, 5000):
        sch = onecycle(1e-3, total)
        for s in range(0, min(total, 20)):
            assert math.isfinite(float(sch(s))), (total, s)
        assert math.isfinite(schedule_applied_lr(sch, total, total)), total
        assert schedule_applied_lr(sch, total, total) > 0.0
