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
