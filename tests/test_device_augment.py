"""On-device augmentation pipeline (`ops/device_augment.py`).

Contract tests: shape/range/determinism, identity of the warp machinery,
JPEG-sim quality monotonicity, and the device_augment rec train step
end-to-end (uint8 batch -> finite loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.ops.device_augment import (
    _bilinear_warp,
    _homography_from_points,
    _jpeg_sim,
    _median3,
    augment_rec_batch,
)

B, H, W = 4, 32, 256


def _test_images():
    rng = np.random.RandomState(0)
    img = np.full((B, H, W, 3), 1.0, np.float32)
    # dark "text" strokes on white background
    for b in range(B):
        for _ in range(20):
            x = rng.randint(0, W - 8)
            y = rng.randint(4, H - 8)
            img[b, y : y + 6, x : x + 4] = rng.uniform(0, 0.3)
    return jnp.asarray(img)


@pytest.mark.slow
def test_shape_range_determinism():
    img = _test_images()
    key = jax.random.PRNGKey(3)
    out1 = augment_rec_batch(key, img)
    out2 = augment_rec_batch(key, img)
    assert out1.shape == img.shape and out1.dtype == jnp.float32
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = augment_rec_batch(jax.random.PRNGKey(4), img)
    assert float(jnp.abs(out3 - out1).max()) > 1e-3


def test_augmentation_is_moderate():
    """Augmented lines stay recognizable: bounded mean deviation, and the
    dark-stroke/white-background contrast survives."""
    img = _test_images()
    diffs = []
    for seed in range(8):
        out = augment_rec_batch(jax.random.PRNGKey(seed), img)
        diffs.append(float(jnp.abs(out - img).mean()))
    assert max(diffs) < 0.35, diffs
    assert any(d > 1e-4 for d in diffs)  # it does do something


def test_warp_identity():
    img = _test_images()
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    out = _bilinear_warp(img, eye, fill=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_homography_identity_and_shift():
    src = jnp.asarray([[[0.0, 0], [W, 0], [W, H], [0, H]]] * B)
    h_id = _homography_from_points(src, src)
    np.testing.assert_allclose(
        np.asarray(h_id), np.broadcast_to(np.eye(3), (B, 3, 3)), atol=1e-4)
    dst = src + jnp.asarray([5.0, 3.0])
    h_shift = _homography_from_points(src, dst)
    pt = jnp.asarray([10.0, 10.0, 1.0])
    mapped = h_shift[0] @ pt
    np.testing.assert_allclose(
        np.asarray(mapped[:2] / mapped[2]), [15.0, 13.0], atol=1e-3)


def test_jpeg_sim_quality_monotonic():
    img = _test_images()
    hi = _jpeg_sim(img, jnp.full((B,), 95.0))
    lo = _jpeg_sim(img, jnp.full((B,), 10.0))
    err_hi = float(jnp.abs(hi - img).mean())
    err_lo = float(jnp.abs(lo - img).mean())
    assert err_hi < err_lo
    assert err_hi < 0.02  # q95 nearly lossless


def test_median3_constant_and_impulse():
    img = jnp.full((1, 8, 16, 3), 0.5, jnp.float32)
    np.testing.assert_allclose(np.asarray(_median3(img)), 0.5, atol=1e-6)
    impulse = img.at[0, 4, 8, :].set(1.0)  # single outlier pixel vanishes
    out = _median3(impulse)
    assert abs(float(out[0, 4, 8, 0]) - 0.5) < 1e-6


@pytest.mark.slow
def test_rec_train_step_device_augment():
    """uint8 batch + device_augment step: finite loss, params update."""
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.train.schedules import adamw_onecycle
    from ocr_vi_invoice_tpu.train.steps import TrainState, make_rec_train_step

    model = SVTRv2(variant="tiny", dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    t = jnp.ones((1, 8), jnp.int32)
    variables = model.init(rng, x, targets=t, train=True)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              adamw_onecycle(1e-4, 10))
    step = jax.jit(make_rec_train_step(model, 0.1, device_augment=True))
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (2, H, W, 3), np.uint8)),
        "target": jnp.ones((2, 8), jnp.int32) * 5,
        "target_length": jnp.asarray([3, 4], jnp.int32),
        "input_length": jnp.full((2,), W // 4, jnp.int32),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    leaf1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.array_equal(np.asarray(leaf0), np.asarray(leaf1))
