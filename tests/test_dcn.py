import jax
import jax.numpy as jnp
import numpy as np

from ocr_vi_invoice_tpu.ops.dcn import deform_conv2d


def _naive_deform_conv(x, offset, mask, weight, stride=1, padding=1, dilation=1):
    """Direct-loop reference (numpy), torchvision semantics."""
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    out = np.zeros((B, Ho, Wo, Cout), np.float64)

    def sample(b, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        wy, wx = y - y0, xx - x0
        acc = np.zeros(Cin)
        for dy, dxx, w in [
            (0, 0, (1 - wy) * (1 - wx)),
            (0, 1, (1 - wy) * wx),
            (1, 0, wy * (1 - wx)),
            (1, 1, wy * wx),
        ]:
            yy, xc = y0 + dy, x0 + dxx
            if 0 <= yy < H and 0 <= xc < W:
                acc += w * x[b, yy, xc]
        return acc

    for b in range(B):
        for i in range(Ho):
            for j in range(Wo):
                for t in range(K):
                    ti, tj = t // kw, t % kw
                    y = i * stride - padding + ti * dilation + offset[b, i, j, 2 * t]
                    xx = j * stride - padding + tj * dilation + offset[b, i, j, 2 * t + 1]
                    v = sample(b, y, xx) * mask[b, i, j, t]
                    out[b, i, j] += v @ weight[ti, tj]
    return out


def test_zero_offset_equals_standard_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)
    offset = jnp.zeros((2, 8, 8, 18), jnp.float32)
    mask = jnp.ones((2, 8, 8, 9), jnp.float32)
    out = deform_conv2d(x, offset, mask, w)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_matches_naive_with_random_offsets():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 7, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 5).astype(np.float32)
    offset = (rng.randn(1, 6, 7, 18) * 1.5).astype(np.float32)
    mask = rng.rand(1, 6, 7, 9).astype(np.float32)
    out = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w)
    )
    ref = _naive_deform_conv(x, offset, mask, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_stride2():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32)
    offset = (rng.randn(1, 4, 4, 18) * 0.7).astype(np.float32)
    mask = rng.rand(1, 4, 4, 9).astype(np.float32)
    out = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w),
        stride=2,
    )
    ref = _naive_deform_conv(x, offset, mask, w, stride=2)
    assert out.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_gradients_flow_to_offsets_and_mask():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 6, 2), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 2, 3), jnp.float32)
    offset = jnp.asarray(rng.randn(1, 6, 6, 18) * 0.5, jnp.float32)
    mask = jnp.asarray(rng.rand(1, 6, 6, 9), jnp.float32)

    def f(o, m, xx, ww):
        return deform_conv2d(xx, o, m, ww).sum()

    go, gm, gx, gw = jax.grad(f, argnums=(0, 1, 2, 3))(offset, mask, x, w)
    for g in (go, gm, gx, gw):
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0


def test_inference_dcn_mode_selection():
    """'local'/'pallas' resolve to the backend's fast equivalent path
    (pallas on TPU, plain-XLA local elsewhere — the kernel has no CPU
    lowering); 'gather' is never remapped (different numerics at
    unbounded offsets)."""
    from ocr_vi_invoice_tpu.ops.dcn import inference_dcn_mode

    expect = "pallas" if jax.default_backend() == "tpu" else "local"
    assert inference_dcn_mode("local") == expect
    assert inference_dcn_mode("pallas") == expect
    assert inference_dcn_mode("gather") == "gather"
