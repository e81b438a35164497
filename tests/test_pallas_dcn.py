"""Pallas DCN kernel: interpret-mode parity with the exact gather path.

(The compiled kernel is exercised on real TPU by bench/verification runs;
CI here runs the interpreter so the math is covered on CPU.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import ocr_vi_invoice_tpu.ops.pallas.dcn_kernel as DK
from ocr_vi_invoice_tpu.ops.dcn import deform_conv2d



pytestmark = pytest.mark.slow

@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(DK.pl, "pallas_call", patched)


def _case(stride, Ho, Wo, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, 12, 16, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 16), jnp.float32)
    off = jnp.clip(jnp.asarray(rng.randn(2, Ho, Wo, 18) * 1.2, jnp.float32),
                   -2.9, 2.9)
    m = jnp.asarray(rng.rand(2, Ho, Wo, 9), jnp.float32)
    return x, off, m, w


def test_matches_gather():
    x, off, m, w = _case(1, 12, 16)
    ref = deform_conv2d(x, off, m, w, stride=1)
    out = DK.deform_conv2d_pallas(x, off, m, w, 1, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_stride2_rejected():
    # Stride-2 layers go through deform_conv2d_s2_pallas (parity-view
    # kernel); the stride-1 entry point rejects stride=2 outright.
    x, off, m, w = _case(2, 6, 8)
    with pytest.raises(ValueError):
        DK.deform_conv2d_pallas(x, off, m, w, 2, 1, 3, 4)


def test_stride2_forward_matches_clipped_gather():
    """Parity-view stride-2 kernel vs the exact clipped-offset gather,
    with offsets large enough that the clip is active and samples cross
    parity cells and image boundaries; Ho=6 with tile_h=4 exercises the
    row-padding branch."""
    x, off, m, w = _case(2, 6, 8, seed=3)
    off = off * 1.5   # beyond R=3 in places -> clip path active
    ref = deform_conv2d(x, jnp.clip(off, -3, 3), m, w, stride=2, padding=1)
    out = DK.deform_conv2d_s2_pallas(x, off, m, w, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_non_divisible_rows():
    # Ho=12 with tile_h=5 -> padding branch
    x, off, m, w = _case(1, 12, 16, seed=1)
    ref = deform_conv2d(x, off, m, w)
    out = DK.deform_conv2d_pallas(x, off, m, w, 1, 1, 3, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_backward_via_xla_path():
    x, off, m, w = _case(1, 12, 16, seed=2)

    def f(x_, o_, m_, w_):
        return DK.deform_conv2d_pallas(x_, o_, m_, w_, 1, 1, 3, 4).sum()

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, off, m, w)

    def fr(x_, o_, m_, w_):
        return deform_conv2d(x_, o_, m_, w_).sum()

    refs = jax.grad(fr, argnums=(0, 1, 2, 3))(x, off, m, w)
    for g, r in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-3, atol=1e-3)


# --------------------------------------------------------------------------- #
# Backward kernels (round 2)
# --------------------------------------------------------------------------- #


def test_backward_matches_gather_autodiff():
    """The two Pallas backward kernels vs autodiff of the exact gather.

    Oracle choice matters: `deform_conv2d_local` routes data movement
    through conv_general_dilated_patches, which XLA runs at bf16 input
    precision (on TPU by design, and on this CPU stack's TPU-emulating
    config) — ~4e-3 relative noise. The gather path is precise f32, and
    for |offset| < radius the two are the same function, so the gather's
    autodiff is the right reference. Small radius keeps interpret-mode
    runtime sane.
    """
    rng = np.random.RandomState(0)
    B, H, W, Cin, Cout, R = 1, 6, 8, 4, 8, 1
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout), jnp.float32)
    off = jnp.clip(
        jnp.asarray(rng.randn(B, H, W, 18) * 0.8, jnp.float32), -0.9, 0.9)
    m = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, H, W, Cout), jnp.float32)

    def f_pallas(x, o, mm, ww):
        return jnp.sum(DK.deform_conv2d_pallas(x, o, mm, ww, 1, 1, R, 2) * g)

    def f_gather(x, o, mm, ww):
        return jnp.sum(deform_conv2d(x, o, mm, ww, stride=1, padding=1) * g)

    gp = jax.grad(f_pallas, argnums=(0, 1, 2, 3))(x, off, m, w)
    gg = jax.grad(f_gather, argnums=(0, 1, 2, 3))(x, off, m, w)
    for name, a, b in zip(["dx", "doffset", "dmask", "dweight"], gp, gg):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4,
            err_msg=name)


def test_backward_clip_boundary_zero_grad():
    """Offsets beyond the radius get zero gradient (clip semantics)."""
    rng = np.random.RandomState(1)
    B, H, W, Cin, Cout, R = 1, 4, 8, 2, 4, 1
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout), jnp.float32)
    off = jnp.full((B, H, W, 18), 1.7, jnp.float32)   # all beyond R=1
    m = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)

    def f(o):
        return jnp.sum(DK.deform_conv2d_pallas(x, o, m, w, 1, 1, R, 2))

    doff = jax.grad(f)(off)
    np.testing.assert_array_equal(np.asarray(doff), 0.0)


def test_stride2_backward_matches_gather_autodiff():
    """deform_conv2d_s2_pallas: parity-view Pallas fwd, stride-1-Pallas-
    on-upsampled-grid bwd — both must match the clipped-gather autodiff
    (fwd to kernel f32 op-order tolerance; it used to be the gather
    itself and therefore bit-exact)."""
    rng = np.random.RandomState(2)
    B, H, W, Cin, Cout, R = 1, 8, 8, 3, 4, 1
    Ho = H // 2
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout), jnp.float32)
    off = jnp.clip(
        jnp.asarray(rng.randn(B, Ho, Ho, 18) * 0.8, jnp.float32), -0.9, 0.9)
    m = jnp.asarray(rng.rand(B, Ho, Ho, 9), jnp.float32)
    g = jnp.asarray(rng.randn(B, Ho, Ho, Cout), jnp.float32)

    def fp(x, o, mm, ww):
        return jnp.sum(DK.deform_conv2d_s2_pallas(x, o, mm, ww, 1, R, 2) * g)

    def fg(x, o, mm, ww):
        return jnp.sum(deform_conv2d(
            x, jnp.clip(o, -R, R), mm, ww, stride=2, padding=1) * g)

    out_p = DK.deform_conv2d_s2_pallas(x, off, m, w, 1, R, 2)
    out_g = deform_conv2d(x, jnp.clip(off, -R, R), m, w, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g),
                               rtol=1e-5, atol=1e-6)

    gp = jax.grad(fp, argnums=(0, 1, 2, 3))(x, off, m, w)
    gg = jax.grad(fg, argnums=(0, 1, 2, 3))(x, off, m, w)
    for name, a, b in zip(["dx", "doffset", "dmask", "dweight"], gp, gg):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5, err_msg=name)


# --------------------------------------------------------------------------- #
# Scalar-interval guards (round 5)
# --------------------------------------------------------------------------- #


def test_straddle_offsets_exact():
    """Pixels straddling a cell's open support (one at -2, one at +2
    around a cell center) make the interval guard fire conservatively;
    the accumulated hat product must be identically zero, so the output
    still matches the exact gather."""
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 10, 12, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)
    off = np.zeros((1, 10, 12, 18), np.float32)
    # alternate dy between -2 and +2 per column: every row-cell interval
    # [-2, 2] intersects supports its pixels never enter
    off[..., 0::2] = np.where(np.arange(12)[None, None, :, None] % 2 == 0,
                              -2.0, 2.0)
    off = jnp.asarray(off)
    m = jnp.asarray(rng.rand(1, 10, 12, 9), jnp.float32)
    ref = deform_conv2d(x, off, m, w)
    out = DK.deform_conv2d_pallas(x, off, m, w, 1, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_zero_mask_tap_skipped_exact():
    """A tap whose modulation mask is identically zero is gated out by
    the mpos scalar guard; output must equal the gather (which just
    multiplies that tap by zero)."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 10, 12, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 4, 8), jnp.float32)
    off = jnp.clip(jnp.asarray(rng.randn(1, 10, 12, 18).astype(np.float32))
                   * 1.2, -2.9, 2.9)
    m = np.asarray(rng.rand(1, 10, 12, 9), np.float32)
    m[..., [2, 5]] = 0.0   # two taps fully masked out
    m = jnp.asarray(m)
    ref = deform_conv2d(x, off, m, w)
    out = DK.deform_conv2d_pallas(x, off, m, w, 1, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
