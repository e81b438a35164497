import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ocr_vi_invoice_tpu.ops.ctc import (
    ctc_loss,
    ctc_neg_log_likelihood,
    collapse_repeats,
    greedy_ids,
)


def _random_case(key, B=4, T=20, C=12, L=6):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    logits = jax.random.normal(k1, (B, T, C))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    target_lengths = jax.random.randint(k2, (B,), 1, L + 1)
    targets = jax.random.randint(k3, (B, L), 2, C)  # avoid blank(0)/pad(1)
    input_lengths = jax.random.randint(k4, (B,), L * 2 + 2, T + 1)
    return log_probs, targets, input_lengths, target_lengths


def test_nll_matches_optax():
    log_probs, targets, input_lengths, target_lengths = _random_case(
        jax.random.PRNGKey(0)
    )
    B, T, C = log_probs.shape
    L = targets.shape[1]
    ours = ctc_neg_log_likelihood(log_probs, targets, input_lengths, target_lengths)

    logit_paddings = (jnp.arange(T)[None, :] >= input_lengths[:, None]).astype(
        jnp.float32
    )
    label_paddings = (jnp.arange(L)[None, :] >= target_lengths[:, None]).astype(
        jnp.float32
    )
    ref = optax.ctc_loss(log_probs, logit_paddings, targets, label_paddings, blank_id=0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_nll_brute_force_tiny():
    """Sum over all alignments explicitly for a tiny case."""
    rng = np.random.RandomState(1)
    T, C = 4, 4
    logits = rng.randn(1, T, C).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))[0]
    target = [2, 3]

    # Enumerate all id sequences of length T, keep those collapsing to target.
    total = -np.inf
    for seq in np.ndindex(*([C] * T)):
        collapsed = []
        prev = -1
        for s in seq:
            if s != 0 and s != prev:
                collapsed.append(s)
            prev = s
        if collapsed == target:
            total = np.logaddexp(total, sum(lp[t, s] for t, s in enumerate(seq)))

    ours = ctc_neg_log_likelihood(
        jax.nn.log_softmax(jnp.asarray(logits), axis=-1),
        jnp.asarray([[2, 3]]),
        jnp.asarray([T]),
        jnp.asarray([2]),
    )
    np.testing.assert_allclose(float(ours[0]), -total, rtol=1e-4)


def test_mean_reduction_divides_by_target_length():
    log_probs, targets, input_lengths, target_lengths = _random_case(
        jax.random.PRNGKey(2)
    )
    nll = ctc_neg_log_likelihood(log_probs, targets, input_lengths, target_lengths)
    loss = ctc_loss(log_probs, targets, input_lengths, target_lengths)
    expect = float((nll / target_lengths).mean())
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_zero_infinity():
    # Target longer than available frames -> unreachable -> inf -> zeroed.
    log_probs = jax.nn.log_softmax(jnp.zeros((1, 3, 5)), axis=-1)
    targets = jnp.asarray([[2, 2, 2, 2]])  # needs >= 2*4-1=7 frames (repeats)
    nll = ctc_neg_log_likelihood(log_probs, targets, jnp.asarray([3]), jnp.asarray([4]))
    assert not np.isfinite(float(nll[0]))
    loss = ctc_loss(log_probs, targets, jnp.asarray([3]), jnp.asarray([4]))
    assert float(loss) == 0.0


def test_grad_is_finite_and_nonzero():
    log_probs, targets, input_lengths, target_lengths = _random_case(
        jax.random.PRNGKey(3)
    )

    def f(lp):
        return ctc_loss(lp, targets, input_lengths, target_lengths)

    g = jax.grad(f)(log_probs)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_greedy_and_collapse():
    lp = jnp.full((1, 5, 4), -10.0)
    # frames: a a blank b b  (a=2, b=3)
    frame_ids = [2, 2, 0, 3, 3]
    lp = lp.at[0, jnp.arange(5), jnp.asarray(frame_ids)].set(0.0)
    ids = greedy_ids(lp)
    assert ids.tolist() == [frame_ids]
    collapsed = collapse_repeats(ids)
    assert collapsed.tolist() == [[2, 0, 0, 3, 0]]


def test_jit_compiles():
    log_probs, targets, input_lengths, target_lengths = _random_case(
        jax.random.PRNGKey(4)
    )
    f = jax.jit(ctc_loss)
    v1 = f(log_probs, targets, input_lengths, target_lengths)
    v2 = ctc_loss(log_probs, targets, input_lengths, target_lengths)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
