import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.data.tokenizer import Tokenizer
from ocr_vi_invoice_tpu.losses.rec_loss import svtrv2_loss
from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2, VARIANTS
from ocr_vi_invoice_tpu.ops.ctc import greedy_ids


pytestmark = pytest.mark.slow

# Golden parameter counts measured on the reference implementation
# (/root/reference/model/rec2/svtrv2.py) — exact parity required.
GOLDEN = {
    "tiny": {"total": 6_736_656, "sgm": 910_824, "frm": 1_580_288, "stem": 19_584,
             "stages_merges": 3_796_032 + 369_792, "head": 59_624},
    "small": {"total": 10_893_744, "sgm": 910_824, "frm": 1_580_288, "stem": 43_200,
              "stages_merges": 7_689_696 + 609_600, "head": 59_624},
    "base": {"total": 22_630_864, "sgm": 1_955_944, "frm": 3_550_080, "stem": 76_032,
             "stages_merges": 15_777_152 + 1_181_568, "head": 89_320},
}


def _count(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("variant", ["tiny", "small", "base"])
def test_param_counts_match_reference(variant):
    model = SVTRv2(variant=variant)
    x = jnp.zeros((1, 32, 256, 3))
    targets = jnp.ones((1, 8), jnp.int32)
    shapes = jax.eval_shape(
        lambda r: model.init(r, x, targets=targets, train=True), jax.random.PRNGKey(0)
    )
    params = shapes["params"]
    g = GOLDEN[variant]
    assert _count(params) == g["total"]
    assert _count(params["sgm"]) == g["sgm"]
    assert _count(params["frm"]) == g["frm"]
    assert _count(params["stem"]) == g["stem"]
    assert _count(params["head"]) == g["head"]
    sm = sum(
        _count(v) for k, v in params.items() if k.startswith(("stage", "merge"))
    )
    assert sm == g["stages_merges"]


def test_forward_shapes_and_logprob_contract():
    model = SVTRv2(variant="tiny")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 256, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    log_probs = model.apply(variables, x)
    # 256 wide / 4 (stem) = 64 CTC frames; 232 classes.
    assert log_probs.shape == (2, 64, 232)
    assert log_probs.dtype == jnp.float32
    assert float(log_probs.max()) <= 0.0
    # log-softmax: rows sum to 1 in prob space
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_probs).sum(-1)), 1.0, rtol=1e-4
    )


def test_train_mode_returns_sgm():
    model = SVTRv2(variant="tiny")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3))
    targets = jnp.asarray([[5, 6, 7, 1, 1], [8, 9, 1, 1, 1]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, targets=targets, train=True)
    (log_probs, sgm), _ = model.apply(
        variables, x, targets=targets, train=True, mutable=["batch_stats"]
    )
    assert log_probs.shape == (2, 16, 232)
    assert sgm["sgm_left"].shape == (2, 5, 232)
    assert sgm["sgm_right"].shape == (2, 5, 232)
    assert (sgm["sgm_targets"] == targets).all()


def test_inference_has_no_sgm_params_needed():
    """SGM is train-only: inference must work and its params are separable."""
    model = SVTRv2(variant="tiny")
    x = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "sgm" not in variables["params"]  # init without targets skips SGM


def test_loss_decreases_with_matching_target():
    model = SVTRv2(variant="tiny")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    log_probs = model.apply(variables, x)
    targets = jnp.asarray([[5, 6, 7, 1], [8, 9, 1, 1]], jnp.int32)
    loss, metrics = svtrv2_loss(log_probs, targets)
    assert np.isfinite(float(loss))
    assert metrics["loss_ctc"] == loss  # no SGM => pure CTC


def test_greedy_decode_returns_strings():
    model = SVTRv2(variant="tiny")
    tok = Tokenizer()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    log_probs = model.apply(variables, x)
    ids = greedy_ids(log_probs)
    texts = tok.decode_ctc_greedy(np.asarray(ids))
    assert isinstance(texts, list) and len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


def test_bfloat16_forward():
    model = SVTRv2(variant="tiny", dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 64, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    log_probs = model.apply(variables, x)
    assert log_probs.dtype == jnp.float32  # head log-softmax upcasts
    assert np.isfinite(np.asarray(log_probs)).all()
