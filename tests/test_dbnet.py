import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.losses.db_loss import balanced_bce_loss, db_loss
from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
from ocr_vi_invoice_tpu.models.resnet import ResNet


pytestmark = pytest.mark.slow

# Golden counts: neck/head measured on the reference modules
# (model/det/neck.py, head.py); backbone computed from torchvision
# resnet50 (25,557,032 incl. fc) minus fc (2,049,000) plus the DCN
# offset/mask convs (871,263) — fc/avgpool are dead weight the reference
# carries and we deliberately do not.
GOLDEN_NECK = 3_349_508
GOLDEN_HEAD = 328_834
GOLDEN_BACKBONE_R50 = 23_508_032
GOLDEN_BACKBONE_R50_DCN = 24_379_295


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _init_shapes(model, shape):
    return jax.eval_shape(
        lambda r: model.init(r, jnp.zeros(shape), train=False), jax.random.PRNGKey(0)
    )


@pytest.mark.parametrize(
    "dcn,golden", [(False, GOLDEN_BACKBONE_R50), (True, GOLDEN_BACKBONE_R50_DCN)]
)
def test_backbone_param_count(dcn, golden):
    model = ResNet(name_="resnet50", dcn=dcn)
    shapes = _init_shapes(model, (1, 64, 64, 3))
    assert _count(shapes["params"]) == golden


def test_full_model_param_counts():
    model = DBNetPP(dcn=True)
    shapes = _init_shapes(model, (1, 64, 64, 3))
    p = shapes["params"]
    assert _count(p["neck"]) == GOLDEN_NECK
    assert _count(p["head"]) == GOLDEN_HEAD
    assert _count(p["backbone"]) == GOLDEN_BACKBONE_R50_DCN
    assert _count(p) == GOLDEN_NECK + GOLDEN_HEAD + GOLDEN_BACKBONE_R50_DCN


def test_backbone_pyramid_shapes():
    model = ResNet(name_="resnet50", dcn=False)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 16, 16, 256),
        (1, 8, 8, 512),
        (1, 4, 4, 1024),
        (1, 2, 2, 2048),
    ]


def test_forward_output_contract():
    model = DBNetPP(dcn=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    for key in ("binary", "thresh", "thresh_binary"):
        assert out[key].shape == (1, 64, 64, 1)
        v = np.asarray(out[key])
        assert v.min() >= 0.0 and v.max() <= 1.0
    assert out["bin_logits"].shape == (1, 64, 64, 1)
    # thresh_binary is the k=50 step function of (binary - thresh)
    tb = 1.0 / (1.0 + np.exp(-50.0 * (np.asarray(out["binary"]) - np.asarray(out["thresh"]))))
    np.testing.assert_allclose(np.asarray(out["thresh_binary"]), tb, atol=1e-5)


def test_dcn_forward_runs():
    model = DBNetPP(dcn=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert np.isfinite(np.asarray(out["binary"])).all()


def test_db_loss_components():
    B, H, W = 2, 32, 32
    rng = np.random.RandomState(0)
    preds = {
        "bin_logits": jnp.asarray(rng.randn(B, H, W, 1), jnp.float32),
        "thresh": jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        "thresh_binary": jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
    }
    batch = {
        "gt": jnp.asarray((rng.rand(B, H, W, 1) > 0.8).astype(np.float32)),
        "mask": jnp.ones((B, H, W, 1), jnp.float32),
        "thresh_map": jnp.asarray(rng.rand(B, H, W, 1), jnp.float32),
        "thresh_mask": jnp.asarray((rng.rand(B, H, W, 1) > 0.5).astype(np.float32)),
    }
    loss, m = db_loss(preds, batch)
    assert float(loss) == pytest.approx(
        float(m["l_prob"] + 5.0 * m["l_binary"] + 10.0 * m["l_thresh"]), rel=1e-6
    )
    assert np.isfinite(float(loss))


def test_ohem_matches_torch_semantics():
    """Static-shape OHEM == topk over negatives with ratio 3:1."""
    rng = np.random.RandomState(1)
    H = 16
    logits = rng.randn(1, H, H, 1).astype(np.float32)
    gt = (rng.rand(1, H, H, 1) > 0.9).astype(np.float32)
    mask = np.ones_like(gt)
    ours = float(balanced_bce_loss(jnp.asarray(logits), jnp.asarray(gt), jnp.asarray(mask)))

    # NumPy reference mirroring model/det/loss.py:10-33
    loss = np.maximum(logits, 0) - logits * gt + np.log1p(np.exp(-np.abs(logits)))
    pos = (gt * mask).astype(bool)
    neg = ((1 - gt) * mask).astype(bool)
    pos_count = int(pos.sum())
    neg_count = min(int(neg.sum()), pos_count * 3)
    pos_loss = loss[pos].sum()
    neg_loss = np.sort(loss[neg].ravel())[::-1][:neg_count].sum()
    ref = (pos_loss + neg_loss) / (pos_count + neg_count + 1e-6)
    assert ours == pytest.approx(float(ref), rel=1e-5)


def test_db_loss_gradients_finite():
    model = DBNetPP(dcn=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    batch = {
        "gt": jnp.zeros((1, 32, 32, 1)).at[:, 8:16, 8:16].set(1.0),
        "mask": jnp.ones((1, 32, 32, 1)),
        "thresh_map": jnp.zeros((1, 32, 32, 1)),
        "thresh_mask": jnp.ones((1, 32, 32, 1)),
    }

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return db_loss(out, batch)[0]

    g = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_stem_s2d_equals_direct_conv():
    """The space-to-depth stem reparameterization computes the identical
    function to the 7x7/stride-2 conv from the SAME parameter tree
    (checkpoint-compatible: param stays backbone/conv1/kernel (7,7,3,64))."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ocr_vi_invoice_tpu.models.resnet import ResNet

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 96, 3), jnp.float32)
    m_direct = ResNet(name_="resnet18", stem_s2d=False)
    m_s2d = ResNet(name_="resnet18", stem_s2d=True)
    v = m_direct.init(jax.random.PRNGKey(1), x)
    out_d = m_direct.apply(v, x)
    out_s = m_s2d.apply(v, x)  # same variables drop in
    for a, b in zip(out_d, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
