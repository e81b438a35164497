import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.models.u2net import U2Net, u2net_bce_loss



pytestmark = pytest.mark.slow

def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_u2netp_param_count_and_forward():
    model = U2Net(variant="u2netp")
    x = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(lambda r: model.init(r, x), jax.random.PRNGKey(0))
    n = _count(shapes["params"])
    # official U2NETP is ~1.13M params
    assert 1.0e6 < n < 1.3e6, n

    variables = model.init(jax.random.PRNGKey(0), x)
    d0, sides = model.apply(variables, x)
    assert d0.shape == (1, 64, 64, 1)
    assert len(sides) == 6
    assert all(s.shape == (1, 64, 64, 1) for s in sides)
    v = np.asarray(d0)
    assert v.min() >= 0 and v.max() <= 1


def test_u2net_full_param_count():
    model = U2Net(variant="u2net")
    x = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(lambda r: model.init(r, x), jax.random.PRNGKey(0))
    n = _count(shapes["params"])
    # official U2NET is ~44.0M params
    assert 42e6 < n < 46e6, n


def test_u2net_loss_and_grads():
    model = U2Net(variant="u2netp")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    target = jnp.zeros((1, 64, 64, 1)).at[:, 16:48, 16:48].set(1.0)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        (d0, sides), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return u2net_bce_loss(d0, sides, target)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_u2net_nondivisible_input():
    """ceil-mode pooling handles inputs not divisible by 32."""
    model = U2Net(variant="u2netp")
    x = jnp.zeros((1, 100, 76, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    d0, _ = model.apply(variables, x)
    assert d0.shape == (1, 100, 76, 1)
