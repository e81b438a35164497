import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ocr_vi_invoice_tpu.parallel import (
    make_mesh,
    batch_sharding,
    shard_batch,
    param_shardings,
)
from ocr_vi_invoice_tpu.parallel.mesh import choose_mesh_shape


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = make_mesh(shape=(4, 2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_shard_batch_spreads_dim0():
    mesh = make_mesh()
    x = np.ones((16, 4), np.float32)
    sx = shard_batch(mesh, {"x": x})["x"]
    assert sx.sharding.spec == P("data", None)
    assert len(sx.addressable_shards) == 8
    assert sx.addressable_shards[0].data.shape == (2, 4)


def test_param_shardings_model_axis():
    mesh = make_mesh(shape=(4, 2))
    params = {
        "frm": {"h_qkv": {"kernel": jnp.zeros((384, 1152)), "bias": jnp.zeros(1152)}},
        "stem": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 64))}},
    }
    sh = param_shardings(mesh, params)
    assert sh["frm"]["h_qkv"]["kernel"].spec == P(None, "model")
    assert sh["stem"]["conv1"]["kernel"].spec == P()


def test_data_parallel_psum_under_jit():
    """A sharded-batch loss grad equals the full-batch grad (XLA inserts the
    all-reduce across data shards)."""
    mesh = make_mesh()
    w = jnp.arange(4, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(16, 4).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    g_sharded = jax.jit(jax.grad(loss))(w, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-5)


def test_choose_mesh_shape():
    assert choose_mesh_shape(8) == (4, 2)
    assert choose_mesh_shape(2) == (2, 1)
    assert choose_mesh_shape(1) == (1, 1)
