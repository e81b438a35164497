import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.utils.debug import (
    assert_replicated,
    check_finite,
    deterministic_run,
)


def test_check_finite_passes_and_raises():
    check_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="a/b"):
        check_finite({"a": {"b": jnp.asarray([1.0, np.nan])}})


def test_assert_replicated():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ocr_vi_invoice_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    x = jax.device_put(jnp.ones((8, 4)), NamedSharding(mesh, P()))
    assert_replicated(x)


def test_deterministic_run():
    f = jax.jit(lambda x: x * 2 + 1)
    deterministic_run(f, jnp.arange(4.0))

    counter = [0]

    def flaky(x):
        counter[0] += 1
        return x + counter[0]

    with pytest.raises(AssertionError):
        deterministic_run(flaky, jnp.zeros(2))
