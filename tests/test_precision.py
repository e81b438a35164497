"""utils/precision.cast_inference_params: bit-identical inference.

The cast rule (f32 leaves of ndim>=2 -> compute dtype, everything else
untouched) must reproduce exactly what flax's promote_dtype does inside
every apply — verified here by comparing model outputs bitwise on the
recognizer and the detector (the detector includes the DCN bias add at
models/resnet.py:114 whose f32-ness the rule must preserve).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.utils.precision import cast_inference_params


def test_cast_rule_selects_only_large_f32_leaves():
    variables = {
        "params": {
            "kernel": jnp.ones((3, 3, 8, 16), jnp.float32),
            "dense": jnp.ones((8, 4), jnp.float32),
            "bias": jnp.ones((16,), jnp.float32),
            "scale": jnp.ones((16,), jnp.float32),
            "step": jnp.asarray(3, jnp.int32),
        },
        "batch_stats": {"mean": jnp.ones((16,), jnp.float32)},
    }
    out = cast_inference_params(variables, jnp.bfloat16)
    assert out["params"]["kernel"].dtype == jnp.bfloat16
    assert out["params"]["dense"].dtype == jnp.bfloat16
    assert out["params"]["bias"].dtype == jnp.float32
    assert out["params"]["scale"].dtype == jnp.float32
    assert out["params"]["step"].dtype == jnp.int32
    assert out["batch_stats"]["mean"].dtype == jnp.float32
    # input tree untouched
    assert variables["params"]["kernel"].dtype == jnp.float32


@pytest.mark.slow  # full-model double compile (~45 s); rule itself is fast
def test_svtrv2_outputs_bit_identical_after_cast():
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2

    model = SVTRv2(variant="tiny", dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    cast = cast_inference_params(variables, jnp.bfloat16)
    y_raw = jax.jit(model.apply)(variables, x)
    y_cast = jax.jit(model.apply)(cast, x)
    np.testing.assert_array_equal(np.asarray(y_raw), np.asarray(y_cast))


@pytest.mark.slow  # full-model double compile (~75 s); rule itself is fast
def test_dbnet_outputs_bit_identical_after_cast():
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP

    model = DBNetPP(dcn=True, dcn_mode="gather", dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x)
    cast = cast_inference_params(variables, jnp.bfloat16)
    y_raw = jax.jit(lambda v, x: model.apply(v, x)["binary"])(variables, x)
    y_cast = jax.jit(lambda v, x: model.apply(v, x)["binary"])(cast, x)
    np.testing.assert_array_equal(np.asarray(y_raw), np.asarray(y_cast))
