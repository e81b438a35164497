import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.pipeline.fused import FusedOCR
from ocr_vi_invoice_tpu.utils.config import PipelineConfig, PostProcessConfig



pytestmark = pytest.mark.slow

def _zeros(model, *args):
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *args))
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def test_fused_program_runs_end_to_end():
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2

    cfg = PipelineConfig(
        det_image_size=64, rec_batch_size=8, max_boxes=8,
        postprocess=PostProcessConfig(thresh=0.3, box_thresh=0.4, min_area=4),
    )
    det = DBNetPP(dcn=True, dtype=jnp.float32)
    rec = SVTRv2(variant="tiny", dtype=jnp.float32)
    det_vars = _zeros(det, jnp.zeros((1, 64, 64, 3)))
    rec_vars = _zeros(rec, jnp.zeros((1, 32, 256, 3)))

    fused = FusedOCR(det_vars, rec_vars, cfg, rec_variant="tiny",
                     dtype=jnp.float32)
    img = np.random.RandomState(0).randint(0, 255, (64, 64, 3)).astype(np.uint8)
    results = fused(img)
    # zero weights -> binary == 0.5 everywhere -> one page-sized component
    assert isinstance(results, list)
    assert len(results) == 1
    r = results[0]
    assert len(r["box"]) == 4 and isinstance(r["text"], str)
    assert 0.45 < r["score"] < 0.55
