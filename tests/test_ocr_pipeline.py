"""OCRPipeline construction honors checkpoint meta (dcn_mode, variant).

Reference analogue: `src/pipeline/pipeline2.py:43-80` rebuilds the same
architecture the checkpoint was trained with; here that contract extends
to the DCN sampling path recorded by `train/det.py` and the SVTRv2
variant recorded by `train/rec.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.train.checkpoint import CheckpointManager
from ocr_vi_invoice_tpu.utils.config import PipelineConfig



pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def tiny_ckpts(tmp_path_factory):
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2

    root = tmp_path_factory.mktemp("ckpts")
    key = jax.random.PRNGKey(0)

    det = DBNetPP(dcn=True, dcn_mode="local", dtype=jnp.float32)
    dv = jax.jit(lambda k, x: det.init(k, x))(
        key, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    CheckpointManager(root / "det").save_best(
        0, dv["params"], dv["batch_stats"], 0.5,
        {"dcn_mode": "local", "dcn": True},
    )

    rec = SVTRv2(variant="tiny", dtype=jnp.float32)
    rv = jax.jit(lambda k, x: rec.init(k, x))(
        key, jnp.zeros((1, 32, 256, 3), jnp.float32)
    )
    CheckpointManager(root / "rec").save_best(
        0, rv["params"], rv["batch_stats"], 0.5, {"variant": "tiny"}
    )
    return root / "det" / "best_model", root / "rec" / "best_model"


def test_pipeline_honors_ckpt_meta(tiny_ckpts):
    from ocr_vi_invoice_tpu.pipeline.ocr import OCRPipeline

    det_ckpt, rec_ckpt = tiny_ckpts
    p = OCRPipeline(
        det_ckpt=str(det_ckpt),
        rec_ckpt=str(rec_ckpt),
        cfg=PipelineConfig(det_image_size=64),
        rec_variant="base",  # must be overridden by the ckpt's "tiny"
        dtype=jnp.float32,
    )
    assert p.det.dcn_mode == "local"
    assert p.rec.variant == "tiny"

    img = (np.random.RandomState(0).rand(80, 100, 3) * 255).astype(np.uint8)
    results = p(img)
    assert isinstance(results, list)


def test_pipeline_dcn_mode_override(tiny_ckpts):
    from ocr_vi_invoice_tpu.pipeline.ocr import OCRPipeline

    det_ckpt, _ = tiny_ckpts
    p = OCRPipeline(
        det_ckpt=str(det_ckpt),
        cfg=PipelineConfig(det_image_size=64),
        rec_variant="tiny",
        dtype=jnp.float32,
        dcn_mode="gather",
    )
    assert p.det.dcn_mode == "gather"
