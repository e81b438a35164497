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


def test_fused_batch_sharded_matches_single():
    """FusedOCR.batch over an 8-device data mesh returns per-image results
    identical to the single-image program."""
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2
    from ocr_vi_invoice_tpu.parallel.mesh import make_mesh

    cfg = PipelineConfig(
        det_image_size=64, rec_batch_size=8, max_boxes=8,
        postprocess=PostProcessConfig(thresh=0.3, box_thresh=0.4, min_area=4),
    )
    det = DBNetPP(dcn=True, dtype=jnp.float32)
    rec = SVTRv2(variant="tiny", dtype=jnp.float32)
    det_vars = _zeros(det, jnp.zeros((1, 64, 64, 3)))
    rec_vars = _zeros(rec, jnp.zeros((1, 32, 256, 3)))

    mesh = make_mesh(jax.devices()[:8])
    fused = FusedOCR(det_vars, rec_vars, cfg, rec_variant="tiny",
                     dtype=jnp.float32, mesh=mesh)
    rng = np.random.RandomState(1)
    stack = rng.randint(0, 255, (8, 64, 64, 3)).astype(np.uint8)

    batched = fused.batch(stack)
    assert len(batched) == 8
    for i in (0, 3, 7):
        single = fused(stack[i])
        assert len(single) == len(batched[i])
        for rs, rb in zip(single, batched[i]):
            np.testing.assert_allclose(rs["box"], rb["box"], atol=1e-3)
            assert rs["text"] == rb["text"]
            assert abs(rs["score"] - rb["score"]) < 1e-4

    with pytest.raises(ValueError):
        fused.batch(stack[:3])  # not a multiple of the data axis


def test_fused_rec_chunking_matches_unchunked():
    """The chunked-rec program (tile skipping past the last valid box) must
    return the same results as the plain full-capacity run on valid slots."""
    from ocr_vi_invoice_tpu.models.dbnet import DBNetPP
    from ocr_vi_invoice_tpu.models.svtrv2 import SVTRv2

    cfg = PipelineConfig(
        det_image_size=64, rec_batch_size=8, max_boxes=128,
        postprocess=PostProcessConfig(thresh=0.3, box_thresh=0.4, min_area=4),
    )
    det = DBNetPP(dcn=True, dtype=jnp.float32)
    rec = SVTRv2(variant="tiny", dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    det_vars = det.init(key, jnp.zeros((1, 64, 64, 3)))
    rec_vars = rec.init(key, jnp.zeros((1, 32, 256, 3)))

    chunked = FusedOCR(det_vars, rec_vars, cfg, rec_variant="tiny",
                       dtype=jnp.float32, rec_chunk=64)
    plain = FusedOCR(det_vars, rec_vars, cfg, rec_variant="tiny",
                     dtype=jnp.float32, rec_chunk=None)
    img = np.random.RandomState(2).randint(
        0, 255, (64, 64, 3)).astype(np.uint8)

    rc = chunked(img)
    rp = plain(img)
    assert len(rc) == len(rp)
    for a, b in zip(rc, rp):
        np.testing.assert_allclose(a["box"], b["box"], atol=1e-3)
        assert a["text"] == b["text"]


def test_run_batch_in_fori_loop_compiles():
    """bench.py wraps `FusedOCR._run_batch` in a carried fori_loop (so the
    device relay's async dispatch can't fake the timing); keep that
    pattern compiling."""
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
                     dtype=jnp.float32, rec_chunk=None)
    imgs = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3)), jnp.float32)

    @jax.jit
    def batch_loop(dv, rv, imgs, n):
        def body(i, carry):
            boxes, scores, valid, quads, ids, _ovf = fused._run_batch(dv, rv, carry)
            return carry + jnp.sum(boxes) * 1e-12
        return jnp.sum(jax.lax.fori_loop(0, n, body, imgs))

    out = batch_loop(fused.det_vars, fused.rec_vars, imgs, 2)
    assert np.isfinite(float(out))
