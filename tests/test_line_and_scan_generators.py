import numpy as np

from ocr_vi_invoice_tpu.data.vocab import VOCAB
from ocr_vi_invoice_tpu.generator.content import ContentProvider
from ocr_vi_invoice_tpu.generator.rec_lines import _sample_text, render_line
from ocr_vi_invoice_tpu.generator.scan_data import ScanDataset, sample


def test_rec_line_texts_in_vocab():
    vocab = set(VOCAB)
    rng = np.random.RandomState(0)
    c = ContentProvider(rng)
    for _ in range(100):
        t = _sample_text(c, rng)
        assert t.strip()
        assert all(ch in vocab for ch in t), t


def test_render_line_shapes():
    rng = np.random.RandomState(1)
    img = render_line(rng, "Tổng cộng: 123.000đ")
    assert img.ndim == 3 and img.dtype == np.uint8
    assert img.shape[0] >= 20 and img.shape[1] > img.shape[0]


def test_scan_sample_mask_consistent():
    rng = np.random.RandomState(2)
    img, mask = sample(rng, 256, 192)
    assert img.shape == (256, 192, 3) and mask.shape == (256, 192)
    assert 0.05 < mask.mean() < 0.95  # doc present but not full-frame
    # doc region should be much brighter than typical backgrounds... not
    # guaranteed for dark docs; instead check the mask is a single-ish blob
    ys, xs = np.nonzero(mask)
    bbox_area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
    assert mask.sum() / bbox_area > 0.5  # mostly convex quad


def test_scan_dataset_deterministic():
    ds = ScanDataset(size=4, out_hw=(128, 96), seed=5)
    a = ds[1]
    b = ds[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["image"].shape == (128, 96, 3)
    assert a["mask"].shape == (128, 96, 1)
