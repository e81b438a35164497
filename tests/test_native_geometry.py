"""Parity tests for the first-party C++ geometry/imaging primitives
(contour trace, polygon simplify, perspective warp, resize) vs OpenCV,
and proof that the host postprocessing path runs without cv2.

Reference call sites being replaced: cv2.findContours/approxPolyDP
(`src/det/test.py:60-70`), cv2.getPerspectiveTransform/warpPerspective
(`src/preprocess/scanner.py:50-51`).
"""

import sys

import numpy as np
import pytest

from ocr_vi_invoice_tpu import native

cv2 = pytest.importorskip("cv2")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _blobby_mask(rng, h=120, w=160, n=5):
    mask = np.zeros((h, w), np.uint8)
    for _ in range(n):
        cx, cy = rng.randint(10, w - 10), rng.randint(10, h - 10)
        ax, ay = rng.randint(4, 25), rng.randint(3, 12)
        cv2.ellipse(mask, (cx, cy), (ax, ay), rng.randint(0, 180), 0, 360, 1, -1)
    return mask


def test_find_contours_matches_cv2_areas():
    rng = np.random.RandomState(0)
    for _ in range(10):
        mask = _blobby_mask(rng)
        ours = native.find_contours(mask)
        ref, _ = cv2.findContours(mask * 255, cv2.RETR_LIST,
                                  cv2.CHAIN_APPROX_SIMPLE)
        assert len(ours) == len(ref)
        a0 = sorted(native.polygon_area(c) for c in ours)
        a1 = sorted(cv2.contourArea(c) for c in ref)
        np.testing.assert_allclose(a0, a1, atol=1e-3)


def test_find_contours_includes_holes():
    mask = np.zeros((60, 60), np.uint8)
    mask[10:50, 10:50] = 1
    mask[22:38, 22:38] = 0  # hole -> RETR_LIST reports its border too
    ours = native.find_contours(mask)
    ref, _ = cv2.findContours(mask * 255, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    assert len(ours) == len(ref) == 2


def test_approx_poly_dp_close_to_cv2():
    rng = np.random.RandomState(1)
    t = np.linspace(0, 2 * np.pi, 240, endpoint=False)
    pts = np.stack(
        [100 + 60 * np.cos(t) + rng.randn(240),
         90 + 40 * np.sin(t) + rng.randn(240)], 1
    ).astype(np.float32)
    eps = 0.02 * cv2.arcLength(pts.reshape(-1, 1, 2), True)
    ref = cv2.approxPolyDP(pts.reshape(-1, 1, 2), eps, True).reshape(-1, 2)
    ours = native.approx_poly_dp(pts, eps)
    # Different ring split points -> not identical, but same order of
    # simplification and near-identical area.
    assert abs(len(ours) - len(ref)) <= 2
    assert abs(native.polygon_area(ours) - cv2.contourArea(ref)) < 0.03 * cv2.contourArea(ref)


def test_perspective_transform_and_warp_match_cv2():
    rng = np.random.RandomState(2)
    src = np.array([[10, 20], [200, 15], [210, 300], [5, 310]], np.float32)
    dst = np.array([[0, 0], [199, 0], [199, 299], [0, 299]], np.float32)
    M_ref = cv2.getPerspectiveTransform(src, dst)
    M = native.get_perspective_transform(src, dst)
    np.testing.assert_allclose(M, M_ref, atol=1e-10)

    img = rng.randint(0, 255, (320, 240, 3), np.uint8)
    ref = cv2.warpPerspective(img, M_ref, (200, 300))
    ours = native.warp_perspective(img, M, (200, 300))
    assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1


def test_resize_bilinear_matches_cv2():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (97, 133, 3), np.uint8)
    ref = cv2.resize(img, (117, 83), interpolation=cv2.INTER_LINEAR)
    ours = native.resize_bilinear(img, (117, 83))
    assert np.abs(ref.astype(int) - ours.astype(int)).max() <= 1


def test_fill_poly_matches_cv2():
    rng = np.random.RandomState(4)
    for _ in range(5):
        pts = rng.uniform(3, 57, (6, 2)).astype(np.float32)
        ref = np.zeros((60, 60), np.uint8)
        cv2.fillPoly(ref, [pts.astype(np.int32)], 1)
        ours = native.fill_poly((60, 60), pts.astype(np.int32).astype(np.float32))
        # Boundary rounding can differ by a ring of pixels; interiors agree.
        diff = ref.astype(int) - ours.astype(int)
        assert np.abs(diff).mean() < 0.02


class _PoisonedCV2:
    def __getattr__(self, name):
        raise AssertionError(f"postprocess path touched cv2.{name}")


def test_postprocess_runs_without_cv2(monkeypatch):
    """SURVEY §2.4 completion gate: DBPostProcessor + unclip + crop +
    resize run with cv2 poisoned — the default host path is first-party."""
    from ocr_vi_invoice_tpu.pipeline import postprocess as pp

    prob = np.zeros((160, 160), np.float32)
    prob[20:40, 30:120] = 0.95
    prob[80:100, 10:70] = 0.9

    monkeypatch.setitem(sys.modules, "cv2", _PoisonedCV2())
    post = pp.DBPostProcessor(thresh=0.3, box_thresh=0.5, unclip_ratio=1.6)
    boxes, scores = post(prob)
    assert len(boxes) == 2
    assert all(s > 0.5 for s in scores)
    img = (np.ones((160, 160, 3)) * 255).astype(np.uint8)
    crop = pp.crop_image(img, boxes[0])
    assert crop.size > 0
    resized, _ = pp.resize_image_for_det(img, 96)
    assert max(resized.shape[:2]) == 96


def test_scanner_warp_without_cv2(monkeypatch):
    from ocr_vi_invoice_tpu.pipeline import scanner as sc

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (200, 150, 3), np.uint8)
    pts = np.array([[10, 10], [140, 12], [138, 188], [8, 190]], np.float32)
    ref = sc.four_point_transform(img, pts)

    monkeypatch.setitem(sys.modules, "cv2", _PoisonedCV2())
    ours = sc.four_point_transform(img, pts)
    assert np.array_equal(ref, ours)


def test_enhance_document_without_cv2(monkeypatch):
    """CLAHE + sharpen enhancement is first-party; with cv2 poisoned the
    NLM denoise is skipped and the rest still runs (`scanner.py:55-76`
    role)."""
    import sys

    from ocr_vi_invoice_tpu.pipeline import scanner as sc

    rng = np.random.RandomState(0)
    # low-contrast document-ish image
    img = (rng.rand(120, 90, 3) * 40 + 150).astype(np.uint8)
    img[40:60, 20:70] = 140

    poisoned = _PoisonedCV2()
    monkeypatch.setattr(sc, "cv2", poisoned)
    monkeypatch.setitem(sys.modules, "cv2", poisoned)
    out = sc.enhance_document(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # contrast must expand (CLAHE stretches the luma histogram)
    assert out.std() > img.std()
