import numpy as np
import pytest

from ocr_vi_invoice_tpu import native


def test_native_library_builds():
    assert native.available(), "C++ native module failed to build"


def test_levenshtein_basic():
    assert native.levenshtein("kitten", "sitting") == 3
    assert native.levenshtein("", "abc") == 3
    assert native.levenshtein("abc", "") == 3
    assert native.levenshtein("same", "same") == 0
    # Vietnamese diacritics are single code points after NFC
    assert native.levenshtein("đơn", "đơn") == 0
    assert native.levenshtein("hóa", "hoa") == 1


def test_levenshtein_matches_python_dp():
    rng = np.random.RandomState(0)
    alphabet = "abcđêộ01"
    for _ in range(20):
        a = "".join(rng.choice(list(alphabet), rng.randint(0, 12)))
        b = "".join(rng.choice(list(alphabet), rng.randint(0, 12)))
        # reference DP
        n, m = len(a), len(b)
        dp = np.zeros((n + 1, m + 1), int)
        dp[:, 0] = np.arange(n + 1)
        dp[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                               dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        assert native.levenshtein(a, b) == dp[n, m]


def test_polygon_area_perimeter():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], np.float32)
    assert native.polygon_area(sq) == pytest.approx(100.0)
    assert native.polygon_perimeter(sq) == pytest.approx(40.0)


def test_edt_matches_cv2():
    import cv2

    rng = np.random.RandomState(1)
    mask = np.zeros((40, 50), np.uint8)
    cv2.circle(mask, (25, 20), 12, 1, -1)
    ours = native.edt(mask)
    ref = cv2.distanceTransform(mask, cv2.DIST_L2, cv2.DIST_MASK_PRECISE)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_det_gt_maps_contract():
    h, w = 100, 120
    poly = np.array([[20, 20], [100, 20], [100, 60], [20, 60]], np.float32)
    gt, mask, tm, tk = native.det_gt_maps([poly], h, w)
    assert gt.shape == (h, w) and mask.shape == (h, w)
    # Shrunk region strictly inside the polygon
    assert gt.sum() > 0
    ys, xs = np.nonzero(gt)
    assert ys.min() > 20 and ys.max() < 60 and xs.min() > 20 and xs.max() < 100
    # d = A(1-r^2)/L for the 80x40 rect: 3200*0.84/240 = 11.2
    d = 80 * 40 * (1 - 0.16) / 240
    assert abs((ys.min() - 20) - d) < 2.0
    # Threshold band covers dilated region, peaks at thresh_max on boundary
    assert tk.sum() > gt.sum()
    assert tm.max() == pytest.approx(0.7, abs=0.02)
    assert tm[tk > 0].min() >= 0.29
    # Valid mask stays 1 (successful shrink)
    assert mask.min() == 1.0


def test_det_gt_maps_degenerate_polygon_masks_out():
    # Near-degenerate sliver (area < 1): region excluded via mask=0,
    # mirroring the reference's failed-shrink branch (dataloader.py:343-344).
    poly = np.array([[5, 10], [25, 10.02], [25, 10.4], [5, 10.42]], np.float32)
    gt, mask, tm, tk = native.det_gt_maps([poly], 32, 32)
    assert gt.sum() == 0
    assert (mask == 0).sum() > 0


def test_det_gt_maps_matches_cv2_fallback():
    h, w = 80, 90
    polys = [
        np.array([[10, 10], [70, 12], [68, 40], [12, 38]], np.float32),
        np.array([[20, 50], [80, 50], [80, 70], [20, 70]], np.float32),
    ]
    a = native.det_gt_maps(polys, h, w)
    b = native._det_gt_maps_cv2(
        [p.reshape(-1, 2) for p in polys], h, w, 0.4, 0.3, 0.7, True
    )
    # gt/mask may differ on boundary pixels (scanline vs cv2 raster
    # conventions); demand near-identical maps away from edges.
    for x, y, name in zip(a, b, ["gt", "mask", "tm", "tk"]):
        diff = np.abs(x - y)
        assert (diff > 0.05).mean() < 0.04, f"{name} differs too much"
    inter = ((a[0] > 0) & (b[0] > 0)).sum()
    union = ((a[0] > 0) | (b[0] > 0)).sum()
    assert inter / union > 0.9  # gt region IoU


def test_eval_mode_skips_threshold_maps():
    poly = np.array([[20, 20], [100, 20], [100, 60], [20, 60]], np.float32)
    gt, mask, tm, tk = native.det_gt_maps([poly], 100, 120, is_training=False)
    assert tm.sum() == 0 and tk.sum() == 0
    assert gt.sum() > 0
