import jax.numpy as jnp
import numpy as np
import pytest

from ocr_vi_invoice_tpu.ops.cc import connected_components, extract_boxes
from ocr_vi_invoice_tpu.ops.warp import crop_resize_batch


def test_connected_components_two_blobs():
    mask = np.zeros((32, 40), bool)
    mask[4:10, 5:20] = True
    mask[20:28, 25:38] = True
    lab = np.asarray(connected_components(jnp.asarray(mask)))
    l1 = lab[5, 6]
    l2 = lab[22, 30]
    assert l1 != l2
    assert (lab[4:10, 5:20] == l1).all()
    assert (lab[20:28, 25:38] == l2).all()
    assert (lab[~mask] > 10**6).all()


def test_connected_components_snake():
    """Long thin S-shape: pointer jumping must converge in 16 iters."""
    mask = np.zeros((64, 64), bool)
    mask[2, 2:60] = True
    mask[2:40, 59] = True
    mask[39, 4:60] = True
    mask[10:40, 4] = True
    lab = np.asarray(connected_components(jnp.asarray(mask), num_iters=16))
    vals = np.unique(lab[mask])
    assert len(vals) == 1


def test_extract_boxes_matches_host_decisions():
    prob = np.zeros((96, 128), np.float32)
    prob[10:26, 8:60] = 0.92     # keep
    prob[50:70, 30:100] = 0.85   # keep
    prob[80:82, 5:8] = 0.9       # area 6 < min_area -> reject
    prob[40:44, 110:120] = 0.4   # score 0.4 < box_thresh -> reject
    boxes, scores, valid = extract_boxes(
        jnp.asarray(prob), thresh=0.3, box_thresh=0.6, unclip_ratio=1.5,
        min_area=10, max_boxes=16,
    )
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    assert valid.sum() == 2
    kept = boxes[valid]
    # Host-raster unclip semantics: pixel-center polygon area by Pick
    # (solid rect: ew*eh = 51*15 = 765), L = 2(ew+eh) = 132 -> d = floor(
    # 765*1.5/132) = 8, the integer EDT dilation of the host path.
    b = kept[np.argsort(kept[:, 1])]
    assert b[0][0] == pytest.approx(8 - 8, abs=1e-4)
    assert b[0][1] == pytest.approx(10 - 8, abs=1e-4)
    assert b[0][2] == pytest.approx(59 + 8, abs=1e-4)
    assert scores[valid].min() > 0.8


def test_extract_boxes_min_size_gate():
    prob = np.zeros((64, 128), np.float32)
    prob[10:12, 8:60] = 0.92     # 2px tall -> rejected at min_size=3
    prob[30:40, 8:60] = 0.92     # 10px tall -> kept
    boxes, scores, valid = extract_boxes(
        jnp.asarray(prob), thresh=0.3, box_thresh=0.6, min_area=10,
        max_boxes=8, min_size=3.0,
    )
    assert int(np.asarray(valid).sum()) == 1
    # With the gate off (reference decision parity) both stay.
    _, _, valid0 = extract_boxes(
        jnp.asarray(prob), thresh=0.3, box_thresh=0.6, min_area=10,
        max_boxes=8,
    )
    assert int(np.asarray(valid0).sum()) == 2


def _quad_mask(quad, h, w):
    from ocr_vi_invoice_tpu import native

    return native.fill_poly((h, w), np.asarray(quad, np.float32))


def test_extract_boxes_quads_on_rotated_text():
    """A rotated bar: the quad must align with it (mask IoU vs the true
    rotated rect >= 0.8) while the axis-aligned box only bounds it."""
    from ocr_vi_invoice_tpu import native

    H, W = 160, 200
    prob = np.zeros((H, W), np.float32)
    # rotated rectangle: center (100, 80), 120x14, 15 degrees
    ang = np.deg2rad(15.0)
    c, s = np.cos(ang), np.sin(ang)
    corners = []
    for su, sv in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        corners.append([100 + su * 60 * c - sv * 7 * s,
                        80 + su * 60 * s + sv * 7 * c])
    corners = np.asarray(corners, np.float32)
    truth = native.fill_poly((H, W), corners)
    prob[truth > 0] = 0.9

    boxes, scores, valid, quads = extract_boxes(
        jnp.asarray(prob), thresh=0.3, box_thresh=0.6, unclip_ratio=1.5,
        min_area=10, max_boxes=8, with_quads=True,
    )
    valid = np.asarray(valid)
    assert valid.sum() == 1
    quad = np.asarray(quads)[valid][0]
    # Angle recovered from the quad's first edge.
    e = quad[1] - quad[0]
    got = np.rad2deg(np.arctan2(e[1], e[0]))
    assert got == pytest.approx(15.0, abs=3.0)
    # IoU vs the truth rect expanded by the same d (pixel area ~ 120*14).
    area = float(truth.sum())
    ext = np.ptp(corners, axis=0).sum()  # ew + eh of the AABB
    d = np.floor(max(area - ext - 1, 0) * 1.5 / (2 * ext))
    grown = []
    for su, sv in ((-1, -1), (1, -1), (1, 1), (-1, 1)):
        grown.append([100 + su * (60 + d) * c - sv * (7 + d) * s,
                      80 + su * (60 + d) * s + sv * (7 + d) * c])
    tm = _quad_mask(np.asarray(grown, np.float32), H, W)
    qm = _quad_mask(quad, H, W)
    inter = float((tm & qm).sum())
    union = float((tm | qm).sum())
    assert inter / union >= 0.8, f"quad IoU {inter / union:.3f}"


def test_extract_boxes_empty_map():
    prob = np.zeros((32, 32), np.float32)
    boxes, scores, valid = extract_boxes(jnp.asarray(prob), max_boxes=8)
    assert not np.asarray(valid).any()


def test_crop_resize_batch_shapes_and_pad():
    img = np.full((100, 200, 3), 255.0, np.float32)
    img[20:40, 10:50] = 0.0  # dark box
    boxes = jnp.asarray([[10, 20, 49, 39], [0, 0, 9, 99]], jnp.float32)
    valid = jnp.asarray([True, True])
    crops = np.asarray(crop_resize_batch(jnp.asarray(img), boxes, valid, 32, 256))
    assert crops.shape == (2, 32, 256, 3)
    # crop 0: 40x20 box -> scale 20/32 -> content width 64; content dark
    white = (1.0 - 0.485) / 0.229
    assert crops[0, 16, 10, 0] < 0  # dark (normalized below mean)
    assert crops[0, 16, 200, 0] == pytest.approx(white, abs=0.05)  # padded


def test_crop_resize_invalid_is_whitelike():
    img = np.zeros((50, 50, 3), np.float32)
    boxes = jnp.zeros((1, 4), jnp.float32)
    crops = np.asarray(crop_resize_batch(jnp.asarray(img), boxes,
                                         jnp.asarray([False]), 32, 64))
    assert np.isfinite(crops).all()
    for c in range(3):  # uniform fill per channel
        assert len(np.unique(crops[..., c])) == 1


def test_fused_vs_host_postproc_on_synthetic():
    """Box-level agreement between on-device extraction and the host
    DBPostProcessor on a clean probability map."""
    from ocr_vi_invoice_tpu.pipeline.postprocess import DBPostProcessor

    rng = np.random.RandomState(0)
    prob = np.zeros((160, 200), np.float32) + rng.rand(160, 200) * 0.05
    rects = [(20, 30, 90, 18), (110, 60, 70, 14), (30, 120, 150, 20)]
    for x, y, w, h in rects:
        prob[y:y + h, x:x + w] = 0.9

    host = DBPostProcessor(thresh=0.3, box_thresh=0.6, unclip_ratio=1.5)
    hboxes, hscores = host(prob)

    dboxes, dscores, dvalid = extract_boxes(
        jnp.asarray(prob), 0.3, 0.6, 1.5, 10.0, max_boxes=16)
    dboxes = np.asarray(dboxes)[np.asarray(dvalid)]

    assert len(hboxes) == len(dboxes) == 3
    # compare bounding rects of host polygons vs device boxes
    hrects = sorted(
        (b[:, 0].min(), b[:, 1].min(), b[:, 0].max(), b[:, 1].max())
        for b in hboxes
    )
    drects = sorted(map(tuple, dboxes))
    for hr, dr in zip(hrects, drects):
        assert np.abs(np.asarray(hr) - np.asarray(dr)).max() < 4.0


def test_run_based_extraction_equals_pixel_cc_oracle():
    """The run-length extract_boxes must agree EXACTLY (bbox, count, score)
    with the per-pixel connected_components oracle, including U-shapes
    (labels must flow down one arm and up the other) and diagonal-only
    connectivity."""
    rng = np.random.RandomState(0)
    for _ in range(4):
        H, W = 120, 160
        prob = np.zeros((H, W), np.float32)
        for _ in range(rng.randint(3, 12)):
            y, x = rng.randint(0, H - 30), rng.randint(0, W - 40)
            h, w = rng.randint(2, 25), rng.randint(2, 35)
            prob[y:y + h, x:x + w] = rng.uniform(0.65, 0.95)
        y, x = rng.randint(0, H - 40), rng.randint(0, W - 40)
        prob[y:y + 30, x:x + 4] = 0.9          # U-shape left arm
        prob[y:y + 30, x + 26:x + 30] = 0.9    # right arm
        prob[y + 28:y + 30, x:x + 30] = 0.9    # bottom join
        for i in range(10):
            prob[5 + i, 100 + i] = 0.8         # diagonal chain

        boxes, scores, valid = map(np.asarray, extract_boxes(
            jnp.asarray(prob), 0.3, 0.0, 0.0, 0.0, max_boxes=64))
        got = sorted(
            (round(b[0]), round(b[1]), round(b[2]), round(b[3]), round(s, 4))
            for b, s in zip(boxes[valid], scores[valid])
        )

        mask = prob > 0.3
        lab = np.asarray(connected_components(jnp.asarray(mask), num_iters=32))
        want = []
        for v in np.unique(lab[mask]):
            ys, xs = np.where(lab == v)
            want.append((xs.min(), ys.min(), xs.max(), ys.max(),
                         round(float(prob[ys, xs].mean()), 4)))
        want = sorted(tuple(map(lambda t: round(float(t), 4), o)) for o in want)
        assert got == want


def test_extract_boxes_overflow_counters_fire_on_sand_grain_noise():
    """A sand-grain-noise page (thousands of 1-2px specks, the
    generator's false-positive trigger) must not truncate silently:
    with small capacities the (runs@row, runs@global, components)
    counters report exactly what was dropped."""
    rng = np.random.RandomState(0)
    H = W = 96
    prob = np.zeros((H, W), np.float32)
    ys = rng.randint(0, H, 3000)
    xs = rng.randint(0, W, 3000)
    prob[ys, xs] = 0.9

    out = extract_boxes(
        jnp.asarray(prob), thresh=0.3, box_thresh=0.5, min_area=0.0,
        max_boxes=16, max_runs=64, max_runs_per_row=4,
        with_overflow=True)
    boxes, scores, valid, ovf = map(np.asarray, out)
    runs_row, runs_global, comps = (int(v) for v in ovf)

    # ground truth from the mask itself
    mask = prob > 0.3
    left = np.pad(mask, ((0, 0), (1, 0)))[:, :W]
    starts_per_row = (mask & ~left).sum(axis=1)
    exp_row_dropped = np.maximum(starts_per_row - 4, 0).sum()
    kept_slots = np.minimum(starts_per_row, 4).sum()
    exp_global_dropped = max(kept_slots - 64, 0)

    assert runs_row == exp_row_dropped > 0
    assert runs_global == exp_global_dropped > 0
    assert comps > 0            # more components than 16 box slots
    assert valid.shape == (16,)

    # a clean page reports zero overflow everywhere
    clean = np.zeros((H, W), np.float32)
    clean[10:20, 10:60] = 0.9
    out2 = extract_boxes(
        jnp.asarray(clean), thresh=0.3, box_thresh=0.5,
        max_boxes=16, with_overflow=True)
    _, _, valid2, ovf2 = map(np.asarray, out2)
    assert valid2.sum() == 1
    assert tuple(ovf2) == (0, 0, 0)


def test_extract_boxes_overflow_with_quads_tuple_shape():
    prob = np.zeros((32, 32), np.float32)
    prob[4:10, 4:28] = 0.9
    out = extract_boxes(
        jnp.asarray(prob), thresh=0.3, box_thresh=0.5,
        max_boxes=8, with_quads=True, with_overflow=True)
    assert len(out) == 5
    boxes, scores, valid, quads, ovf = map(np.asarray, out)
    assert quads.shape == (8, 4, 2)
    assert ovf.shape == (3,)
    assert tuple(ovf) == (0, 0, 0)
