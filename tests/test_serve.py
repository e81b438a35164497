import json
import queue
from pathlib import Path

import cv2
import numpy as np
import pytest

from ocr_vi_invoice_tpu.pipeline.serve import _prefetch, pick_bucket


def test_pick_bucket_routes_to_smallest_holding_bucket():
    sizes = [640, 960, 1280]
    assert pick_bucket(500, 300, sizes) == 640
    assert pick_bucket(640, 100, sizes) == 640      # boundary inclusive
    assert pick_bucket(700, 1000, sizes) == 1280    # longest side rules
    assert pick_bucket(961, 100, sizes) == 1280
    # larger than every bucket -> downscale into the largest
    assert pick_bucket(4000, 3000, sizes) == 1280
    # single bucket behaves like the old fixed-size path
    assert pick_bucket(4000, 3000, [960]) == 960
    assert pick_bucket(10, 10, [960]) == 960


def test_prefetch_feeds_and_closes(tmp_path):
    for i in range(5):
        cv2.imwrite(str(tmp_path / f"{i}.jpg"),
                    np.full((100, 80, 3), 200, np.uint8))
    (tmp_path / "broken.jpg").write_bytes(b"not an image")
    paths = sorted(tmp_path.glob("*.jpg"))

    q: "queue.Queue" = queue.Queue(maxsize=4)
    _prefetch(paths, det_sizes=96, q=q, threads=2)

    got, broken = 0, 0
    while True:
        item = q.get(timeout=10)
        if item is None:
            break
        p, canvas, meta, bucket = item
        if canvas is None:
            broken += 1
            continue
        assert bucket == 96
        assert canvas.shape == (96, 96, 3)
        (sh, sw), (rh, rw), (oh, ow) = meta
        assert (oh, ow) == (100, 80)
        assert rh % 32 == 0 and rw % 32 == 0
        got += 1
    assert got == 5 and broken == 1


def test_prefetch_multi_bucket_routing(tmp_path):
    cv2.imwrite(str(tmp_path / "small.jpg"),
                np.full((60, 40, 3), 200, np.uint8))
    cv2.imwrite(str(tmp_path / "large.jpg"),
                np.full((150, 90, 3), 200, np.uint8))
    paths = sorted(tmp_path.glob("*.jpg"))

    q: "queue.Queue" = queue.Queue()
    _prefetch(paths, det_sizes=[64, 160], q=q, threads=1)

    seen = {}
    while True:
        item = q.get(timeout=10)
        if item is None:
            break
        p, canvas, meta, bucket = item
        seen[p.name] = bucket
        assert canvas.shape == (bucket, bucket, 3)
    assert seen == {"small.jpg": 64, "large.jpg": 160}


@pytest.mark.slow
def test_serve_multi_bucket_end_to_end(tmp_path, monkeypatch):
    """Heterogeneous input sizes through `serve.main` with two buckets:
    every image gets a JSON with its routed bucket and overflow counters,
    and the summary reports per-bucket throughput."""
    import ocr_vi_invoice_tpu.pipeline.serve as serve_mod

    # random/zero weights: keep the smoke run off the shipped checkpoints
    monkeypatch.setattr(
        "ocr_vi_invoice_tpu.train.checkpoint.shipped_checkpoint",
        lambda kind: None)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.randint(0, 255, (60, 50, 3), np.uint8))
    cv2.imwrite(str(img_dir / "b.jpg"),
                rng.randint(0, 255, (150, 100, 3), np.uint8))
    cv2.imwrite(str(img_dir / "c.jpg"),
                rng.randint(0, 255, (40, 64, 3), np.uint8))

    out_dir = tmp_path / "out"
    serve_mod.main([
        "--input_dir", str(img_dir),
        "--output_dir", str(out_dir),
        "--det_sizes", "64,160",
        "--max_boxes", "32",
        "--rec_variant", "tiny",
    ])

    docs = {p.stem: json.loads(Path(p).read_text(encoding="utf-8"))
            for p in out_dir.glob("*.json") if p.stem != "_summary"}
    assert set(docs) == {"a", "b", "c"}
    assert docs["a"]["bucket"] == 64
    assert docs["b"]["bucket"] == 160
    assert docs["c"]["bucket"] == 64
    for d in docs.values():
        assert isinstance(d["results"], list)
        assert len(d["overflow"]) == 3

    summary = json.loads((out_dir / "_summary.json").read_text())
    assert summary["images"] == 3
    assert set(summary["buckets"]) == {"64", "160"}
    assert summary["buckets"]["64"]["images"] == 2
    assert summary["buckets"]["160"]["images"] == 1
