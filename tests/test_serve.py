import queue
from pathlib import Path

import cv2
import numpy as np

from ocr_vi_invoice_tpu.pipeline.serve import _prefetch


def test_prefetch_feeds_and_closes(tmp_path):
    for i in range(5):
        cv2.imwrite(str(tmp_path / f"{i}.jpg"),
                    np.full((100, 80, 3), 200, np.uint8))
    (tmp_path / "broken.jpg").write_bytes(b"not an image")
    paths = sorted(tmp_path.glob("*.jpg"))

    q: "queue.Queue" = queue.Queue(maxsize=4)
    _prefetch(paths, det_size=96, q=q, threads=2)

    got, broken = 0, 0
    while True:
        item = q.get(timeout=10)
        if item is None:
            break
        p, canvas, meta = item
        if canvas is None:
            broken += 1
            continue
        assert canvas.shape == (96, 96, 3)
        (sh, sw), (rh, rw), (oh, ow) = meta
        assert (oh, ow) == (100, 80)
        assert rh % 32 == 0 and rw % 32 == 0
        got += 1
    assert got == 5 and broken == 1
