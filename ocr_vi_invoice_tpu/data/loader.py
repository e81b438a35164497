"""Minimal host input pipeline: shuffling, batching, thread prefetch.

Replaces torch DataLoader (reference `src/det/dataloader.py:405-433`).
Workers are threads, not processes: the hot loops (cv2 decode/resize, the
C++ GT-map generator) release the GIL. Corrupt samples are the dataset's
responsibility (blank fallbacks), matching the reference.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def _stack(batch: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out = {}
    for k in batch[0]:
        v0 = batch[0][k]
        if isinstance(v0, str):
            out[k] = [b[k] for b in batch]
        else:
            out[k] = np.stack([b[k] for b in batch])
    return out


def iterate(
    dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = False,
    epoch: int = 0,
    collate: Optional[Callable] = None,
    prefetch: int = 2,
    num_threads: int = 2,
    start_batch: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batches as dicts of stacked numpy arrays.

    ``start_batch`` skips the first N batches WITHOUT loading them (the
    shuffle order is deterministic in (seed, epoch), so a resumed run
    continues the exact sequence) — used by ``--auto_resume`` to continue
    a mid-epoch ``last_state`` checkpoint.
    """
    n = len(dataset)
    if hasattr(dataset, "set_epoch"):
        dataset.set_epoch(epoch)  # deterministic per-epoch augmentation
    order = np.arange(n)
    if shuffle:
        np.random.RandomState(seed + epoch).shuffle(order)
    if drop_last:
        order = order[: (n // batch_size) * batch_size]
    batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    if start_batch:
        batches = batches[start_batch:]
    collate = collate or _stack

    if not batches:
        return

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    stop = threading.Event()

    def producer(batch_indices, out_q):
        idx_q = queue.Queue()
        for bi, idxs in enumerate(batch_indices):
            idx_q.put((bi, idxs))
        results = {}
        lock = threading.Lock()
        next_emit = [0]

        def work():
            while not stop.is_set():
                try:
                    bi, idxs = idx_q.get_nowait()
                except queue.Empty:
                    return
                samples = [dataset[i] for i in idxs]
                batch = collate(samples)
                with lock:
                    results[bi] = batch
                # emit in order
                while True:
                    with lock:
                        if next_emit[0] in results:
                            out_q.put(results.pop(next_emit[0]))
                            next_emit[0] += 1
                        else:
                            break

        threads = [threading.Thread(target=work, daemon=True) for _ in range(num_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        out_q.put(None)

    prod = threading.Thread(target=producer, args=(batches, q), daemon=True)
    prod.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()


def num_batches(n: int, batch_size: int, drop_last: bool = False) -> int:
    return n // batch_size if drop_last else -(-n // batch_size)
