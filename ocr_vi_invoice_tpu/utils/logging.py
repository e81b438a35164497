"""Training observability: CSV logs (reference-compatible) and timers.

The reference appends one CSV row per epoch (`src/det/train.py:192-196`,
`src/rec2/train.py:197-201`); we keep the exact column sets so existing
analysis of ``training_log.csv`` files carries over.
"""

from __future__ import annotations

import csv
import os
import time
from pathlib import Path
from typing import Dict, Sequence

DET_COLUMNS = [
    "epoch", "lr", "train_loss", "val_loss", "val_precision", "val_recall",
    "val_f1", "val_iou", "val_dice",
]
REC_COLUMNS = ["epoch", "lr", "train_loss", "val_loss", "val_cer", "val_accuracy"]


class CSVLogger:
    def __init__(self, path: str | Path, columns: Sequence[str], resume: bool = False):
        self.path = Path(path)
        self.columns = list(columns)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if not self.path.exists() or not resume:
            with open(self.path, "w", newline="") as f:
                csv.writer(f).writerow(self.columns)

    def append(self, row: Dict[str, object]):
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow([row.get(c, "") for c in self.columns])


class StepTimer:
    """Rolling steps/sec and images/sec meter."""

    def __init__(self):
        self.t0 = time.time()
        self.steps = 0
        self.items = 0

    def tick(self, items: int = 0):
        self.steps += 1
        self.items += items

    def rates(self):
        dt = max(time.time() - self.t0, 1e-9)
        return {"steps_per_sec": self.steps / dt, "items_per_sec": self.items / dt}

    def reset(self):
        self.__init__()
