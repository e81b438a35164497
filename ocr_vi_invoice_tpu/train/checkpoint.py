"""Checkpointing with the reference's best/periodic policy, orbax-backed.

Reference policy (`src/det/train.py:264-286`, `src/rec2/train.py:238-260`):
new best metric -> ``best_model``; every N epochs -> ``checkpoint_epoch_K``.
``--resume`` loads model weights only and restarts optimizer/schedule fresh
(`train.py:180-189`) — mirrored by ``load_weights`` + ``TrainState.replace_tx``.

Array trees (params/batch_stats) go through orbax/tensorstore; scalar
metadata (epoch, metric, variant, val metrics) lives in a ``meta.json``
sidecar — tensorstore has no string dtype.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, save_dir: str | Path, every: int = 5):
        self.save_dir = Path(save_dir).absolute()
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.every = every
        self._ckptr = ocp.StandardCheckpointer()

    def _save(self, name: str, params, batch_stats, meta: Dict[str, Any]):
        # Crash-safe: build the full checkpoint (arrays + meta.json) under a
        # temp name, then swap it in. A kill at any point leaves at least one
        # complete checkpoint on disk — either the old `name` (before the
        # swap) or the finished `name.tmp` (which load_weights falls back
        # to). Writing meta.json before the swap also closes the window
        # where a checkpoint existed without its dcn_mode/variant metadata.
        final = self.save_dir / name
        tmp = self.save_dir / (name + ".tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckptr.save(
            tmp, _to_host({"params": params, "batch_stats": batch_stats})
        )
        self._ckptr.wait_until_finished()
        with open(tmp / "meta.json", "w") as f:
            json.dump(meta, f)
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)

    def save_best(self, epoch: int, params, batch_stats, best_metric: float,
                  extra: Optional[Dict[str, Any]] = None):
        self._save("best_model", params, batch_stats,
                   {"epoch": epoch, "best_metric": float(best_metric),
                    **(extra or {})})

    def maybe_save_periodic(self, epoch: int, params, batch_stats,
                            best_metric: float,
                            extra: Optional[Dict[str, Any]] = None):
        if (epoch + 1) % self.every == 0:
            self._save(f"checkpoint_epoch_{epoch + 1}", params, batch_stats,
                       {"epoch": epoch, "best_metric": float(best_metric),
                        **(extra or {})})

    def save_step(self, epoch: int, step: int, params, batch_stats,
                  extra: Optional[Dict[str, Any]] = None):
        """Mid-epoch safety checkpoint (single rolling `last_step` dir).

        For preemptible/flaky devices: a multi-hour epoch that dies at
        step N-1 otherwise leaves nothing. Weights-only, like --resume.
        """
        self._save("last_step", params, batch_stats,
                   {"epoch": epoch, "step": step, **(extra or {})})

    def load(self, name: str = "best_model") -> Dict[str, Any]:
        return load_weights(self.save_dir / name)


def load_weights(path: str | Path) -> Dict[str, Any]:
    """Load {params, batch_stats, **meta} from a checkpoint dir.

    Falls back to ``<path>.tmp`` — a save that completed but was killed
    before the atomic swap in ``CheckpointManager._save``.
    """
    path = Path(path).absolute()
    if not path.exists() and path.with_name(path.name + ".tmp").exists():
        path = path.with_name(path.name + ".tmp")
    ckptr = ocp.StandardCheckpointer()
    restored = dict(ckptr.restore(path))
    meta_path = path / "meta.json"
    if meta_path.exists():
        with open(meta_path) as f:
            restored.update(json.load(f))
    return restored
