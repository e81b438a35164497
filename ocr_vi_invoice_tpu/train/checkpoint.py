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
        self._save_payload(
            name, {"params": params, "batch_stats": batch_stats}, meta)

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

    def peek(self, name: str) -> Optional[Dict[str, Any]]:
        """meta.json of a checkpoint (or its .tmp fallback), else None —
        lets a resuming CLI learn the epoch/phase BEFORE building the
        optimizer tree it must restore into."""
        for cand in (self.save_dir / name,
                     self.save_dir / (name + ".tmp")):
            if (cand / "meta.json").exists():
                with open(cand / "meta.json") as f:
                    return json.load(f)
        return None

    # ---------------- full train-state (preemption recovery) ------------- #

    def save_state(self, epoch: int, step: int, state,
                   extra: Optional[Dict[str, Any]] = None):
        """Rolling ``last_state`` checkpoint of the FULL ``TrainState``
        (params + BN stats + optimizer state + step counter), atomically
        swapped like every other save.

        Unlike ``save_step`` (weights-only, reference ``--resume``
        semantics), restoring this continues the optimizer moments and the
        OneCycle schedule position exactly — the elastic-recovery path for
        preemptible TPU VMs and for this dev harness's leaky device relay,
        where a supervisor restarts the process when host RSS runs away
        (see `train/supervisor.py`).
        """
        opt_leaves = jax.tree_util.tree_leaves(state.opt_state)
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt": {f"l{i:04d}": leaf for i, leaf in enumerate(opt_leaves)},
            # NB distinct from the meta.json "step" (loop position): this is
            # the TrainState.step counter array.
            "step_counter": state.step,
        }
        self._save_payload("last_state", payload,
                           {"epoch": epoch, "step": step, **(extra or {})})

    def restore_state(self, state_template) -> Optional[Dict[str, Any]]:
        """Restore ``last_state`` into a freshly-built ``TrainState`` (same
        model/optimizer construction). Returns ``{state, epoch, step,
        **meta}`` or None if no last_state exists.
        """
        path = self.save_dir / "last_state"
        if not path.exists() and not path.with_name(
                path.name + ".tmp").exists():
            return None
        r = load_weights(path)
        leaves, treedef = jax.tree_util.tree_flatten(state_template.opt_state)
        saved = r["opt"]
        if len(saved) != len(leaves):
            raise ValueError(
                f"optimizer state mismatch: checkpoint has {len(saved)} "
                f"leaves, template has {len(leaves)} — was the training "
                "phase/schedule rebuilt differently?")
        restored_leaves = [
            jnp_like(saved[f"l{i:04d}"], leaves[i]) for i in range(len(leaves))
        ]
        state = state_template.replace(
            params=r["params"],
            batch_stats=r["batch_stats"],
            opt_state=jax.tree_util.tree_unflatten(treedef, restored_leaves),
            step=jnp_like(r["step_counter"], state_template.step),
        )
        meta = {k: v for k, v in r.items()
                if k not in ("params", "batch_stats", "opt", "step_counter")}
        return {"state": state, **meta}

    def _save_payload(self, name: str, payload, meta: Dict[str, Any]):
        final = self.save_dir / name
        tmp = self.save_dir / (name + ".tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckptr.save(tmp, _to_host(payload))
        self._ckptr.wait_until_finished()
        with open(tmp / "meta.json", "w") as f:
            json.dump(meta, f)
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)


# Shipped best_model checkpoints, newest/strongest training leg first.
# The pipeline CLIs and bench default to the first one that exists, so a
# user gets the best trained weights without naming a path (the reference
# equivalent is its hardcoded weights/{det,rec2}/best_model.pth paths,
# `src/pipeline/pipeline2.py:196-238`).
_SHIPPED = {
    # det960d: round-5 converged 3-epoch OneCycle — test F1 0.9393 vs
    # det960b's 0.9278 on the matched regenerated split (README table)
    "det": ("det960d", "det960b", "det960", "det"),
    "rec": ("rec2_aug2", "rec2_aug", "rec2"),
    "scan": ("u2netp",),
}


def shipped_candidates(kind: str) -> list:
    """Candidate ``best_model`` dirs for 'det' | 'rec' | 'scan', preferred
    training leg first (existence not checked)."""
    root = Path(__file__).resolve().parents[2] / "weights"
    return [root / d / "best_model" for d in _SHIPPED[kind]]


def shipped_checkpoint(kind: str) -> Optional[str]:
    """Path of the preferred shipped checkpoint for `kind`, or None."""
    for cand in shipped_candidates(kind):
        if cand.exists():
            return str(cand)
    return None


def jnp_like(value, template):
    """Cast a restored (numpy) leaf to the template leaf's dtype."""
    import jax.numpy as jnp

    return jnp.asarray(value, dtype=getattr(template, "dtype", None))


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
