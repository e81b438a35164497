"""Debugging aids: NaN hunting, determinism checks, shape guards.

The reference's only concurrency is DataLoader workers and its failure
handling is NaN-skip (SURVEY.md §5 "race detection / sanitizers: none").
The JAX equivalents of a sanitizer toolbox:

* ``enable_nan_debugging()`` — ``jax.debug_nans``: any NaN produced
  inside jitted code raises at the producing primitive (the analogue of
  running under a numeric sanitizer);
* ``check_finite(tree)`` — host-side assertion over a pytree;
* ``assert_replicated(x)`` — verifies a global array's shards agree (a
  cheap cross-device divergence detector when data-parallel training
  should keep params identical);
* ``deterministic_run(fn, *args)`` — runs twice and compares, catching
  nondeterminism from unexpected RNG or donation bugs.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def enable_nan_debugging(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)


def check_finite(tree: Any, name: str = "tree") -> None:
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}:{p} has {bad}/{arr.size} non-finite values"
            )


def assert_replicated(x, atol: float = 0.0) -> None:
    """All addressable shards of ``x`` must be identical (replicated
    params drifting apart means a sharding/donation bug)."""
    shards = [np.asarray(s.data) for s in x.addressable_shards]
    for i, s in enumerate(shards[1:], 1):
        if shards[0].shape != s.shape:
            return  # genuinely sharded; nothing to check
        if not np.allclose(shards[0], s, atol=atol, rtol=0):
            raise AssertionError(
                f"shard {i} diverges from shard 0 by "
                f"{np.abs(shards[0] - s).max()}"
            )


def deterministic_run(fn, *args, atol: float = 0.0):
    """Run ``fn`` twice on identical inputs; raise if outputs differ."""
    import jax

    a = fn(*args)
    b = fn(*args)
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        xa, ya = np.asarray(x), np.asarray(y)
        if not np.allclose(xa, ya, atol=atol, rtol=0):
            raise AssertionError(
                f"nondeterministic output: max diff {np.abs(xa - ya).max()}"
            )
    return a
