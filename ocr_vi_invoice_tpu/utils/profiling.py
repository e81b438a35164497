"""Tracing / profiling utilities.

The reference's observability is ad-hoc timers and CUDA memory prints
(`tests/test_model.py:403-427`). TPU-native equivalents:
  * ``trace(...)`` — jax.profiler trace context writing to TensorBoard-
    readable protos;
  * ``annotate(name)`` — named trace regions around pipeline stages;
  * ``compiled_stats(fn, *args)`` — XLA cost analysis (FLOPs, bytes) of a
    jitted function without running it;
  * ``enable_compilation_cache()`` — persistent XLA compile cache so CLI
    restarts skip the 20-40s first-compile.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Any, Dict, Optional

_CACHE_ENABLED = False


def _host_cache_key() -> str:
    """Backend + CPU-feature fingerprint for the compilation cache dir.

    jax's CPU cache key does not cover the host's CPU features; an AOT
    executable compiled on an AVX-512-different machine loads with a
    'machine type ... doesn't match' warning and then computes GARBAGE
    (observed: NaN train losses and CER 1.0 evals from a cache carried
    across machines). Keying the directory by a feature hash makes a
    foreign cache invisible instead of poisonous.
    """
    import hashlib

    import jax

    backend = "unknown"
    try:
        backend = jax.default_backend()
    except Exception:
        pass
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except Exception:
        pass
    return f"{backend}-{hashlib.md5(feats.encode()).hexdigest()[:10]}"


def enable_compilation_cache(path: Optional[str] = None) -> None:
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.environ.get(
        "OVI_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    )
    path = os.path.join(path, _host_cache_key())
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        _CACHE_ENABLED = True
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ovi_trace"):
    """Capture a jax.profiler trace for TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in profiler traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def compiled_stats(fn, *args, **kwargs) -> Dict[str, Any]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes)."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
    except Exception:
        ca = {}
    out = {
        "flops": float(ca.get("flops", -1.0)),
        "bytes_accessed": float(ca.get("bytes accessed", -1.0)),
    }
    try:
        mem = compiled.memory_analysis()
        out["device_memory_bytes"] = int(
            getattr(mem, "output_size_in_bytes", 0)
            + getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
        )
    except Exception:
        pass
    return out


class Timer:
    """Wall timer with named laps."""

    def __init__(self):
        self.t0 = time.time()
        self.laps: Dict[str, float] = {}

    def lap(self, name: str) -> float:
        now = time.time()
        dt = now - self.t0
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self.t0 = now
        return dt
