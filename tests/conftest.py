"""Test harness: run everything on an 8-device virtual CPU mesh.

Mirrors how the driver validates multichip sharding — pjit/NamedSharding
code paths are exercised without TPU hardware. The session's sitecustomize
imports jax before pytest starts (JAX_PLATFORMS=axon), so env vars are too
late; jax.config still works because no backend has been initialized yet.
"""

import os
import sys

# Widen XLA:CPU collective rendezvous windows: with 8 virtual devices on
# one physical core the last all-reduce participant can arrive minutes
# after the first, and XLA's default 40s terminate window abort()s the
# whole pytest process. Must be set before the first compilation.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    + " --xla_cpu_collective_timeout_seconds=1200"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
