"""Test harness: run everything on an 8-device virtual CPU mesh.

Mirrors how the driver validates multichip sharding — pjit/NamedSharding
code paths are exercised without TPU hardware. The session's sitecustomize
imports jax before pytest starts (JAX_PLATFORMS=axon), so env vars are too
late; jax.config still works because no backend has been initialized yet.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
