"""Device mesh and sharding layer.

The reference has no live distributed code (SURVEY.md §2.5: only vestigial
``module.`` DataParallel prefixes). Here parallelism is first-class and
TPU-native: a 2-D ``jax.sharding.Mesh`` with axes ``('data', 'model')``.

* ``data``  — batch parallelism: inputs sharded on dim 0; XLA inserts the
  gradient ``psum`` over ICI automatically when the loss reduces over a
  data-sharded batch under jit.
* ``model`` — optional tensor parallelism for wide projection weights
  (SVTR MLP/attention kernels, CTC head). The models here are small
  (≤30M params) so this axis defaults to size 1, but the plumbing is real
  and exercised by tests / the multichip dry-run.

No NCCL/MPI analogue exists or is needed: collectives are compiled by XLA
from the sharding annotations.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``shape`` is (data, model); by default all devices go to the data axis,
    which is the right layout for these model sizes.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != #devices {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with dim-0 sharded over 'data'."""

    def put(x):
        x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)


def device_prefetch(host_iter, mesh: Mesh, depth: int = 2):
    """Shard/upload ``depth`` batches ahead of consumption.

    ``jax.device_put`` dispatches the host->device copy asynchronously,
    so keeping a small deque of in-flight device batches overlaps the
    transfer with the running train step — behind this dev harness's
    device relay the upload is seconds-scale for f32 det batches and
    still ~1s for uint8, i.e. comparable to the step itself.
    """
    import collections

    buf = collections.deque()
    for host_batch in host_iter:
        buf.append(shard_batch(mesh, host_batch))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


# --------------------------------------------------------------------------- #
# Parameter partitioning rules (model axis)
# --------------------------------------------------------------------------- #

# Flax param paths whose kernels are worth sharding over the model axis when
# it has size > 1. Matched against '/'-joined path strings.
_SHARD_LAST_DIM = re.compile(
    r"(mlp.*fc1|qkv|h_qkv|v_kv|cross_kv|context_.*|head|sgm_head|char_embed)"
)
_SHARD_FIRST_OF_LAST2 = re.compile(r"(mlp.*fc2|proj|h_proj|v_proj|cross_proj)")


def _spec_for(path: str, shape: Tuple[int, ...], model_size: int) -> P:
    if model_size <= 1 or len(shape) < 2:
        return P()
    last = shape[-1]
    if _SHARD_LAST_DIM.search(path) and last % model_size == 0:
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    if _SHARD_FIRST_OF_LAST2.search(path) and shape[-2] % model_size == 0:
        return P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
    return P()


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for a flax param tree.

    Wide projection kernels get a model-axis shard (column/row parallel in
    Megatron terms — XLA inserts the matching all-reduce); everything else
    is replicated. With model axis size 1 this is pure replication.
    """
    model_size = mesh.shape[MODEL_AXIS]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def sharding_for(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_entries)
        return NamedSharding(mesh, _spec_for(path, np.shape(leaf), model_size))

    leaves = [sharding_for(p, l) for p, l in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def choose_mesh_shape(n: int) -> Tuple[int, int]:
    """Pick a (data, model) split for n devices: model axis 2 when n is
    divisible by 4 or more, else pure data parallel."""
    if n >= 4 and n % 2 == 0:
        return (n // 2, 2)
    return (n, 1)
