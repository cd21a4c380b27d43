"""Device mesh construction.

The reference's distributed runtime is NCCL DDP/ZeRO-2 (`train.py:466-487`,
SURVEY §2.2). The TPU-native equivalent is a `jax.sharding.Mesh` with named
axes and sharding annotations — XLA inserts the collectives over ICI/DCN.

Axes:
  "data"  — batch / ZeRO axis (maps to DDP ranks of the reference)
  "model" — tensor-parallel axis for the LLaMA weights (reference has none;
            used when a model doesn't fit one chip's HBM)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    need = data * model
    assert need <= n, (data, model, n)
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over "data"."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def globalize_batch(batch: dict, mesh: Mesh) -> dict:
    """Host-local numpy batch -> global jax.Arrays sharded over "data".

    Single-process: a plain device_put with the data sharding. Multi-host
    (`jax.process_count() > 1`): each host contributes its LOCAL batch as
    its shard of the global array (`jax.make_array_from_process_local_data`
    — global batch = per-host batch x process_count, the DistributedSampler
    model of `train.py:452-463`); jit then runs one SPMD program over the
    global mesh and metric reductions cross hosts via ICI/DCN collectives.
    """
    import numpy as np

    out = {}
    multi = jax.process_count() > 1
    for k, v in batch.items():
        v = np.asarray(v)
        sharding = data_sharded(mesh, v.ndim)
        if multi:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = jax.device_put(v, sharding)
    return out
