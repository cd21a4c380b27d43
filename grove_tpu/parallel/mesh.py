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
