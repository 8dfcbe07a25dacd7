"""Device-mesh construction.

TPU-native replacement for the reference's process/NCCL topology
(SURVEY.md §2.13): instead of one model replica per GPU process wired with
Manager queues + torch.distributed, we build a single `jax.sharding.Mesh`
with named axes and let pjit/XLA insert ICI collectives.

Axes:
  data  — batch sharding (DP; also the serving "replica" axis: independent
          utterances are batch rows)
  model — tensor parallelism over attention heads / MLP hidden (TP)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
