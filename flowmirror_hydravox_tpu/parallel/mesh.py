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


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host runtime init — the TPU-native replacement for the
    reference's NCCL/gloo `init_distributed` (train_utils.py:39-50).

    One call per host process wires every host into a single JAX runtime:
    afterwards `jax.devices()` is global and pjit collectives ride ICI
    within a slice and DCN across slices. Arguments default to the standard
    env vars (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, also set
    automatically on Cloud TPU). No-op when single-process."""
    import os

    num = num_processes or int(os.environ.get("NUM_PROCESSES", "1"))
    if num <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(model: int = 1) -> Mesh:
    """('data', 'model') mesh spanning all hosts: the data axis is laid out
    hierarchically (hosts outer, local devices inner) via
    mesh_utils.create_hybrid_device_mesh so the gradient all-reduce
    decomposes into intra-slice ICI reduce-scatter + inter-slice DCN
    all-reduce. Falls back to the flat single-process mesh when there is
    one process."""
    if jax.process_count() == 1:
        return make_mesh(model=model)
    from jax.experimental import mesh_utils

    local = jax.local_device_count()
    assert local % model == 0, f"{local} local devices not divisible by model={model}"
    arr = mesh_utils.create_hybrid_device_mesh(
        (local // model, model), (jax.process_count(), 1)
    )
    return Mesh(arr, ("data", "model"))


def host_local_batch_to_global(mesh: Mesh, batch: dict) -> dict:
    """Per-host input feeding for multi-host DP: each process supplies its
    local rows; the result is a global jax.Array sharded over 'data'
    (replaces the reference's per-rank DataLoader + DDP pairing)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
