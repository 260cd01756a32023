"""Device mesh construction and multi-host initialisation.

TPU-native replacement for the reference's NCCL process-group setup
(``distributed/iwslt14_train.py:377-380,453-466``): no mp.spawn, no
MASTER_ADDR rendezvous — a ``jax.sharding.Mesh`` over ``(data, model)`` axes,
with XLA inserting all collectives.  Multi-host pods call
``initialize_distributed()`` once (DCN rendezvous via
``jax.distributed.initialize``), then every host runs the same program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host DCN rendezvous (equivalent of dist.init_process_group,
    distributed/iwslt14_train.py:377-379). No-op on a single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  ``data=-1`` takes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays (replaces DistributedSampler +
    scatter, distributed/iwslt14_train.py:334)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
