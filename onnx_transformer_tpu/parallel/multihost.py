"""Multi-process (multi-host) array assembly for SPMD training.

The reference's multi-host story is NCCL DDP: one process per GPU,
``dist.init_process_group("nccl", env://)`` + ``DistributedSampler``
(``distributed/iwslt14_train.py:334,377-380,460-466``).  The TPU-native
equivalent splits into three orthogonal pieces:

1. rendezvous  — :func:`parallel.mesh.initialize_distributed`
   (``jax.distributed.initialize`` over DCN);
2. data        — each process loads ONLY its shard
   (``BucketedLoader(num_shards=N, shard_index=pid)``) and stitches it into
   a globally-sharded ``jax.Array`` here;
3. compute     — the SAME jitted train step as single-process: XLA sees the
   global (data-sharded) batch and inserts the cross-host gradient
   all-reduce itself.  No DDP wrapper, no bucket hooks.

Everything here is also exercised single-process (process_count()==1), where
``make_array_from_process_local_data`` degenerates to a device_put.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onnx_transformer_tpu.parallel.mesh import DATA_AXIS


def global_batch(batch: tuple, mesh: Mesh, accum: int = 1) -> tuple:
    """Per-process local batch shard -> global data-sharded jax.Arrays.

    ``batch`` holds THIS process's rows (its loader shard); the returned
    arrays are global, sharded over the ``data`` mesh axis across all
    processes.  The multi-process replacement for
    :func:`train.trainer.shard_batch`.
    """
    spec = P(DATA_AXIS) if accum == 1 else P(None, DATA_AXIS)
    sh = NamedSharding(mesh, spec)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(a)) for a in batch
    )


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate a host-local pytree (params/opt state) onto every device of
    a (possibly multi-process) mesh.  Each process must hold identical values
    — guaranteed when state comes from the same seed or the same checkpoint,
    mirroring the reference's identical-per-rank model build
    (``distributed/iwslt14_train.py:357-380``)."""
    sh = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, (jax.Array, np.ndarray)) or np.isscalar(x):
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return x

    return jax.tree.map(put, tree)


def fetch_replicated(x: jax.Array) -> np.ndarray:
    """Replicated global array -> host numpy (every process holds it all)."""
    return np.asarray(jax.device_get(x))
