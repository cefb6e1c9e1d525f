"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP over NCCL
(SURVEY.md §5: MMDistributedDataParallel / init_process_group('nccl')).
The TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over the 'data' axis,
batches sharded on it, parameters replicated, and the train step written as
global-batch SPMD under jit — XLA inserts the gradient all-reduces and the
global loss normalizers (the benchmark fork's cross-GPU ``reduce_sum``,
fcos_core/.../loss.py:374-390, falls out for free).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
feed per-host shards via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every array in the batch dict along its leading (batch) dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
