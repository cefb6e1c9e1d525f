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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up: the analog of the reference's
    ``init_process_group('nccl')`` + torch.distributed.launch
    (tools/dist_train.sh, fcos_core tools/train_net.py:134-140).

    With no arguments, ``jax.distributed.initialize`` auto-detects the
    cluster from the environment (TPU pod metadata / JAX_COORDINATOR_*);
    explicit args support the torchrun-style manual launch. No-op if the
    runtime is already initialized (e.g. under a test harness).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_shard_args():
    """(shard_id, num_shards) for per-host data sharding — the
    DistributedGroupSampler rank/world_size analog."""
    return jax.process_index(), jax.process_count()


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()  # global devices across all processes
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every array in the batch dict along its leading (batch) dim.

    Single-process: a plain device_put. Multi-host: each process passes its
    LOCAL batch shard (global_batch / process_count rows) and the global
    array is assembled via ``jax.make_array_from_process_local_data`` —
    the per-host sharded feeding that replaces the reference's per-rank
    DataLoader + DDP input split.
    """
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
