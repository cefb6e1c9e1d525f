"""Multi-host result collection for distributed evaluation.

Reference analog: ``multi_gpu_test`` shards the val set per rank and
gathers the per-rank result lists on rank 0
(SipMask-mmdetection/mmdet/apis/test.py:30-73) via either a shared-dir
pickle exchange (``collect_results_cpu``, :75-117) or a padded
all-gather over the collective backend (``collect_results_gpu``,
:120-146). The TPU-native versions below keep both transports:

- :func:`collect_results_gather` rides JAX's cross-host collectives
  (``multihost_utils.process_allgather`` -> ICI/DCN), needs no shared
  filesystem, and returns the full result list on EVERY process (SPMD
  symmetry; the reference returns None off rank 0).
- :func:`collect_results_cpu` is the shared-filesystem fallback for
  clusters where results are too large to all-gather comfortably.

Both accept arbitrary picklable per-process payloads.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import jax


def collect_results_gather(part):
    """All-gather one picklable object per process; return the list
    ``[part_rank0, part_rank1, ...]`` on every process.

    Transport: pickle -> uint8 buffer, pad to the global max length
    (all-gather needs a uniform shape), one ``process_allgather``,
    unpickle each rank's prefix. Single-process: ``[part]``.
    """
    if jax.process_count() == 1:
        return [part]
    from jax.experimental import multihost_utils
    buf = np.frombuffer(
        pickle.dumps(part, protocol=pickle.HIGHEST_PROTOCOL), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.asarray([buf.size], np.int64))          # (P, 1)
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[:buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[r, :int(sizes[r])].tobytes())
            for r in range(jax.process_count())]


def collect_results_cpu(part, tmpdir):
    """Shared-filesystem collection (reference ``collect_results_cpu``):
    every process pickles its part into ``tmpdir``, a global barrier,
    then every process loads all parts (the reference loads only on rank
    0; loading everywhere keeps the return symmetric with the gather
    path). ``tmpdir`` must be visible to all hosts. Returns
    ``[part_rank0, ...]``; rank 0 removes the part files afterwards.
    """
    if jax.process_count() == 1:
        return [part]
    from jax.experimental import multihost_utils
    os.makedirs(tmpdir, exist_ok=True)
    rank = jax.process_index()
    path = os.path.join(tmpdir, f"part_{rank}.pkl")
    with open(path, "wb") as f:
        pickle.dump(part, f, protocol=pickle.HIGHEST_PROTOCOL)
    multihost_utils.sync_global_devices("collect_results_cpu_write")
    out = []
    for r in range(jax.process_count()):
        with open(os.path.join(tmpdir, f"part_{r}.pkl"), "rb") as f:
            out.append(pickle.load(f))
    multihost_utils.sync_global_devices("collect_results_cpu_read")
    if rank == 0:
        for r in range(jax.process_count()):
            try:
                os.remove(os.path.join(tmpdir, f"part_{r}.pkl"))
            except OSError:
                pass
    return out
