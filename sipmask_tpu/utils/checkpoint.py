"""Checkpoint save/restore via orbax.

Replaces mmcv's load/save_checkpoint + the benchmark's DetectronCheckpointer
(SURVEY.md §5): checkpoints embed meta (config name, step, classes) and
support both 'resume' (full train state) and 'load' (params only, the
reference's load_from used by VIS to start from a COCO model).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, state, meta: Optional[dict] = None):
    """Save the train state. Under multi-process SPMD this is a collective:
    every process must call it (orbax coordinates; the primary host
    writes), matching the reference's rank-0 checkpointing under DDP
    (mmcv CheckpointHook / fcos_core checkpoint.py). The sidecar files
    (meta.json, last_checkpoint) are written by process 0 only, behind a
    barrier so no process observes last_checkpoint before the checkpoint
    itself is complete."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    payload = dict(params=_to_numpy(state.params),
                   constants=_to_numpy(state.constants),
                   opt_state=_to_numpy(state.opt_state),
                   step=np.asarray(state.step))
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()
    if jax.process_index() == 0:
        if meta is not None:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
        _write_last(os.path.dirname(path), path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("sipmask_ckpt_saved")


def restore_checkpoint(path: str, state):
    """Full resume (params + optimizer + step)."""
    ckpt = ocp.StandardCheckpointer()
    target = dict(params=_to_numpy(state.params),
                  constants=_to_numpy(state.constants),
                  opt_state=_to_numpy(state.opt_state),
                  step=np.asarray(state.step))
    restored = ckpt.restore(os.path.abspath(path), target)
    return state.replace(params=restored["params"],
                         constants=restored["constants"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def load_weights(path: str, state):
    """Weights-only load (the reference's ``load_from``).

    Restores only params/constants so it works regardless of whether the
    checkpoint carries an optimizer state or what shape it has (a full
    train checkpoint, a published slim checkpoint, or a converted torch
    one).
    """
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckpt:
        restored = ckpt.restore(path)
    return state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, restored["params"]),
        constants=jax.tree_util.tree_map(
            jnp.asarray, restored.get("constants", state.constants)))


def latest_checkpoint(work_dir: str) -> Optional[str]:
    """benchmark DetectronCheckpointer's last_checkpoint auto-resume."""
    f = os.path.join(work_dir, "last_checkpoint")
    if os.path.exists(f):
        with open(f) as fh:
            p = fh.read().strip()
        return p if os.path.exists(p) else None
    return None


def _write_last(work_dir: str, path: str):
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "last_checkpoint"), "w") as f:
        f.write(path)
