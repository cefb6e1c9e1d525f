"""Worker for the 2-process checkpoint round-trip test.

Exercises orbax save -> restart -> auto-resume -> train inside a real
``jax.distributed`` job (the reference resumes under DDP as a matter of
course: mmdet/apis/train.py:177-180 runner.resume; mmcv CheckpointHook
writes from rank 0). Runs two trajectories on the same global batch:

- interrupted: 2 steps -> save_checkpoint (collective) -> fresh state with
  DIFFERENT init -> latest_checkpoint + restore_checkpoint -> 1 step
- uninterrupted: 3 straight steps from the original init

and writes per-leaf param fingerprints of both finals; the test asserts
they are identical on every process.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fingerprint(tree):
    import jax
    import numpy as np
    from flax import traverse_util
    flat = traverse_util.flatten_dict(jax.device_get(tree))
    return {"/".join(k): float(np.float64(np.abs(np.asarray(v))).sum())
            for k, v in flat.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{args.local_devices}").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from sipmask_tpu.parallel import (init_distributed, make_mesh,
                                      shard_batch, replicate,
                                      process_shard_args)

    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)

    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.train import create_train_state, make_train_step
    from sipmask_tpu.utils import demo_batch
    from sipmask_tpu.utils.checkpoint import (save_checkpoint,
                                              restore_checkpoint,
                                              latest_checkpoint)

    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2)
    cfg = _r(cfg, "train", max_pos=8)

    n_dev = args.local_devices * args.num_processes
    global_batch = demo_batch(batch_size=n_dev, height=64, width=64,
                              max_gts=8, seed=5)
    shard_id, num_shards = process_shard_args()
    rows_per = n_dev // num_shards
    rows = slice(shard_id * rows_per, (shard_id + 1) * rows_per)
    local = {k: jnp.asarray(v[rows]) for k, v in global_batch.items()}

    mesh = make_mesh()

    def fresh(seed):
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(seed), local["images"][:1],
            steps_per_epoch=10)
        return model, state, make_train_step(model, tx, cfg, donate=False)

    with mesh:
        batch = shard_batch(local, mesh)

        # --- interrupted trajectory
        model, state, step_fn = fresh(0)
        state = replicate(state, mesh)
        for _ in range(2):
            state, _ = step_fn(state, batch)
        ckpt_path = os.path.join(args.work_dir, "ckpt_step2")
        save_checkpoint(ckpt_path, state, meta=dict(test=True))

        # restart: DIFFERENT init, then auto-resume from work_dir
        _, state2, step_fn2 = fresh(1)
        state2 = replicate(state2, mesh)
        latest = latest_checkpoint(args.work_dir)
        assert latest == os.path.abspath(ckpt_path), latest
        state2 = restore_checkpoint(latest, state2)
        state2 = replicate(state2, mesh)
        assert int(state2.step) == 2
        state2, m_resumed = step_fn2(state2, batch)

        # --- uninterrupted trajectory
        _, state3, step_fn3 = fresh(0)
        state3 = replicate(state3, mesh)
        for _ in range(3):
            state3, m_straight = step_fn3(state3, batch)

    out = dict(
        resumed=fingerprint(state2.params),
        straight=fingerprint(state3.params),
        resumed_opt=fingerprint(state2.opt_state.trace),
        straight_opt=fingerprint(state3.opt_state.trace),
        step_resumed=int(state2.step), step_straight=int(state3.step),
        loss_resumed=float(m_resumed["loss_total"]),
        loss_straight=float(m_straight["loss_total"]),
    )
    with open(args.out, "w") as f:
        json.dump(out, f)
    print("ckpt worker", args.process_id, "ok")


if __name__ == "__main__":
    main()
