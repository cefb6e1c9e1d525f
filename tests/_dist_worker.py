"""Worker process for the 2-process distributed train-step test.

Each worker owns 4 virtual CPU devices and its half of the global batch;
jax.distributed.initialize over a TCP coordinator makes the 8-device mesh
global, and shard_batch routes through
``jax.make_array_from_process_local_data`` (sipmask_tpu/parallel/mesh.py) —
the per-host feeding path that replaces the reference's
DistributedGroupSampler + DDP input split
(mmdet/datasets/loader/sampler.py:11-164, tools/dist_train.sh).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
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
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert jax.device_count() == args.local_devices * args.num_processes
    assert len(jax.local_devices()) == args.local_devices

    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.train import create_train_state, make_train_step
    from sipmask_tpu.utils import demo_batch

    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2)
    cfg = _r(cfg, "train", max_pos=8)

    # deterministic GLOBAL batch; this process feeds only its local rows
    global_batch = demo_batch(batch_size=8, height=64, width=64, max_gts=8,
                              seed=5)
    shard_id, num_shards = process_shard_args()
    rows_per = 8 // num_shards
    rows = slice(shard_id * rows_per, (shard_id + 1) * rows_per)
    local = {k: jnp.asarray(v[rows]) for k, v in global_batch.items()}

    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), local["images"][:1], steps_per_epoch=10)
    step_fn = make_train_step(model, tx, cfg, donate=False)

    mesh = make_mesh()
    with mesh:
        batch = shard_batch(local, mesh)
        state = replicate(state, mesh)
        state, metrics = step_fn(state, batch)
    out = {k: float(v) for k, v in metrics.items()}
    with open(args.out, "w") as f:
        json.dump(out, f)
    print("worker", args.process_id, "ok", out)


if __name__ == "__main__":
    main()
