"""Multi-process distributed execution test (VERDICT r2 missing item 2).

Spawns two real processes, each with 4 virtual CPU devices, joined by
``jax.distributed.initialize`` over a local TCP coordinator. One train
step runs through ``shard_batch``'s
``jax.make_array_from_process_local_data`` branch (parallel/mesh.py) —
previously dead code in every test — and the losses must equal the
single-process 8-device run on the same global batch.

Reference analog: tools/dist_train.sh + DistributedGroupSampler
(mmdet/datasets/loader/sampler.py:11-164).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_train_step_matches_single_process(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [str(tmp_path / f"w{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", coord,
             "--process-id", str(i), "--num-processes", "2",
             "--out", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    m0 = json.load(open(outs[0]))
    m1 = json.load(open(outs[1]))
    # SPMD: every process computes the same global-batch losses
    assert set(m0) == set(m1)
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=0, atol=0, err_msg=k)

    # single-process reference on the same global batch (this process has
    # 8 virtual devices via conftest)
    import jax
    import jax.numpy as jnp
    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.parallel import make_mesh, shard_batch, replicate
    from sipmask_tpu.train import create_train_state, make_train_step
    from sipmask_tpu.utils import demo_batch

    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2)
    cfg = _r(cfg, "train", max_pos=8)
    batch_np = demo_batch(batch_size=8, height=64, width=64, max_gts=8,
                          seed=5)
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), jnp.asarray(batch_np["images"][:1]),
        steps_per_epoch=10)
    step_fn = make_train_step(model, tx, cfg, donate=False)
    mesh = make_mesh(8)
    with mesh:
        batch = shard_batch({k: jnp.asarray(v)
                             for k, v in batch_np.items()}, mesh)
        state = replicate(state, mesh)
        _, metrics = step_fn(state, batch)
    single = {k: float(v) for k, v in metrics.items()}
    for k in single:
        np.testing.assert_allclose(m0[k], single[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)
