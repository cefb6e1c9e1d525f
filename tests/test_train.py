"""Training-subsystem tests: optimizer rules, LR schedule, and the SPMD
train step on the virtual 8-device CPU mesh (capability the reference lacks,
SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from sipmask_tpu.config import get_config, _r, OptimConfig
from sipmask_tpu.parallel import make_mesh, shard_batch, replicate
from sipmask_tpu.train import (make_optimizer, lr_schedule,
                               create_train_state, make_train_step)
from sipmask_tpu.train.optim import _label_params
from sipmask_tpu.utils import demo_batch


def _tiny_cfg():
    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2)
    cfg = _r(cfg, "train", max_pos=16)
    return cfg


class TestSchedule:
    def test_constant_warmup_and_steps(self):
        cfg = OptimConfig(lr=0.01, warmup="constant", warmup_iters=500,
                          warmup_ratio=1 / 3, lr_steps=(8, 11))
        s = lr_schedule(cfg, steps_per_epoch=100)
        assert abs(float(s(0)) - 0.01 / 3) < 1e-9
        assert abs(float(s(499)) - 0.01 / 3) < 1e-9
        assert abs(float(s(500)) - 0.01) < 1e-9
        assert abs(float(s(800)) - 0.001) < 1e-9   # epoch 8
        assert abs(float(s(1100)) - 0.0001) < 1e-9  # epoch 11

    def test_linear_warmup(self):
        cfg = OptimConfig(lr=0.01, warmup="linear", warmup_iters=100,
                          warmup_ratio=1 / 3, lr_steps=(20,))
        s = lr_schedule(cfg, steps_per_epoch=1000)
        assert abs(float(s(0)) - 0.01 / 3) < 1e-6
        assert float(s(0)) < float(s(50)) < float(s(100)) + 1e-9


class TestParamLabels:
    def test_frozen_and_bias_labels(self):
        params = {
            "backbone": {"conv1": {"kernel": 0},
                         "layer1_0": {"conv1": {"kernel": 0}},
                         "layer2_0": {"conv1": {"kernel": 0}}},
            "head": {"fcos_cls": {"kernel": 0, "bias": 0}},
        }
        labels = traverse_util.flatten_dict(_label_params(params, 1))
        assert labels[("backbone", "conv1", "kernel")] == "frozen"
        assert labels[("backbone", "layer1_0", "conv1", "kernel")] == "frozen"
        assert labels[("backbone", "layer2_0", "conv1", "kernel")] == "default"
        assert labels[("head", "fcos_cls", "bias")] == "bias"
        assert labels[("head", "fcos_cls", "kernel")] == "default"


class TestTrainStep:
    def test_step_on_8_device_mesh(self):
        assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
        cfg = _tiny_cfg()
        mesh = make_mesh()
        batch_np = demo_batch(batch_size=8, height=64, width=64)
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(0),
            jnp.asarray(batch_np["images"][:1]), steps_per_epoch=10)
        step_fn = make_train_step(model, tx, cfg, donate=False)

        with mesh:
            batch = shard_batch(
                {k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)
            state_r = replicate(state, mesh)
            conv1_before = np.asarray(
                state_r.params["backbone"]["conv1"]["kernel"])
            head_before = np.asarray(
                state_r.params["head"]["fcos_cls"]["kernel"])
            new_state, metrics = step_fn(state_r, batch)
            new_state, metrics = step_fn(new_state, batch)

        assert int(new_state.step) == 2
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # frozen backbone stem must not move; head must move
        np.testing.assert_array_equal(
            np.asarray(new_state.params["backbone"]["conv1"]["kernel"]),
            conv1_before)
        assert np.abs(np.asarray(new_state.params["head"]["fcos_cls"]["kernel"])
                      - head_before).max() > 0

    def test_sharded_step_equals_single_device(self):
        """Global-batch SPMD: losses on the 8-device sharded batch must
        equal a single-device run of the same global batch — the normalizer
        semantics of the benchmark fork's cross-GPU reduce_sum
        (fcos_core loss.py:374-400) under jax.sharding."""
        cfg = _tiny_cfg()
        batch_np = demo_batch(batch_size=8, height=64, width=64, seed=5)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(0), batch["images"][:1],
            steps_per_epoch=10)
        step_fn = make_train_step(model, tx, cfg, donate=False)

        mesh = make_mesh()
        with mesh:
            _, metrics_sharded = step_fn(replicate(state, mesh),
                                         shard_batch(batch, mesh))
        mesh1 = make_mesh(1)
        with mesh1:
            _, metrics_single = step_fn(replicate(state, mesh1),
                                        shard_batch(batch, mesh1))
        for k in metrics_single:
            # small float noise from the different reduction order of the
            # 8-way psum-of-partials vs the single-device sum
            np.testing.assert_allclose(
                float(metrics_sharded[k]), float(metrics_single[k]),
                rtol=5e-4, atol=1e-6, err_msg=k)


class TestMultiHostPlumbing:
    def test_process_shard_args_single_process(self):
        from sipmask_tpu.parallel import process_shard_args
        assert process_shard_args() == (0, 1)

    def test_loader_shards_partition_epoch(self, tmp_path):
        """Per-host sharding (DistributedGroupSampler analog): the union of
        all shards' epoch batches covers every batch exactly once, and all
        shards agree on the partition (same seed -> same permutation)."""
        import json
        import cv2
        from sipmask_tpu.config import DataConfig
        from sipmask_tpu.data import CocoDataset
        from sipmask_tpu.data.transforms import TrainTransform
        from sipmask_tpu.data.loader import build_train_loader

        rng = np.random.RandomState(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(16):
            h, w = (60, 80) if i % 2 else (80, 60)
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.randint(0, 255, (h, w, 3), np.uint8))
            images.append(dict(id=i + 1, file_name=f"{i}.jpg",
                               width=w, height=h))
            anns.append(dict(id=i + 1, image_id=i + 1, category_id=1,
                             bbox=[5, 5, 30, 30], area=900, iscrowd=0,
                             segmentation=[[5, 5, 35, 5, 35, 35, 5, 35]]))
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps(dict(
            images=images, annotations=anns,
            categories=[dict(id=1, name="a")])))

        ds = CocoDataset(str(ann_file), str(img_dir), min_size=1)
        dcfg = DataConfig(img_scale=(80, 60), max_gts=4)
        num_shards = 4
        seen = []
        per_shard_steps = None
        for shard in range(num_shards):
            loader, steps = build_train_loader(
                ds, TrainTransform(dcfg, seed=0), batch_size=2, seed=0,
                num_workers=2, prefetch=2, shard_id=shard,
                num_shards=num_shards)
            per_shard_steps = steps
            for _ in range(steps):
                seen.append(tuple(sorted(next(loader)["image_ids"].tolist())))
        # 16 imgs / batch 2 = 8 batches -> 2 per shard, disjoint union
        assert per_shard_steps == 2
        assert len(seen) == 8
        all_ids = [i for b in seen for i in b]
        assert sorted(all_ids) == sorted(ds.image_id(i)
                                         for i in range(len(ds)))
