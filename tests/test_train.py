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
