"""Optimizer + LR schedule, matching the reference's training recipe.

- SGD momentum 0.9, weight decay 1e-4, with mmcv's paramwise options
  ``bias_lr_mult=2, bias_decay_mult=0`` (config :108-113) — torch SGD
  semantics: v = m*v + (g + wd*p); p -= lr*v.
- Warmup ('constant' 1/3 for 500 iters for 1x, 'linear' for the 6x real-time
  schedule) + step decay x0.1 at epoch milestones (config :116-121; mmcv
  LrUpdaterHook math).
- frozen_stages parameters get zero updates (reference freezes them by
  requires_grad=False + BN eval; here: optimizer mask + stop_gradient in the
  backbone).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import optax
from flax import traverse_util

from ..config import OptimConfig


def lr_schedule(cfg: OptimConfig, steps_per_epoch: int):
    """mmcv warmup + multi-step decay, as a function of the global step."""
    milestones = jnp.asarray([e * steps_per_epoch for e in cfg.lr_steps])

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        decay = 0.1 ** (step >= milestones.astype(jnp.float32)).sum()
        base = cfg.lr * decay
        if cfg.warmup == "constant":
            warm = cfg.lr * cfg.warmup_ratio
        elif cfg.warmup == "linear":
            k = (1 - step / cfg.warmup_iters) * (1 - cfg.warmup_ratio)
            warm = cfg.lr * (1 - k)
        else:
            warm = base
        return jnp.where(step < cfg.warmup_iters, warm, base)

    return sched


def _label_params(params, frozen_stages: int):
    """Label every param leaf 'frozen' | 'bias' | 'default'."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    frozen_prefixes = ["conv1"] + [f"layer{i}" for i in
                                   range(1, frozen_stages + 1)]
    for path in flat:
        mods = list(path)
        is_frozen = (len(mods) >= 2 and mods[0] == "backbone" and
                     any(mods[1] == p or mods[1].startswith(p + "_")
                         for p in frozen_prefixes))
        if is_frozen:
            labels[path] = "frozen"
        elif path[-1] == "bias":
            labels[path] = "bias"
        else:
            labels[path] = "default"
    return traverse_util.unflatten_dict(labels)


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int, params,
                   frozen_stages: int = 1):
    sched = lr_schedule(cfg, steps_per_epoch)

    def sgd(lr_mult: float, decay_mult: float):
        chain = []
        if cfg.weight_decay * decay_mult > 0:
            chain.append(optax.add_decayed_weights(
                cfg.weight_decay * decay_mult))
        if cfg.momentum > 0:
            chain.append(optax.trace(decay=cfg.momentum))
        chain.append(optax.scale_by_schedule(
            lambda s: -sched(s) * lr_mult))
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {"default": sgd(1.0, 1.0),
         "bias": sgd(cfg.bias_lr_mult, cfg.bias_decay_mult),
         "frozen": optax.set_to_zero()},
        _label_params(params, frozen_stages))
    if cfg.grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx
