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

from typing import Any, NamedTuple, Tuple

import jax
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


class FusedSGDState(NamedTuple):
    """Step count + one momentum buffer tree (zeros for frozen leaves)."""

    count: jnp.ndarray
    trace: Any


class FusedSGD(NamedTuple):
    """optax-compatible (init, update) plus a single-pass ``fused_apply``.

    The previous optax.chain/multi_transform formulation lowered to one
    fused elementwise pass PER transform PER group (~94 multiply_add
    fusions, 3.65 GB of HBM traffic, 5.7 ms/step in the hi-acc train
    profile). ``fused_apply`` computes, per leaf, torch-SGD semantics
    (mmcv paramwise groups, config :108-113)::

        v_new = momentum * v + (g + wd_leaf * p)
        p_new = p - lr * lr_mult_leaf * v_new

    in ONE traversal, so XLA emits one read-(g, p, v) / write-(p, v)
    kernel per leaf — the minimal possible optimizer traffic. ``update``
    keeps the optax contract (returns updates; the caller adds) for code
    that composes transforms, e.g. the torch-trajectory parity test.
    """

    init: Any
    update: Any
    fused_apply: Any


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int, params,
                   frozen_stages: int = 1):
    sched = lr_schedule(cfg, steps_per_epoch)
    labels = _label_params(params, frozen_stages)
    # per-label (lr_mult, decay_mult); frozen leaves get exactly zero update
    mults = {"default": (1.0, 1.0),
             "bias": (cfg.bias_lr_mult, cfg.bias_decay_mult),
             "frozen": (0.0, 0.0)}

    def init(params):
        trace = jax.tree_util.tree_map(jnp.zeros_like, params)
        return FusedSGDState(count=jnp.zeros([], jnp.int32), trace=trace)

    def _momenta(grads, state, params):
        """New momentum tree + the (lr, clip-scale) scalars of this step."""
        lr = sched(state.count)
        scale = None
        if cfg.grad_clip is not None:
            leaves = jax.tree_util.tree_leaves(grads)
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                                 for g in leaves))
            scale = jnp.minimum(1.0, cfg.grad_clip / (gnorm + 1e-6))

        def one(label, g, p, v):
            lr_mult, decay_mult = mults[label]
            if lr_mult == 0.0:
                return v  # frozen: momentum buffer never moves
            g = g.astype(jnp.float32)
            if scale is not None:
                g = g * scale
            wd = cfg.weight_decay * decay_mult
            if wd > 0 and cfg.momentum > 0:
                return cfg.momentum * v + (g + wd * p)
            if cfg.momentum > 0:
                return cfg.momentum * v + g
            return g + wd * p if wd > 0 else g

        new_trace = jax.tree_util.tree_map(one, labels, grads, params,
                                           state.trace)
        return new_trace, lr

    def update(grads, state, params):
        new_trace, lr = _momenta(grads, state, params)

        def upd(label, v):
            lr_mult, _ = mults[label]
            return -(lr * lr_mult) * v if lr_mult else jnp.zeros_like(v)

        updates = jax.tree_util.tree_map(upd, labels, new_trace)
        return updates, FusedSGDState(count=state.count + 1, trace=new_trace)

    def fused_apply(grads, state, params):
        """(new_params, new_state) in one pass; p + update(g) bit-exactly."""
        new_trace, lr = _momenta(grads, state, params)

        def apply_one(label, p, v):
            lr_mult, _ = mults[label]
            # p + (-(lr*lr_mult)*v) — same expression as update() + add so
            # fused_apply and the optax-contract path stay bit-identical
            return p + (-(lr * lr_mult) * v) if lr_mult else p

        new_params = jax.tree_util.tree_map(apply_one, labels, params,
                                            new_trace)
        return new_params, FusedSGDState(count=state.count + 1,
                                         trace=new_trace)

    return FusedSGD(init=init, update=update, fused_apply=fused_apply)
