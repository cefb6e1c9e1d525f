"""The jitted SPMD train step.

Replaces the reference's Runner.batch_processor + DDP backward
(mmdet/apis/train.py:59-81) with a single functional step: forward -> loss ->
grad -> SGD update, written as global-batch SPMD. With the batch sharded over
the mesh 'data' axis and params replicated, XLA inserts the gradient
all-reduces (DDP equivalent) and the loss normalizers are computed over the
global batch (the benchmark fork's cross-GPU reduce_sum, loss.py:374-390).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import SipMaskConfig
from ..models.loss import compute_losses


def make_train_step(model, tx, cfg: SipMaskConfig, donate: bool = True):
    head_cfg = cfg.model.head

    def train_step(state, batch):
        def loss_fn(params):
            variables = {"params": params, "constants": state.constants}
            if head_cfg.track:
                out = model.apply(variables, batch["images"],
                                  batch["ref_images"])
            else:
                out = model.apply(variables, batch["images"])
            rescore_fn = None
            if head_cfg.rescoring:
                rescore_fn = lambda m: model.apply(
                    variables, m, method=model.rescore)
            losses = compute_losses(out, batch, head_cfg,
                                    max_pos=cfg.train.max_pos,
                                    rescore_fn=rescore_fn)
            metrics_only = {k: losses.pop(k) for k in list(losses)
                            if not k.startswith("loss")}
            total = sum(jnp.asarray(v) for v in losses.values())
            return total, {**losses, **metrics_only}

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if hasattr(tx, "fused_apply"):
            # one read-(g,p,v)/write-(p,v) pass per leaf (see optim.FusedSGD)
            params, opt_state = tx.fused_apply(grads, state.opt_state,
                                               state.params)
        else:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                            updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = dict(losses)
        metrics["loss_total"] = total
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
