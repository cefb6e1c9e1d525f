"""Train state: params + frozen constants + optimizer state."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..config import SipMaskConfig
from ..models import build_model
from .optim import make_optimizer


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    constants: Any  # FrozenBatchNorm stats etc. (never updated)
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, "constants": self.constants}


def create_train_state(cfg: SipMaskConfig, rng, sample_images,
                       steps_per_epoch: int = 1000,
                       sample_images_ref=None):
    """Initialize model params + optimizer. Returns (model, state, tx)."""
    model = build_model(cfg.model)
    if cfg.model.head.track and sample_images_ref is not None:
        variables = jax.jit(model.init)(rng, sample_images, sample_images_ref)
    else:
        variables = jax.jit(model.init)(rng, sample_images)
    if cfg.model.head.rescoring:
        # ensure rescoring params exist: init through the rescore method
        h, w = sample_images.shape[1] // 2, sample_images.shape[2] // 2
        dummy = jnp.zeros((1, h, w, 1))
        resc = jax.jit(
            lambda r, d: model.init(r, d, method=model.rescore))(rng, dummy)
        params = dict(variables["params"])
        params.update(resc["params"])
        variables = {"params": params,
                     "constants": variables.get("constants", {})}
    tx = make_optimizer(cfg.train.optim, steps_per_epoch,
                        variables["params"],
                        frozen_stages=cfg.model.backbone.frozen_stages)
    opt_state = tx.init(variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=variables["params"],
                       constants=variables.get("constants", {}),
                       opt_state=opt_state)
    return model, state, tx
