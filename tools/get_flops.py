#!/usr/bin/env python
"""FLOPs/params counter (tools/get_flops.py analog) via XLA cost analysis."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="sipmask_r50_fpn_gn_1x")
    ap.add_argument("--shape", type=int, nargs=2, default=[544, 544])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from sipmask_tpu.config import get_config
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.models import build_model

    cfg = get_config(args.config)
    model = build_model(cfg.model)
    h, w = args.shape
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n_params = sum(int(np.prod(v.shape)) for v in
                   jax.tree_util.tree_leaves(variables["params"]))

    def fwd(variables, x):
        return model.apply(variables, x)

    lowered = jax.jit(fwd).lower(variables, x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"config: {cfg.name}  input: {h}x{w}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops: {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
