#!/usr/bin/env python
"""Throughput benchmark: inference fps and training step time on the
current backend (the reference reports fps only in the paper; here it is a
first-class tool). Prints one JSON line per measurement."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="sipmask_r50_fpn_ssd_6x")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--shape", type=int, nargs=2, default=None,
                    help="H W; default from config")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--mode", nargs="+", default=["infer", "train"])
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.models import build_model
    from sipmask_tpu.models.decode import decode_batch

    cfg = get_config(args.config)
    cfg = _r(cfg, "model", compute_dtype=args.dtype)
    def mode_shape(mode):
        # train benches default to the train-time shape (RT trains at the
        # 576 train_size stretch, tests at the 544 fixed_size)
        return args.shape \
            or (cfg.data.train_size if mode == "train" else None) \
            or cfg.data.fixed_size \
            or (min(cfg.data.img_scale), min(cfg.data.img_scale))
    rng = np.random.RandomState(0)

    def timeit(f, *a):
        out = f(*a)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
        # force a host fetch so async-future backends can't lie
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(first.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(first.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters

    if "infer" in args.mode:
        h, w = mode_shape("infer")
        b = args.batch_size
        model = build_model(cfg.model)
        images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 20)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
        shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (b, 1))
        sf = jnp.ones((b, 4), jnp.float32)

        @jax.jit
        def infer(v, im):
            d = decode_batch(model.apply(v, im), shapes, sf, cfg.model)
            d["masks"] = d["masks"] > cfg.model.test.mask_thr
            return d

        t = timeit(infer, variables, images)
        print(json.dumps(dict(metric="inference_images_per_sec",
                              config=args.config, batch=b, hw=[h, w],
                              ms_per_batch=round(t * 1e3, 2),
                              value=round(b / t, 2))))

    if "train" in args.mode:
        from sipmask_tpu.train import create_train_state, make_train_step
        from sipmask_tpu.utils import demo_batch
        h, w = mode_shape("train")
        b = args.train_batch
        batch_np = demo_batch(batch_size=b, height=h, width=w, max_gts=16)
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(0), jnp.asarray(batch_np["images"][:1]),
            steps_per_epoch=1000)
        # production-shaped step: donated state carried through the loop
        # (apis/train.py trains with make_train_step's donate=True default)
        step_fn = make_train_step(model, tx, cfg)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        state, metrics = step_fn(state, batch)  # compile + warmup
        jax.block_until_ready((state.params, metrics))
        # force a host fetch so async-future backends can't lie
        float(metrics["loss_total"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step_fn(state, batch)
        jax.block_until_ready((state.params, metrics))
        float(metrics["loss_total"])
        t = (time.perf_counter() - t0) / args.iters
        print(json.dumps(dict(metric="train_images_per_sec",
                              config=args.config, batch=b, hw=[h, w],
                              ms_per_step=round(t * 1e3, 2),
                              value=round(b / t, 2))))


if __name__ == "__main__":
    main()
