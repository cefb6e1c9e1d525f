#!/usr/bin/env python
"""Per-op device profile of the train/inference step.

TPU-native replacement for the reference's nvprof/nsight workflow: captures a
``jax.profiler`` trace of the jitted step on the real chip, then parses the
perfetto trace and aggregates device-op durations so the hot spots are
visible without a TensorBoard round-trip. Feeds docs/KERNEL_NOTES.md and the
PERF_r{N}.json roofline notes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob
import gzip
import json
import re


def newest_trace(log_dir):
    cands = glob.glob(os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    return max(cands, key=os.path.getmtime)


HBM_GBPS = 819.0  # v5e HBM bandwidth
PEAK_TFLOPS = 197.0  # v5e bf16 peak


def _repo_frame(stack):
    """First /root/repo frame of a source_stack (innermost model code)."""
    for line in stack.split("\n"):
        if line.startswith("/root/repo") and "profile_step" not in line:
            parts = line.rsplit(":", 2)
            return f"{parts[0].split('/root/repo/')[-1]}:{parts[1]}"
    return "?"


def parse_trace(path, steps=1):
    """Aggregate device XLA-op events; returns (op_rows, cat_rows, src_rows,
    totals) per step, with bytes_accessed-derived achieved HBM bandwidth and
    model_flops-derived MXU utilization for the roofline read."""
    d = json.load(gzip.open(path))
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    device_pids = {p for p, n in pids.items() if "TPU" in n}
    agg_us = collections.Counter()
    agg_bytes = collections.Counter()
    agg_flops = collections.Counter()
    count = collections.Counter()
    cat_of = {}
    src_us = collections.Counter()
    src_flops = collections.Counter()
    total_us = 0.0
    total_flops = 0
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        tname = tids.get((e["pid"], e["tid"]), "")
        if tname == "XLA Modules":
            total_us += e.get("dur", 0)
            continue
        if tname != "XLA Ops":
            continue
        name = re.sub(r"\.\d+$", "", e.get("name", "?"))
        a = e.get("args", {})
        fl = int(a.get("model_flops", 0) or 0)
        agg_us[name] += e.get("dur", 0)
        agg_bytes[name] += int(a.get("bytes_accessed", 0) or 0)
        agg_flops[name] += fl
        total_flops += fl
        count[name] += 1
        cat_of[name] = a.get("hlo_category", "?")
        src = _repo_frame(a.get("source_stack", ""))
        src_us[src] += e.get("dur", 0)
        src_flops[src] += fl
    op_rows = []
    for name, us in agg_us.most_common():
        ms = us / 1e3 / steps
        gb = agg_bytes[name] / 1e9 / steps
        tf = agg_flops[name] / 1e12 / steps
        op_rows.append(dict(
            op=name, cat=cat_of[name], ms=round(ms, 3),
            calls=max(count[name] // steps, 1), gb=round(gb, 3),
            tflops=round(tf, 3),
            gbps=round(gb / (ms / 1e3), 1) if ms > 0 else 0.0,
            hbm_frac=round(gb / (ms / 1e3) / HBM_GBPS, 2) if ms > 0 else 0.0,
            mxu_frac=round(tf / (ms / 1e3) / PEAK_TFLOPS, 2)
            if ms > 0 else 0.0))
    cats = collections.Counter()
    cat_bytes = collections.Counter()
    cat_flops = collections.Counter()
    for name, us in agg_us.items():
        cats[cat_of[name]] += us
        cat_bytes[cat_of[name]] += agg_bytes[name]
        cat_flops[cat_of[name]] += agg_flops[name]
    cat_rows = [dict(cat=c, ms=round(us / 1e3 / steps, 3),
                     gb=round(cat_bytes[c] / 1e9 / steps, 3),
                     tflops=round(cat_flops[c] / 1e12 / steps, 3))
                for c, us in cats.most_common()]
    src_rows = [dict(src=s, ms=round(us / 1e3 / steps, 3),
                     tflops=round(src_flops[s] / 1e12 / steps, 3))
                for s, us in src_us.most_common()]
    return op_rows, cat_rows, src_rows, dict(
        total_ms=total_us / 1e3 / steps,
        total_tflops=total_flops / 1e12 / steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="sipmask_r50_fpn_gn_1x")
    ap.add_argument("--mode", default="train", choices=["train", "infer"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--shape", type=int, nargs=2, default=None)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="compute dtype override (bench.py uses bfloat16)")
    ap.add_argument("--logdir", default="/tmp/sipmask_profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.models import build_model
    from sipmask_tpu.models.decode import decode_batch

    cfg = _r(get_config(args.config), "model", compute_dtype=args.dtype)
    # train profiles default to the train-time shape (the 6x RT recipe
    # trains at the 576 train_size stretch, tests at the 544 fixed_size)
    # img_scale presets (e.g. hi-acc (1333, 800)) run at the bucketed
    # production shape: short side x long side padded to stride 32
    # (800x1344), matching bench.py — NOT a square min-side crop, which
    # understates the step by ~40%
    default = (cfg.data.train_size if args.mode == "train" else None) \
        or cfg.data.fixed_size \
        or (min(cfg.data.img_scale), -(-max(cfg.data.img_scale) // 32) * 32)
    h, w = args.shape or default
    rng = np.random.RandomState(0)
    b = args.batch

    if args.mode == "infer":
        model = build_model(cfg.model)
        images = jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) * 20)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
        shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (b, 1))
        sf = jnp.ones((b, 4), jnp.float32)

        @jax.jit
        def step(v, im):
            d = decode_batch(model.apply(v, im), shapes, sf, cfg.model)
            d["masks"] = d["masks"] > cfg.model.test.mask_thr
            return d

        run = lambda: jax.tree_util.tree_map(
            lambda x: x.block_until_ready(), step(variables, images))
    else:
        from sipmask_tpu.train import create_train_state, make_train_step
        from sipmask_tpu.utils import demo_batch
        batch_np = demo_batch(batch_size=b, height=h, width=w, max_gts=16)
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(0), jnp.asarray(batch_np["images"][:1]),
            steps_per_epoch=1000)
        # production-shaped step: donated state carried across run() calls
        # (apis/train.py trains with make_train_step's donate=True default)
        step_fn = make_train_step(model, tx, cfg)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        state_box = [state]

        def run():
            new_state, metrics = step_fn(state_box[0], batch)
            state_box[0] = new_state
            jax.block_until_ready((new_state.params, metrics))

    run()  # compile
    run()  # warm
    jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
    for _ in range(args.steps):
        run()
    jax.effects_barrier()
    jax.profiler.stop_trace()

    op_rows, cat_rows, src_rows, totals = parse_trace(
        newest_trace(args.logdir), steps=args.steps)
    total = totals["total_ms"]
    mfu = totals["total_tflops"] / (total / 1e3) / PEAK_TFLOPS
    print(f"# device profile: {args.config} {args.mode} {args.dtype} bs{b} "
          f"{h}x{w} ({args.steps} steps; module total {total:.2f} ms/step; "
          f"{totals['total_tflops']:.2f} TFLOP/step -> MFU {mfu:.3f})")
    print("## by hlo_category (ms | GB accessed | implied GB/s | TFLOP)")
    for r in cat_rows:
        gbps = r["gb"] / (r["ms"] / 1e3) if r["ms"] else 0
        print(f"{r['ms']:9.3f} ms  {r['gb']:8.2f} GB  {gbps:6.0f} GB/s  "
              f"{r['tflops']:7.3f} TF  {r['cat']}")
    print(f"## top {args.top} ops (ms | calls | GB | HBM frac | MXU frac)")
    for r in op_rows[:args.top]:
        print(f"{r['ms']:9.3f} ms  x{r['calls']:<4d} {r['gb']:8.3f} GB "
              f"{r['hbm_frac']:5.2f} {r['mxu_frac']:5.2f} "
              f"[{r['cat']}] {r['op']}")
    rest = sum(r["ms"] for r in op_rows[args.top:])
    print(f"{rest:9.3f} ms        (+{max(len(op_rows)-args.top, 0)} more)")
    print(f"## by repo source line (top {args.top})")
    for r in src_rows[:args.top]:
        print(f"{r['ms']:9.3f} ms  {r['tflops']:7.3f} TF  {r['src']}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(dict(config=args.config, mode=args.mode, batch=b,
                           dtype=args.dtype, hw=[h, w],
                           module_ms=round(total, 3),
                           tflops_per_step=round(totals["total_tflops"], 3),
                           mfu=round(mfu, 4), categories=cat_rows,
                           sources=src_rows, ops=op_rows), f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
