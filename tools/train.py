#!/usr/bin/env python
"""Train a SipMask model (tools/train.py analog).

Example:
  python tools/train.py sipmask_r50_fpn_gn_1x \
      --ann data/coco/annotations/instances_train2017.json \
      --img-prefix data/coco/train2017 --work-dir work_dirs/r50_1x
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="preset name (sipmask_tpu.config)")
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-prefix", required=True)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--load-from", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--val-ann", default=None,
                    help="enable eval-during-train on this val json")
    ap.add_argument("--val-img-prefix", default=None)
    ap.add_argument("--cfg-options", nargs="+", default=None,
                    help="dotted config overrides, e.g. train.optim.lr=0.005"
                         " data.fixed_size=(256,256) (the benchmark fork's"
                         " YACS opts analog)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize() (env"
                         " auto-detect; the dist_train.sh/NCCL-launch analog)")
    ap.add_argument("--coordinator", default=None,
                    help="host:port for manual multi-host launch")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    if args.distributed:
        from sipmask_tpu.parallel import init_distributed
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)

    from sipmask_tpu.config import get_config, _r, apply_overrides
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.apis import train_detector
    from sipmask_tpu.apis.train import make_coco_eval_hook

    cfg = apply_overrides(get_config(args.config), args.cfg_options)
    if args.seed is not None:
        cfg = _r(cfg, "train", seed=args.seed)
    eval_hook = None
    if args.val_ann:
        eval_hook = make_coco_eval_hook(
            cfg, args.val_ann, args.val_img_prefix or args.img_prefix)
    train_detector(cfg, args.ann, args.img_prefix, args.work_dir,
                   resume=not args.no_resume, load_from=args.load_from,
                   max_steps=args.max_steps, eval_hook=eval_hook)


if __name__ == "__main__":
    main()
