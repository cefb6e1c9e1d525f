#!/usr/bin/env python
"""Evaluate a SipMask model on COCO val (tools/test.py analog)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-prefix", required=True)
    ap.add_argument("--out", default=None, help="dump results json")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--eval", nargs="+", default=["bbox", "segm"])
    ap.add_argument("--cfg-options", nargs="+", default=None,
                    help="dotted config overrides (see tools/train.py)")
    ap.add_argument("--dist", action="store_true",
                    help="multi-host eval: shard the val set per process and "
                         "collect results (tools/dist_test.sh analog; run "
                         "one process per host with jax.distributed env)")
    ap.add_argument("--tmpdir", default=None,
                    help="with --dist: collect via this shared dir instead "
                         "of the cross-host allgather")
    args = ap.parse_args()

    from sipmask_tpu.config import get_config, apply_overrides
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.apis.inference import init_detector
    from sipmask_tpu.apis.test import run_inference, evaluate_coco
    from sipmask_tpu.data import CocoDataset

    cfg = apply_overrides(get_config(args.config), args.cfg_options)
    if args.dist:
        from sipmask_tpu.parallel import init_distributed
        init_distributed()
    det = init_detector(cfg, checkpoint=args.checkpoint)
    dataset = CocoDataset(args.ann, args.img_prefix, test_mode=True)
    results = run_inference(det.model, det.variables, cfg, dataset,
                            batch_size=args.batch_size,
                            distributed=args.dist, tmpdir=args.tmpdir)
    import jax
    if args.dist and jax.process_index() != 0:
        return  # rank 0 reports (every rank holds the full result list)
    if args.out:
        def _ser(r):
            r = dict(r)
            if "segmentation" in r:
                r["segmentation"] = {
                    "size": r["segmentation"]["size"],
                    "counts": r["segmentation"]["counts"].decode()}
            return r
        with open(args.out, "w") as f:
            json.dump([_ser(r) for r in results], f)
    evaluate_coco(results, args.ann, metrics=args.eval)


if __name__ == "__main__":
    main()
