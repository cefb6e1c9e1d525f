#!/usr/bin/env python
"""Video instance segmentation inference + eval
(SipMask-VIS tools/test_video.py analog).

Runs the streaming tracker over every video, writes YTVIS-format results
json (results2json_videoseg equivalent), and — when the annotation file
carries ground truth — runs the reimplemented YTVOS evaluation. (The
official val split's gt is withheld; the reference uploads to codalab.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="sipmask_vis_r50")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-prefix", required=True)
    ap.add_argument("--out", default="results.json")
    ap.add_argument("--eval", action="store_true",
                    help="run YTVOS eval (needs gt in --ann)")
    ap.add_argument("--cfg-options", nargs="+", default=None,
                    help="dotted config overrides, e.g. "
                         "model.head.num_classes=2")
    args = ap.parse_args()

    from sipmask_tpu.config import get_config, apply_overrides
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.apis.inference import init_detector
    from sipmask_tpu.apis.test_video import run_video_inference
    from sipmask_tpu.data.ytvos import YTVOSDataset

    cfg = get_config(args.config)
    cfg = apply_overrides(cfg, args.cfg_options)
    assert cfg.model.head.track, f"{args.config} is not a VIS config"
    det = init_detector(cfg, checkpoint=args.checkpoint)
    dataset = YTVOSDataset(args.ann, args.img_prefix, test_mode=True)
    results = run_video_inference(det.model, det.variables, cfg, dataset)

    def _ser(r):
        r = dict(r)
        r["segmentations"] = [
            None if s is None else
            {"size": s["size"],
             "counts": s["counts"].decode()
             if isinstance(s["counts"], bytes) else s["counts"]}
            for s in r["segmentations"]]
        return r

    with open(args.out, "w") as f:
        json.dump([_ser(r) for r in results], f)
    print(f"wrote {args.out}: {len(results)} tracks")

    if args.eval:
        from sipmask_tpu.eval.ytvos_eval import YTVOSEvaluator
        ev = YTVOSEvaluator(args.ann)
        ev.update(results)
        ev.summarize()


if __name__ == "__main__":
    main()
