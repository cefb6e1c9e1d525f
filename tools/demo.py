#!/usr/bin/env python
"""Single-image demo (demo/sipmask_demo.py analog)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("image")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="demo_out.jpg")
    ap.add_argument("--score-thr", type=float, default=0.3)
    args = ap.parse_args()

    import cv2
    from sipmask_tpu.apis.inference import (init_detector, inference_detector,
                                            show_result)
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.data.coco import COCO_CLASSES

    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"could not read image: {args.image}")
    det = init_detector(args.config, checkpoint=args.checkpoint)
    result = inference_detector(det, img)
    show_result(img, result, COCO_CLASSES, score_thr=args.score_thr,
                out_file=args.out)
    print(f"wrote {args.out} with {len(result['boxes'])} detections")


if __name__ == "__main__":
    main()
