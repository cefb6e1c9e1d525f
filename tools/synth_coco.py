#!/usr/bin/env python
"""Generate a small synthetic COCO-format dataset of visually learnable
shapes (bright ellipses = class 'disc', dark rotated boxes = class 'slab')
on noise backgrounds.

Used for the train->checkpoint->eval overfit proof (the closest feasible
analog of the reference's full-COCO eval protocol under zero egress) and as
demo/smoke-test data. Deterministic for a given seed.

  python tools/synth_coco.py /tmp/synth_coco --num-images 8 --size 256
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np
import cv2


def make_dataset(out_dir, num_images=8, size=256, max_objs=3, seed=0):
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(out_dir, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations = [], []
    aid = 1
    for i in range(num_images):
        img = rng.randint(0, 60, (size, size, 3), np.uint8)  # dark noise bg
        n = rng.randint(2, max_objs + 1)
        for _ in range(n):
            cat = int(rng.randint(1, 3))
            cx, cy = rng.randint(size // 5, 4 * size // 5, 2)
            a = rng.randint(size // 10, size // 4)
            b = rng.randint(size // 10, size // 4)
            mask = np.zeros((size, size), np.uint8)
            if cat == 1:  # bright ellipse
                color = tuple(int(c) for c in rng.randint(180, 255, 3))
                cv2.ellipse(img, (cx, cy), (a, b), 0, 0, 360, color, -1)
                cv2.ellipse(mask, (cx, cy), (a, b), 0, 0, 360, 1, -1)
            else:  # mid-gray rotated box
                color = tuple(int(c) for c in rng.randint(90, 150, 3))
                ang = float(rng.uniform(0, 180))
                pts = cv2.boxPoints(((float(cx), float(cy)),
                                     (float(2 * a), float(2 * b)), ang))
                pts = np.clip(pts, 0, size - 1).astype(np.int32)
                cv2.fillPoly(img, [pts], color)
                cv2.fillPoly(mask, [pts], 1)
            ys, xs = np.nonzero(mask)
            if len(xs) < 20:
                continue
            x1, y1 = int(xs.min()), int(ys.min())
            w, h = int(xs.max() - x1 + 1), int(ys.max() - y1 + 1)
            contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                           cv2.CHAIN_APPROX_SIMPLE)
            segs = [c.reshape(-1).astype(float).tolist() for c in contours
                    if c.shape[0] >= 3]
            if not segs:
                continue
            annotations.append(dict(
                id=aid, image_id=i + 1, category_id=cat,
                bbox=[x1, y1, w, h], area=int(mask.sum()), iscrowd=0,
                segmentation=segs))
            aid += 1
        cv2.imwrite(os.path.join(img_dir, f"{i:04d}.jpg"), img)
        images.append(dict(id=i + 1, file_name=f"{i:04d}.jpg",
                           width=size, height=size))
    ann = dict(images=images, annotations=annotations,
               categories=[dict(id=1, name="disc"), dict(id=2, name="slab")])
    ann_file = os.path.join(out_dir, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, img_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--num-images", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--max-objs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    ann_file, img_dir = make_dataset(args.out_dir, args.num_images,
                                     args.size, args.max_objs, args.seed)
    n_ann = len(json.load(open(ann_file))["annotations"])
    print(f"wrote {ann_file} ({args.num_images} images, {n_ann} annotations),"
          f" images in {img_dir}")


if __name__ == "__main__":
    main()
