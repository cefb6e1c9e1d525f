#!/usr/bin/env python
"""Visualize what the training pipeline feeds the model
(reference tools/browse_dataset.py analog): runs the full TrainTransform
(resize/flip/SSD augs/pad) and writes images with gt boxes + masks overlaid,
in pipeline (padded, BGR-mean-normalized undone) space."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-prefix", required=True)
    ap.add_argument("--out-dir", default="browse_out")
    ap.add_argument("--num", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import cv2
    from sipmask_tpu.config import get_config
    from sipmask_tpu.data import CocoDataset, TrainTransform

    cfg = get_config(args.config)
    dataset = CocoDataset(args.ann, args.img_prefix)
    transform = TrainTransform(cfg.data, seed=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    mean = np.asarray(cfg.data.mean, np.float32)
    std = np.asarray(cfg.data.std, np.float32)
    colors = np.random.RandomState(3).randint(0, 255, (256, 3))

    for i in range(min(args.num, len(dataset))):
        boxes, labels, masks = dataset.get_ann(i)
        s = transform(dataset.load_image(i), boxes, labels, masks,
                      image_id=dataset.image_id(i))
        img = np.clip(s.image * std + mean, 0, 255).astype(np.uint8).copy()
        n = int((s.gt_labels > 0).sum())
        for j in range(n):
            x1, y1, x2, y2 = s.gt_bboxes[j].astype(int)
            c = tuple(int(v) for v in colors[int(s.gt_labels[j]) % 256])
            cv2.rectangle(img, (x1, y1), (x2, y2), c, 2)
            if s.gt_masks is not None and j < len(s.gt_masks):
                # gt masks are stored at the stride-2 basis resolution
                m = cv2.resize(s.gt_masks[j].astype(np.float32),
                               (img.shape[1], img.shape[0]),
                               interpolation=cv2.INTER_NEAREST) > 0.5
                img[m] = img[m] * 0.5 + np.asarray(c) * 0.5
        path = os.path.join(args.out_dir, f"sample_{i:04d}.jpg")
        cv2.imwrite(path, img)
        print(f"{path}: {n} instances, shape {img.shape[:2]}")


if __name__ == "__main__":
    main()
