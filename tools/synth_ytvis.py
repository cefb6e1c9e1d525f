#!/usr/bin/env python
"""Generate a small synthetic YouTube-VIS-format dataset: per video, shapes
(bright ellipse = 'disc', gray rotated box = 'slab') moving linearly across
frames, with per-frame polygon segmentations and track ids.

Used for the VIS train->checkpoint->test_video->YTVOSeval end-to-end proof
(the reference's val gt is withheld/codalab, so a gt-carrying synthetic set
is the feasible analog) and as demo data. Deterministic for a given seed.

  python tools/synth_ytvis.py /tmp/synth_vis --num-videos 6 --frames 4
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np
import cv2


def make_dataset(out_dir, num_videos=6, frames=4, size=256, seed=0,
                 max_objects=2):
    rng = np.random.RandomState(seed)
    img_root = os.path.join(out_dir, "imgs")
    videos, annotations = [], []
    aid = 1
    for vi in range(num_videos):
        vdir = f"v{vi:03d}"
        os.makedirs(os.path.join(img_root, vdir), exist_ok=True)
        n_obj = rng.randint(1, max_objects + 1)
        objs = []
        for _ in range(n_obj):
            objs.append(dict(
                cat=int(rng.randint(1, 3)),
                cx=float(rng.randint(size // 4, 3 * size // 4)),
                cy=float(rng.randint(size // 4, 3 * size // 4)),
                a=int(rng.randint(size // 8, size // 5)),
                b=int(rng.randint(size // 8, size // 5)),
                vx=float(rng.uniform(-8, 8)), vy=float(rng.uniform(-8, 8)),
                ang=float(rng.uniform(0, 180))))
        tracks = [dict(bboxes=[], segmentations=[], areas=[]) for _ in objs]
        file_names = []
        for fi in range(frames):
            img = rng.randint(0, 60, (size, size, 3), np.uint8)
            for oi, o in enumerate(objs):
                cx = int(np.clip(o["cx"] + o["vx"] * fi, o["a"],
                                 size - 1 - o["a"]))
                cy = int(np.clip(o["cy"] + o["vy"] * fi, o["b"],
                                 size - 1 - o["b"]))
                mask = np.zeros((size, size), np.uint8)
                if o["cat"] == 1:
                    color = tuple(int(c) for c in rng.randint(180, 255, 3))
                    cv2.ellipse(img, (cx, cy), (o["a"], o["b"]), 0, 0, 360,
                                color, -1)
                    cv2.ellipse(mask, (cx, cy), (o["a"], o["b"]), 0, 0, 360,
                                1, -1)
                else:
                    color = tuple(int(c) for c in rng.randint(90, 150, 3))
                    pts = cv2.boxPoints(((float(cx), float(cy)),
                                         (2.0 * o["a"], 2.0 * o["b"]),
                                         o["ang"]))
                    pts = np.clip(pts, 0, size - 1).astype(np.int32)
                    cv2.fillPoly(img, [pts], color)
                    cv2.fillPoly(mask, [pts], 1)
                ys, xs = np.nonzero(mask)
                contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                               cv2.CHAIN_APPROX_SIMPLE)
                segs = [c.reshape(-1).astype(float).tolist()
                        for c in contours if c.shape[0] >= 3]
                if len(xs) < 20 or not segs:
                    tracks[oi]["bboxes"].append(None)
                    tracks[oi]["segmentations"].append(None)
                    tracks[oi]["areas"].append(None)
                else:
                    x1, y1 = int(xs.min()), int(ys.min())
                    tracks[oi]["bboxes"].append(
                        [x1, y1, int(xs.max() - x1 + 1),
                         int(ys.max() - y1 + 1)])
                    tracks[oi]["segmentations"].append(segs)
                    tracks[oi]["areas"].append(int(mask.sum()))
            fn = f"{vdir}/{fi:03d}.jpg"
            cv2.imwrite(os.path.join(img_root, fn), img)
            file_names.append(fn)
        videos.append(dict(id=vi + 1, file_names=file_names, width=size,
                           height=size, length=frames))
        for oi, o in enumerate(objs):
            annotations.append(dict(
                id=aid, video_id=vi + 1, category_id=o["cat"], iscrowd=0,
                **tracks[oi]))
            aid += 1
    ann = dict(videos=videos, annotations=annotations,
               categories=[dict(id=1, name="disc"), dict(id=2, name="slab")])
    ann_file = os.path.join(out_dir, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(ann, f)
    return ann_file, img_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--num-videos", type=int, default=6)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-objects", type=int, default=2,
                    help="objects per video (1 = no crossing tracks,\n                    for clean tracker-loop proofs)")
    args = ap.parse_args()
    ann_file, img_root = make_dataset(args.out_dir, args.num_videos,
                                      args.frames, args.size, args.seed,
                                      args.max_objects)
    n = len(json.load(open(ann_file))["annotations"])
    print(f"wrote {ann_file} ({args.num_videos} videos x {args.frames} "
          f"frames, {n} tracks), images in {img_root}")


if __name__ == "__main__":
    main()
