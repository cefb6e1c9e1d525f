#!/usr/bin/env python
"""Video / webcam demo (reference demo/webcam_demo.py + SipMask-VIS
tools/test_video.py --show analog).

Image configs: per-frame detection overlay. VIS configs (track=True):
per-frame detection + identity-colored tracks via the streaming tracker.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("video", help="path to a video file, or an integer "
                    "camera index for webcam")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default="video_out.mp4")
    ap.add_argument("--score-thr", type=float, default=0.3)
    ap.add_argument("--max-frames", type=int, default=None)
    args = ap.parse_args()

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sipmask_tpu.config import get_config
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.apis.inference import (init_detector, inference_detector,
                                            show_result)
    from sipmask_tpu.data.coco import COCO_CLASSES

    cfg = get_config(args.config)
    det = init_detector(cfg, checkpoint=args.checkpoint)
    is_vis = cfg.model.head.track
    class_names = COCO_CLASSES if not is_vis else tuple(
        f"c{i}" for i in range(cfg.model.head.num_classes))

    src = int(args.video) if args.video.isdigit() else args.video
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise SystemExit(f"could not open video source: {args.video}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    writer = None

    tracker_state = None
    if is_vis:
        from sipmask_tpu.models.track import tracker_init, tracker_step
        from sipmask_tpu.models.decode import decode_batch
        from sipmask_tpu.models.track import extract_center_feats
        tracker_state = tracker_init(cfg.model.track.max_tracks)

        @jax.jit
        def vis_infer(variables, images, img_shapes, scale_factors):
            out = det.model.apply(variables, images)
            dets = decode_batch(out, img_shapes, scale_factors, cfg.model)
            boxes_in = dets["boxes"][0] * scale_factors[0][None, :]
            feats = extract_center_feats(out["track_feats"][0], boxes_in)
            return dets, feats

        @jax.jit
        def vis_step(state, boxes, scores, labels, valid, feats, first):
            return tracker_step(state, boxes, scores, labels, valid, feats,
                                first, match_coeff=cfg.model.track.match_coeff)

    id_colors = np.random.RandomState(7).randint(0, 255, (256, 3))
    fi = 0
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and fi >= args.max_frames):
            break
        if not is_vis:
            result = inference_detector(det, frame)
            vis = show_result(frame, result, class_names,
                              score_thr=args.score_thr)
        else:
            s = det.transform(frame)
            dets, feats = vis_infer(det.variables,
                                    jnp.asarray(s.image[None]),
                                    jnp.asarray(s.img_shape[None]),
                                    jnp.asarray(s.scale_factor[None]))
            tracker_state, obj_ids = vis_step(
                tracker_state, dets["boxes"][0], dets["scores"][0],
                dets["labels"][0], dets["valid"][0], feats,
                jnp.asarray(fi == 0))
            d = {k: np.asarray(v[0]) for k, v in dets.items()}
            obj_ids = np.asarray(obj_ids)
            vis = frame.copy()
            for i in range(len(obj_ids)):
                oid = int(obj_ids[i])
                if oid < 0 or not d["valid"][i] or \
                        d["scores"][i] < args.score_thr:
                    continue
                x1, y1, x2, y2 = d["boxes"][i].astype(int)
                c = tuple(int(v) for v in id_colors[oid % 256])
                cv2.rectangle(vis, (x1, y1), (x2, y2), c, 2)
                cv2.putText(vis, f"id{oid} {d['scores'][i]:.2f}",
                            (x1, y1 - 3), cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1)
        if writer is None:
            writer = cv2.VideoWriter(
                args.out, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                (vis.shape[1], vis.shape[0]))
        writer.write(vis)
        fi += 1
    cap.release()
    if writer is not None:
        writer.release()
    print(f"wrote {args.out} ({fi} frames)")


if __name__ == "__main__":
    main()
