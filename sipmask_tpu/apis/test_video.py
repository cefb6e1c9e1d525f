"""VIS video inference driver (SipMask-VIS tools/test_video.py +
results2json_videoseg, coco_utils.py:205-246).

Streams each video frame-by-frame (batch 1, the reference's protocol),
threads the fixed-capacity tracker state through a jitted per-frame step,
and aggregates per-object tracks: mean score, majority-vote category,
per-frame RLE or None.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import cv2

from ..config import SipMaskConfig
from ..data.transforms import TestTransform
from ..native import encode_mask  # C++ codec, numpy fallback inside
from ..models.decode import decode_batch
from ..models.track import (tracker_init, tracker_step, extract_center_feats)


def run_video_inference(model, variables, cfg: SipMaskConfig, dataset,
                        progress: bool = True) -> List[dict]:
    """Returns YTVIS-format results: video_id, score, category_id,
    segmentations (per-frame RLE dicts or None)."""
    transform = TestTransform(cfg.data)
    max_tracks = cfg.model.track.max_tracks
    coeff = cfg.model.track.match_coeff

    @jax.jit
    def infer(variables, images, img_shapes, scale_factors):
        out = model.apply(variables, images)
        dets = decode_batch(out, img_shapes, scale_factors, cfg.model)
        # embeddings at detection centers, input-resized coords (:617-619)
        boxes_in = dets["boxes"][0] * scale_factors[0][None, :]
        feats = extract_center_feats(out["track_feats"][0], boxes_in)
        return dets, feats

    @jax.jit
    def step(state, boxes, scores, labels, valid, feats, is_first):
        return tracker_step(state, boxes, scores, labels, valid, feats,
                            is_first, match_coeff=coeff)

    results = []
    for video_id, vid_idx, n_frames in dataset.iter_videos():
        state = tracker_init(max_tracks)
        vid_objs = {}
        for fi in range(n_frames):
            img = dataset.load_frame(vid_idx, fi)
            s = transform(img)
            dets, feats = infer(variables, jnp.asarray(s.image[None]),
                                jnp.asarray(s.img_shape[None]),
                                jnp.asarray(s.scale_factor[None]))
            state, obj_ids = step(
                state, dets["boxes"][0], dets["scores"][0],
                dets["labels"][0], dets["valid"][0], feats,
                jnp.asarray(fi == 0))
            obj_ids = np.asarray(obj_ids)
            d = {k: np.asarray(v[0]) for k, v in dets.items()}
            oh, ow = s.ori_shape
            for i in range(len(obj_ids)):
                oid = int(obj_ids[i])
                if oid < 0 or not d["valid"][i]:
                    continue
                mm = cv2.resize(d["masks"][i].astype(np.float32), None,
                                fx=2.0 / s.scale_factor[0],
                                fy=2.0 / s.scale_factor[1],
                                interpolation=cv2.INTER_LINEAR)
                full = np.zeros((oh, ow), np.uint8)
                hh, ww = min(oh, mm.shape[0]), min(ow, mm.shape[1])
                full[:hh, :ww] = mm[:hh, :ww] > cfg.model.test.mask_thr
                o = vid_objs.setdefault(oid, dict(scores=[], cats=[],
                                                  segms={}))
                o["scores"].append(float(d["scores"][i]))
                o["cats"].append(int(d["labels"][i]))
                o["segms"][fi] = encode_mask(full)  # det order overwrites
        for oid, o in vid_objs.items():
            results.append(dict(
                video_id=video_id,
                score=float(np.mean(o["scores"])),
                category_id=int(np.bincount(o["cats"]).argmax()) + 1,
                segmentations=[o["segms"].get(fi) for fi in range(n_frames)]))
        overflow = int(state.overflow)
        if overflow:
            print(f"  WARNING video {video_id}: tracker capacity "
                  f"({max_tracks}) exceeded, {overflow} LRU eviction(s) — "
                  "raise model.track.max_tracks for crowded videos",
                  flush=True)
        if progress:
            print(f"  video {video_id}: {len(vid_objs)} tracks", flush=True)
    return results
