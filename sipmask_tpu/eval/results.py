"""Host post-processing: device decode outputs -> COCO-format results.

The reference's per-detection host loop (sipmask_head.py:645-657): bilinear
resize of the stride-2 masks to the original image size, threshold 0.4, RLE
encode. Also ``bbox2result``-style grouping (mmdet/core/bbox/transforms.py:
181) collapsed into flat COCO result dicts.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import cv2

from ..native import encode_mask  # C++ codec, numpy fallback inside


def postprocess_batch(dets: Dict[str, np.ndarray], image_ids, ori_shapes,
                      label2cat, mask_thr: float = 0.4,
                      n_valid: Optional[int] = None) -> List[dict]:
    """Args:
      dets: decode_batch output pulled to host (numpy): boxes (B, D, 4) in
        original coords, scores, labels, valid, masks (B, D, Hm, Wm) sigmoid
        probs at the stride-2 input grid [+ mask_scores].
      ori_shapes: (B, 2) original (h, w).
      label2cat: contiguous label (1-based) -> COCO category id.
    Returns flat list of COCO result dicts (bbox xywh + segmentation RLE).
    """
    results = []
    b = dets["boxes"].shape[0]
    n = b if n_valid is None else n_valid
    has_ms = "mask_scores" in dets
    for i in range(n):
        valid = np.asarray(dets["valid"][i]).astype(bool)
        if not valid.any():
            continue
        boxes = np.asarray(dets["boxes"][i])[valid]
        scores = np.asarray(dets["scores"][i])[valid]
        labels = np.asarray(dets["labels"][i])[valid]
        masks = np.asarray(dets["masks"][i])[valid]
        mscores = (np.asarray(dets["mask_scores"][i])[valid]
                   if has_ms else None)
        oh, ow = int(ori_shapes[i][0]), int(ori_shapes[i][1])
        img_id = int(image_ids[i])
        # stride-2 grid covers the padded input; the ori image maps to the
        # top-left (input_hw / scale) region -> resize the full grid by
        # 2/scale and crop to (oh, ow) (the reference's F.interpolate by
        # scale/scale_factor + pad-to-ori, :627-654)
        for d in range(len(boxes)):
            x1, y1, x2, y2 = boxes[d]
            res = dict(image_id=img_id,
                       category_id=int(label2cat[int(labels[d]) + 1]),
                       bbox=[float(x1), float(y1),
                             float(x2 - x1), float(y2 - y1)],
                       score=float(mscores[d] if has_ms else scores[d]))
            res["det_score"] = float(scores[d])
            results.append(res)
        # vectorized mask resize: scale factors per image are uniform
        mh, mw = masks.shape[1:]
        sx = dets.get("scale_factors")
        # target: masks at ori resolution
        up = np.zeros((len(boxes), oh, ow), np.uint8)
        for d in range(len(boxes)):
            mm = cv2.resize(masks[d].astype(np.float32), None,
                            fx=2.0 / _sf(dets, i, 0), fy=2.0 / _sf(dets, i, 1),
                            interpolation=cv2.INTER_LINEAR)
            hh, ww = min(oh, mm.shape[0]), min(ow, mm.shape[1])
            up[d, :hh, :ww] = mm[:hh, :ww] > mask_thr
        for d, r in zip(range(len(boxes)), results[-len(boxes):]):
            r["segmentation"] = encode_mask(up[d])
    return results


def _sf(dets, i, axis):
    sf = dets.get("scale_factors")
    if sf is None:
        return 1.0
    return float(np.asarray(sf)[i][axis])
