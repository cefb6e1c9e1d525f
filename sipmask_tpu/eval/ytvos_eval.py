"""YouTube-VIS evaluation (YTVOSeval reimplementation).

The reference imports pycocotools.ytvoseval from an un-vendored submodule
(SipMask-VIS/mmdet/core/evaluation/coco_utils.py:5-11) — reimplemented here:
track-level evaluation where IoU between a predicted and gt track is
spatio-temporal (sum over frames of intersections / sum of unions; frames
where either mask is None count via the other's area). Matching/AP protocol
mirrors COCOeval (greedy per (video, category), IoU 0.5:0.05:0.95,
101-point AP). Note: the official YT-VIS val server gt is withheld
(reference README:157); this evaluator works on any labeled split.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import List, Optional

import numpy as np

from .rle import decode_mask
from .coco_eval import IOU_THRS, REC_THRS, MAX_DETS


def _seg_to_mask(seg, h, w):
    if seg is None:
        return None
    if isinstance(seg, dict):
        return decode_mask(seg).astype(np.uint8)
    from ..data.coco import rasterize_polygons
    return rasterize_polygons(seg, h, w)


def track_iou(dt_segs, gt_segs, h, w, iscrowd=False) -> float:
    """Spatio-temporal IoU of two tracks (lists of per-frame masks/None)."""
    inter = 0.0
    union = 0.0
    for d, g in zip(dt_segs, gt_segs):
        dm = _seg_to_mask(d, h, w)
        gm = _seg_to_mask(g, h, w)
        if dm is None and gm is None:
            continue
        if dm is None:
            union += int(gm.sum())
            continue
        if gm is None:
            union += int(dm.sum())
            continue
        i = int(np.bitwise_and(dm, gm).sum())
        inter += i
        union += int(dm.sum()) + int(gm.sum()) - i
    if iscrowd:
        da = sum(int(_seg_to_mask(d, h, w).sum()) for d in dt_segs
                 if d is not None)
        return inter / max(da, 1e-9)
    return inter / max(union, 1e-9)


class YTVOSEvaluator:
    """Track-level mask AP on a labeled YT-VIS-format json."""

    AREA_RNG = {"all": (0.0, 1e10), "small": (0.0, 32 ** 2),
                "medium": (32 ** 2, 96 ** 2), "large": (96 ** 2, 1e10)}

    def __init__(self, ann_file: Optional[str] = None,
                 ann_data: Optional[dict] = None):
        data = ann_data if ann_data is not None else json.load(open(ann_file))
        self.videos = {v["id"]: v for v in data["videos"]}
        self.cat_ids = [c["id"] for c in data["categories"]]
        self.gts = defaultdict(list)
        for a in data.get("annotations", []):
            a = dict(a)
            a["ignore"] = a.get("ignore", 0) or a.get("iscrowd", 0)
            areas = [x for x in a.get("areas", []) if x]
            a["avg_area"] = float(np.mean(areas)) if areas else 0.0
            self.gts[(a["video_id"], a["category_id"])].append(a)
        self.dts = defaultdict(list)

    def update(self, results: List[dict]):
        for r in results:
            self.dts[(r["video_id"], r["category_id"])].append(r)

    def _evaluate_vid(self, vid, cat, area_rng):
        gts = self.gts.get((vid, cat), [])
        dts = self.dts.get((vid, cat), [])
        if not gts and not dts:
            return None
        v = self.videos[vid]
        h, w = v["height"], v["width"]
        gt_ig = np.asarray([g["ignore"] or g["avg_area"] < area_rng[0] or
                            g["avg_area"] > area_rng[1] for g in gts], bool)
        order_g = np.argsort(gt_ig, kind="stable")
        gts = [gts[i] for i in order_g]
        gt_ig = gt_ig[order_g]
        dts = sorted(dts, key=lambda d: -d["score"])[:MAX_DETS]
        iscrowd = np.asarray([g.get("iscrowd", 0) for g in gts], bool)

        ious = np.zeros((len(dts), len(gts)))
        for di, d in enumerate(dts):
            for gi, g in enumerate(gts):
                ious[di, gi] = track_iou(d["segmentations"],
                                         g["segmentations"], h, w,
                                         iscrowd=bool(iscrowd[gi]))
        t_n = len(IOU_THRS)
        dtm = np.zeros((t_n, len(dts)), np.int64)
        gtm = np.zeros((t_n, len(gts)), np.int64)
        dt_ig = np.zeros((t_n, len(dts)), bool)
        for ti, t in enumerate(IOU_THRS):
            for di in range(len(dts)):
                best = min(t, 1 - 1e-10)
                m = -1
                for gi in range(len(gts)):
                    if gtm[ti, gi] > 0 and not iscrowd[gi]:
                        continue
                    if m > -1 and not gt_ig[m] and gt_ig[gi]:
                        break
                    if ious[di, gi] < best:
                        continue
                    best = ious[di, gi]
                    m = gi
                if m == -1:
                    continue
                dt_ig[ti, di] = gt_ig[m]
                dtm[ti, di] = m + 1
                gtm[ti, m] = di + 1
        return dict(scores=np.asarray([d["score"] for d in dts]),
                    dtm=dtm, dt_ig=dt_ig, n_gt=int((~gt_ig).sum()))

    def summarize(self, verbose: bool = True):
        t_n, r_n = len(IOU_THRS), len(REC_THRS)
        aps = {}
        for an, rng_ in self.AREA_RNG.items():
            precision = -np.ones((t_n, r_n, len(self.cat_ids)))
            for ki, cat in enumerate(self.cat_ids):
                evs = [self._evaluate_vid(v, cat, rng_) for v in self.videos]
                evs = [e for e in evs if e is not None]
                if not evs:
                    continue
                scores = np.concatenate([e["scores"] for e in evs])
                order = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate([e["dtm"] for e in evs], 1)[:, order]
                dt_ig = np.concatenate([e["dt_ig"] for e in evs], 1)[:, order]
                n_gt = sum(e["n_gt"] for e in evs)
                if n_gt == 0:
                    continue
                tp_c = np.cumsum((dtm > 0) & ~dt_ig, 1).astype(float)
                fp_c = np.cumsum((dtm == 0) & ~dt_ig, 1).astype(float)
                for ti in range(t_n):
                    rc = tp_c[ti] / n_gt
                    pr = (tp_c[ti] / np.maximum(tp_c[ti] + fp_c[ti], 1e-12)
                          ).tolist()
                    for i in range(len(pr) - 1, 0, -1):
                        pr[i - 1] = max(pr[i - 1], pr[i])
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    q = np.zeros(r_n)
                    for rid, pid in enumerate(inds):
                        if pid < len(pr):
                            q[rid] = pr[pid]
                    precision[ti, :, ki] = q
            s = precision[precision > -1]
            aps[an] = float(s.mean()) if s.size else -1.0
            if an == "all":
                s50 = precision[0][precision[0] > -1]
                aps["AP50"] = float(s50.mean()) if s50.size else -1.0
                i75 = int(np.where(IOU_THRS == 0.75)[0][0])
                s75 = precision[i75][precision[i75] > -1]
                aps["AP75"] = float(s75.mean()) if s75.size else -1.0
        stats = {"AP": aps["all"], "AP50": aps["AP50"], "AP75": aps["AP75"],
                 "APs": aps["small"], "APm": aps["medium"], "APl": aps["large"]}
        if verbose:
            for k, v in stats.items():
                print(f"  ytvis {k:5s} = {v:.4f}")
        return stats
