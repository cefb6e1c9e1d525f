"""Eval subsystem tests: RLE codec roundtrip + COCOeval sanity cases with
known AP values."""

import numpy as np
import pytest

from sipmask_tpu.eval.rle import (encode_mask, decode_mask, encode_counts,
                                  decode_counts, rle_area)
from sipmask_tpu.eval.coco_eval import (COCOEvaluator, bbox_iou_xywh,
                                        mask_iou, IOU_THRS)


class TestRLE:
    def test_roundtrip_random(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            m = (rng.rand(37, 53) > 0.5).astype(np.uint8)
            rle = encode_mask(m)
            np.testing.assert_array_equal(decode_mask(rle), m)
            assert rle_area(rle) == m.sum()

    def test_roundtrip_edge_cases(self):
        for m in [np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8)]:
            np.testing.assert_array_equal(decode_mask(encode_mask(m)), m)

    def test_counts_varint_roundtrip(self):
        runs = [0, 1, 5, 100000, 3, 7, 123456]
        got = decode_counts(encode_counts(runs))
        np.testing.assert_array_equal(got, runs)


class TestIoU:
    def test_bbox_iou_xywh(self):
        dt = np.array([[0, 0, 10, 10.]])
        gt = np.array([[5, 5, 10, 10.]])
        iou = bbox_iou_xywh(dt, gt, np.array([False]))
        assert abs(iou[0, 0] - 25 / 175) < 1e-9

    def test_crowd_iou_uses_dt_area(self):
        dt = np.array([[0, 0, 10, 10.]])
        gt = np.array([[0, 0, 100, 100.]])
        iou = bbox_iou_xywh(dt, gt, np.array([True]))
        assert abs(iou[0, 0] - 1.0) < 1e-9

    def test_mask_iou(self):
        a = np.zeros((20, 20), np.uint8); a[:10] = 1
        b = np.zeros((20, 20), np.uint8); b[5:15] = 1
        iou = mask_iou([a], [b], np.array([False]))
        assert abs(iou[0, 0] - 100 / 300) < 1e-6


def _ann_data(gts, images=None, cats=(1,)):
    images = images or [dict(id=1, width=100, height=100)]
    return dict(
        images=images,
        categories=[dict(id=c, name=str(c)) for c in cats],
        annotations=[dict(id=i + 1, ignore=0, **g) for i, g in enumerate(gts)])


class TestCOCOEval:
    def test_perfect_detections_ap1(self):
        gts = [dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20],
                    area=400, iscrowd=0),
               dict(image_id=1, category_id=1, bbox=[50, 50, 30, 30],
                    area=900, iscrowd=0)]
        ev = COCOEvaluator(None, "bbox", ann_data=_ann_data(gts))
        ev.update([dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20],
                        score=0.9),
                   dict(image_id=1, category_id=1, bbox=[50, 50, 30, 30],
                        score=0.8)])
        stats = ev.summarize(verbose=False)
        assert abs(stats["AP"] - 1.0) < 1e-6
        assert abs(stats["AR"] - 1.0) < 1e-6

    def test_iou_06_passes_3_thresholds(self):
        gts = [dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                    area=100, iscrowd=0)]
        ev = COCOEvaluator(None, "bbox", ann_data=_ann_data(gts))
        # dt [0,0,10,6]: inter 60, union 100+60-60=100 -> IoU 0.6
        ev.update([dict(image_id=1, category_id=1, bbox=[0, 0, 10, 6],
                        score=0.9)])
        stats = ev.summarize(verbose=False)
        assert abs(stats["AP50"] - 1.0) < 1e-6
        assert abs(stats["AP"] - 3 / 10) < 1e-6  # t in {.5,.55,.6}

    def test_false_positive_halves_precision(self):
        gts = [dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                    area=100, iscrowd=0)]
        ev = COCOEvaluator(None, "bbox", ann_data=_ann_data(gts))
        ev.update([
            dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10], score=0.9),
            dict(image_id=1, category_id=1, bbox=[60, 60, 10, 10], score=0.95),
        ])
        stats = ev.summarize(verbose=False)
        # high-scored FP first: precision at recall 1.0 is 1/2
        assert abs(stats["AP50"] - 0.5) < 0.02

    def test_crowd_gt_ignored_not_fp(self):
        gts = [dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                    area=100, iscrowd=1)]
        ev = COCOEvaluator(None, "bbox", ann_data=_ann_data(gts))
        ev.update([dict(image_id=1, category_id=1, bbox=[0, 0, 10, 10],
                        score=0.9)])
        p, r = ev.accumulate()
        # no non-ignore gt anywhere -> everything stays -1 (undefined)
        assert (p == -1).all()

    def test_segm_eval_perfect(self):
        gts = [dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20],
                    area=400, iscrowd=0,
                    segmentation=[[10, 10, 30, 10, 30, 30, 10, 30]])]
        ev = COCOEvaluator(None, "segm", ann_data=_ann_data(gts))
        from sipmask_tpu.data.coco import rasterize_polygons
        m = rasterize_polygons([[10, 10, 30, 10, 30, 30, 10, 30]], 100, 100)
        from sipmask_tpu.eval.rle import encode_mask
        ev.update([dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20],
                        segmentation=encode_mask(m), score=0.9)])
        stats = ev.summarize(verbose=False)
        assert abs(stats["AP"] - 1.0) < 1e-6

    def test_area_ranges(self):
        # one small (16x16=256 <1024) and one large gt (100x100)
        gts = [dict(image_id=1, category_id=1, bbox=[0, 0, 16, 16],
                    area=256, iscrowd=0),
               dict(image_id=1, category_id=1, bbox=[30, 30, 60, 60],
                    area=3600, iscrowd=0)]
        ev = COCOEvaluator(None, "bbox", ann_data=_ann_data(gts))
        ev.update([dict(image_id=1, category_id=1, bbox=[0, 0, 16, 16],
                        score=0.9)])  # only the small one detected
        stats = ev.summarize(verbose=False)
        assert abs(stats["APs"] - 1.0) < 1e-6
        assert abs(stats["APm"] - 0.0) < 1e-6
        assert abs(stats["AP"] - 0.5) < 0.01
