"""Proposal-recall (AR@N) tests: handcrafted cases + parity vs the
reference's own recall code (core/evaluation/recall.py, loaded from
/root/reference with stubs) + the fast_eval_recall dataset plumbing."""

import json
import os
import sys

import numpy as np
import pytest

from sipmask_tpu.eval.recall import (bbox_overlaps_plus1, eval_recalls,
                                     fast_eval_recall)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_loader import reference_available  # noqa: E402

REF_EVAL = "/root/reference/SipMask-mmdetection/mmdet/core/evaluation"


def _load_reference_recall():
    """Load the reference's recall.py + bbox_overlaps.py with the minimal
    stubs (terminaltables, mmdet.utils.print_log) they import."""
    from reference_loader import _stub_module, _load_file

    class _Table:
        def __init__(self, rows):
            self.table = str(rows)

    _stub_module("terminaltables", AsciiTable=_Table)
    _stub_module("mmdet", is_pkg=True)
    _stub_module("mmdet.utils", print_log=lambda *a, **k: None)
    _stub_module("mmdet.core", is_pkg=True)
    _stub_module("mmdet.core.evaluation", is_pkg=True)
    bo = _load_file("mmdet.core.evaluation.bbox_overlaps",
                    f"{REF_EVAL}/bbox_overlaps.py")
    sys.modules["mmdet.core.evaluation"].bbox_overlaps = bo
    rec = _load_file("mmdet.core.evaluation.recall", f"{REF_EVAL}/recall.py")
    return rec


class TestRecallBasics:
    def test_perfect_proposals_ar1(self):
        gts = [np.array([[0, 0, 9, 9], [20, 20, 39, 39]], np.float32)]
        props = [np.array([[0, 0, 9, 9, 0.9], [20, 20, 39, 39, 0.8]],
                          np.float32)]
        r = eval_recalls(gts, props, proposal_nums=(1, 2),
                         iou_thrs=(0.5, 0.95), verbose=False)
        # top-1 proposal can only match one of the two gts
        np.testing.assert_allclose(r[0], [0.5, 0.5])
        np.testing.assert_allclose(r[1], [1.0, 1.0])

    def test_no_proposals_ar0(self):
        gts = [np.array([[0, 0, 9, 9]], np.float32)]
        r = eval_recalls(gts, [np.zeros((0, 5), np.float32)],
                         proposal_nums=(100,), iou_thrs=(0.5,),
                         verbose=False)
        assert r[0, 0] == 0.0

    def test_greedy_matching_is_one_to_one(self):
        # one proposal overlapping both gts: only one gt may claim it
        gts = [np.array([[0, 0, 9, 9], [5, 0, 14, 9]], np.float32)]
        props = [np.array([[0, 0, 9, 9, 0.9]], np.float32)]
        r = eval_recalls(gts, props, proposal_nums=(10,), iou_thrs=(0.4,),
                         verbose=False)
        assert r[0, 0] == 0.5

    def test_plus1_iou_convention(self):
        a = np.array([[0, 0, 9, 9]], np.float32)
        np.testing.assert_allclose(bbox_overlaps_plus1(a, a), [[1.0]])
        b = np.array([[5, 0, 14, 9]], np.float32)
        # widths are 10 px (+1 conv): inter 5*10, union 150
        np.testing.assert_allclose(bbox_overlaps_plus1(a, b),
                                   [[50.0 / 150.0]], rtol=1e-6)


@pytest.mark.skipif(not reference_available(),
                    reason="/root/reference not present")
class TestRecallReferenceParity:
    def test_random_scenes_match_reference(self):
        rec = _load_reference_recall()
        rng = np.random.RandomState(7)
        gts, props = [], []
        for i in range(12):
            ng = rng.randint(0, 6)
            g = rng.rand(ng, 4) * 100
            g = np.stack([np.minimum(g[:, 0], g[:, 2]),
                          np.minimum(g[:, 1], g[:, 3]),
                          np.maximum(g[:, 0], g[:, 2]) + 5,
                          np.maximum(g[:, 1], g[:, 3]) + 5],
                         -1).astype(np.float32) if ng else np.zeros(
                             (0, 4), np.float32)
            npr = rng.randint(0, 40)
            p = rng.rand(npr, 4) * 100
            p = np.stack([np.minimum(p[:, 0], p[:, 2]),
                          np.minimum(p[:, 1], p[:, 3]),
                          np.maximum(p[:, 0], p[:, 2]) + 5,
                          np.maximum(p[:, 1], p[:, 3]) + 5],
                         -1).astype(np.float32) if npr else np.zeros(
                             (0, 4), np.float32)
            scores = rng.rand(len(p), 1).astype(np.float32)
            gts.append(g)
            props.append(np.concatenate([p, scores], -1))
        nums = (1, 5, 20)
        thrs = (0.3, 0.5, 0.7)
        # the reference's eval_recalls wrapper crashes on modern numpy
        # (np.array over a ragged IoU list, recall.py:103); reproduce its
        # preprocessing (score sort + top-N slice + +1 IoU) verbatim and
        # drive its core _recalls protocol directly
        bo = sys.modules["mmdet.core.evaluation.bbox_overlaps"].bbox_overlaps
        all_ious = np.empty((len(gts),), object)
        for i, (g, p) in enumerate(zip(gts, props)):
            p = p[np.argsort(p[:, 4])[::-1]]
            prop_num = min(p.shape[0], max(nums))
            if g.shape[0] == 0:
                all_ious[i] = np.zeros((0, p.shape[0]), np.float32)
            else:
                all_ious[i] = bo(g, p[:prop_num, :4])
        want = rec._recalls(all_ious, np.asarray(nums), np.asarray(thrs))
        got = eval_recalls(gts, props, proposal_nums=nums, iou_thrs=thrs,
                           verbose=False)
        np.testing.assert_allclose(got, want, atol=1e-9)


class TestFastEvalRecall:
    def test_dataset_plumbing(self, tmp_path):
        import cv2
        from sipmask_tpu.data import CocoDataset

        rng = np.random.RandomState(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        images, anns = [], []
        for i in range(3):
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.randint(0, 255, (60, 80, 3), np.uint8))
            images.append(dict(id=i + 1, file_name=f"{i}.jpg",
                               width=80, height=60))
            anns.append(dict(id=i + 1, image_id=i + 1, category_id=1,
                             bbox=[10, 10, 20, 20], area=400, iscrowd=0,
                             segmentation=[[10, 10, 30, 10, 30, 30,
                                            10, 30]]))
        ann_file = tmp_path / "ann.json"
        ann_file.write_text(json.dumps(dict(
            images=images, annotations=anns,
            categories=[dict(id=1, name="a")])))
        ds = CocoDataset(str(ann_file), str(img_dir), test_mode=True,
                         min_size=1)
        # detections: exact on images 1-2, nothing on image 3
        results = [dict(image_id=1, bbox=[10, 10, 20, 20], score=0.9),
                   dict(image_id=2, bbox=[10, 10, 20, 20], score=0.8)]
        ar = fast_eval_recall(results, ds, proposal_nums=(1,),
                              iou_thrs=(0.5,), verbose=False)
        np.testing.assert_allclose(ar, [[2.0 / 3.0]])
