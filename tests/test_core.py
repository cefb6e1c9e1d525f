"""Unit tests for core box math, points, targets, and losses.

Parity oracles: small numpy/torch re-derivations of the reference formulas
(sipmask_head.py / iou_loss.py / geometry.py), hand-checked values.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sipmask_tpu.core import (bbox_overlaps, distance2bbox, center_size,
                              level_points, all_points, fcos_targets,
                              centerness_target, losses)


class TestBoxes:
    def test_bbox_overlaps_reference_values(self):
        # values from the docstring example of mmdet geometry.py
        b1 = jnp.array([[0, 0, 10, 10], [10, 10, 20, 20], [32, 32, 38, 42]],
                       jnp.float32)
        b2 = jnp.array([[0, 0, 10, 20], [0, 10, 10, 19], [10, 10, 20, 20]],
                       jnp.float32)
        ious = np.asarray(bbox_overlaps(b1, b2))
        expect = np.array([[0.5238, 0.0500, 0.0041],
                           [0.0323, 0.0452, 1.0000],
                           [0.0000, 0.0000, 0.0000]])
        np.testing.assert_allclose(ious, expect, atol=1e-3)

    def test_aligned_matches_pairwise_diag(self):
        rng = np.random.RandomState(0)
        a = rng.rand(8, 4).astype(np.float32) * 50
        a[:, 2:] += a[:, :2]
        b = rng.rand(8, 4).astype(np.float32) * 50
        b[:, 2:] += b[:, :2]
        full = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
        al = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b),
                                      is_aligned=True))
        np.testing.assert_allclose(np.diag(full), al, rtol=1e-6)

    def test_distance2bbox_roundtrip(self):
        pts = jnp.array([[100., 100.], [8., 16.]])
        dist = jnp.array([[10., 20., 30., 40.], [1., 2., 3., 4.]])
        boxes = distance2bbox(pts, dist)
        np.testing.assert_allclose(
            np.asarray(boxes), [[90, 80, 130, 140], [7, 14, 11, 20]])
        clipped = distance2bbox(pts, dist, max_shape=(120, 120))
        assert np.asarray(clipped).max() <= 119

    def test_center_size(self):
        b = jnp.array([[0., 0., 10., 20.]])
        np.testing.assert_allclose(np.asarray(center_size(b)),
                                   [[5, 10, 10, 20]])


class TestPoints:
    def test_level_points_stride8(self):
        pts = np.asarray(level_points(2, 3, 8))
        # reference: arange(0, w*s, s) + s//2 -> x in {4,12,20}, y in {4,12}
        expect = [[4, 4], [12, 4], [20, 4], [4, 12], [12, 12], [20, 12]]
        np.testing.assert_allclose(pts, expect)

    def test_all_points_concat(self):
        pts, strides, rngs = all_points([(4, 4), (2, 2)], [8, 16],
                                        [(-1, 64), (64, 128)])
        assert pts.shape == (20, 2) and strides.shape == (20,)
        assert float(strides[0]) == 8 and float(strides[-1]) == 16
        np.testing.assert_allclose(np.asarray(rngs[0]), [-1, 64])
        np.testing.assert_allclose(np.asarray(rngs[-1]), [64, 128])


def _numpy_fcos_reference(gt_bboxes, gt_labels, points, regress_ranges,
                          strides, center_sampling, radius):
    """Direct numpy transcription of sipmask_head.py:773-857 for the oracle."""
    INF = 1e8
    P, G = len(points), len(gt_labels)
    areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0] + 1) * \
            (gt_bboxes[:, 3] - gt_bboxes[:, 1] + 1)
    areas = np.where(gt_labels > 0, areas, INF)
    areas = np.tile(areas[None], (P, 1)).astype(np.float64)
    xs, ys = points[:, 0:1], points[:, 1:2]
    l = xs - gt_bboxes[None, :, 0]
    r = gt_bboxes[None, :, 2] - xs
    t = ys - gt_bboxes[None, :, 1]
    b = gt_bboxes[None, :, 3] - ys
    tgt = np.stack([l, t, r, b], -1)
    if center_sampling:
        cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2
        cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
        sr = strides[:, None] * radius
        x1 = np.maximum(cx[None] - sr, gt_bboxes[None, :, 0])
        y1 = np.maximum(cy[None] - sr, gt_bboxes[None, :, 1])
        x2 = np.minimum(cx[None] + sr, gt_bboxes[None, :, 2])
        y2 = np.minimum(cy[None] + sr, gt_bboxes[None, :, 3])
        cb = np.stack([xs - x1, ys - y1, x2 - xs, y2 - ys], -1)
        inside = cb.min(-1) > 0
    else:
        inside = tgt.min(-1) > 0
    maxd = tgt.max(-1)
    in_range = (maxd >= regress_ranges[:, None, 0]) & \
               (maxd <= regress_ranges[:, None, 1])
    areas[~inside] = INF
    areas[~in_range] = INF
    min_area = areas.min(1)
    idx = areas.argmin(1)
    labels = gt_labels[idx]
    labels[min_area >= INF] = 0
    bbox_t = tgt[np.arange(P), idx]
    return labels, bbox_t, idx


class TestTargets:
    def _setup(self, center_sampling):
        rng = np.random.RandomState(42)
        featmaps = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
        strides_l = [8, 16, 32, 64, 128]
        ranges = [(-1, 64), (64, 128), (128, 256), (256, 512), (512, 1e8)]
        pts, strd, rr = all_points(featmaps, strides_l, ranges)
        G = 6
        boxes = rng.rand(G, 4).astype(np.float32) * 100
        boxes[:, 2:] = boxes[:, :2] + 10 + rng.rand(G, 2).astype(np.float32) * 60
        labels = rng.randint(1, 10, size=G).astype(np.int32)
        labels[-2:] = 0  # padded gts
        return pts, strd, rr, boxes, labels

    @pytest.mark.parametrize("center_sampling", [True, False])
    def test_matches_numpy_reference(self, center_sampling):
        pts, strd, rr, boxes, labels = self._setup(center_sampling)
        out = fcos_targets(jnp.asarray(boxes)[None], jnp.asarray(labels)[None],
                           pts, rr, strd, center_sampling, 1.5)
        ref_l, ref_t, ref_i = _numpy_fcos_reference(
            boxes.astype(np.float64), labels.copy(), np.asarray(pts),
            np.asarray(rr), np.asarray(strd), center_sampling, 1.5)
        np.testing.assert_array_equal(np.asarray(out["labels"][0]), ref_l)
        pos = ref_l > 0
        assert pos.sum() > 0, "test fixture should produce positives"
        np.testing.assert_allclose(np.asarray(out["bbox_targets"][0])[pos],
                                   ref_t[pos], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["gt_inds"][0])[pos],
                                      ref_i[pos])

    def test_all_padded_gts_gives_no_positives(self):
        pts, strd, rr, boxes, labels = self._setup(True)
        labels = np.zeros_like(labels)
        out = fcos_targets(jnp.asarray(boxes)[None], jnp.asarray(labels)[None],
                           pts, rr, strd, True, 1.5)
        assert int((out["labels"] > 0).sum()) == 0

    def test_centerness(self):
        t = jnp.array([[3., 3., 3., 3.], [1., 4., 4., 1.]])
        c = np.asarray(centerness_target(t))
        np.testing.assert_allclose(c, [1.0, np.sqrt(0.25 * 0.25)], rtol=1e-6)


class TestLosses:
    def test_focal_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        logits = rng.randn(50, 10).astype(np.float32)
        labels = rng.randint(0, 11, size=50).astype(np.int32)  # 0 = bg

        # torch oracle: mmdet py_sigmoid_focal_loss
        tl = torch.tensor(logits)
        t = torch.zeros(50, 10)
        fg = labels > 0
        t[torch.tensor(fg), torch.tensor(labels[fg] - 1).long()] = 1.0
        p = tl.sigmoid()
        pt = (1 - p) * t + p * (1 - t)
        w = (0.25 * t + 0.75 * (1 - t)) * pt ** 2.0
        bce = torch.nn.functional.binary_cross_entropy_with_logits(
            tl, t, reduction="none")
        expect = float((bce * w).sum() / 17.0)

        got = float(losses.sigmoid_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels), 10, 2.0, 0.25,
            avg_factor=17.0))
        assert abs(got - expect) < 1e-4

    def test_iou_loss_perfect_box_is_zero(self):
        b = jnp.array([[0., 0., 10., 10.]])
        assert float(losses.iou_loss(b, b)) < 1e-5
        assert float(losses.giou_loss(b, b)) < 1e-5

    def test_iou_loss_weighted_avg(self):
        p = jnp.array([[0., 0., 10., 10.], [0., 0., 10., 10.]])
        t = jnp.array([[0., 0., 10., 10.], [5., 5., 10., 10.]])
        w = jnp.array([0.0, 2.0])
        lw = float(losses.iou_loss(p, t, weight=w, avg_factor=2.0))
        iou = (6 * 6) / (11 * 11 + 6 * 6 - 36)
        assert abs(lw - (-np.log(iou) * 2 / 2)) < 1e-4

    def test_bce_with_logits_vs_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(1)
        x = rng.randn(40).astype(np.float32)
        t = (rng.rand(40) > 0.5).astype(np.float32)
        expect = float(torch.nn.functional.binary_cross_entropy_with_logits(
            torch.tensor(x), torch.tensor(t), reduction="sum"))
        got = float(losses.bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
        assert abs(got - expect) < 1e-3

    def test_binary_cross_entropy_zero_zero(self):
        # BCE(p=0, t=0) must be exactly 0 (pixels outside boxes)
        v = float(losses.binary_cross_entropy(jnp.zeros(3), jnp.zeros(3)).sum())
        assert v == 0.0


class TestAssignersSamplers:
    def test_max_iou_assign(self):
        import jax.numpy as jnp
        from sipmask_tpu.core.assigners import max_iou_assign
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 9, 9], [50, 50, 60, 60],
                             [100, 100, 101, 101]], jnp.float32)
        gts = jnp.asarray([[0, 0, 10, 10], [48, 48, 62, 62],
                           [0, 0, 0, 0]], jnp.float32)
        labels = jnp.asarray([3, 7, 0], jnp.int32)
        valid = jnp.asarray([True, True, False])
        r = max_iou_assign(boxes, gts, labels, valid)
        out = np.asarray(r.gt_inds)
        assert out[0] == 1            # exact match -> gt 1
        assert out[1] == 1            # IoU ~0.66 >= 0.5
        assert out[2] == 2            # good overlap with gt 2
        assert out[3] == 0            # no overlap -> negative
        assert np.asarray(r.labels).tolist() == [3, 3, 7, 0]

    def test_low_quality_match_claims_best_box(self):
        import jax.numpy as jnp
        from sipmask_tpu.core.assigners import max_iou_assign
        boxes = jnp.asarray([[0, 0, 30, 30]], jnp.float32)
        gts = jnp.asarray([[0, 0, 10, 10]], jnp.float32)  # IoU ~0.12
        r = max_iou_assign(boxes, gts, jnp.asarray([5], jnp.int32),
                           jnp.asarray([True]))
        assert int(r.gt_inds[0]) == 1  # claimed via low-quality match

    def test_random_sampler_caps_and_validity(self):
        import jax
        import jax.numpy as jnp
        from sipmask_tpu.core.assigners import (AssignResult, random_sample)
        gt_inds = jnp.asarray([1, 0, 0, 2, 0, -1, 0, 1], jnp.int32)
        a = AssignResult(gt_inds, jnp.zeros(8), jnp.zeros(8, jnp.int32))
        s = random_sample(a, jax.random.PRNGKey(0), num=6, pos_fraction=0.5)
        pos = np.asarray(s.pos_inds)[np.asarray(s.pos_valid)]
        neg = np.asarray(s.neg_inds)[np.asarray(s.neg_valid)]
        assert set(pos) <= {0, 3, 7} and len(pos) == 3
        assert set(neg) <= {1, 2, 4, 6} and len(neg) == 3
        assert not (set(pos) & set(neg))


class TestBoundedIoULoss:
    def test_zero_for_perfect_match_and_positive_otherwise(self):
        import jax.numpy as jnp
        from sipmask_tpu.core.losses import bounded_iou_loss
        t = jnp.asarray([[10.0, 10.0, 50.0, 30.0]])
        assert float(bounded_iou_loss(t, t)) < 1e-5
        p = jnp.asarray([[12.0, 11.0, 55.0, 28.0]])
        assert float(bounded_iou_loss(p, t)) > 0.0

    def test_weight_and_avg_factor(self):
        import jax.numpy as jnp
        from sipmask_tpu.core.losses import bounded_iou_loss
        t = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
        p = jnp.asarray([[1.0, 1.0, 12.0, 12.0], [1.0, 1.0, 12.0, 12.0]])
        full = float(bounded_iou_loss(p, t))
        half = float(bounded_iou_loss(p, t, weight=jnp.asarray([1.0, 0.0]),
                                      avg_factor=2.0))
        assert abs(half - full / 4) < 1e-6
