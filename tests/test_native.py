"""Native C++ maskops: parity against the numpy RLE reference
(sipmask_tpu/eval/rle.py) and against dense mask arithmetic."""

import numpy as np
import pytest

from sipmask_tpu import native
from sipmask_tpu.eval import rle as pyrle
from sipmask_tpu.eval.coco_eval import mask_iou
from sipmask_tpu.eval.ytvos_eval import track_iou


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("no C++ toolchain; numpy fallback covers the API")


def _rand_mask(rng, h, w):
    return (rng.rand(h, w) > rng.rand()).astype(np.uint8)


class TestCodecParity:
    def test_encode_decode_roundtrip(self, lib_ok):
        rng = np.random.RandomState(0)
        for _ in range(30):
            h, w = rng.randint(1, 70, 2)
            m = _rand_mask(rng, h, w)
            r_native = native.encode_mask(m)
            r_py = pyrle.encode_mask(m)
            assert r_native["counts"] == r_py["counts"]
            assert (native.decode_mask(r_native) == m).all()
            assert (pyrle.decode_mask(r_native) == m).all()
            assert native.rle_area(r_native) == int(m.sum())

    def test_edge_masks(self, lib_ok):
        for m in [np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8),
                  np.ones((1, 1), np.uint8), np.zeros((1, 1), np.uint8)]:
            r = native.encode_mask(m)
            assert r["counts"] == pyrle.encode_mask(m)["counts"]
            assert (native.decode_mask(r) == m).all()

    def test_uncompressed_counts_accepted(self, lib_ok):
        m = np.zeros((4, 6), np.uint8)
        m[1:3, 2:5] = 1
        runs = pyrle._runs(np.ascontiguousarray(m.T).reshape(-1))
        rle = {"size": [4, 6], "counts": runs.tolist()}
        assert (native.decode_mask(rle) == m).all()
        assert native.rle_area(rle) == int(m.sum())


class TestIoU:
    def test_iou_matrix_vs_dense(self, lib_ok):
        rng = np.random.RandomState(1)
        dts = [_rand_mask(rng, 40, 30) for _ in range(6)]
        gts = [_rand_mask(rng, 40, 30) for _ in range(4)]
        crowd = np.array([0, 1, 0, 1], np.uint8)
        got = native.iou_matrix([native.encode_mask(m) for m in dts],
                                [native.encode_mask(m) for m in gts], crowd)
        want = mask_iou(dts, gts, crowd.astype(bool))
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_inter_matrix(self, lib_ok):
        rng = np.random.RandomState(2)
        a = [_rand_mask(rng, 20, 20) for _ in range(3)]
        b = [_rand_mask(rng, 20, 20) for _ in range(2)]
        got = native.inter_matrix([native.encode_mask(m) for m in a],
                                  [native.encode_mask(m) for m in b])
        for i in range(3):
            for j in range(2):
                assert got[i, j] == float(np.bitwise_and(a[i], b[j]).sum())

    def test_empty_inputs(self):
        assert native.iou_matrix([], []).shape == (0, 0)
        assert native.inter_matrix([], [{"size": [2, 2], "counts": b"2"}]
                                   ).shape == (0, 1)


class TestTrackIoU:
    def test_track_iou_with_none_frames(self, lib_ok):
        rng = np.random.RandomState(3)
        h = w = 16
        d = [native.encode_mask(_rand_mask(rng, h, w)), None,
             native.encode_mask(_rand_mask(rng, h, w))]
        g = [native.encode_mask(_rand_mask(rng, h, w)),
             native.encode_mask(_rand_mask(rng, h, w)), None]
        got = track_iou(d, g, h, w)
        # manual dense computation
        inter = union = 0.0
        for ds, gs in zip(d, g):
            dm = None if ds is None else pyrle.decode_mask(ds)
            gm = None if gs is None else pyrle.decode_mask(gs)
            if dm is None and gm is None:
                continue
            if dm is None:
                union += gm.sum()
            elif gm is None:
                union += dm.sum()
            else:
                i = np.bitwise_and(dm, gm).sum()
                inter += i
                union += dm.sum() + gm.sum() - i
        assert abs(got - inter / max(union, 1e-9)) < 1e-9

    def test_identical_tracks(self, lib_ok):
        rng = np.random.RandomState(4)
        t = [native.encode_mask(_rand_mask(rng, 12, 12)) for _ in range(4)]
        assert abs(track_iou(t, t, 12, 12) - 1.0) < 1e-9


class TestGreedyMatch:
    def _py_match(self, ious, thrs, gt_ig, iscrowd):
        n_dt, n_gt = ious.shape
        dtm = np.zeros((len(thrs), n_dt), np.int32)
        dt_ig = np.zeros((len(thrs), n_dt), np.uint8)
        for ti, t in enumerate(thrs):
            gtm = np.zeros(n_gt, np.int32)
            for di in range(n_dt):
                best = min(t, 1 - 1e-10)
                m = -1
                for gi in range(n_gt):
                    if gtm[gi] > 0 and not iscrowd[gi]:
                        continue
                    if m > -1 and not gt_ig[m] and gt_ig[gi]:
                        break
                    if ious[di, gi] < best:
                        continue
                    best = ious[di, gi]
                    m = gi
                if m >= 0:
                    dtm[ti, di] = m + 1
                    dt_ig[ti, di] = gt_ig[m]
                    gtm[m] = di + 1
        return dtm, dt_ig

    def test_matches_python_reference(self, lib_ok):
        rng = np.random.RandomState(7)
        for _ in range(20):
            n_dt, n_gt = rng.randint(1, 12, 2)
            ious = rng.rand(n_dt, n_gt)
            gt_ig = (rng.rand(n_gt) < 0.3).astype(np.uint8)
            # sort gts ignore-last as the evaluator does
            order = np.argsort(gt_ig, kind="stable")
            gt_ig = gt_ig[order]
            ious = ious[:, order]
            crowd = (rng.rand(n_gt) < 0.2).astype(np.uint8)
            thrs = np.array([0.3, 0.5, 0.75])
            got = native.greedy_match(ious, thrs, gt_ig, crowd)
            want = self._py_match(ious, thrs, gt_ig, crowd)
            np.testing.assert_array_equal(got[0], want[0])
            np.testing.assert_array_equal(got[1], want[1])

    def test_empty(self):
        dtm, dt_ig = native.greedy_match(np.zeros((0, 0)),
                                         np.array([0.5]),
                                         np.zeros(0, np.uint8),
                                         np.zeros(0, np.uint8))
        assert dtm.shape == (1, 0)
