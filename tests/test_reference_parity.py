"""Cross-framework parity: the reference's OWN pure-PyTorch code as oracle.

Loads /root/reference/SipMask-mmdetection modules via ``reference_loader``
(CUDA exts replaced by faithful pure-torch transcriptions; everything
semantic is the reference's source) and asserts numerical agreement with
this framework on shared random fixtures. This is the round-2 upgrade from
self-authored oracles to reference-authored oracles (VERDICT.md item 2).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

FEAT_SIZES = [(8, 12), (4, 6), (2, 3), (1, 2), (1, 1)]  # 64x96 input
STRIDES = (8, 16, 32, 64, 128)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def ref_head(ref):
    torch.manual_seed(0)
    return ref["make_head"](num_fg_classes=8, center_sampling=True)


def _rand_gts(rng, n, w=96, h=64):
    cx = rng.uniform(0.2, 0.8, n) * w
    cy = rng.uniform(0.2, 0.8, n) * h
    bw = rng.uniform(0.1, 0.7, n) * w
    bh = rng.uniform(0.1, 0.7, n) * h
    boxes = np.stack([np.clip(cx - bw / 2, 0, w - 1),
                      np.clip(cy - bh / 2, 0, h - 1),
                      np.clip(cx + bw / 2, 0, w - 1),
                      np.clip(cy + bh / 2, 0, h - 1)], -1).astype(np.float32)
    labels = rng.randint(1, 9, n).astype(np.int64)
    return boxes, labels


class TestPointsParity:
    def test_points_and_strides(self, ref_head):
        from sipmask_tpu.core.points import all_points
        pts_ref, strides_ref = ref_head.get_points(
            FEAT_SIZES, torch.float32, "cpu")
        pts, strides, _ = all_points(FEAT_SIZES, STRIDES)
        np.testing.assert_array_equal(
            np.asarray(pts), torch.cat(pts_ref).numpy())
        np.testing.assert_array_equal(
            np.asarray(strides), torch.cat(strides_ref).numpy())


class TestFcosTargetParity:
    @pytest.mark.parametrize("center_sampling", [True, False])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_assignment(self, ref, center_sampling, seed):
        from sipmask_tpu.core.points import all_points
        from sipmask_tpu.core.targets import fcos_targets_single
        torch.manual_seed(0)
        head = ref["make_head"](num_fg_classes=8,
                                center_sampling=center_sampling)
        rng = np.random.RandomState(seed)
        boxes_np, labels_np = _rand_gts(rng, n=5)

        pts_ref, _ = head.get_points(FEAT_SIZES, torch.float32, "cpu")
        labels_r, tgts_r, _, _, gt_inds_r = head.fcos_target(
            pts_ref, [torch.from_numpy(boxes_np)],
            [torch.from_numpy(labels_np)])
        # reference returns per-level (single image): cat to level-major (P,)
        labels_r = torch.cat(labels_r).numpy()
        tgts_r = torch.cat(tgts_r).numpy()
        gt_inds_r = gt_inds_r[0].numpy()  # positives only, in point order

        points, strides, ranges = all_points(FEAT_SIZES, STRIDES,
                                             regress_ranges=tuple(
                                                 head.regress_ranges))
        out = fcos_targets_single(
            jnp.asarray(boxes_np), jnp.asarray(labels_np.astype(np.int32)),
            points, ranges, strides, center_sampling, 1.5)
        labels_j = np.asarray(out["labels"])
        tgts_j = np.asarray(out["bbox_targets"])
        gt_inds_j = np.asarray(out["gt_inds"])

        np.testing.assert_array_equal(labels_j, labels_r)
        np.testing.assert_allclose(tgts_j, tgts_r, rtol=1e-6, atol=1e-5)
        pos = labels_j > 0
        assert pos.sum() == len(gt_inds_r)
        np.testing.assert_array_equal(gt_inds_j[pos], gt_inds_r)

    def test_centerness(self, ref_head):
        from sipmask_tpu.core.targets import centerness_target
        rng = np.random.RandomState(3)
        ltrb = rng.uniform(1, 60, (40, 4)).astype(np.float32)
        want = ref_head.centerness_target(torch.from_numpy(ltrb)).numpy()
        got = np.asarray(centerness_target(jnp.asarray(ltrb)))
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestBoxMathParity:
    def test_distance2bbox(self, ref):
        from sipmask_tpu.core.boxes import distance2bbox
        rng = np.random.RandomState(4)
        pts = rng.uniform(0, 100, (30, 2)).astype(np.float32)
        dist = rng.uniform(0, 50, (30, 4)).astype(np.float32)
        want = ref["core"].distance2bbox(
            torch.from_numpy(pts), torch.from_numpy(dist),
            max_shape=(64, 96)).numpy()
        got = np.asarray(distance2bbox(jnp.asarray(pts), jnp.asarray(dist),
                                       max_shape=(64, 96)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_bbox_overlaps(self, ref):
        from sipmask_tpu.core.boxes import bbox_overlaps
        rng = np.random.RandomState(5)
        a, _ = _rand_gts(rng, 12)
        b, _ = _rand_gts(rng, 12)
        want = ref["core"].bbox_overlaps(
            torch.from_numpy(a), torch.from_numpy(b)).numpy()
        got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        want_al = ref["core"].bbox_overlaps(
            torch.from_numpy(a), torch.from_numpy(b), is_aligned=True).numpy()
        got_al = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b),
                                          is_aligned=True))
        np.testing.assert_allclose(got_al, want_al, rtol=1e-6)


def _boxes_off_half_grid(rng, n, h, w):
    """Boxes inside the grid whose half-split never lands in the [0, 0.05)
    band above an integer, where the CUDA (+0.1/2) and the python-fallback
    (exact midpoint) quadrant splits could disagree on a single pixel row."""
    x1 = rng.randint(1, w // 2, n) + 0.3
    y1 = rng.randint(1, h // 2, n) + 0.3
    x2 = x1 + rng.randint(2, w // 2 - 1, n)  # midpoint fraction: 0.3
    y2 = y1 + rng.randint(2, h // 2 - 1, n)
    return np.stack([x1, y1, x2, y2], -1).astype(np.float32)


class TestCropSplitParity:
    """Oracle = the reference's own pure-torch fallback (sipmask_head.py:56-105)."""

    def test_crop_split_vs_reference_fallback(self, ref):
        from sipmask_tpu.ops.crop_split import crop_split
        rng = np.random.RandomState(6)
        h, w, n = 16, 24, 7
        stack = rng.rand(4, h, w, n).astype(np.float32)
        boxes = _boxes_off_half_grid(rng, n, h, w)
        want = ref["head_mod"].crop_split(
            *[torch.from_numpy(stack[i]) for i in range(4)],
            torch.from_numpy(boxes)).numpy()
        got = np.asarray(crop_split(jnp.asarray(stack), jnp.asarray(boxes)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_crop_gt_vs_reference_fallback(self, ref):
        from sipmask_tpu.ops.crop_split import box_crop_mask
        rng = np.random.RandomState(7)
        h, w, n = 16, 24, 5
        gt = (rng.rand(h, w, n) > 0.5).astype(np.float32)
        boxes = _boxes_off_half_grid(rng, n, h, w)
        _, want = ref["head_mod"].crop_split(
            *[torch.from_numpy(np.zeros((h, w, n), np.float32))] * 4,
            torch.from_numpy(boxes), torch.from_numpy(gt))
        got = gt * np.asarray(box_crop_mask(jnp.asarray(boxes), h, w))
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-6)

    def test_cuda_transcription_matches_fallback(self, ref):
        """Sanity: the loader's CUDA-kernel transcription == the reference's
        own fallback away from the +0.05 half-split band."""
        import sys
        rng = np.random.RandomState(8)
        h, w, n = 16, 24, 6
        stack = torch.rand(4, h, w, n)
        boxes = torch.from_numpy(_boxes_off_half_grid(rng, n, h, w))
        cuda_like = sys.modules["mmdet.ops"].CropSplit(2)(stack, boxes)
        fallback = ref["head_mod"].crop_split(*stack.unbind(0), boxes)
        np.testing.assert_allclose(cuda_like.numpy(), fallback.numpy(),
                                   rtol=1e-6)


def _make_head_outputs(rng, b=2, nc=8, nb=32):
    sizes = FEAT_SIZES
    outs = dict(
        cls_scores=[rng.randn(b, h, w, nc).astype(np.float32)
                    for h, w in sizes],
        bbox_preds=[(rng.rand(b, h, w, 4) * 24 + 8).astype(np.float32)
                    for h, w in sizes],
        centernesses=[rng.randn(b, h, w, 1).astype(np.float32)
                      for h, w in sizes],
        cof_preds=[(rng.randn(b, h, w, nb * 4) * 0.1).astype(np.float32)
                   for h, w in sizes],
        feat_masks=rng.randn(b, 32, 48, nb).astype(np.float32),
    )
    return outs


class TestFullLossParity:
    """Handcrafted head outputs through the reference's own loss() vs this
    framework's compute_losses (same fixtures, fp32 CPU)."""

    def test_loss_scalars_match(self, ref, ref_head):
        from sipmask_tpu.config import get_config, _r
        from sipmask_tpu.models.loss import compute_losses
        from sipmask_tpu.utils import demo_batch

        rng = np.random.RandomState(11)
        b = 2
        outs = _make_head_outputs(rng, b=b)
        batch_np = demo_batch(batch_size=b, height=64, width=96, max_gts=8,
                              seed=13, num_classes=8)

        # ---- reference: NCHW torch tensors, per-image exact-length gt lists
        t = lambda x: torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        cls_scores = [t(x) for x in outs["cls_scores"]]
        bbox_preds = [t(x) for x in outs["bbox_preds"]]
        centernesses = [t(x) for x in outs["centernesses"]]
        cof_preds = [t(x) for x in outs["cof_preds"]]
        feat_masks = t(outs["feat_masks"])

        gt_bboxes, gt_labels, gt_masks_list = [], [], []
        for i in range(b):
            n = int((batch_np["gt_labels"][i] > 0).sum())
            gt_bboxes.append(torch.from_numpy(batch_np["gt_bboxes"][i, :n]))
            gt_labels.append(torch.from_numpy(
                batch_np["gt_labels"][i, :n].astype(np.int64)))
            # full-res gt masks: nearest-2x upsample of the stride-2 masks, so
            # the reference's 0.5 bilinear downsample reproduces them exactly
            m = batch_np["gt_masks"][i, :n].astype(np.float32)
            gt_masks_list.append(m.repeat(2, axis=1).repeat(2, axis=2))

        want = ref_head.loss(cls_scores, bbox_preds, centernesses, cof_preds,
                             feat_masks, gt_bboxes, gt_labels,
                             img_metas=[{}] * b, cfg=None,
                             gt_masks_list=gt_masks_list)
        want = {k: float(v) for k, v in want.items()}

        # ---- this framework
        cfg = get_config("sipmask_r50_fpn_gn_1x")
        head_cfg = _r(cfg, "model.head", num_classes=8).model.head
        outs_j = {k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                      else jnp.asarray(v)) for k, v in outs.items()}
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        got = jax.jit(lambda o, bt: compute_losses(o, bt, head_cfg,
                                                   max_pos=129))(outs_j, batch)
        got = {k: float(v) for k, v in got.items()}

        for k in ["loss_cls", "loss_bbox", "loss_centerness", "loss_mask"]:
            np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=1e-6,
                                       err_msg=k)
        assert want["loss_mask"] > 0  # the fixture must exercise the SP path


class TestBenchmarkLossParity:
    """Oracle = the benchmark fork's own SipMaskLossComputation
    (fcos_core/modeling/rpn/sipmask/loss.py, CPU paths), covering the fork's
    extras: fcos_core GIoU on normalized ltrb, max(num_pos,1) cls normalizer,
    NMS-0.9 mask-positive dedup, and the loss_mask>1 -> x0.5 cap."""

    def test_benchmark_loss_scalars_match(self):
        from reference_loader import load_reference_benchmark
        from sipmask_tpu.config import get_config, _r
        from sipmask_tpu.models.loss import compute_losses
        from sipmask_tpu.utils import demo_batch

        bench = load_reference_benchmark()
        rng = np.random.RandomState(17)
        b = 2
        outs = _make_head_outputs(rng, b=b)
        batch_np = demo_batch(batch_size=b, height=64, width=96, max_gts=8,
                              seed=19, num_classes=8)

        # ---- reference evaluator inputs (NCHW; box_regression is the
        # relu'd stride-normalized form the benchmark head emits in training)
        t = lambda x: torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        locations = []
        box_cls, box_reg, ctrn, cofs = [], [], [], []
        for lvl, (h, w) in enumerate(FEAT_SIZES):
            s = STRIDES[lvl]
            xs = torch.arange(0, w * s, s, dtype=torch.float32) + s // 2
            ys = torch.arange(0, h * s, s, dtype=torch.float32) + s // 2
            yy, xx = torch.meshgrid(ys, xs)
            locations.append(torch.stack(
                [xx.reshape(-1), yy.reshape(-1)], -1))
            box_cls.append(t(outs["cls_scores"][lvl]))
            box_reg.append(torch.relu(t(outs["bbox_preds"][lvl])) / s)
            ctrn.append(t(outs["centernesses"][lvl]))
            cofs.append(t(outs["cof_preds"][lvl]))
        feat_mask = t(outs["feat_masks"])

        targets = []
        for i in range(b):
            n = int((batch_np["gt_labels"][i] > 0).sum())
            m = batch_np["gt_masks"][i, :n].astype(np.float32)
            targets.append(bench["FakeBoxList"](
                torch.from_numpy(batch_np["gt_bboxes"][i, :n]),
                torch.from_numpy(batch_np["gt_labels"][i, :n].astype(np.int64)),
                torch.from_numpy(m.repeat(2, axis=1).repeat(2, axis=2))))

        ev = bench["make_loss_evaluator"]()
        cls_l, reg_l, ctr_l, mask_l = ev(locations, box_cls, box_reg, ctrn,
                                         cofs, feat_mask, targets)
        want = dict(loss_cls=float(cls_l), loss_bbox=float(reg_l),
                    loss_centerness=float(ctr_l), loss_mask=float(mask_l))

        # ---- this framework, benchmark preset loss config
        cfg = get_config("sipmask_benchmark_r50_fpn_1x")
        head_cfg = _r(cfg, "model.head", num_classes=8).model.head
        assert head_cfg.benchmark_loss_extras and \
            head_cfg.iou_loss_mode == "giou"
        outs_j = {k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                      else jnp.asarray(v)) for k, v in outs.items()}
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        got = jax.jit(lambda o, bt: compute_losses(o, bt, head_cfg,
                                                   max_pos=129))(outs_j, batch)
        got = {k: float(v) for k, v in got.items()}

        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=1e-6,
                                       err_msg=k)
        assert want["loss_mask"] > 0


class TestFastNmsParity:
    def test_fast_nms_keep_set(self, ref_head):
        from sipmask_tpu.ops.nms import fast_nms
        rng = np.random.RandomState(21)
        n, c, d = 120, 8, 16
        base, _ = _rand_gts(rng, n)
        # cluster boxes so suppression actually triggers
        boxes = np.concatenate([base[:60], base[:60] + rng.uniform(
            -3, 3, (60, 4)).astype(np.float32)])
        scores = (rng.rand(c, n) ** 2).astype(np.float32)
        cofs = rng.randn(n, d).astype(np.float32)

        rb, rl, rm = ref_head.fast_nms(
            torch.from_numpy(boxes), torch.from_numpy(scores),
            torch.from_numpy(cofs), iou_threshold=0.5, top_k=200,
            score_thr=0.1)
        out = fast_nms(jnp.asarray(boxes), jnp.asarray(scores),
                       jnp.asarray(cofs), iou_thr=0.5, top_k=200,
                       score_thr=0.1, max_out=100)
        valid = np.asarray(out["valid"])
        got_scores = np.asarray(out["scores"])[valid]
        got_boxes = np.asarray(out["boxes"])[valid]
        got_labels = np.asarray(out["labels"])[valid]
        got_cofs = np.asarray(out["cofs"])[valid]

        assert len(got_scores) == rb.shape[0]
        # both are globally sorted by score descending
        np.testing.assert_allclose(got_scores, rb[:, 4].numpy(), rtol=1e-6)
        np.testing.assert_allclose(got_boxes, rb[:, :4].numpy(), rtol=1e-6)
        np.testing.assert_array_equal(got_labels, rl.numpy())
        np.testing.assert_allclose(got_cofs, rm.numpy(), rtol=1e-6)


class TestMulticlassNmsIdxParity:
    def _run(self, seed, n=300, c=8, score_scale=1.0, pre_nms_top_n=1000):
        from sipmask_tpu.ops.nms import multiclass_nms_idx
        rng = np.random.RandomState(seed)
        base, _ = _rand_gts(rng, n)
        boxes = base + rng.uniform(-2, 2, (n, 4)).astype(np.float32)
        scores_fg = (rng.rand(n, c) ** 3 * score_scale).astype(np.float32)
        ctr = rng.rand(n).astype(np.float32)

        ref_core = load_reference()["core"]
        mscores = np.concatenate([np.zeros((n, 1), np.float32), scores_fg], 1)
        rb, rl, ridx = ref_core.multiclass_nms_idx(
            torch.from_numpy(boxes), torch.from_numpy(mscores),
            score_thr=0.05, nms_cfg=dict(type="nms", iou_thr=0.5),
            max_num=100, score_factors=torch.from_numpy(ctr))

        out = multiclass_nms_idx(jnp.asarray(boxes), jnp.asarray(scores_fg),
                                 score_thr=0.05, iou_thr=0.5, max_per_img=100,
                                 score_factors=jnp.asarray(ctr),
                                 pre_nms_top_n=pre_nms_top_n)
        valid = np.asarray(out["valid"])
        got = set(zip(np.asarray(out["idxs"])[valid].tolist(),
                      np.asarray(out["labels"])[valid].tolist()))
        want = set(zip(ridx.numpy().tolist(), rl.numpy().tolist()))
        return got, want, (np.sort(np.asarray(out["scores"])[valid])[::-1],
                           np.sort(rb[:, 4].numpy())[::-1])

    def test_keep_set_matches(self):
        got, want, (gs, ws) = self._run(seed=31)
        assert got == want
        np.testing.assert_allclose(gs, ws, rtol=1e-6)

    def test_keep_set_matches_dense_scores(self):
        """Crowded case: thousands of (box,class) pairs above score_thr
        (historically the static pre-NMS cap risk, VERDICT round-1 item 4;
        the hard path is now uncapped and exact)."""
        got, want, _ = self._run(seed=32, n=1000, c=8,
                                 pre_nms_top_n=8000)
        assert got == want

    @pytest.mark.parametrize("seed", [41, 42])
    def test_keep_set_matches_crowded_duplicates_default_cap(self, seed):
        """Trained-detector-like crowded scene: 120 objects x 25 duplicate
        boxes each, scores high on 1-2 classes per object, 80 classes.
        The hard path now runs the greedy loop over the FULL pair matrix
        (no cap), so the keep set matches the reference exactly on any
        input; this fixture documents the historical worst case for the
        old pre_nms_pairs truncation."""
        from sipmask_tpu.config import TestConfig
        from sipmask_tpu.ops.nms import multiclass_nms_idx
        rng = np.random.RandomState(seed)
        nclus, ndup, c = 120, 25, 80
        n = nclus * ndup
        cx = rng.uniform(.1, .9, nclus) * 960
        cy = rng.uniform(.1, .9, nclus) * 640
        bw = rng.uniform(.03, .2, nclus) * 960
        bh = rng.uniform(.03, .2, nclus) * 640
        boxes = np.stack([cx - bw / 2, cy - bh / 2,
                          cx + bw / 2, cy + bh / 2], -1)
        boxes = (np.repeat(boxes, ndup, 0)
                 + rng.uniform(-3, 3, (n, 4))).astype(np.float32)
        # focal-style scores: low everywhere, high on 1-2 classes per object
        scores = (rng.rand(nclus, c) * 0.04).astype(np.float32)
        for i in range(nclus):
            for j in rng.choice(c, rng.randint(1, 3), replace=False):
                scores[i, j] = rng.uniform(0.3, 0.95)
        scores = (np.repeat(scores, ndup, 0)
                  * rng.uniform(0.7, 1.0, (n, c))).astype(np.float32)
        ctr = rng.uniform(.3, 1, n).astype(np.float32)

        ref_core = load_reference()["core"]
        ms = np.concatenate([np.zeros((n, 1), np.float32), scores], 1)
        rb, rl, ridx = ref_core.multiclass_nms_idx(
            torch.from_numpy(boxes), torch.from_numpy(ms), score_thr=0.05,
            nms_cfg=dict(type="nms", iou_thr=0.5), max_num=100,
            score_factors=torch.from_numpy(ctr))
        want = set(zip(ridx.numpy().tolist(), rl.numpy().tolist()))

        cap = TestConfig().pre_nms_pairs
        o = multiclass_nms_idx(jnp.asarray(boxes), jnp.asarray(scores), 0.05,
                               0.5, 100, score_factors=jnp.asarray(ctr),
                               pre_nms_top_n=cap)
        v = np.asarray(o["valid"])
        got = set(zip(np.asarray(o["idxs"])[v].tolist(),
                      np.asarray(o["labels"])[v].tolist()))
        assert got == want


class TestRescoringLossParity:
    """SipMask++ ``loss_iou`` (sipmask_head.py:466-486) vs this framework's
    _rescoring_loss, with the rescoring tower weights shared through
    torch_convert so pred_iou comes from identical convolutions.

    Needs a 256x256 image (stride-2 grid 128): the reference's six
    stride-2 VALID convs shrink 128 -> 63 -> 31 -> 15 -> 7 -> 3 -> 1.
    """

    def test_loss_iou_matches(self, ref):
        from sipmask_tpu.config import get_config, _r
        from sipmask_tpu.models.loss import compute_losses
        from sipmask_tpu.models.sipmask_head import RescoringHead
        from sipmask_tpu.utils import demo_batch
        from sipmask_tpu.utils.torch_convert import torch_to_flax

        torch.manual_seed(2)
        head = ref["make_head"](num_fg_classes=8, center_sampling=True,
                                rescoring_flag=True)
        # randomize the tower beyond init so pred_iou is nontrivial
        g = torch.Generator().manual_seed(3)
        for m in head.convs_scoring:
            m.conv.weight.data.normal_(0, 0.05, generator=g)
            m.conv.bias.data.normal_(0, 0.2, generator=g)
        head.mask_scoring.weight.data.normal_(0, 0.2, generator=g)
        head.mask_scoring.bias.data.normal_(0, 0.3, generator=g)

        sizes = [(32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]
        rng = np.random.RandomState(23)
        b = 2
        outs = dict(
            cls_scores=[rng.randn(b, h, w, 8).astype(np.float32)
                        for h, w in sizes],
            bbox_preds=[(rng.rand(b, h, w, 4) * 60 + 20).astype(np.float32)
                        for h, w in sizes],
            centernesses=[rng.randn(b, h, w, 1).astype(np.float32)
                          for h, w in sizes],
            cof_preds=[(rng.randn(b, h, w, 128) * 0.1).astype(np.float32)
                       for h, w in sizes],
            feat_masks=rng.randn(b, 128, 128, 32).astype(np.float32),
        )
        batch_np = demo_batch(batch_size=b, height=256, width=256, max_gts=8,
                              seed=29, num_classes=8)

        t = lambda x: torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        gt_bboxes, gt_labels, gt_masks_list = [], [], []
        for i in range(b):
            n = int((batch_np["gt_labels"][i] > 0).sum())
            gt_bboxes.append(torch.from_numpy(batch_np["gt_bboxes"][i, :n]))
            gt_labels.append(torch.from_numpy(
                batch_np["gt_labels"][i, :n].astype(np.int64)))
            m = batch_np["gt_masks"][i, :n].astype(np.float32)
            gt_masks_list.append(m.repeat(2, axis=1).repeat(2, axis=2))
        with torch.no_grad():
            want = head.loss(
                [t(x) for x in outs["cls_scores"]],
                [t(x) for x in outs["bbox_preds"]],
                [t(x) for x in outs["centernesses"]],
                [t(x) for x in outs["cof_preds"]],
                t(outs["feat_masks"]), gt_bboxes, gt_labels,
                img_metas=[{}] * b, cfg=None, gt_masks_list=gt_masks_list)
        want = {k: float(v) for k, v in want.items()}
        assert want["loss_iou"] > 0

        cfg = get_config("sipmask_r50_fpn_gn_1x")
        head_cfg = _r(cfg, "model.head", num_classes=8,
                      rescoring=True).model.head
        sd = {f"bbox_head.{k}": v.detach().numpy()
              for k, v in head.state_dict().items() if "scoring" in k}
        params, _ = torch_to_flax(sd)
        rs = RescoringHead(num_classes=8)
        rescore_fn = lambda m: rs.apply({"params": params["rescoring"]}, m)

        outs_j = {k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                      else jnp.asarray(v)) for k, v in outs.items()}
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        got = jax.jit(lambda o, bt: compute_losses(
            o, bt, head_cfg, max_pos=129, rescore_fn=rescore_fn)
        )(outs_j, batch)
        got = {k: float(v) for k, v in got.items()}

        for k in ["loss_cls", "loss_bbox", "loss_centerness", "loss_mask"]:
            np.testing.assert_allclose(got[k], want[k], rtol=3e-4, atol=1e-6,
                                       err_msg=k)
        # loss_iou inherits (pred > 0.4) threshold sensitivity: a ~1e-6 fp
        # difference in one near-threshold pixel shifts that mask's
        # iou_target by ~1/area (the tower itself matches to 2e-7 — see the
        # direct comparison above in git history). 5e-3 still catches any
        # structural error (selection, normalizer, weighting, wrong input).
        np.testing.assert_allclose(got["loss_iou"], want["loss_iou"],
                                   rtol=5e-3, err_msg="loss_iou")


class TestSSDAugParity:
    """Bit-for-bit parity with the reference's OWN PhotoMetricDistortion /
    Expand / MinIoURandomCrop (transforms.py:460-720) under a shared
    MT19937 seed: our functions draw from the rng in the reference's exact
    order, so seeding np.random for the reference and RandomState(seed)
    for ours must produce identical images/boxes/labels/masks."""

    @staticmethod
    def _inputs(seed):
        r = np.random.RandomState(seed + 1000)
        h, w = int(r.randint(80, 160)), int(r.randint(80, 160))
        img = (r.rand(h, w, 3) * 255).astype(np.float32)
        n = int(r.randint(1, 6))
        x1 = r.uniform(0, w - 25, n)
        y1 = r.uniform(0, h - 25, n)
        x2 = np.minimum(x1 + r.uniform(5, w / 2, n), w - 1)
        y2 = np.minimum(y1 + r.uniform(5, h / 2, n), h - 1)
        boxes = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
        labels = r.randint(1, 10, n).astype(np.int64)
        masks = (r.rand(n, h, w) > 0.6).astype(np.uint8)
        return img, boxes, labels, masks

    def test_photometric_distortion_parity(self):
        from reference_loader import load_reference_transforms
        from sipmask_tpu.data.transforms import photometric_distortion
        T = load_reference_transforms()
        for seed in range(10):
            img, *_ = self._inputs(seed)
            np.random.seed(seed)
            ref = T.PhotoMetricDistortion()(dict(img=img.copy()))["img"]
            got = photometric_distortion(img.copy(),
                                         np.random.RandomState(seed))
            np.testing.assert_array_equal(got, ref)

    def test_expand_parity(self):
        from reference_loader import load_reference_transforms
        from sipmask_tpu.data.transforms import expand
        T = load_reference_transforms()
        mean = (102.9801, 115.9465, 122.7717)  # BGR, to_rgb=False (ssd_6x)
        for seed in range(10):
            img, boxes, _, masks = self._inputs(seed)
            np.random.seed(seed)
            res = T.Expand(mean=mean, to_rgb=False)(
                dict(img=img.copy(), gt_bboxes=boxes.copy(),
                     gt_masks=masks.copy(), img_shape=img.shape))
            gi, gb, gm = expand(img.copy(), boxes.copy(), masks.copy(),
                                np.random.RandomState(seed),
                                np.asarray(mean, np.float32))
            np.testing.assert_array_equal(gi, res["img"])
            np.testing.assert_array_equal(gb, res["gt_bboxes"])
            np.testing.assert_array_equal(gm, res["gt_masks"])

    def test_min_iou_random_crop_parity(self):
        from reference_loader import load_reference_transforms
        from sipmask_tpu.data.transforms import min_iou_random_crop
        T = load_reference_transforms()
        for seed in range(14):
            img, boxes, labels, masks = self._inputs(seed)
            np.random.seed(seed)
            res = T.MinIoURandomCrop()(
                dict(img=img.copy(), gt_bboxes=boxes.copy(),
                     gt_labels=labels.copy(), gt_masks=masks.copy()))
            gi, gb, gl, gm = min_iou_random_crop(
                img.copy(), boxes.copy(), labels.copy(), masks.copy(),
                np.random.RandomState(seed))
            np.testing.assert_array_equal(gi, res["img"])
            np.testing.assert_array_equal(gb, res["gt_bboxes"])
            np.testing.assert_array_equal(gl, res["gt_labels"])
            np.testing.assert_array_equal(gm, res["gt_masks"])

    def test_min_iou_random_crop_empty_gt_still_crops(self):
        from reference_loader import load_reference_transforms
        from sipmask_tpu.data.transforms import min_iou_random_crop
        T = load_reference_transforms()
        for seed in (3, 5, 9):
            img, *_ = self._inputs(seed)
            empty_b = np.zeros((0, 4), np.float32)
            empty_l = np.zeros((0,), np.int64)
            np.random.seed(seed)
            res = T.MinIoURandomCrop()(
                dict(img=img.copy(), gt_bboxes=empty_b.copy(),
                     gt_labels=empty_l.copy()))
            gi, gb, gl, gm = min_iou_random_crop(
                img.copy(), empty_b.copy(), empty_l.copy(), None,
                np.random.RandomState(seed))
            np.testing.assert_array_equal(gi, res["img"])
            assert len(gb) == 0 and len(gl) == 0


class TestKeepRatioPipelineParity:
    """The hi-acc (keep-ratio) train/test pipeline vs the reference's OWN
    Resize/RandomFlip/Normalize/Pad classes (transforms.py:24-360). Draw
    order matches (single-scale Resize draws nothing; RandomFlip draws one
    rand), so a shared MT19937 seed makes the comparison bit-for-bit on
    image, boxes, and scale factor; gt masks compare after applying OUR
    in-loss stride-2 binarization to the reference's full-res masks."""

    MEAN = (102.9801, 115.9465, 122.7717)

    @staticmethod
    def _inputs(seed):
        r = np.random.RandomState(seed + 2000)
        h, w = int(r.randint(100, 240)), int(r.randint(100, 240))
        img = (r.rand(h, w, 3) * 255).astype(np.uint8)
        n = int(r.randint(1, 5))
        x1 = r.uniform(0, w - 30, n)
        y1 = r.uniform(0, h - 30, n)
        x2 = np.minimum(x1 + r.uniform(8, w / 2, n), w - 1)
        y2 = np.minimum(y1 + r.uniform(8, h / 2, n), h - 1)
        boxes = np.stack([x1, y1, x2, y2], 1).astype(np.float32)
        labels = r.randint(1, 10, n).astype(np.int64)
        masks = (r.rand(n, h, w) > 0.6).astype(np.uint8)
        return img, boxes, labels, masks

    def _ref_pipeline(self, T, img, boxes, masks, scale, flip_ratio):
        # uint8 in: the hi-acc configs use plain LoadImageFromFile
        # (to_float32 defaults False), so mmcv resizes the UINT8 image
        res = dict(img=img.copy(), gt_bboxes=boxes.copy(),
                   gt_masks=masks.copy(), bbox_fields=["gt_bboxes"],
                   mask_fields=["gt_masks"], seg_fields=[])
        res = T.Resize(img_scale=[scale], keep_ratio=True)(res)
        res = T.RandomFlip(flip_ratio=flip_ratio)(res)
        res = T.Normalize(mean=self.MEAN, std=(1.0, 1.0, 1.0),
                          to_rgb=False)(res)
        res = T.Pad(size_divisor=32)(res)
        return res

    def test_train_pipeline_parity(self):
        import cv2
        from reference_loader import load_reference_transforms
        from sipmask_tpu.config import DataConfig
        from sipmask_tpu.data.transforms import TrainTransform
        T = load_reference_transforms()
        scale = (320, 200)  # (long, short)
        for seed in range(8):
            img, boxes, labels, masks = self._inputs(seed)
            np.random.seed(seed)
            ref = self._ref_pipeline(T, img, boxes, masks, scale,
                                     flip_ratio=0.5)
            cfg = DataConfig(img_scale=scale, mean=self.MEAN,
                             max_gts=8, flip_ratio=0.5)
            tf = TrainTransform(cfg, seed=seed)
            s = tf(img, boxes, labels, masks)
            n = len(boxes)
            rh, rw = ref["img"].shape[:2]
            # image: identical on the reference's padded extent (our bucket
            # is >= the div-32 pad; beyond it both are zeros)
            np.testing.assert_array_equal(s.image[:rh, :rw], ref["img"])
            assert np.all(s.image[rh:] == 0) and np.all(s.image[:, rw:] == 0)
            # boxes: scalar-factor scaling, clip, flip — bit-for-bit
            np.testing.assert_array_equal(s.gt_bboxes[:n], ref["gt_bboxes"])
            # stored f32 (the reference keeps a python float until the
            # torch boundary casts it to f32 — same value there)
            assert s.scale_factor[0] == np.float32(ref["scale_factor"])
            assert np.all(s.scale_factor == s.scale_factor[0])
            # masks: reference full-res masks through OUR in-loss stride-2
            # sequence (pad to bucket, 0.5x bilinear, > 0.5)
            ph, pw = s.image.shape[:2]
            for i in range(n):
                mp = np.zeros((ph, pw), np.float32)
                rm = ref["gt_masks"][i].astype(np.float32)
                mp[:rm.shape[0], :rm.shape[1]] = rm
                want = cv2.resize(mp, (pw // 2, ph // 2),
                                  interpolation=cv2.INTER_LINEAR) > 0.5
                np.testing.assert_array_equal(s.gt_masks[i], want)

    def test_test_pipeline_parity(self):
        from reference_loader import load_reference_transforms
        from sipmask_tpu.config import DataConfig
        from sipmask_tpu.data.transforms import TestTransform
        T = load_reference_transforms()
        scale = (320, 200)
        for seed in range(4):
            img, boxes, _, masks = self._inputs(seed)
            np.random.seed(seed)
            ref = self._ref_pipeline(T, img, boxes, masks, scale,
                                     flip_ratio=0.0)
            cfg = DataConfig(img_scale=scale, mean=self.MEAN, max_gts=8)
            s = TestTransform(cfg)(img)
            rh, rw = ref["img"].shape[:2]
            np.testing.assert_array_equal(s.image[:rh, :rw], ref["img"])
            assert s.scale_factor[0] == np.float32(ref["scale_factor"])


class TestSSDTrainTransformComposition:
    """END-TO-END TrainTransform (fixed-size SSD path) vs the reference's
    full 6x train pipeline composed from ITS OWN classes in config order
    (sipmask_r50_caffe_fpn_ssd_6x.py:64-87): PhotoMetricDistortion ->
    Expand -> MinIoURandomCrop -> Resize(576, keep_ratio=False) ->
    Normalize -> RandomFlip. Stage-level parity is covered elsewhere; this
    pins the COMPOSITION: stage order, rng threading across stages, the
    per-axis imresize factors, and the resize-before-flip mask order."""

    MEAN = (102.9801, 115.9465, 122.7717)

    def test_composition_bit_parity(self):
        import cv2
        from reference_loader import load_reference_transforms
        from sipmask_tpu.config import DataConfig
        from sipmask_tpu.data.transforms import TrainTransform
        T = load_reference_transforms()
        size = 64  # stand-in for 576 (exact divisor-of-32 square)
        for seed in range(12):
            img, boxes, labels, masks = TestSSDAugParity._inputs(seed)
            np.random.seed(seed)
            res = dict(img=img.copy(), gt_bboxes=boxes.copy(),
                       gt_labels=labels.copy(), gt_masks=masks.copy(),
                       bbox_fields=["gt_bboxes"], mask_fields=["gt_masks"],
                       seg_fields=[])
            res = T.PhotoMetricDistortion()(res)
            res = T.Expand(mean=self.MEAN, to_rgb=False)(res)
            res = T.MinIoURandomCrop()(res)
            res = T.Resize(img_scale=[(size, size)], keep_ratio=False)(res)
            res = T.Normalize(mean=self.MEAN, std=(1, 1, 1),
                              to_rgb=False)(res)
            res = T.RandomFlip(flip_ratio=0.5)(res)

            cfg = DataConfig(fixed_size=(size, size), mean=self.MEAN,
                             ssd_augs=True, max_gts=8, flip_ratio=0.5)
            s = TrainTransform(cfg, seed=seed)(
                img.copy(), boxes.copy(), labels.copy(), masks.copy())
            n = len(res["gt_bboxes"])
            np.testing.assert_array_equal(s.image, res["img"])
            np.testing.assert_array_equal(s.gt_bboxes[:n], res["gt_bboxes"])
            np.testing.assert_array_equal(s.gt_labels[:n], res["gt_labels"])
            np.testing.assert_array_equal(
                s.scale_factor, res["scale_factor"].astype(np.float32))
            for i in range(min(n, 8)):
                want = cv2.resize(
                    res["gt_masks"][i].astype(np.float32),
                    (size // 2, size // 2),
                    interpolation=cv2.INTER_LINEAR) > 0.5
                np.testing.assert_array_equal(s.gt_masks[i], want)


class TestMsRangeScaleParity:
    """Multi-scale 'range' sampling vs the reference Resize.random_sample
    (transforms.py:82-96): long edge drawn first, then short, via randint
    over the endpoint ranges — identical draws under a shared seed."""

    def test_sampled_scales_match_reference(self):
        from reference_loader import load_reference_transforms
        from sipmask_tpu.data.transforms import sample_ms_scale
        T = load_reference_transforms()
        scales = [(1333, 640), (1333, 800)]
        for seed in range(20):
            np.random.seed(seed)
            want, _ = T.Resize.random_sample(scales)
            got = sample_ms_scale(tuple(scales), "range",
                                  np.random.RandomState(seed))
            assert tuple(got) == tuple(want)


class TestSoftNmsParity:
    """soft_nms vs a numpy transcription of the reference's
    soft_nms_cpu_kernel (nms_cpu.cpp:71-200): pick order, surviving
    indices, and decayed scores, for both linear and gaussian decay."""

    @staticmethod
    def _dets(seed, n=60):
        r = np.random.RandomState(seed)
        x1 = r.uniform(0, 80, n).astype(np.float32)
        y1 = r.uniform(0, 80, n).astype(np.float32)
        wb = r.uniform(5, 40, n).astype(np.float32)
        hb = r.uniform(5, 40, n).astype(np.float32)
        scores = r.uniform(0.05, 1.0, n).astype(np.float32)
        return np.stack([x1, y1, x1 + wb, y1 + hb, scores], 1)

    @pytest.mark.parametrize("method", ["linear", "gaussian"])
    def test_pick_order_scores_match(self, method):
        import jax.numpy as jnp
        from reference_loader import soft_nms_cpu_oracle
        from sipmask_tpu.ops.nms import soft_nms
        for seed in range(6):
            dets = self._dets(seed)
            want, want_inds = soft_nms_cpu_oracle(
                dets, iou_thr=0.3, method=method)
            keep, ks, valid = soft_nms(
                jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
                iou_thr=0.3, max_out=len(dets), method=method)
            keep = np.asarray(keep)[np.asarray(valid)]
            ks = np.asarray(ks)[np.asarray(valid)]
            m = min(len(keep), len(want_inds))
            assert m > 5
            np.testing.assert_array_equal(keep[:m], want_inds[:m])
            np.testing.assert_allclose(ks[:m], want[:m, 4], rtol=2e-5,
                                       atol=1e-6)

    @pytest.mark.parametrize("method", ["linear", "gaussian"])
    def test_multiclass_uncapped_vs_per_class_oracle(self, method):
        """multiclass_nms_idx(nms_type='soft_nms') — the UNCAPPED wave-
        batched path — vs the reference semantics composed by hand: per
        class, threshold raw scores at score_thr, multiply score_factors,
        run soft_nms_cpu_oracle, concat all classes, global sort by decayed
        score, top max_per_img (bbox_nms.py:79-146 with soft_nms_cpu)."""
        import jax.numpy as jnp
        from reference_loader import soft_nms_cpu_oracle
        from sipmask_tpu.ops.nms import multiclass_nms_idx

        n_cls, score_thr, max_out = 5, 0.05, 60
        for seed in range(4):
            r = np.random.RandomState(100 + seed)
            n = 300
            # dense scene: boxes clustered so decay chains actually fire
            cx = r.uniform(20, 120, n).astype(np.float32)
            cy = r.uniform(20, 120, n).astype(np.float32)
            wb = r.uniform(15, 60, n).astype(np.float32)
            hb = r.uniform(15, 60, n).astype(np.float32)
            boxes = np.stack([cx - wb / 2, cy - hb / 2,
                              cx + wb / 2, cy + hb / 2], 1)
            scores = r.uniform(0, 1, (n, n_cls)).astype(np.float32)
            factors = r.uniform(0.3, 1.0, n).astype(np.float32)

            # reference composition, per class
            want = []  # (score, row, cls)
            for ci in range(n_cls):
                sel = np.nonzero(scores[:, ci] > score_thr)[0]
                dets = np.concatenate(
                    [boxes[sel],
                     (scores[sel, ci] * factors[sel])[:, None]], 1)
                out, inds = soft_nms_cpu_oracle(dets, iou_thr=0.5,
                                                method=method)
                for row in range(len(out)):
                    want.append((out[row, 4], sel[inds[row]], ci))
            want.sort(key=lambda t: -t[0])
            want = want[:max_out]

            res = multiclass_nms_idx(
                jnp.asarray(boxes), jnp.asarray(scores), score_thr,
                0.5, max_out, score_factors=jnp.asarray(factors),
                nms_type="soft_nms", soft_method=method)
            got_v = np.asarray(res["valid"])
            got_s = np.asarray(res["scores"])[got_v]
            got_r = np.asarray(res["idxs"])[got_v]
            got_c = np.asarray(res["labels"])[got_v]

            assert len(got_s) == len(want) > 30
            np.testing.assert_allclose(
                got_s, [w[0] for w in want], rtol=3e-5, atol=1e-6)
            # identity comparison as a set keyed by (row, cls): the global
            # sort order of near-equal f32 scores may differ, identities not
            assert set(zip(got_r.tolist(), got_c.tolist())) == \
                {(int(w[1]), w[2]) for w in want}


class TestMsTrainPipelineParity:
    """Multi-scale keep-ratio TRAIN pipeline end-to-end vs the reference
    classes: Resize draws (long, short) via random_sample, then RandomFlip
    draws — our TrainTransform consumes the rng in the same order, so
    image/boxes stay bit-equal across seeds."""

    MEAN = (102.9801, 115.9465, 122.7717)

    def test_ms_range_pipeline_parity(self):
        from reference_loader import load_reference_transforms
        from sipmask_tpu.config import DataConfig
        from sipmask_tpu.data.transforms import TrainTransform
        T = load_reference_transforms()
        scales = [(320, 200), (400, 256)]
        for seed in range(8):
            img, boxes, labels, masks = \
                TestKeepRatioPipelineParity._inputs(seed)
            np.random.seed(seed)
            res = dict(img=img.copy(), gt_bboxes=boxes.copy(),
                       gt_masks=masks.copy(), bbox_fields=["gt_bboxes"],
                       mask_fields=["gt_masks"], seg_fields=[])
            res = T.Resize(img_scale=scales, keep_ratio=True)(res)
            res = T.RandomFlip(flip_ratio=0.5)(res)
            res = T.Normalize(mean=self.MEAN, std=(1, 1, 1),
                              to_rgb=False)(res)
            res = T.Pad(size_divisor=32)(res)
            cfg = DataConfig(img_scale=scales[0], ms_scales=tuple(scales),
                             mean=self.MEAN, max_gts=8, flip_ratio=0.5)
            s = TrainTransform(cfg, seed=seed)(img, boxes, labels, masks)
            rh, rw = res["img"].shape[:2]
            np.testing.assert_array_equal(s.image[:rh, :rw], res["img"])
            n = len(res["gt_bboxes"])
            np.testing.assert_array_equal(s.gt_bboxes[:n], res["gt_bboxes"])
            assert s.scale_factor[0] == np.float32(res["scale_factor"])
