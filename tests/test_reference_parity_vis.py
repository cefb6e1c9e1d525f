"""VIS-fork parity: the reference's own streaming tracker as oracle.

Drives the REAL SipMask-VIS head.get_bboxes (fast_nms + mask assembly +
comp-score matching + greedy best-score dedup, sipmask_head.py:565-684) on
handcrafted multi-frame outputs and asserts this framework's
decode_batch + extract_center_feats + tracker_step produce the same
detections and object-id assignments — including the contested
two-detections-one-object case (VERDICT.md round-1 item 8)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_loader import load_reference_vis, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

FEAT_SIZES = [(8, 12), (4, 6), (2, 3), (1, 2), (1, 1)]  # 64x96 input
H, W = 64, 96


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _frame_outputs(rng, base, nc=8, nb=32, noise=0.15):
    """Perturbed copy of base head outputs: consistent detections across
    frames so tracks persist, plus fresh noise so scores/ranks shuffle and
    contested matches occur."""
    out = {}
    for k, v in base.items():
        if isinstance(v, list):
            out[k] = [x + rng.randn(*x.shape).astype(np.float32) * noise
                      for x in v]
        else:
            out[k] = v + rng.randn(*v.shape).astype(np.float32) * noise
    return out


def _base_outputs(rng, nc=8, nb=32):
    sizes = FEAT_SIZES
    return dict(
        cls_scores=[(rng.randn(1, h, w, nc) * 2 - 1).astype(np.float32)
                    for h, w in sizes],
        bbox_preds=[(rng.rand(1, h, w, 4) * 24 + 8).astype(np.float32)
                    for h, w in sizes],
        centernesses=[rng.randn(1, h, w, 1).astype(np.float32)
                      for h, w in sizes],
        cof_preds=[(rng.randn(1, h, w, nb * 4) * 0.1).astype(np.float32)
                   for h, w in sizes],
        feat_masks=rng.randn(1, H // 2, W // 2, nb).astype(np.float32),
        track_feats=(rng.randn(1, H // 8, W // 8, 512) * 0.3).astype(
            np.float32),
    )


class TestVisTrackerParity:
    @pytest.mark.parametrize("seed", [3, 5])
    def test_stream_matches_reference(self, seed):
        from sipmask_tpu.config import get_config, _r
        from sipmask_tpu.models.decode import decode_batch
        from sipmask_tpu.models.track import (tracker_init, tracker_step,
                                              extract_center_feats)

        vis = load_reference_vis()
        torch.manual_seed(0)
        head = vis["make_vis_head"](num_fg_classes=8)
        cfg_ref = _Cfg(nms_pre=200, score_thr=0.03, max_per_img=10)

        cfg = get_config("sipmask_vis_r50")
        cfg = _r(cfg, "model.head", num_classes=8)
        state = tracker_init(cfg.model.track.max_tracks)
        img_shapes = jnp.asarray([[float(H), float(W)]])
        scale_factors = jnp.ones((1, 4), jnp.float32)

        rng = np.random.RandomState(seed)
        base = _base_outputs(rng)
        contested = 0

        for fi in range(4):
            outs = base if fi == 0 else _frame_outputs(rng, base)
            t = lambda x: torch.from_numpy(np.moveaxis(x, -1, 1).copy())

            # ---- reference: real VIS get_bboxes incl. the stateful tracker
            res = head.get_bboxes(
                [t(x) for x in outs["cls_scores"]],
                [t(x) for x in outs["bbox_preds"]],
                [t(x) for x in outs["centernesses"]],
                [t(x) for x in outs["cof_preds"]],
                t(outs["feat_masks"]), t(outs["track_feats"]), None,
                img_metas=[dict(is_first=fi == 0, img_shape=(H, W, 3),
                                ori_shape=(H, W, 3), scale_factor=1.0)],
                cfg=cfg_ref, rescale=True)
            boxes_r, labels_r, _, obj_ids_r = res[0]
            boxes_r = boxes_r.detach().numpy()
            labels_r = labels_r.detach().numpy()
            obj_ids_r = np.asarray(obj_ids_r)

            # ---- this framework: decode + center feats + tracker step
            outs_j = {k: ([jnp.asarray(x) for x in v]
                          if isinstance(v, list) else jnp.asarray(v))
                      for k, v in outs.items()}
            dets = decode_batch(outs_j, img_shapes, scale_factors, cfg.model)
            feats = extract_center_feats(
                outs_j["track_feats"][0],
                dets["boxes"][0] * scale_factors[0][None, :])
            state, obj_ids = tracker_step(
                state, dets["boxes"][0], dets["scores"][0],
                dets["labels"][0], dets["valid"][0], feats,
                jnp.asarray(fi == 0),
                match_coeff=cfg.model.track.match_coeff)

            valid = np.asarray(dets["valid"])
            got_boxes = np.asarray(dets["boxes"])[0][valid[0]]
            got_scores = np.asarray(dets["scores"])[0][valid[0]]
            got_labels = np.asarray(dets["labels"])[0][valid[0]]
            got_ids = np.asarray(obj_ids)[valid[0]]

            assert len(got_scores) == boxes_r.shape[0], f"frame {fi}"
            np.testing.assert_allclose(got_boxes, boxes_r[:, :4], rtol=1e-5,
                                       atol=1e-5, err_msg=f"frame {fi}")
            np.testing.assert_allclose(got_scores, boxes_r[:, 4], rtol=1e-5,
                                       err_msg=f"frame {fi}")
            np.testing.assert_array_equal(got_labels, labels_r,
                                          err_msg=f"frame {fi}")
            np.testing.assert_array_equal(got_ids, obj_ids_r,
                                          err_msg=f"frame {fi} obj ids")

            if fi > 0:
                assigned = obj_ids_r[obj_ids_r >= 0]
                if (obj_ids_r < 0).any() or \
                        len(set(assigned.tolist())) < len(assigned):
                    contested += 1
        del contested  # random streams rarely contest; covered determin. below

    def test_contested_two_dets_one_object(self):
        """Deterministic contested case: frame 0 has ONE object; frame 1 has
        TWO same-label detections that both best-match it (near-uniform
        embeddings + label bonus). The reference greedy loop (:644-667) gives
        the object id to the higher-comp-score det and leaves the other at
        -1; assert we reproduce that exactly."""
        from sipmask_tpu.config import get_config, _r
        from sipmask_tpu.models.decode import decode_batch
        from sipmask_tpu.models.track import (tracker_init, tracker_step,
                                              extract_center_feats)

        vis = load_reference_vis()
        torch.manual_seed(0)
        head = vis["make_vis_head"](num_fg_classes=8)
        cfg_ref = _Cfg(nms_pre=200, score_thr=0.03, max_per_img=10)
        cfg = get_config("sipmask_vis_r50")
        cfg = _r(cfg, "model.head", num_classes=8)

        rng = np.random.RandomState(0)

        def craft(peaks):
            """peaks: [(row, col, cls, logit)] on level 0 (stride 8)."""
            outs = _base_outputs(rng)
            for lvl, (h, w) in enumerate(FEAT_SIZES):
                outs["cls_scores"][lvl][:] = -10.0
                outs["bbox_preds"][lvl][:] = 16.0
                outs["centernesses"][lvl][:] = 0.0
            for r, c, cls, logit in peaks:
                outs["cls_scores"][0][0, r, c, cls] = logit
            outs["track_feats"][:] = 0.05  # near-uniform embeddings
            return outs

        frames = [
            craft([(4, 5, 0, 3.0)]),                      # one object
            craft([(4, 3, 0, 3.0), (4, 7, 0, 2.5)]),      # two contenders
        ]

        state = tracker_init(cfg.model.track.max_tracks)
        img_shapes = jnp.asarray([[float(H), float(W)]])
        scale_factors = jnp.ones((1, 4), jnp.float32)
        saw_contested = False
        for fi, outs in enumerate(frames):
            t = lambda x: torch.from_numpy(np.moveaxis(x, -1, 1).copy())
            res = head.get_bboxes(
                [t(x) for x in outs["cls_scores"]],
                [t(x) for x in outs["bbox_preds"]],
                [t(x) for x in outs["centernesses"]],
                [t(x) for x in outs["cof_preds"]],
                t(outs["feat_masks"]), t(outs["track_feats"]), None,
                img_metas=[dict(is_first=fi == 0, img_shape=(H, W, 3),
                                ori_shape=(H, W, 3), scale_factor=1.0)],
                cfg=cfg_ref, rescale=True)
            boxes_r, labels_r, _, obj_ids_r = res[0]
            obj_ids_r = np.asarray(obj_ids_r)

            outs_j = {k: ([jnp.asarray(x) for x in v]
                          if isinstance(v, list) else jnp.asarray(v))
                      for k, v in outs.items()}
            dets = decode_batch(outs_j, img_shapes, scale_factors, cfg.model)
            feats = extract_center_feats(
                outs_j["track_feats"][0],
                dets["boxes"][0] * scale_factors[0][None, :])
            state, obj_ids = tracker_step(
                state, dets["boxes"][0], dets["scores"][0],
                dets["labels"][0], dets["valid"][0], feats,
                jnp.asarray(fi == 0),
                match_coeff=cfg.model.track.match_coeff)
            valid = np.asarray(dets["valid"])[0]
            got_ids = np.asarray(obj_ids)[valid]
            assert len(got_ids) == len(obj_ids_r), f"frame {fi}"
            np.testing.assert_array_equal(got_ids, obj_ids_r,
                                          err_msg=f"frame {fi}")
            if fi == 1:
                saw_contested = (obj_ids_r < 0).any()
        assert saw_contested, "frame 1 must contain a dropped duplicate det"
