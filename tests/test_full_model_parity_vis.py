"""Whole-model VIS parity vs the reference's own PyTorch model.

Closes the remaining whole-model gap from VERDICT round 2: the image path
got full-stack parity in round 3 (tests/test_full_model_parity.py); this
file does the same for the SipMask-VIS stack — the reference's REAL
ResNet50-caffe -> FPN -> VIS SipMaskHead with the tracking branch
(SipMask-VIS/mmdet/models/anchor_heads/sipmask_head.py:252-317 forward,
:565-684 get_bboxes incl. the stateful tracker), at the FULL flagship width
(256ch, stacked_convs=3, 40 fg classes, per
SipMask-VIS/configs/sipmask/sipmask_r50_caffe_fpn_gn_1x.py).

The backbone/neck classes are loaded from the mmdetection fork's sources:
the VIS fork's resnet.py / fpn.py differ only in import paths, logging, and
DCN plumbing that the R50-caffe non-DCN config never executes (verified by
diff) — the executed computation is identical.

Asserts, with the state_dict converted through utils/torch_convert:
  * two-frame TRAIN forward: all seven head outputs match per level
    (cls/bbox/centerness/cof, basis feat_masks, track_feats,
    track_feats_ref),
  * two-frame INFERENCE stream: decoded detections and the tracker's
    object-id assignments match the reference's get_bboxes frame by frame.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import (reference_available, load_reference_detector,
                              load_reference_vis)  # noqa: E402
from sipmask_tpu.config import get_config  # noqa: E402
from sipmask_tpu.models import build_model  # noqa: E402
from sipmask_tpu.models.decode import decode_batch  # noqa: E402
from sipmask_tpu.models.track import (tracker_init, tracker_step,
                                      extract_center_feats)  # noqa: E402
from sipmask_tpu.utils.torch_convert import torch_to_flax  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

H, W = 96, 128


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _randomize(backbone, neck, head, seed=43):
    """Perturb weights so every conversion path carries nontrivial values
    (same recipe as the image-path full-model test)."""
    g = torch.Generator().manual_seed(seed)
    for m in (backbone, neck, head):
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
                mod.weight.data.uniform_(0.8, 1.2, generator=g)
                mod.bias.data.normal_(0, 0.1, generator=g)
            elif isinstance(mod, torch.nn.GroupNorm):
                mod.weight.data.uniform_(0.8, 1.2, generator=g)
                mod.bias.data.normal_(0, 0.1, generator=g)
    head.feat_align.conv_offset.weight.data.normal_(0, 0.2, generator=g)
    head.fcos_cls.bias.data.normal_(0, 1.5, generator=g)
    head.fcos_reg.bias.data.normal_(1.0, 0.2, generator=g)
    for s in head.scales:
        s.scale.data.uniform_(0.7, 1.5, generator=g)


@pytest.fixture(scope="module")
def vis_parity():
    det = load_reference_detector()
    vis = load_reference_vis()
    torch.manual_seed(0)
    backbone = det["ResNet"](
        depth=50, num_stages=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
        norm_cfg=dict(type="BN", requires_grad=False), style="caffe")
    neck = det["FPN"](
        in_channels=[256, 512, 1024, 2048], out_channels=256, start_level=1,
        add_extra_convs=True, extra_convs_on_inputs=False, num_outs=5,
        relu_before_extra_convs=True)
    neck.init_weights()
    head = vis["make_vis_head"](num_fg_classes=40, in_channels=256,
                                feat_channels=256, stacked_convs=3)
    _randomize(backbone, neck, head)
    backbone.eval(); neck.eval(); head.eval()

    sd = {}
    for prefix, m in (("backbone", backbone), ("neck", neck),
                      ("bbox_head", head)):
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()

    rng = np.random.RandomState(11)
    frames = [(rng.randn(1, 3, H, W) * 40).astype(np.float32)
              for _ in range(2)]

    with torch.no_grad():
        feats = [neck(backbone(torch.from_numpy(f))) for f in frames]
        outs_t = head(feats[0], feats[1], flag_train=True)

    params, constants = torch_to_flax(sd, depth=50)
    variables = {"params": params, "constants": constants}
    cfg = get_config("sipmask_vis_r50")
    model = build_model(cfg.model)
    out_j = model.apply(variables,
                        jnp.asarray(frames[0].transpose(0, 2, 3, 1)),
                        jnp.asarray(frames[1].transpose(0, 2, 3, 1)))
    return dict(head=head, feats=feats, frames=frames, outs_t=outs_t,
                out_j=out_j, cfg=cfg, model=model, variables=variables)


class TestFullModelParityVIS:
    def test_train_forward_outputs_match(self, vis_parity):
        cls_t, box_t, ctr_t, cof_t, fm_t, tk_t, tkr_t = vis_parity["outs_t"]
        out_j = vis_parity["out_j"]
        for name, tl, jl, atol in (
                ("cls", cls_t, out_j["cls_scores"], 1e-4),
                ("bbox", box_t, out_j["bbox_preds"], 5e-4),
                ("centerness", ctr_t, out_j["centernesses"], 1e-4),
                ("cof", cof_t, out_j["cof_preds"], 1e-4)):
            for lvl, (t, j) in enumerate(zip(tl, jl)):
                np.testing.assert_allclose(
                    np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
                    atol=atol, err_msg=f"{name} level {lvl}")
        np.testing.assert_allclose(
            np.asarray(out_j["feat_masks"]),
            fm_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out_j["track_feats"]),
            tk_t.numpy().transpose(0, 2, 3, 1), atol=1e-4,
            err_msg="track_feats (key frame)")
        np.testing.assert_allclose(
            np.asarray(out_j["track_feats_ref"]),
            tkr_t.numpy().transpose(0, 2, 3, 1), atol=1e-4,
            err_msg="track_feats_ref (reference frame)")

    def test_inference_stream_matches(self, vis_parity):
        head, cfg = vis_parity["head"], vis_parity["cfg"]
        model, variables = vis_parity["model"], vis_parity["variables"]
        tcfg = _Cfg(nms_pre=200, score_thr=0.03, max_per_img=10)
        state = tracker_init(cfg.model.track.max_tracks)
        img_shapes = jnp.asarray([[float(H), float(W)]])
        scale_factors = jnp.ones((1, 4), jnp.float32)

        saw_dets = 0
        for fi, frame in enumerate(vis_parity["frames"]):
            feats = vis_parity["feats"][fi]
            with torch.no_grad():
                outs = head(feats, feats, flag_train=False)
            res = head.get_bboxes(
                *outs, img_metas=[dict(is_first=fi == 0,
                                       img_shape=(H, W, 3),
                                       ori_shape=(H, W, 3),
                                       scale_factor=1.0)],
                cfg=tcfg, rescale=True)
            boxes_r, labels_r, _, obj_ids_r = res[0]
            boxes_r = boxes_r.detach().numpy()
            labels_r = labels_r.detach().numpy()
            obj_ids_r = np.asarray(obj_ids_r)

            out_j = model.apply(
                variables, jnp.asarray(frame.transpose(0, 2, 3, 1)))
            dets = decode_batch(out_j, img_shapes, scale_factors, cfg.model)
            tfeats = extract_center_feats(
                out_j["track_feats"][0],
                dets["boxes"][0] * scale_factors[0][None, :])
            state, obj_ids = tracker_step(
                state, dets["boxes"][0], dets["scores"][0],
                dets["labels"][0], dets["valid"][0], tfeats,
                jnp.asarray(fi == 0),
                match_coeff=cfg.model.track.match_coeff)

            v = np.asarray(dets["valid"])[0]
            got_boxes = np.asarray(dets["boxes"])[0][v]
            got_scores = np.asarray(dets["scores"])[0][v]
            got_labels = np.asarray(dets["labels"])[0][v]
            got_ids = np.asarray(obj_ids)[v]
            saw_dets += len(got_scores)

            assert len(got_scores) == boxes_r.shape[0], f"frame {fi}"
            np.testing.assert_allclose(got_boxes, boxes_r[:, :4], atol=1e-3,
                                       err_msg=f"frame {fi}")
            np.testing.assert_allclose(got_scores, boxes_r[:, 4], atol=1e-5,
                                       err_msg=f"frame {fi}")
            np.testing.assert_array_equal(got_labels, labels_r,
                                          err_msg=f"frame {fi}")
            np.testing.assert_array_equal(got_ids, obj_ids_r,
                                          err_msg=f"frame {fi} obj ids")
        assert saw_dets >= 4  # populated scenes on both frames
