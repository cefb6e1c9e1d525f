"""Whole-model SipMask++ parity vs the reference's own PyTorch model.

Third full-stack parity fixture (image R50-GN and VIS stacks are covered by
test_full_model_parity{,_vis}.py). This one runs the SipMask++ flagship
variant per configs/sipmask/sipmask++_r101_caffe_fpn_ssd_6x.py, exercising
the paths the other two never touch:

  * ResNet-101 depth (23-block stage 3) with DCN in stages 2-4
    (backbones/resnet.py:150-168 build_conv_layer(dcn) -> DeformConvPack,
    nonzero randomized offset convs so offset-layout bugs cannot hide),
  * the norm-free ssd_flag head (stacked_convs=2, norm_cfg=None),
  * the fast_nms decode branch (get_bboxes_single:602-605) with a
    non-uniform 4-vector scale_factor,
  * SipMask++ mask re-scoring at decode time (:635-643).

Asserts per-level head outputs, fast-NMS detections, pasted binary masks,
and rescored mask_scores all match with weights converted through
utils/torch_convert.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from reference_loader import (reference_available, load_reference,
                              load_reference_detector)  # noqa: E402
from sipmask_tpu.config import get_config  # noqa: E402
from sipmask_tpu.models import build_model  # noqa: E402
from sipmask_tpu.models.decode import decode_batch  # noqa: E402
from sipmask_tpu.models.sipmask_head import RescoringHead  # noqa: E402
from sipmask_tpu.utils.torch_convert import torch_to_flax  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

# 256x256: the rescoring tower's six stride-2 VALID convs need a >=128px
# stride-2 mask grid (see TestRescoringParity) — smaller inputs underflow
# the 3x3 kernels
H, W = 256, 256
OH, OW = 342, 320           # original shape; ssd pipelines carry a
SX, SY = W / OW, H / OH     # 4-vector per-axis scale_factor


class _Cfg(dict):
    __getattr__ = dict.__getitem__


def _randomize(backbone, neck, head, seed=44):
    g = torch.Generator().manual_seed(seed)
    for m in (backbone, neck, head):
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
                mod.weight.data.uniform_(0.8, 1.2, generator=g)
                mod.bias.data.normal_(0, 0.1, generator=g)
            # backbone DCN offset convs are zero-init (DeformConvPack);
            # zero offsets would reduce every DCN block to a plain conv and
            # hide offset-channel-layout bugs — give them real values
            if type(mod).__name__ == "DeformConvPack":
                mod.conv_offset.weight.data.normal_(0, 0.05, generator=g)
                mod.conv_offset.bias.data.normal_(0, 0.2, generator=g)
    head.feat_align.conv_offset.weight.data.normal_(0, 0.2, generator=g)
    head.fcos_cls.bias.data.normal_(0, 1.5, generator=g)
    head.fcos_reg.bias.data.normal_(1.0, 0.2, generator=g)
    for s in head.scales:
        s.scale.data.uniform_(0.7, 1.5, generator=g)
    # give the rescoring tower's 1x1 head real weights (normal_init 0.001
    # leaves pred_iou ~0 and would make the mask_scores check vacuous)
    head.mask_scoring.weight.data.normal_(0, 0.1, generator=g)
    head.mask_scoring.bias.data.normal_(0.2, 0.1, generator=g)


@pytest.fixture(scope="module")
def pp_parity():
    det = load_reference_detector()
    ref = load_reference()
    torch.manual_seed(0)
    backbone = det["ResNet"](
        depth=101, num_stages=4, out_indices=(0, 1, 2, 3), frozen_stages=1,
        norm_cfg=dict(type="BN", requires_grad=False), style="caffe",
        dcn=dict(type="DCN", deformable_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True))
    neck = det["FPN"](
        in_channels=[256, 512, 1024, 2048], out_channels=256, start_level=1,
        add_extra_convs=True, extra_convs_on_inputs=False, num_outs=5,
        relu_before_extra_convs=True)
    neck.init_weights()
    head = ref["make_head"](num_fg_classes=80, in_channels=256,
                            feat_channels=256, stacked_convs=2, norm=False,
                            ssd_flag=True, rescoring_flag=True)
    _randomize(backbone, neck, head)
    backbone.eval(); neck.eval(); head.eval()

    sd = {}
    for prefix, m in (("backbone", backbone), ("neck", neck),
                      ("bbox_head", head)):
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()

    rng = np.random.RandomState(17)
    img = (rng.randn(1, 3, H, W) * 40).astype(np.float32)

    with torch.no_grad():
        feats = neck(backbone(torch.from_numpy(img)))
        outs_t = head(feats)

    params, constants = torch_to_flax(sd, depth=101)
    variables = {"params": params, "constants": constants}
    cfg = get_config("sipmaskpp_r101_fpn_ssd_6x")
    model = build_model(cfg.model)
    out_j = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)))
    return dict(head=head, outs_t=outs_t, out_j=out_j, cfg=cfg,
                variables=variables)


class TestFullModelParityPP:
    def test_head_outputs_match(self, pp_parity):
        cls_t, box_t, ctr_t, cof_t, fm_t = pp_parity["outs_t"]
        out_j = pp_parity["out_j"]
        for name, tl, jl, atol in (
                ("cls", cls_t, out_j["cls_scores"], 2e-4),
                ("bbox", box_t, out_j["bbox_preds"], 1e-3),
                ("centerness", ctr_t, out_j["centernesses"], 2e-4),
                ("cof", cof_t, out_j["cof_preds"], 2e-4)):
            for lvl, (t, j) in enumerate(zip(tl, jl)):
                np.testing.assert_allclose(
                    np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
                    atol=atol, err_msg=f"{name} level {lvl}")
        np.testing.assert_allclose(
            np.asarray(out_j["feat_masks"]),
            fm_t.numpy().transpose(0, 2, 3, 1), atol=2e-4)

    def test_fast_nms_decode_masks_and_rescoring_match(self, pp_parity,
                                                       monkeypatch):
        head, cfg = pp_parity["head"], pp_parity["cfg"]
        cls_t, box_t, ctr_t, cof_t, fm_t = pp_parity["outs_t"]
        tcfg = _Cfg(nms_pre=1000, score_thr=0.1,
                    nms=_Cfg(type="nms", iou_thr=0.5), max_per_img=100)
        scale_factor = np.array([SX, SY, SX, SY], np.float32)
        img_metas = [dict(img_shape=(H, W, 3), ori_shape=(OH, OW, 3),
                          scale_factor=scale_factor)]
        # the reference passes a numpy slice as F.interpolate's scale_factor
        # (sipmask_head.py:631: scale / scale_factor[3:1:-1]); torch <=1.x
        # accepted ndarrays there, torch 2.x requires floats — coerce, the
        # values are unchanged
        import torch.nn.functional as F
        orig_interp = F.interpolate

        def interp(x, size=None, scale_factor=None, **kw):
            if isinstance(scale_factor, np.ndarray):
                scale_factor = tuple(float(s) for s in scale_factor)
            return orig_interp(x, size=size, scale_factor=scale_factor, **kw)

        monkeypatch.setattr(F, "interpolate", interp)
        with torch.no_grad():
            det_bboxes, det_labels, (cls_segms, mask_scores_r) = \
                head.get_bboxes(cls_t, box_t, ctr_t, cof_t, fm_t,
                                img_metas, tcfg, rescale=True)[0]

        rs = RescoringHead(cfg.model.head.num_classes)
        rescore_fn = lambda m: rs.apply(  # noqa: E731
            {"params": pp_parity["variables"]["params"]["rescoring"]}, m)
        out_d = decode_batch(pp_parity["out_j"],
                             jnp.asarray([[float(H), float(W)]]),
                             jnp.asarray([scale_factor]), cfg.model,
                             rescore_fn=rescore_fn)
        v = np.asarray(out_d["valid"][0]).astype(bool)
        jb = np.asarray(out_d["boxes"][0])[v]
        js = np.asarray(out_d["scores"][0])[v]
        jl = np.asarray(out_d["labels"][0])[v]
        jm = np.asarray(out_d["masks"][0])[v]
        jms = np.asarray(out_d["mask_scores"][0])[v]

        n_ref = det_bboxes.shape[0]
        assert len(js) == n_ref and n_ref >= 20  # a populated scene
        np.testing.assert_array_equal(jl, det_labels.numpy())
        np.testing.assert_allclose(js, det_bboxes[:, 4].numpy(), atol=1e-5)
        np.testing.assert_allclose(jb, det_bboxes[:, :4].numpy(), atol=1e-3)

        # mask_scores: reference groups them per class in detection order
        per_cls_ms = {c: iter(mask_scores_r[c]) for c in range(80)}
        ref_ms = np.array([next(per_cls_ms[int(l)])
                           for l in det_labels.numpy()])
        np.testing.assert_allclose(jms, ref_ms, atol=1e-4)

        # pasted binary masks (ssd path resizes by scale/scale_factor[3:1:-1]
        # = (2/sy, 2/sx)); same cv2-vs-F.interpolate tolerance as the image
        # full-model test
        per_cls = {c: iter([r["arr"] for r in cls_segms[c]])
                   for c in range(80)}
        ref_masks = [next(per_cls[int(l)]) for l in det_labels.numpy()]
        ious = []
        for i in range(n_ref):
            mm = cv2.resize(jm[i].astype(np.float32), None, fx=2.0 / SX,
                            fy=2.0 / SY, interpolation=cv2.INTER_LINEAR)
            mj = np.zeros((OH, OW), np.uint8)
            hh, ww = min(OH, mm.shape[0]), min(OW, mm.shape[1])
            mj[:hh, :ww] = mm[:hh, :ww] > 0.4
            inter = (mj & ref_masks[i]).sum()
            union = (mj | ref_masks[i]).sum()
            ious.append(inter / union if union else 1.0)
        ious = np.asarray(ious)
        assert ious.min() >= 0.97, ious.min()
        assert ious.mean() >= 0.995, ious.mean()
