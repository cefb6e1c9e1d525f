"""Load the reference's pure-PyTorch modules from /root/reference so tests
can use the reference's OWN code as numerical oracles (VERDICT.md round-1
item 2: all prior parity evidence was self-authored).

The reference imports mmcv, pycocotools and its compiled CUDA extensions at
module import time; none of those are installed. This loader installs minimal
stub packages in sys.modules for everything that is *plumbing* (registries,
init helpers, ConvModule) and faithful pure-torch transcriptions for the two
compiled kernels the loss path actually executes (CropSplit / CropSplitGt —
transcribed from mmdet/ops/crop/src/crop_split_cuda_kernel.cu:18-57 — and the
hard NMS from mmdet/ops/nms/src/nms_cpu.cpp:10-65 with its +1 IoU
convention). Everything semantic — fcos_target, the loss arithmetic,
fast_nms, multiclass_nms_idx, distance2bbox, bbox_overlaps, the loss
modules — is the reference's own source, loaded from /root/reference.
"""

from __future__ import annotations

import functools
import importlib.util
import os
import sys
import types

import numpy as np

REF_MMDET = "/root/reference/SipMask-mmdetection"
REF_VIS = "/root/reference/SipMask-VIS"

_cache: dict = {}


def reference_available() -> bool:
    return os.path.isdir(REF_MMDET)


def _stub_module(name, is_pkg=False, **attrs):
    m = types.ModuleType(name)
    if is_pkg:
        m.__path__ = []
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _load_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _make_torch_stubs():
    """Install mmcv / pycocotools / mmdet scaffolding stubs in sys.modules."""
    import torch
    import torch.nn as nn

    # --- mmcv (only init helpers are used by the code paths under test)
    def normal_init(module, mean=0, std=1, bias=0):
        nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0):
        nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def kaiming_init(module, **kw):
        nn.init.kaiming_normal_(module.weight)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def xavier_init(module, **kw):
        nn.init.xavier_normal_(module.weight)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def kaiming_uniform_init(module, **kw):
        nn.init.kaiming_uniform_(module.weight)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def xavier_uniform_init(module, distribution="normal", **kw):
        if distribution == "uniform":
            nn.init.xavier_uniform_(module.weight)
        else:
            nn.init.xavier_normal_(module.weight)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, 0)

    class VGG(nn.Module):
        """Pure-torch transcription of mmcv 0.x ``mmcv/cnn/vgg.py`` (the
        no-BN slice SSDVGG uses: per-stage [conv3x3(pad=dilation), relu]*n
        + MaxPool2d(2, 2, ceil_mode), with_last_pool pops the final pool).
        Test-only scaffolding so the reference's own ssd_vgg.py source can
        run; everything semantic stays in /root/reference."""

        arch_settings = {11: (1, 1, 2, 2, 2), 13: (2, 2, 2, 2, 2),
                         16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}

        def __init__(self, depth, with_bn=False, num_classes=-1,
                     num_stages=5, dilations=(1, 1, 1, 1, 1),
                     out_indices=(0, 1, 2, 3, 4), frozen_stages=-1,
                     bn_eval=True, bn_frozen=False, ceil_mode=False,
                     with_last_pool=True):
            super().__init__()
            assert not with_bn and num_classes <= 0
            stage_blocks = self.arch_settings[depth][:num_stages]
            self.out_indices = out_indices
            layers = []
            inplanes = 3
            for i, n_blocks in enumerate(stage_blocks):
                planes = 64 * 2 ** i if i < 4 else 512
                for _ in range(n_blocks):
                    layers.append(nn.Conv2d(inplanes, planes, 3,
                                            padding=dilations[i],
                                            dilation=dilations[i]))
                    layers.append(nn.ReLU(inplace=True))
                    inplanes = planes
                layers.append(nn.MaxPool2d(2, 2, ceil_mode=ceil_mode))
            if not with_last_pool:
                layers.pop(-1)
            self.features = nn.Sequential(*layers)

    mmcv = _stub_module("mmcv", is_pkg=True)
    _stub_module("mmcv.cnn", normal_init=normal_init,
                 constant_init=constant_init, kaiming_init=kaiming_init,
                 xavier_init=xavier_uniform_init, VGG=VGG)
    mmcv.cnn = sys.modules["mmcv.cnn"]
    _stub_module("mmcv.runner",
                 load_checkpoint=lambda *a, **k: None)
    mmcv.runner = sys.modules["mmcv.runner"]

    # --- pycocotools.mask: captures the raw binary mask so full-model
    # parity tests can compare the reference's final pasted masks
    pyco = _stub_module("pycocotools", is_pkg=True)
    _stub_module("pycocotools.mask",
                 encode=lambda a: [{"counts": b"", "size": list(a.shape[:2]),
                                    "arr": np.asarray(a[..., 0]).copy()}])
    pyco.mask = sys.modules["pycocotools.mask"]


def _pure_torch_nms(dets, iou_thr, device_id=None):
    """Transcription of nms_cpu.cpp:10-65 (the +1 IoU convention).

    Returns (dets[keep], keep) with keep indexing the input rows, exactly as
    mmdet/ops/nms/nms_wrapper.py:7-60 does for CPU tensors.
    """
    import torch
    boxes, scores = dets[:, :4], dets[:, 4]
    x1, y1, x2, y2 = boxes.unbind(1)
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort(descending=True)
    suppressed = torch.zeros(dets.shape[0], dtype=torch.bool)
    keep = []
    for oi in range(order.numel()):
        i = order[oi].item()
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(x1[i], x1)
        yy1 = torch.maximum(y1[i], y1)
        xx2 = torch.minimum(x2[i], x2)
        yy2 = torch.minimum(y2[i], y2)
        w = (xx2 - xx1 + 1).clamp(min=0)
        h = (yy2 - yy1 + 1).clamp(min=0)
        inter = w * h
        ovr = inter / (areas[i] + areas - inter)
        suppressed |= ovr > iou_thr
    keep = torch.as_tensor(keep, dtype=torch.long)
    return dets[keep], keep


def _torch_deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1,
                         deformable_groups=1):
    """Pure-torch transcription of the v1 deformable conv forward
    (mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu: deformable_im2col then a
    weight matmul). Offset layout per deformable group: [dy_k, dx_k]
    interleaved over kernel positions; zero-padded bilinear sampling."""
    import torch
    b, c, h, w = x.shape
    oc, _, kh, kw = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    dg = deformable_groups
    cg = c // dg
    off = offset.view(b, dg, kh * kw, 2, ho, wo)
    base_y = (torch.arange(ho, dtype=x.dtype) * stride - padding).view(1, ho, 1)
    base_x = (torch.arange(wo, dtype=x.dtype) * stride - padding).view(1, 1, wo)
    cols = x.new_zeros(b, c, kh * kw, ho, wo)
    for g in range(dg):
        xg = x[:, g * cg:(g + 1) * cg].reshape(b, cg, h * w)
        for kidx in range(kh * kw):
            i, j = kidx // kw, kidx % kw
            py = base_y + i * dilation + off[:, g, kidx, 0]
            px = base_x + j * dilation + off[:, g, kidx, 1]
            y0, x0 = torch.floor(py), torch.floor(px)
            val = x.new_zeros(b, cg, ho, wo)
            for dy in (0, 1):
                wy = (py - y0) if dy else (1 - (py - y0))
                yy = y0 + dy
                for dx in (0, 1):
                    wx = (px - x0) if dx else (1 - (px - x0))
                    xx = x0 + dx
                    valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
                    idx = (yy.clamp(0, h - 1) * w +
                           xx.clamp(0, w - 1)).long().view(b, 1, -1)
                    v = xg.gather(2, idx.expand(b, cg, -1)).view(b, cg, ho, wo)
                    val = val + v * (wy * wx * valid.to(x.dtype)).unsqueeze(1)
            cols[:, g * cg:(g + 1) * cg, kidx] = val
    return torch.einsum("bckxy,ock->boxy", cols, weight.view(oc, c, kh * kw))


def _make_mmdet_stubs():
    """Builds the fake mmdet package tree and loads the reference's own
    pure-torch modules into it. ConvModule / Scale / build_conv_layer /
    build_norm_layer are the reference's REAL sources (ops/conv_module.py,
    scale.py, conv.py, norm.py, activation.py, conv_ws.py); only the
    compiled CUDA extensions are transcriptions."""
    import math
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    mmdet = _stub_module("mmdet", is_pkg=True)

    class DeformConv(nn.Module):
        """mmdet/ops/dcn DeformConv with the CUDA forward transcribed to
        pure torch (_torch_deform_conv2d); same init (reset_parameters
        stdv = 1/sqrt(fan_in))."""

        def __init__(self, in_channels, out_channels, kernel_size=3,
                     stride=1, padding=0, dilation=1, groups=1,
                     deformable_groups=1, bias=False, **kw):
            super().__init__()
            assert groups == 1 and not bias
            self.stride, self.padding, self.dilation = stride, padding, dilation
            self.deformable_groups = deformable_groups
            self.weight = nn.Parameter(torch.empty(
                out_channels, in_channels, kernel_size, kernel_size))
            n = in_channels * kernel_size * kernel_size
            self.weight.data.uniform_(-1 / math.sqrt(n), 1 / math.sqrt(n))
            self.bias = None

        def forward(self, x, offset):
            return _torch_deform_conv2d(
                x, offset, self.weight, self.stride, self.padding,
                self.dilation, self.deformable_groups)

    class DeformConvPack(DeformConv):
        """DeformConvPack: offsets from an internal zero-init conv on the
        input (mmdet/ops/dcn/deform_conv.py)."""

        def __init__(self, *args, **kw):
            super().__init__(*args, **kw)
            k = self.weight.shape[2]
            self.conv_offset = nn.Conv2d(
                self.weight.shape[1], self.deformable_groups * 2 * k * k,
                kernel_size=k, stride=self.stride, padding=self.padding,
                bias=True)
            self.conv_offset.weight.data.zero_()
            self.conv_offset.bias.data.zero_()

        def forward(self, x):
            return _torch_deform_conv2d(
                x, self.conv_offset(x), self.weight, self.stride,
                self.padding, self.dilation, self.deformable_groups)

    class CropSplit(nn.Module):
        """Pure-torch transcription of crop_split_cuda_kernel.cu:18-57:
        no clamping; plane = idx_h*2+idx_w with half sizes (x2-x1+0.1)/2."""

        def __init__(self, c=2):
            super().__init__()
            assert c == 2

        def forward(self, data, rois):
            h, w, n = data.shape[1:]
            pw = torch.arange(w, dtype=rois.dtype).view(1, -1, 1)
            ph = torch.arange(h, dtype=rois.dtype).view(-1, 1, 1)
            x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
            in_box = (pw >= x1) & (ph >= y1) & (pw < x2) & (ph < y2)
            right = pw >= x1 + (x2 - x1 + 0.1) / 2
            bottom = ph >= y1 + (y2 - y1 + 0.1) / 2
            quads = [~right & ~bottom, right & ~bottom,
                     ~right & bottom, right & bottom]
            out = data.new_zeros(h, w, n)
            for plane, q in enumerate(quads):
                out = out + data[plane] * (q & in_box).to(data.dtype)
            return out

    class CropSplitGt(nn.Module):
        """crop_split_gt_cuda_kernel.cu: zero outside the box, no quadrants."""

        def __init__(self, c=2):
            super().__init__()

        def forward(self, data, rois):
            h, w, n = data.shape
            pw = torch.arange(w, dtype=rois.dtype).view(1, -1, 1)
            ph = torch.arange(h, dtype=rois.dtype).view(-1, 1, 1)
            x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
            in_box = (pw >= x1) & (ph >= y1) & (pw < x2) & (ph < y2)
            return data * in_box.to(data.dtype)

    def sigmoid_focal_loss(pred, target, gamma, alpha):
        """Per-element focal loss of the CUDA op (sigmoid_focal_loss_cuda.cu):
        target is int 0..C (0 = background), output (n, C) elementwise."""
        nc = pred.size(1)
        t = F.one_hot(target.clamp(min=0).long(), nc + 1)[:, 1:].type_as(pred)
        p = pred.sigmoid()
        pt = (1 - p) * t + p * (1 - t)
        fw = (alpha * t + (1 - alpha) * (1 - t)) * pt.pow(gamma)
        return F.binary_cross_entropy_with_logits(
            pred, t, reduction="none") * fw

    # real ops sources (relative imports resolve against these entries)
    ops = _stub_module("mmdet.ops", is_pkg=True)
    _load_file("mmdet.ops.activation", f"{REF_MMDET}/mmdet/ops/activation.py")
    _load_file("mmdet.ops.conv_ws", f"{REF_MMDET}/mmdet/ops/conv_ws.py")
    _stub_module("mmdet.ops.dcn", DeformConvPack=DeformConvPack,
                 ModulatedDeformConvPack=DeformConvPack)
    norm_mod = _load_file("mmdet.ops.norm", f"{REF_MMDET}/mmdet/ops/norm.py")
    conv_mod = _load_file("mmdet.ops.conv", f"{REF_MMDET}/mmdet/ops/conv.py")
    cm_mod = _load_file("mmdet.ops.conv_module",
                        f"{REF_MMDET}/mmdet/ops/conv_module.py")
    nl_mod = _load_file("mmdet.ops.non_local",
                        f"{REF_MMDET}/mmdet/ops/non_local.py")
    scale_mod = _load_file("mmdet.ops.scale", f"{REF_MMDET}/mmdet/ops/scale.py")
    for k, v in dict(
            Scale=scale_mod.Scale, ConvModule=cm_mod.ConvModule,
            NonLocal2D=nl_mod.NonLocal2D,
            build_conv_layer=conv_mod.build_conv_layer,
            build_norm_layer=norm_mod.build_norm_layer,
            DeformConv=DeformConv, ModulatedDeformConv=DeformConv,
            DeformConvPack=DeformConvPack,
            ContextBlock=None, GeneralizedAttention=None,
            CropSplit=CropSplit, CropSplitGt=CropSplitGt,
            sigmoid_focal_loss=sigmoid_focal_loss).items():
        setattr(ops, k, v)
    nms_wrapper = _stub_module("mmdet.ops.nms.nms_wrapper",
                               nms=_pure_torch_nms)
    _stub_module("mmdet.ops.nms", nms_wrapper=nms_wrapper,
                 nms=_pure_torch_nms)
    ops.nms = sys.modules["mmdet.ops.nms"]
    mmdet.ops = ops

    # ---- mmdet.core: the reference's own geometry/transforms + helpers
    geometry = _load_file("mmdet.core._geometry",
                          f"{REF_MMDET}/mmdet/core/bbox/geometry.py")
    transforms = _load_file("mmdet.core._transforms",
                            f"{REF_MMDET}/mmdet/core/bbox/transforms.py")

    def multi_apply(func, *args, **kwargs):
        pfunc = functools.partial(func, **kwargs) if kwargs else func
        return tuple(map(list, zip(*map(pfunc, *args))))

    def force_fp32(*dargs, **dkw):
        def wrap(fn):
            return fn
        return wrap

    core = _stub_module(
        "mmdet.core", is_pkg=True,
        bbox_overlaps=geometry.bbox_overlaps,
        distance2bbox=transforms.distance2bbox,
        bbox2result=getattr(transforms, "bbox2result", None),
        multi_apply=multi_apply, force_fp32=force_fp32,
        auto_fp16=force_fp32)
    mmdet.core = core

    # ---- mmdet.models: registry plumbing + the reference's loss modules
    class _Registry:
        def __init__(self):
            self.module_dict = {}

        def register_module(self, cls):
            self.module_dict[cls.__name__] = cls
            return cls

    LOSSES, HEADS = _Registry(), _Registry()
    BACKBONES, NECKS, DETECTORS = _Registry(), _Registry(), _Registry()
    models = _stub_module("mmdet.models", is_pkg=True)
    _stub_module("mmdet.models.registry", LOSSES=LOSSES, HEADS=HEADS,
                 BACKBONES=BACKBONES, NECKS=NECKS, DETECTORS=DETECTORS)
    _stub_module("mmdet.utils",
                 get_root_logger=lambda *a, **k: __import__(
                     "logging").getLogger("mmdet"))

    def bias_init_with_prob(prior_prob):
        return float(-np.log((1 - prior_prob) / prior_prob))

    _stub_module("mmdet.models.utils", bias_init_with_prob=bias_init_with_prob)
    _stub_module("mmdet.models.losses", is_pkg=True)
    _load_file("mmdet.models.losses.utils",
               f"{REF_MMDET}/mmdet/models/losses/utils.py")
    for name in ["focal_loss", "iou_loss", "cross_entropy_loss", "mse_loss"]:
        _load_file(f"mmdet.models.losses.{name}",
                   f"{REF_MMDET}/mmdet/models/losses/{name}.py")

    def build_loss(cfg):
        cfg = dict(cfg)
        return LOSSES.module_dict[cfg.pop("type")](**cfg)

    _stub_module("mmdet.models.builder", build_loss=build_loss)
    _stub_module("mmdet.models.anchor_heads", is_pkg=True)

    # ---- the reference's multiclass NMS wrappers (pure python + nms stub)
    bbox_nms = _load_file("mmdet.core._bbox_nms",
                          f"{REF_MMDET}/mmdet/core/post_processing/bbox_nms.py")
    core.multiclass_nms = bbox_nms.multiclass_nms
    core.multiclass_nms_idx = bbox_nms.multiclass_nms_idx
    return mmdet


REF_BENCH = "/root/reference/SipMask-benchmark"
_bench_cache: dict = {}
_vis_cache: dict = {}


def load_reference_vis():
    """Load the SipMask-VIS fork's head (SipMask-VIS/mmdet/models/
    anchor_heads/sipmask_head.py) on the same stub tree: its get_bboxes runs
    the REAL streaming tracker (comp scores + greedy best-score dedup,
    :597-667) on CPU. torch.cuda.current_device is patched to 'cpu' (the
    tracker hardcodes it for dummy-tensor devices)."""
    if _vis_cache:
        return _vis_cache
    load_reference()
    import torch

    torch.cuda.current_device = lambda: "cpu"
    ops = sys.modules["mmdet.ops"]
    mu = sys.modules["mmdet.models.utils"]
    mu.ConvModule = ops.ConvModule
    mu.Scale = ops.Scale
    ml = sys.modules["mmdet.models.losses"]
    acc_mod = _load_file("mmdet.models.losses._vis_accuracy",
                         f"{REF_VIS}/mmdet/models/losses/accuracy.py")
    ml.accuracy = acc_mod.accuracy
    ml.cross_entropy = sys.modules[
        "mmdet.models.losses.cross_entropy_loss"].cross_entropy

    head_mod = _load_file(
        "mmdet.models.anchor_heads.sipmask_head_vis",
        f"{REF_VIS}/mmdet/models/anchor_heads/sipmask_head.py")

    def make_vis_head(num_fg_classes=8, in_channels=32, feat_channels=32,
                      stacked_convs=2, **kw):
        head = head_mod.SipMaskHead(
            num_classes=num_fg_classes + 1,
            in_channels=in_channels,
            feat_channels=feat_channels,
            stacked_convs=stacked_convs,
            strides=kw.pop("strides", (8, 16, 32, 64, 128)),
            **kw)
        return head

    _vis_cache.update(dict(head_mod=head_mod, make_vis_head=make_vis_head))
    return _vis_cache


def load_reference_benchmark():
    """Load the benchmark fork's own SipMaskLossComputation
    (fcos_core/modeling/rpn/sipmask/loss.py) with only the compiled _C
    extension stubbed. Its sigmoid_focal_loss has a real CPU path; IOULoss
    is pure torch; CropSplit/Gt/nms reuse the CUDA-kernel transcriptions
    (the benchmark's csrc copies have identical semantics, incl. the +1 IoU
    in nms_cpu.cpp:22,56-57).

    Returns dict with: loss_mod, make_loss_evaluator(cfg-overrides),
    FakeBoxList (targets container exposing .bbox/.area()/get_field()).
    """
    if _bench_cache:
        return _bench_cache
    if not reference_available():
        raise RuntimeError("reference repo not present")
    load_reference()  # installs torch stubs (not strictly needed, cheap)
    import torch
    import torch.nn as nn

    fcos = _stub_module("fcos_core", is_pkg=True)
    fcos._C = types.SimpleNamespace()  # layers import `from fcos_core import _C`
    sys.modules["fcos_core._C"] = fcos._C

    iou_mod = _load_file("fcos_core.layers.iou_loss",
                         f"{REF_BENCH}/fcos_core/layers/iou_loss.py")
    sfl_mod = _load_file("fcos_core.layers.sigmoid_focal_loss",
                         f"{REF_BENCH}/fcos_core/layers/sigmoid_focal_loss.py")

    ops = sys.modules["mmdet.ops"]  # reuse the CUDA-kernel transcriptions

    def _box_nms(boxes, scores, thr):
        """fcos_core.layers.nms (_C.nms) signature: (boxes, scores, thr) ->
        keep indices; +1 IoU convention (csrc/cpu/nms_cpu.cpp:22,56-57)."""
        dets = torch.cat([boxes, scores[:, None]], 1)
        _, keep = _pure_torch_nms(dets, thr)
        return keep

    _stub_module("fcos_core.layers", is_pkg=True,
                 IOULoss=iou_mod.IOULoss,
                 SigmoidFocalLoss=sfl_mod.SigmoidFocalLoss,
                 CropSplit=ops.CropSplit, CropSplitGt=ops.CropSplitGt,
                 nms=_box_nms)
    _stub_module("fcos_core.modeling", is_pkg=True)
    _stub_module("fcos_core.modeling.matcher", Matcher=object)
    _stub_module("fcos_core.modeling.utils", cat=lambda t, dim=0:
                 t[0] if len(t) == 1 else torch.cat(t, dim))
    _stub_module("fcos_core.modeling.rpn", is_pkg=True)
    _stub_module("fcos_core.modeling.rpn.utils",
                 concat_box_prediction_layers=None)
    _stub_module("fcos_core.modeling.rpn.sipmask", is_pkg=True)
    _stub_module("fcos_core.structures", is_pkg=True)
    _stub_module("fcos_core.structures.boxlist_ops",
                 boxlist_iou=None, cat_boxlist=None)

    loss_mod = _load_file(
        "fcos_core.modeling.rpn.sipmask.loss",
        f"{REF_BENCH}/fcos_core/modeling/rpn/sipmask/loss.py")

    class FakeMasks:
        def __init__(self, t):
            self._t = t

        def get_mask_tensor(self):
            return self._t

    class FakeBoxList:
        """The slice of the BoxList API prepare_targets/loss touch
        (fcos_core/structures/bounding_box.py; area() keeps TO_REMOVE=1)."""
        mode = "xyxy"

        def __init__(self, bbox, labels, masks_full_res):
            self.bbox = bbox
            self._fields = {"labels": labels, "masks": FakeMasks(masks_full_res)}

        def get_field(self, k):
            return self._fields[k]

        def area(self):
            b = self.bbox
            return (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)

    def make_loss_evaluator(num_fg_classes=8):
        cfg = types.SimpleNamespace(MODEL=types.SimpleNamespace(
            SIPMASK=types.SimpleNamespace(
                # 1-element lists: sigmoid_focal_loss_cpu indexes gamma[0]
                # (fcos_core/layers/sigmoid_focal_loss.py:42-43)
                LOSS_GAMMA=[2.0], LOSS_ALPHA=[0.25],
                FPN_STRIDES=[8, 16, 32, 64, 128],
                CENTER_SAMPLING_RADIUS=1.5,
                IOU_LOSS_TYPE="giou", NORM_REG_TARGETS=True)))
        return loss_mod.SipMaskLossComputation(cfg)

    _bench_cache.update(dict(loss_mod=loss_mod, FakeBoxList=FakeBoxList,
                             make_loss_evaluator=make_loss_evaluator))
    return _bench_cache


def load_reference_detector():
    """Load the reference's OWN backbone + neck sources so tests can run the
    full model forward (mmdet/models/backbones/resnet.py:13-521,
    necks/fpn.py:10-178) on CPU with real ConvModule/BN/GN semantics. Only
    DeformConv is a pure-torch transcription (see _torch_deform_conv2d).

    Returns dict with ResNet / FPN classes and ``make_r50_gn_detector()``
    which builds (backbone, neck, head) exactly per
    configs/sipmask/sipmask_r50_caffe_fpn_gn_1x.py.
    """
    if "ResNet" in _cache:
        return _cache
    load_reference()
    # package stub so resnext.py's relative imports (`from .resnet import`,
    # `from ..registry import`) resolve
    _stub_module("mmdet.models.backbones", is_pkg=True)
    resnet_mod = _load_file("mmdet.models.backbones.resnet",
                            f"{REF_MMDET}/mmdet/models/backbones/resnet.py")
    resnext_mod = _load_file("mmdet.models.backbones.resnext",
                             f"{REF_MMDET}/mmdet/models/backbones/resnext.py")
    hrnet_mod = _load_file("mmdet.models.backbones.hrnet",
                           f"{REF_MMDET}/mmdet/models/backbones/hrnet.py")
    fpn_mod = _load_file("mmdet.models.necks.fpn",
                         f"{REF_MMDET}/mmdet/models/necks/fpn.py")
    # hrfpn imports caffe2_xavier_init from mmcv.cnn.weight_init
    import torch.nn as _nn

    def _caffe2_xavier_init(module, bias=0):
        _nn.init.kaiming_uniform_(module.weight, a=1)
        if hasattr(module, "bias") and module.bias is not None:
            _nn.init.constant_(module.bias, bias)

    wi = _stub_module("mmcv.cnn.weight_init",
                      caffe2_xavier_init=_caffe2_xavier_init)
    sys.modules["mmcv.cnn"].weight_init = wi
    hrfpn_mod = _load_file("mmdet.models.necks.hrfpn",
                           f"{REF_MMDET}/mmdet/models/necks/hrfpn.py")
    ssdvgg_mod = _load_file("mmdet.models.backbones.ssd_vgg",
                            f"{REF_MMDET}/mmdet/models/backbones/ssd_vgg.py")
    bfp_mod = _load_file("mmdet.models.necks.bfp",
                         f"{REF_MMDET}/mmdet/models/necks/bfp.py")

    def make_r50_gn_detector(num_fg_classes=80):
        backbone = resnet_mod.ResNet(
            depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
            frozen_stages=1, norm_cfg=dict(type="BN", requires_grad=False),
            style="caffe")
        neck = fpn_mod.FPN(
            in_channels=[256, 512, 1024, 2048], out_channels=256,
            start_level=1, add_extra_convs=True, extra_convs_on_inputs=False,
            num_outs=5, relu_before_extra_convs=True)
        neck.init_weights()
        head = _cache["make_head"](
            num_fg_classes=num_fg_classes, in_channels=256, feat_channels=256,
            stacked_convs=4, center_sampling=True, norm=True)
        return backbone, neck, head

    _cache.update(dict(ResNet=resnet_mod.ResNet, FPN=fpn_mod.FPN,
                       ResNeXt=resnext_mod.ResNeXt,
                       HRNet=hrnet_mod.HRNet, HRFPN=hrfpn_mod.HRFPN,
                       SSDVGG=ssdvgg_mod.SSDVGG, BFP=bfp_mod.BFP,
                       make_r50_gn_detector=make_r50_gn_detector))
    return _cache


def load_reference():
    """Returns a namespace dict with the loaded reference modules:
      head_mod: mmdet sipmask_head module (SipMaskHead, crop_split fallback)
      core: fake mmdet.core with the reference's own distance2bbox /
            bbox_overlaps / multiclass_nms(_idx)
      make_head(**kw): construct a SipMaskHead with the CUDA crop ops
            replaced by the pure-torch transcriptions (same semantics).
    """
    if _cache:
        return _cache
    if not reference_available():
        raise RuntimeError("reference repo not present")
    _make_torch_stubs()
    _make_mmdet_stubs()
    head_mod = _load_file(
        "mmdet.models.anchor_heads.sipmask_head",
        f"{REF_MMDET}/mmdet/models/anchor_heads/sipmask_head.py")

    def make_head(num_fg_classes=8, in_channels=32, feat_channels=32,
                  stacked_convs=2, center_sampling=True, norm=True, **kw):
        head = head_mod.SipMaskHead(
            num_classes=num_fg_classes + 1,
            in_channels=in_channels,
            feat_channels=feat_channels,
            stacked_convs=stacked_convs,
            # the head's own defaults are (4, 8, ...); every SipMask config
            # overrides to (8, ..., 128) (sipmask_r50_caffe_fpn_gn_1x.py)
            strides=kw.pop("strides", (8, 16, 32, 64, 128)),
            center_sampling=center_sampling,
            norm_cfg=(dict(type="GN", num_groups=32, requires_grad=True)
                      if norm else None),
            **kw)
        return head

    _cache.update(dict(head_mod=head_mod, core=sys.modules["mmdet.core"],
                       make_head=make_head))
    return _cache


def load_reference_transforms():
    """The reference's OWN SSD augmentation classes — PhotoMetricDistortion /
    Expand / MinIoURandomCrop (mmdet/datasets/pipelines/transforms.py:
    460-720) — with only plumbing stubbed: mmcv's bgr2hsv/hsv2bgr are
    cv2.cvtColor one-liners (exactly mmcv's convert_color_factory), the
    PIPELINES registry is a no-op decorator, and bbox_overlaps is the
    reference's real mmdet/core/evaluation/bbox_overlaps.py."""
    if "aug_transforms" in _cache:
        return _cache["aug_transforms"]
    if not reference_available():
        raise RuntimeError("reference repo not present")
    import cv2

    if "mmcv" not in sys.modules:
        _stub_module("mmcv", is_pkg=True)
    mmcv = sys.modules["mmcv"]
    mmcv.bgr2hsv = lambda img: cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    mmcv.hsv2bgr = lambda img: cv2.cvtColor(img, cv2.COLOR_HSV2BGR)

    # mmcv 0.x imaging functions, reimplemented per their documented cv2
    # semantics (mmcv/image/transforms/{resize,normalize,flip,pad}.py of the
    # era): imresize takes (w, h); imrescale computes the single scalar
    # keep-ratio factor and the int(x*f+0.5) target size; imnormalize is
    # plain (img - mean) / std after optional BGR->RGB.
    _interp = dict(nearest=cv2.INTER_NEAREST, bilinear=cv2.INTER_LINEAR,
                   bicubic=cv2.INTER_CUBIC, area=cv2.INTER_AREA,
                   lanczos=cv2.INTER_LANCZOS4)
    import numpy as _np

    def _imresize(img, size, return_scale=False, interpolation="bilinear"):
        h, w = img.shape[:2]
        out = cv2.resize(img, size, interpolation=_interp[interpolation])
        if not return_scale:
            return out
        return out, size[0] / w, size[1] / h

    def _imrescale(img, scale, return_scale=False, interpolation="bilinear"):
        h, w = img.shape[:2]
        if isinstance(scale, (float, int)):
            f = scale
        else:
            long_edge, short_edge = max(scale), min(scale)
            f = min(long_edge / max(h, w), short_edge / min(h, w))
        size = (int(w * f + 0.5), int(h * f + 0.5))
        out = _imresize(img, size, interpolation=interpolation)
        return (out, f) if return_scale else out

    def _impad(img, shape, pad_val=0):
        if len(shape) < len(img.shape):
            shape = shape + (img.shape[-1],)
        pad = _np.empty(shape, dtype=img.dtype)
        pad[...] = pad_val
        pad[:img.shape[0], :img.shape[1], ...] = img
        return pad

    def _impad_to_multiple(img, divisor, pad_val=0):
        ph = int(_np.ceil(img.shape[0] / divisor)) * divisor
        pw = int(_np.ceil(img.shape[1] / divisor)) * divisor
        return _impad(img, (ph, pw), pad_val)

    def _imnormalize(img, mean, std, to_rgb=True):
        img = img.astype(_np.float32)
        if to_rgb:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return (img - mean) / std

    mmcv.imresize = _imresize
    mmcv.imrescale = _imrescale
    mmcv.imflip = lambda img, direction="horizontal": (
        _np.flip(img, axis=1) if direction == "horizontal"
        else _np.flip(img, axis=0))
    mmcv.impad = _impad
    mmcv.impad_to_multiple = _impad_to_multiple
    mmcv.imnormalize = _imnormalize
    mmcv.is_list_of = lambda seq, t: isinstance(seq, (list, tuple)) and all(
        isinstance(x, t) for x in seq)
    mmcv.is_str = lambda x: isinstance(x, str)

    for name in ("mmdet", "mmdet.core", "mmdet.core.evaluation",
                 "mmdet.datasets", "mmdet.datasets.pipelines"):
        if name not in sys.modules:
            _stub_module(name, is_pkg=True)
    if "mmdet.core.evaluation.bbox_overlaps" not in sys.modules:
        _load_file("mmdet.core.evaluation.bbox_overlaps",
                   f"{REF_MMDET}/mmdet/core/evaluation/bbox_overlaps.py")

    class _Registry:
        def register_module(self, cls):
            return cls

    _stub_module("mmdet.datasets.registry", PIPELINES=_Registry())
    mod = _load_file("mmdet.datasets.pipelines.transforms",
                     f"{REF_MMDET}/mmdet/datasets/pipelines/transforms.py")
    _cache["aug_transforms"] = mod
    return mod


def soft_nms_cpu_oracle(dets, iou_thr, method="linear", sigma=0.5,
                        min_score=1e-3):
    """Pure-numpy transcription of the reference's soft_nms_cpu_kernel
    (mmdet/ops/nms/src/nms_cpu.cpp:71-200) — TEST ORACLE ONLY.

    dets: (N, 5) [x1, y1, x2, y2, score] f32. Returns (dets_out, inds)
    where dets_out rows are the surviving detections in pick order with
    their decayed scores (the kernel's result[:, :5]) and inds the
    original indices (result[:, 5])."""
    import numpy as np
    dets = dets.astype(np.float32).copy()
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    ndets = len(dets)
    inds = np.arange(ndets, dtype=np.float32)
    method_code = {"linear": 1, "gaussian": 2, "naive": 0}[method]

    i = 0
    while i < ndets:
        max_pos = i + int(np.argmax(scores[i:ndets]))
        for arr in (x1, y1, x2, y2, scores, areas, inds):
            arr[i], arr[max_pos] = arr[max_pos], arr[i]
        ix1, iy1, ix2, iy2, iarea = x1[i], y1[i], x2[i], y2[i], areas[i]
        pos = i + 1
        while pos < ndets:
            xx1 = max(ix1, x1[pos]); yy1 = max(iy1, y1[pos])
            xx2 = min(ix2, x2[pos]); yy2 = min(iy2, y2[pos])
            w = max(np.float32(0), xx2 - xx1 + 1)
            h = max(np.float32(0), yy2 - yy1 + 1)
            inter = w * h
            ovr = inter / (iarea + areas[pos] - inter)
            weight = np.float32(1.0)
            if method_code == 1:
                if ovr > iou_thr:
                    weight = np.float32(1.0) - ovr
            elif method_code == 2:
                weight = np.exp(-(ovr * ovr) / np.float32(sigma))
            else:
                weight = np.float32(0.0 if ovr > iou_thr else 1.0)
            scores[pos] = weight * scores[pos]
            if scores[pos] < min_score:
                last = ndets - 1
                for arr in (x1, y1, x2, y2, scores, areas, inds):
                    arr[pos] = arr[last]
                ndets -= 1
                pos -= 1
            pos += 1
        i += 1
    out = np.stack([x1, y1, x2, y2, scores], 1)[:ndets]
    return out, inds[:ndets].astype(np.int64)
