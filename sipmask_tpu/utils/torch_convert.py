"""PyTorch checkpoint -> sipmask_tpu parameter conversion.

Maps the reference's released ``.pth`` state_dicts (mmdetection naming:
backbone.layerX.Y.convZ / neck.lateral_convs / bbox_head.*) onto this
framework's flax param/constants trees, for AP-parity validation against
published models. Works on a plain {name: np.ndarray} dict (use
``torch.load(..., map_location='cpu')`` then ``.numpy()``; torch-cpu is
available in this image).

Layout notes:
- conv weights OIHW -> HWIO; 1x1 offsets convs likewise;
- frozen BN (weight/bias/running_mean/running_var) -> the ``constants``
  collection (gamma/beta/mean/var);
- GroupNorm weight/bias -> scale/bias;
- mmdet ConvModule norm param name is 'gn' (ops/conv_module.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax import traverse_util


def _cw(w):  # conv weight OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _hrnet_backbone(sd, P, bn):
    """HRNet state_dict -> models/hrnet.py naming.

    Reference layout (mmdet/models/backbones/hrnet.py):
      conv1/bn1/conv2/bn2 stem; layer1.{b} Bottlenecks;
      transition{s-1}.{i}: Sequential(conv, bn, relu) for an existing branch
      whose channels change (keys .{i}.0 / .{i}.1) or
      Sequential(Sequential(conv, bn, relu)) for a new branch (.{i}.0.0 /
      .{i}.0.1); stage{s}.{m}.branches.{i}.{b} BasicBlocks;
      stage{s}.{m}.fuse_layers.{i}.{j}: Sequential(conv1x1, bn, Upsample)
      when j > i (.0 / .1), a chain of Sequential(conv3x3s2, bn[, relu])
      when j < i (.{k}.0 / .{k}.1).
    """
    P("backbone/stem_conv1/kernel", _cw(sd["backbone.conv1.weight"]))
    bn("backbone.bn1", "backbone/stem_bn1")
    P("backbone/stem_conv2/kernel", _cw(sd["backbone.conv2.weight"]))
    bn("backbone.bn2", "backbone/stem_bn2")

    b = 0
    while f"backbone.layer1.{b}.conv1.weight" in sd:
        src, dst = f"backbone.layer1.{b}", f"backbone/layer1_{b}"
        for ci in (1, 2, 3):
            P(f"{dst}/conv{ci}/kernel", _cw(sd[f"{src}.conv{ci}.weight"]))
            bn(f"{src}.bn{ci}", f"{dst}/bn{ci}")
        if f"{src}.downsample.0.weight" in sd:
            P(f"{dst}/downsample_conv/kernel",
              _cw(sd[f"{src}.downsample.0.weight"]))
            bn(f"{src}.downsample.1", f"{dst}/downsample_bn")
        b += 1

    for s in (2, 3, 4):
        t = f"backbone.transition{s - 1}"
        for i in range(s):
            if f"{t}.{i}.0.0.weight" in sd:  # new lowest-resolution branch
                P(f"backbone/t{s}_new{i}/kernel",
                  _cw(sd[f"{t}.{i}.0.0.weight"]))
                bn(f"{t}.{i}.0.1", f"backbone/t{s}_newbn{i}")
            elif f"{t}.{i}.0.weight" in sd:  # channel-changing existing branch
                P(f"backbone/t{s}_conv{i}/kernel",
                  _cw(sd[f"{t}.{i}.0.weight"]))
                bn(f"{t}.{i}.1", f"backbone/t{s}_bn{i}")

        m = 0
        while f"backbone.stage{s}.{m}.branches.0.0.conv1.weight" in sd:
            sm = f"backbone.stage{s}.{m}"
            dm = f"backbone/stage{s}_m{m}"
            i = 0
            while f"{sm}.branches.{i}.0.conv1.weight" in sd:
                b = 0
                while f"{sm}.branches.{i}.{b}.conv1.weight" in sd:
                    src = f"{sm}.branches.{i}.{b}"
                    dst = f"{dm}/branch{i}_block{b}"
                    for ci in (1, 2):
                        P(f"{dst}/conv{ci}/kernel",
                          _cw(sd[f"{src}.conv{ci}.weight"]))
                        bn(f"{src}.bn{ci}", f"{dst}/bn{ci}")
                    b += 1
                i += 1
            n_br = i
            for i in range(n_br):
                for j in range(n_br):
                    fl = f"{sm}.fuse_layers.{i}.{j}"
                    if j > i and f"{fl}.0.weight" in sd:
                        P(f"{dm}/fuse/up_{j}_{i}_conv/kernel",
                          _cw(sd[f"{fl}.0.weight"]))
                        bn(f"{fl}.1", f"{dm}/fuse/up_{j}_{i}_bn")
                    elif j < i:
                        for k in range(i - j):
                            P(f"{dm}/fuse/down_{j}_{i}_{k}_conv/kernel",
                              _cw(sd[f"{fl}.{k}.0.weight"]))
                            bn(f"{fl}.{k}.1", f"{dm}/fuse/down_{j}_{i}_{k}_bn")
            m += 1


def torch_to_flax(sd: Dict[str, np.ndarray], depth: int = 50
                  ) -> Tuple[dict, dict]:
    """Returns (params, constants) nested dicts."""
    params, constants = {}, {}

    def P(path, val):
        params[tuple(path.split("/"))] = np.asarray(val)

    def C(path, val):
        constants[tuple(path.split("/"))] = np.asarray(val)

    def bn(src, dst):
        C(f"{dst}/gamma", sd[f"{src}.weight"])
        C(f"{dst}/beta", sd[f"{src}.bias"])
        C(f"{dst}/mean", sd[f"{src}.running_mean"])
        C(f"{dst}/var", sd[f"{src}.running_var"])

    # ---- backbone (sections are skipped when absent so partial
    # state_dicts — e.g. a rescoring-tower-only checkpoint — convert too)
    blocks = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    if "backbone.transition1.0.0.weight" in sd:
        # HRNet (mmdet/models/backbones/hrnet.py): stem convs, stage-1
        # bottlenecks, transitions, parallel stages with exchange units
        _hrnet_backbone(sd, P, bn)
        blocks = ()  # keys overlap the resnet naming; skip that section
    elif "backbone.features.0.weight" in sd:
        # SSD-VGG (mmdet/models/backbones/ssd_vgg.py): features Sequential
        # (convs at even offsets per stage, pools between stages; appended
        # fc6/fc7 at indices 31/33), extra layers, l2_norm
        idx = 0
        for s, n_convs in enumerate((2, 2, 3, 3, 3)):
            for c in range(n_convs):
                src = f"backbone.features.{idx}"
                P(f"backbone/conv{s + 1}_{c + 1}/kernel",
                  _cw(sd[f"{src}.weight"]))
                P(f"backbone/conv{s + 1}_{c + 1}/bias", sd[f"{src}.bias"])
                idx += 2  # skip the relu
            idx += 1  # stage pool (stage 5's slot is the appended 3x3 pool)
        for name, i in (("fc6", idx), ("fc7", idx + 2)):
            P(f"backbone/{name}/kernel",
              _cw(sd[f"backbone.features.{i}.weight"]))
            P(f"backbone/{name}/bias", sd[f"backbone.features.{i}.bias"])
        P("backbone/l2norm/weight", sd["backbone.l2_norm.weight"])
        i = 0
        while f"backbone.extra.{i}.weight" in sd:
            P(f"backbone/extra{i}/kernel",
              _cw(sd[f"backbone.extra.{i}.weight"]))
            P(f"backbone/extra{i}/bias", sd[f"backbone.extra.{i}.bias"])
            i += 1
        blocks = ()
    elif "backbone.conv1.weight" in sd:
        P("backbone/conv1/kernel", _cw(sd["backbone.conv1.weight"]))
        bn("backbone.bn1", "backbone/bn1")
    else:
        blocks = ()
    for s, nb in enumerate(blocks, start=1):
        for b in range(nb):
            src = f"backbone.layer{s}.{b}"
            dst = f"backbone/layer{s}_{b}"
            for ci in (1, 2, 3):
                wkey = f"{src}.conv{ci}.weight"
                if wkey in sd:
                    P(f"{dst}/conv{ci}/kernel", _cw(sd[wkey]))
                else:  # DCN conv2 (DeformConvPack)
                    P(f"{dst}/conv{ci}/kernel",
                      _cw(sd[f"{src}.conv{ci}.conv.weight"])
                      if f"{src}.conv{ci}.conv.weight" in sd else
                      _cw(sd[f"{src}.conv{ci}.weight"]))
                if f"{src}.conv{ci}.conv_offset.weight" in sd:
                    P(f"{dst}/conv{ci}/conv_offset/kernel",
                      _cw(sd[f"{src}.conv{ci}.conv_offset.weight"]))
                    P(f"{dst}/conv{ci}/conv_offset/bias",
                      sd[f"{src}.conv{ci}.conv_offset.bias"])
                bn(f"{src}.bn{ci}", f"{dst}/bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                P(f"{dst}/downsample_conv/kernel",
                  _cw(sd[f"{src}.downsample.0.weight"]))
                bn(f"{src}.downsample.1", f"{dst}/downsample_bn")

    # ---- neck (lateral 0..2 from C3..C5; fpn convs 0..4 incl. extras)
    i = 0
    while f"neck.lateral_convs.{i}.conv.weight" in sd:
        P(f"neck/lateral_{i}/kernel",
          _cw(sd[f"neck.lateral_convs.{i}.conv.weight"]))
        P(f"neck/lateral_{i}/bias", sd[f"neck.lateral_convs.{i}.conv.bias"])
        i += 1
    i = 0
    # fpn_convs belong to the plain FPN only when laterals exist (HRFPN
    # also names its per-level convs fpn_convs but has no lateral_convs)
    while ("neck.lateral_convs.0.conv.weight" in sd
           and f"neck.fpn_convs.{i}.conv.weight" in sd):
        P(f"neck/fpn_{i}/kernel", _cw(sd[f"neck.fpn_convs.{i}.conv.weight"]))
        P(f"neck/fpn_{i}/bias", sd[f"neck.fpn_convs.{i}.conv.bias"])
        i += 1

    # ---- HRFPN neck (mmdet/models/necks/hrfpn.py: reduction ConvModule +
    # per-level 3x3 ConvModules, act_cfg=None so plain conv+bias)
    if "neck.reduction_conv.conv.weight" in sd:
        P("neck/reduction/kernel", _cw(sd["neck.reduction_conv.conv.weight"]))
        P("neck/reduction/bias", sd["neck.reduction_conv.conv.bias"])
        i = 0
        while f"neck.fpn_convs.{i}.conv.weight" in sd:
            P(f"neck/fpn_conv{i}/kernel",
              _cw(sd[f"neck.fpn_convs.{i}.conv.weight"]))
            P(f"neck/fpn_conv{i}/bias", sd[f"neck.fpn_convs.{i}.conv.bias"])
            i += 1

    # ---- head
    def conv_module(src, dst):
        P(f"{dst}/conv/kernel", _cw(sd[f"{src}.conv.weight"]))
        if f"{src}.conv.bias" in sd:
            P(f"{dst}/conv/bias", sd[f"{src}.conv.bias"])
        if f"{src}.gn.weight" in sd:
            P(f"{dst}/gn/scale", sd[f"{src}.gn.weight"])
            P(f"{dst}/gn/bias", sd[f"{src}.gn.bias"])

    hd = "bbox_head"
    i = 0
    while f"{hd}.cls_convs.{i}.conv.weight" in sd:
        conv_module(f"{hd}.cls_convs.{i}", f"head/cls_convs_{i}")
        i += 1
    i = 0
    while f"{hd}.reg_convs.{i}.conv.weight" in sd:
        conv_module(f"{hd}.reg_convs.{i}", f"head/reg_convs_{i}")
        i += 1
    i = 0
    while f"{hd}.track_convs.{i}.conv.weight" in sd:
        conv_module(f"{hd}.track_convs.{i}", f"head/track_convs_{i}")
        i += 1

    for name in ("fcos_cls", "fcos_reg", "fcos_centerness", "sip_cof",
                 "sip_mask_lat", "sip_mask_lat0", "sipmask_track"):
        if f"{hd}.{name}.weight" in sd:
            P(f"head/{name}/kernel", _cw(sd[f"{hd}.{name}.weight"]))
            P(f"head/{name}/bias", sd[f"{hd}.{name}.bias"])

    for i in range(5):
        if f"{hd}.scales.{i}.scale" in sd:
            P(f"head/scale_{i}/scale", sd[f"{hd}.scales.{i}.scale"])

    # FeatureAlign
    if f"{hd}.feat_align.conv_offset.weight" in sd:
        P("head/feat_align/conv_offset/kernel",
          _cw(sd[f"{hd}.feat_align.conv_offset.weight"]))
        P("head/feat_align/kernel",
          _cw(sd[f"{hd}.feat_align.conv_adaption.weight"]))
    if f"{hd}.feat_align.norm.weight" in sd:
        P("head/feat_align/norm/scale", sd[f"{hd}.feat_align.norm.weight"])
        P("head/feat_align/norm/bias", sd[f"{hd}.feat_align.norm.bias"])

    # rescoring (SipMask++)
    i = 0
    while f"{hd}.convs_scoring.{i}.conv.weight" in sd:
        P(f"rescoring/convs_scoring_{i}/kernel",
          _cw(sd[f"{hd}.convs_scoring.{i}.conv.weight"]))
        P(f"rescoring/convs_scoring_{i}/bias",
          sd[f"{hd}.convs_scoring.{i}.conv.bias"])
        i += 1
    if f"{hd}.mask_scoring.weight" in sd:
        P("rescoring/mask_scoring/kernel", _cw(sd[f"{hd}.mask_scoring.weight"]))
        P("rescoring/mask_scoring/bias", sd[f"{hd}.mask_scoring.bias"])

    return (traverse_util.unflatten_dict(params),
            traverse_util.unflatten_dict(constants))


def flax_to_torch_names(params: dict, constants: dict, depth: int = 50
                        ) -> Dict[str, np.ndarray]:
    """Inverse mapping (for tests / exporting back)."""
    # build by round-tripping: construct the torch dict whose conversion
    # reproduces (params, constants)
    out = {}
    flat_p = traverse_util.flatten_dict(params)
    flat_c = traverse_util.flatten_dict(constants)

    def inv_cw(w):
        return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))

    for path, v in flat_p.items():
        name = "/".join(path)
        v = np.asarray(v)
        torch_name = _flax_path_to_torch(name)
        if path[-1] == "kernel" and v.ndim == 4:
            v = inv_cw(v)
        out[torch_name] = v
    for path, v in flat_c.items():
        name = "/".join(path)
        out[_flax_path_to_torch(name)] = np.asarray(v)
    return out


def _flax_path_to_torch(name: str) -> str:
    import re
    n = name
    n = re.sub(r"^backbone/layer(\d)_(\d+)/", r"backbone.layer\1.\2.", n)
    n = n.replace("downsample_conv/kernel", "downsample.0.weight")
    n = n.replace("downsample_bn/", "downsample.1/")
    n = re.sub(r"^neck/lateral_(\d)/", r"neck.lateral_convs.\1.conv.", n)
    n = re.sub(r"^neck/fpn_(\d)/", r"neck.fpn_convs.\1.conv.", n)
    n = re.sub(r"^head/(cls|reg|track)_convs_(\d)/conv/",
               r"bbox_head.\1_convs.\2.conv.", n)
    n = re.sub(r"^head/(cls|reg|track)_convs_(\d)/gn/",
               r"bbox_head.\1_convs.\2.gn.", n)
    n = re.sub(r"^head/scale_(\d)/scale", r"bbox_head.scales.\1.scale", n)
    n = n.replace("head/feat_align/conv_offset/",
                  "bbox_head.feat_align.conv_offset.")
    n = n.replace("head/feat_align/norm/", "bbox_head.feat_align.norm.")
    n = n.replace("head/feat_align/kernel",
                  "bbox_head.feat_align.conv_adaption.weight")
    n = re.sub(r"^rescoring/convs_scoring_(\d)/",
               r"bbox_head.convs_scoring.\1.conv.", n)
    n = n.replace("rescoring/mask_scoring/", "bbox_head.mask_scoring.")
    n = re.sub(r"^head/", "bbox_head.", n)
    n = re.sub(r"^backbone/", "backbone.", n)
    n = n.replace("/", ".")
    n = n.replace(".kernel", ".weight")
    n = n.replace(".scale", ".weight") if n.endswith("gn.scale") else n
    n = (n.replace(".gamma", ".weight").replace(".beta", ".bias")
         .replace(".mean", ".running_mean").replace(".var", ".running_var"))
    # GroupNorm scale -> weight
    n = n.replace("gn.scale", "gn.weight")
    n = n.replace("norm.scale", "norm.weight")
    return n
