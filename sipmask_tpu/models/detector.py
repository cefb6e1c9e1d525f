"""SipMask detector: backbone -> FPN -> head (+ rescoring module).

Rewrite of mmdet/models/detectors/sipmask.py:1-16 + single_stage.py:17-93
(and the VIS variant SipMask-VIS/.../single_stage.py:50-86, which extracts
features of the reference frame too). The detector is a thin composition; the
train/inference drivers live in ``sipmask_tpu/train`` / ``sipmask_tpu/infer``.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from .resnet import ResNet
from .fpn import FPN
from .hrnet import HRNet, HRFPN
from .sipmask_head import SipMaskHead, RescoringHead


class SipMask(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        if c.backbone.type == "hrnet":
            self.backbone = HRNet(width=c.backbone.hrnet_width, dtype=dtype)
        else:
            self.backbone = ResNet(
                depth=c.backbone.depth,
                out_indices=c.backbone.out_indices,
                frozen_stages=c.backbone.frozen_stages,
                style=c.backbone.style,
                stage_with_dcn=c.backbone.stage_with_dcn,
                dcn_deform_groups=c.backbone.dcn_deform_groups,
                groups=c.backbone.groups,
                base_width=c.backbone.base_width,
                dtype=dtype)
        if c.fpn.type == "hrfpn":
            self.neck = HRFPN(out_channels=c.fpn.out_channels,
                              num_outs=c.fpn.num_outs, dtype=dtype)
        else:
            self.neck = FPN(
                out_channels=c.fpn.out_channels,
                start_level=c.fpn.start_level,
                num_outs=c.fpn.num_outs,
                add_extra_convs=c.fpn.add_extra_convs,
                extra_convs_on_inputs=c.fpn.extra_convs_on_inputs,
                relu_before_extra_convs=c.fpn.relu_before_extra_convs,
                dtype=dtype)
        self.head = SipMaskHead(c.head, dtype=dtype)
        if c.head.rescoring:
            self.rescoring = RescoringHead(c.head.num_classes, dtype=dtype)

    def extract_feats(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images, images_ref=None):
        """images: (B, H, W, 3) normalized; returns the head output dict."""
        feats = self.extract_feats(images)
        feats_ref = (self.extract_feats(images_ref)
                     if images_ref is not None else None)
        return self.head(feats, feats_ref)

    def rescore(self, masks):
        """masks: (N, h, w, 1) detached assembled masks -> (N, C) mask-IoU."""
        return self.rescoring(masks)


def build_model(cfg: ModelConfig) -> SipMask:
    return SipMask(cfg)
