"""SipMask head: FCOS towers + SP coefficient branch + basis-mask branch
(+ tracking branch for VIS, + re-scoring for SipMask++).

Forward-pass rewrite of SipMaskHead (sipmask_head.py:107-287; VIS variant
SipMask-VIS/.../sipmask_head.py:219-317). Loss and decode live in
``sipmask_tpu/models/loss.py`` / ``decode.py`` as pure functions over this
module's output pytree.

Output dict (all NHWC):
  cls_scores:   list of (B, h_l, w_l, C) logits
  bbox_preds:   list of (B, h_l, w_l, 4), already multiplied by stride (:268)
  centernesses: list of (B, h_l, w_l, 1) logits
  cof_preds:    list of (B, h_l, w_l, 4*nb) SP coefficients
  feat_masks:   (B, H/2, W/2, nb) basis masks (stride-2 grid)
  track_feats:  (B, H/8, W/8, 512) when track=True
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (ConvModule, GroupNorm32, Scale, conv_init, relu,
                     bias_init_with_prob, resize_bilinear)
from ..ops.deform_conv import deform_conv2d
from ..config import HeadConfig


class FeatureAlign(nn.Module):
    """Deform-conv feature alignment driven by the box regression
    (sipmask_head.py:21-55): offsets = 1x1 zero-init conv on the detached
    4-ch bbox_pred; 3x3 DeformConv with 4 deformable groups; GN+ReLU
    (GN only when the head uses norms)."""

    features: int
    deform_groups: int = 4
    with_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, shape):
        offsets = nn.Conv(self.deform_groups * 18, (1, 1), use_bias=False,
                          kernel_init=nn.initializers.zeros,
                          dtype=jnp.float32, name="conv_offset")(
                              jax.lax.stop_gradient(shape))
        weight = self.param("kernel", conv_init("normal0.01"),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        x = deform_conv2d(x, offsets, weight.astype(x.dtype),
                          padding=1, deform_groups=self.deform_groups)
        if self.with_norm:
            x = GroupNorm32(num_groups=32, epsilon=1e-5, act=True,
                            name="norm")(x)
            return x.astype(self.dtype)
        return relu(x).astype(self.dtype)


class RescoringHead(nn.Module):
    """SipMask++ mask re-scoring (sipmask_head.py:200-219,466-483,635-643):
    6 stride-2 3x3 valid-padding convs (1->16->16->16->32->64->128) + 1x1
    per-class IoU head, global max-pooled."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, masks):
        """masks: (N, h, w, 1) detached predicted masks -> (N, num_classes)."""
        x = masks
        for i, ch in enumerate([16, 16, 16, 32, 64, 128]):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                        use_bias=True, kernel_init=conv_init("kaiming"),
                        dtype=self.dtype, name=f"convs_scoring_{i}")(x)
            x = relu(x)
        x = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                    kernel_init=conv_init("normal0.001"),
                    dtype=self.dtype, name="mask_scoring")(x)
        x = relu(x)
        return x.max(axis=(1, 2))  # global max pool -> (N, C)


class SipMaskHead(nn.Module):
    cfg: HeadConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, feats_ref=None):
        """feats: tuple of 5 FPN levels (B, h_l, w_l, C).

        feats_ref: reference-frame FPN levels (VIS training only); when given
        and cfg.track, also returns track_feats_ref through the same branch.
        """
        c = self.cfg
        norm = c.norm
        cls_scores, bbox_preds, centernesses, cof_preds = [], [], [], []
        basis_feats = []
        track_ins, track_ref_ins = [], []

        # tower conv stacks are shared across levels -> declare once
        cls_convs = [ConvModule(c.feat_channels, 3, norm=norm,
                                weight_init="normal0.01", dtype=self.dtype,
                                name=f"cls_convs_{i}")
                     for i in range(c.stacked_convs - 1)]
        reg_convs = [ConvModule(c.feat_channels, 3, norm=norm,
                                weight_init="normal0.01", dtype=self.dtype,
                                name=f"reg_convs_{i}")
                     for i in range(c.stacked_convs)]
        track_convs = [ConvModule(c.feat_channels, 3, norm=norm,
                                  weight_init="normal0.01", dtype=self.dtype,
                                  name=f"track_convs_{i}")
                       for i in range(c.stacked_convs - 1)] if c.track else []

        fcos_cls = nn.Conv(c.num_classes, (3, 3), padding=1,
                           kernel_init=conv_init("normal0.01"),
                           bias_init=bias_init_with_prob(0.01),
                           dtype=self.dtype, name="fcos_cls")
        fcos_reg = nn.Conv(4, (3, 3), padding=1,
                           kernel_init=conv_init("normal0.01"),
                           dtype=self.dtype, name="fcos_reg")
        fcos_centerness = nn.Conv(1, (3, 3), padding=1,
                                  kernel_init=conv_init("normal0.01"),
                                  dtype=self.dtype, name="fcos_centerness")
        # sip_cof init: std 0.001 in mmdet image head (:236), 0.01 in VIS (:244)
        sip_cof = nn.Conv(c.num_bases * 4, (3, 3), padding=1,
                          kernel_init=conv_init(
                              "normal0.01" if c.track else "normal0.001"),
                          dtype=self.dtype, name="sip_cof")
        feat_align = FeatureAlign(c.feat_channels, deform_groups=4,
                                  with_norm=norm is not None,
                                  dtype=self.dtype, name="feat_align")
        scales = [Scale(1.0, name=f"scale_{i}") for i in range(len(c.strides))]

        for lvl, (x, stride) in enumerate(zip(feats, c.strides)):
            cls_feat = x
            reg_feat = x
            for conv in cls_convs:
                cls_feat = conv(cls_feat)
            for conv in reg_convs:
                reg_feat = conv(reg_feat)

            bbox_pred = scales[lvl](fcos_reg(reg_feat))
            cls_feat = feat_align(cls_feat, bbox_pred)
            cls_scores.append(fcos_cls(cls_feat))
            centernesses.append(fcos_centerness(reg_feat))
            bbox_preds.append(bbox_pred.astype(jnp.float32) * stride)
            cof_preds.append(sip_cof(cls_feat))

            if lvl < 3:
                h0, w0 = feats[0].shape[1:3]
                up = reg_feat if lvl == 0 else resize_bilinear(reg_feat, h0, w0)
                basis_feats.append(up)
                if c.track:
                    tf = x
                    for conv in track_convs:
                        tf = conv(tf)
                    track_ins.append(tf if lvl == 0
                                     else resize_bilinear(tf, h0, w0))
                    if feats_ref is not None:
                        tr = feats_ref[lvl]
                        for conv in track_convs:
                            tr = conv(tr)
                        track_ref_ins.append(tr if lvl == 0
                                             else resize_bilinear(tr, h0, w0))

        # basis ("contextual") branch (:283-285): concat P3-P5 reg feats,
        # 1x1 -> 512, relu, 3x3 -> nb, relu, upsample x4 => stride-2 grid
        fm = jnp.concatenate(basis_feats, axis=-1)
        lat0 = nn.Conv(512, (1, 1), kernel_init=conv_init("normal0.01"),
                       dtype=self.dtype, name="sip_mask_lat0")
        lat = nn.Conv(c.num_bases, (3, 3), padding=1,
                      kernel_init=conv_init("normal0.01"),
                      dtype=self.dtype, name="sip_mask_lat")
        fm = relu(lat(relu(lat0(fm))))
        h0, w0 = fm.shape[1:3]
        feat_masks = resize_bilinear(fm, h0 * 4, w0 * 4)

        out = dict(cls_scores=cls_scores, bbox_preds=bbox_preds,
                   centernesses=centernesses, cof_preds=cof_preds,
                   feat_masks=feat_masks)

        if c.track:
            # track branch (VIS head :313-317): concat 3 levels (768ch) -> 1x1 -> 512
            sip_track = nn.Conv(512, (1, 1),
                                kernel_init=conv_init("normal0.01"),
                                dtype=self.dtype, name="sipmask_track")
            out["track_feats"] = sip_track(jnp.concatenate(track_ins, -1))
            if feats_ref is not None:
                out["track_feats_ref"] = sip_track(
                    jnp.concatenate(track_ref_ins, -1))

        return out
