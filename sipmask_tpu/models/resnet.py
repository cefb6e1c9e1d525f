"""Caffe-style ResNet-50/101 backbone (flax.linen, NHWC).

Rewrite of mmdet/models/backbones/resnet.py:13-521 for TPU:
- 'caffe' style: the stride-2 conv in each bottleneck is the first 1x1
  (resnet.py:125-130) — required for parity with the released checkpoints.
- All BatchNorms frozen (FrozenBatchNorm, reference norm_cfg BN
  requires_grad=False + norm_eval), statistics loadable from torch weights.
- frozen_stages handled by the optimizer mask (sipmask_tpu/train/optim.py),
  plus stop_gradient here to save backward compute.
- Optional DCN stages for SipMask++ ('DCN' == DeformConvPack: deformable
  conv v1 replacing conv2, offsets from a zero-init 3x3 conv on the input,
  configs/sipmask/sipmask++_r101_caffe_fpn_ssd_6x.py:13-14).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvFoldedBN, FrozenBatchNorm, conv_init, max_pool, relu
from ..ops.deform_conv import deform_conv2d

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class DeformConvPack(nn.Module):
    """3x3 deformable conv v1 whose offsets come from an internal zero-init
    conv on the input (mmdet/ops/dcn/deform_conv.py DeformConvPack)."""

    features: int
    deform_groups: int = 1
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.deform_groups
        offsets = nn.Conv(g * 18, (3, 3), strides=(self.stride, self.stride),
                          padding=1, use_bias=True,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          dtype=self.dtype, name="conv_offset")(x)
        weight = self.param(
            "kernel", conv_init("kaiming"),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        return deform_conv2d(x, offsets.astype(jnp.float32),
                             weight.astype(jnp.float32),
                             stride=self.stride, padding=1,
                             deform_groups=g).astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    style: str = "caffe"
    with_dcn: bool = False
    dcn_deform_groups: int = 1
    # ResNeXt (mmdet/models/backbones/resnext.py Bottleneck): grouped 3x3
    # conv with width = planes * base_width/64 * groups
    groups: int = 1
    base_width: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv1_stride = self.stride if self.style == "caffe" else 1
        conv2_stride = 1 if self.style == "caffe" else self.stride
        identity = x
        if self.groups == 1:
            width = self.planes
        else:
            width = int(self.planes * (self.base_width / 64)) * self.groups

        # every conv-BN pair is folded: the frozen-BN affine rides the conv
        # weights (ConvFoldedBN), so no elementwise BN pass (fwd or bwd)
        # ever touches the activations
        s1, b1 = FrozenBatchNorm(width, name="bn1").affine()
        out = ConvFoldedBN(width, 1, stride=conv1_stride, dtype=self.dtype,
                           name="conv1")(x, s1, b1)
        out = relu(out)

        s2, b2 = FrozenBatchNorm(width, name="bn2").affine()
        if self.with_dcn:
            assert self.groups == 1, "DCN + grouped conv not supported"
            out = DeformConvPack(width,
                                 deform_groups=self.dcn_deform_groups,
                                 stride=conv2_stride, dtype=self.dtype,
                                 name="conv2")(out)
            out = out * s2.astype(out.dtype) + b2.astype(out.dtype)
        else:
            out = ConvFoldedBN(width, 3, stride=conv2_stride,
                               groups=self.groups, dtype=self.dtype,
                               name="conv2")(out, s2, b2)
        out = relu(out)

        s3, b3 = FrozenBatchNorm(self.planes * 4, name="bn3").affine()
        out = ConvFoldedBN(self.planes * 4, 1, dtype=self.dtype,
                           name="conv3")(out, s3, b3)

        if self.downsample:
            sd, bd = FrozenBatchNorm(self.planes * 4,
                                     name="downsample_bn").affine()
            identity = ConvFoldedBN(self.planes * 4, 1,
                                    stride=self.stride, dtype=self.dtype,
                                    name="downsample_conv")(x, sd, bd)
        return relu(out + identity)


class ResNet(nn.Module):
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    style: str = "caffe"
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dcn_deform_groups: int = 1
    # groups > 1 turns this into ResNeXt (mmdet resnext.py); e.g.
    # ResNeXt-101 32x4d: depth=101, groups=32, base_width=4
    groups: int = 1
    base_width: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized BGR (caffe means). Returns C2..C5."""
        blocks = STAGE_BLOCKS[self.depth]
        s0, b0 = FrozenBatchNorm(64, name="bn1").affine()
        x = ConvFoldedBN(64, 7, stride=2, dtype=self.dtype,
                         name="conv1")(x, s0, b0)
        x = relu(x)
        x = max_pool(x, 3, 2, padding=1)
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)

        outs = []
        for stage, n_blocks in enumerate(blocks):
            planes = 64 * 2 ** stage
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    style=self.style,
                    # the SipMask fork gates DCN to every 3rd block of an
                    # enabled stage — block 0 and i % 3 == 0 (mmdet
                    # backbones/resnet.py:281,288-291) — NOT all blocks as in
                    # stock mmdet; e.g. R101 stage 3 has 8 of 23 DCN blocks
                    with_dcn=self.stage_with_dcn[stage] and b % 3 == 0,
                    dcn_deform_groups=self.dcn_deform_groups,
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}")(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)
