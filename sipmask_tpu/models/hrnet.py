"""HRNet backbone + HRFPN neck (NHWC flax).

Rewrites of mmdet/models/backbones/hrnet.py (HighResolutionNet: stem ->
Bottleneck stage1 -> parallel multi-resolution branches with exchange/fuse
units) and mmdet/models/necks/hrfpn.py (concat all branches at 1/4
resolution -> 1x1 reduction -> average-pool pyramid). Widths follow the
standard HRNetV2 spec (W18/W32/W48). BatchNorms are frozen statistics like
the rest of this framework's backbones (the reference trains them when
multi-GPU SyncBN is available; on TPU large-batch data parallelism makes
frozen/loaded statistics the stable default).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import (FrozenBatchNorm, conv_init, relu, repeat2d,
                     resize_bilinear)
from .resnet import Bottleneck

HRNET_WIDTHS = {18: (18, 36, 72, 144), 32: (32, 64, 128, 256),
                48: (48, 96, 192, 384)}
# (num_modules, num_blocks) per stage 2..4 of the standard HRNet recipe
STAGE_SPEC = ((1, 4), (4, 4), (3, 4))


class BasicBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      kernel_init=conv_init("kaiming"), dtype=self.dtype,
                      name="conv1")(x)
        out = relu(FrozenBatchNorm(self.features, name="bn1")(out))
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      kernel_init=conv_init("kaiming"), dtype=self.dtype,
                      name="conv2")(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        if identity.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), use_bias=False,
                               kernel_init=conv_init("kaiming"),
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.features,
                                       name="downsample_bn")(identity)
        return relu(out + identity)


class FuseUnit(nn.Module):
    """HRNet exchange unit: every branch receives every other branch,
    upsampled (1x1 conv + bilinear) or strided-downsampled (3x3 s2 chains)."""

    widths: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        n = len(xs)
        outs = []
        for i in range(n):  # receiving branch
            acc = xs[i]
            for j in range(n):  # sending branch
                if j == i:
                    continue
                y = xs[j]
                if j > i:  # lower res -> upsample
                    y = nn.Conv(self.widths[i], (1, 1), use_bias=False,
                                kernel_init=conv_init("kaiming"),
                                dtype=self.dtype, name=f"up_{j}_{i}_conv")(y)
                    y = FrozenBatchNorm(self.widths[i],
                                        name=f"up_{j}_{i}_bn")(y)
                    # the exchange unit upsamples NEAREST (hrnet.py:136-137
                    # nn.Upsample(scale_factor=2**(j-i), mode='nearest'));
                    # integer-factor nearest == pixel repetition, exact
                    y = repeat2d(y, 2 ** (j - i))
                else:  # higher res -> chain of stride-2 convs
                    for s in range(i - j):
                        last = s == i - j - 1
                        ch = self.widths[i] if last else self.widths[j]
                        y = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                                    use_bias=False,
                                    kernel_init=conv_init("kaiming"),
                                    dtype=self.dtype,
                                    name=f"down_{j}_{i}_{s}_conv")(y)
                        y = FrozenBatchNorm(ch, name=f"down_{j}_{i}_{s}_bn")(y)
                        if not last:
                            y = relu(y)
                acc = acc + y
            outs.append(relu(acc))
        return outs


class HRModule(nn.Module):
    widths: Tuple[int, ...]
    num_blocks: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                x = BasicBlock(self.widths[i], dtype=self.dtype,
                               name=f"branch{i}_block{b}")(x)
            ys.append(x)
        return FuseUnit(self.widths, dtype=self.dtype, name="fuse")(ys)


class HRNet(nn.Module):
    """HighResolutionNet; returns the 4 branch maps at strides 4/8/16/32."""

    width: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        widths = HRNET_WIDTHS[self.width]
        # stem: two stride-2 3x3 convs -> 1/4 resolution
        for i in (1, 2):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, kernel_init=conv_init("kaiming"),
                        dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = relu(FrozenBatchNorm(64, name=f"stem_bn{i}")(x))
        # stage 1: 4 Bottlenecks at 64 planes (256 out channels)
        for b in range(4):
            x = Bottleneck(64, downsample=(b == 0), style="pytorch",
                           dtype=self.dtype, name=f"layer1_{b}")(x)

        # transitions + stages 2..4
        xs = [x]
        for stage, (n_modules, n_blocks) in enumerate(STAGE_SPEC, start=2):
            n_branches = stage
            ws = widths[:n_branches]
            new_xs = []
            for i in range(n_branches):
                if i < len(xs):
                    y = xs[i]
                    if y.shape[-1] != ws[i]:
                        y = nn.Conv(ws[i], (3, 3), padding=1, use_bias=False,
                                    kernel_init=conv_init("kaiming"),
                                    dtype=self.dtype,
                                    name=f"t{stage}_conv{i}")(y)
                        y = relu(FrozenBatchNorm(
                            ws[i], name=f"t{stage}_bn{i}")(y))
                else:  # new lower-resolution branch from the lowest existing
                    y = nn.Conv(ws[i], (3, 3), strides=(2, 2), padding=1,
                                use_bias=False,
                                kernel_init=conv_init("kaiming"),
                                dtype=self.dtype, name=f"t{stage}_new{i}")(
                                    xs[-1])
                    y = relu(FrozenBatchNorm(
                        ws[i], name=f"t{stage}_newbn{i}")(y))
                new_xs.append(y)
            xs = new_xs
            for m in range(n_modules):
                xs = HRModule(ws, num_blocks=n_blocks, dtype=self.dtype,
                              name=f"stage{stage}_m{m}")(xs)
        return tuple(xs)


class HRFPN(nn.Module):
    """HRFPN neck (mmdet/models/necks/hrfpn.py): bilinear-upsample all
    branches to 1/4, concat, 1x1 reduce, then avg-pool to num_outs levels
    each followed by a 3x3 conv."""

    out_channels: int = 256
    num_outs: int = 5
    # extra stride-2 pools before the pyramid: with HRNet's stride-4 base,
    # base_pool=1 makes the levels strides 8..128, matching the SipMask
    # head's stride/regress-range defaults and the stride-2 SP basis grid
    base_pool: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        h, w = feats[0].shape[1:3]
        ups = [feats[0]] + [resize_bilinear(f, h, w) for f in feats[1:]]
        x = jnp.concatenate(ups, -1)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=conv_init("kaiming"), dtype=self.dtype,
                    name="reduction")(x)
        outs = []
        for i in range(self.num_outs):
            k = 2 ** (i + self.base_pool)
            # clamp the window so tiny inputs still yield a 1x1 level
            kh, kw = min(k, x.shape[1]), min(k, x.shape[2])
            y = nn.avg_pool(x, (kh, kw), (kh, kw)) if i + self.base_pool \
                else x
            outs.append(nn.Conv(self.out_channels, (3, 3), padding=1,
                                kernel_init=conv_init("kaiming"),
                                dtype=self.dtype, name=f"fpn_conv{i}")(y))
        return tuple(outs)
