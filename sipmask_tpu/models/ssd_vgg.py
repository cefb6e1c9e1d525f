"""SSD-VGG16 backbone (mmdet/models/backbones/ssd_vgg.py, NHWC flax).

VGG-16 through conv5 + the SSD additions: pool5 3x3/s1, dilated fc6,
fc7 1x1, and the extra stride-2 feature layers; outputs conv4_3 (with the
learnable L2Norm, init scale 20) and fc7 plus the extra-layer maps —
enough feature levels for an SSD-style or FPN head. Not used by any
SipMask config (reference keeps it for the SSD detector family); provided
for backbone-surface parity.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_init, max_pool

VGG16_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))


class L2Norm(nn.Module):
    """Per-channel learnable L2 normalization (ssd_vgg.py L2Norm)."""

    scale: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight",
                           nn.initializers.constant(self.scale),
                           (x.shape[-1],))
        norm = jnp.sqrt((x.astype(jnp.float32) ** 2).sum(-1, keepdims=True)
                        + self.eps)
        return (x / norm * gamma).astype(x.dtype)


class SSDVGG(nn.Module):
    """Returns (conv4_3 L2-normed, fc7, extra1, extra2, ...)."""

    num_extras: int = 2            # SSD300 uses 4; 2 suffice for 5 levels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outs = []
        for si, (n_convs, ch) in enumerate(VGG16_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1,
                            kernel_init=conv_init("kaiming"),
                            dtype=self.dtype,
                            name=f"conv{si + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            if si == 3:  # conv4_3 output (before pool4)
                outs.append(L2Norm(name="l2norm")(x))
            if si < 4:
                x = max_pool(x, 2, 2)
            else:  # pool5: 3x3 stride 1 (SSD modification)
                x = max_pool(x, 3, 1, padding=1)
        # dilated fc6 + fc7
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6),
                            kernel_init=conv_init("kaiming"),
                            dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), kernel_init=conv_init("kaiming"),
                            dtype=self.dtype, name="fc7")(x))
        outs.append(x)
        # extra layers: 1x1 squeeze -> 3x3 stride-2
        ch = 256
        for i in range(self.num_extras):
            x = nn.relu(nn.Conv(ch, (1, 1), kernel_init=conv_init("kaiming"),
                                dtype=self.dtype, name=f"extra{i}_1")(x))
            x = nn.relu(nn.Conv(ch * 2, (3, 3), strides=(2, 2), padding=1,
                                kernel_init=conv_init("kaiming"),
                                dtype=self.dtype, name=f"extra{i}_2")(x))
            outs.append(x)
        return tuple(outs)
