"""SSD-VGG16 backbone (mmdet/models/backbones/ssd_vgg.py, NHWC flax).

VGG-16 through conv5 + the SSD additions, matching the reference exactly:
ceil-mode 2x2 stage pools, pool5 3x3/s1, dilated fc6, fc7 1x1, the
``extra_setting`` S-pattern extra layers (ssd_vgg.py:33-35,112-135), and
the learnable L2Norm on conv4_3 (norm = sqrt(sum sq) + eps, eps OUTSIDE
the sqrt, :146-151). Outputs (L2Norm(conv4_3), fc7, extra odd-layer maps)
— 6 levels for input_size=300, 7 for 512 (ssd_vgg.py:96-110). Not used by
any SipMask config (the reference keeps it for the SSD detector family);
provided for backbone-surface parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_init, max_pool, relu

VGG16_STAGES = ((2, 64), (2, 128), (3, 256), (3, 512), (3, 512))

# ssd_vgg.py:33-35 — 'S' marks a stride-2 3x3 conv to the NEXT listed width
EXTRA_SETTING = {
    300: (256, "S", 512, 128, "S", 256, 128, 256, 128, 256),
    512: (256, "S", 512, 128, "S", 256, 128, "S", 256, 128, "S", 256, 128),
}


def ceil_max_pool_2x2(x):
    """MaxPool2d(2, 2, ceil_mode=True): odd extents keep a final window
    padded with -inf (mmcv vgg.py make_vgg_layer)."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return max_pool(x, 2, 2)


class L2Norm(nn.Module):
    """Per-channel learnable L2 normalization (ssd_vgg.py:139-151)."""

    scale: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        gamma = self.param("weight",
                           nn.initializers.constant(self.scale),
                           (x.shape[-1],))
        norm = jnp.sqrt((x.astype(jnp.float32) ** 2)
                        .sum(-1, keepdims=True)) + self.eps
        return (x / norm * gamma).astype(x.dtype)


class SSDVGG(nn.Module):
    """Returns (conv4_3 L2-normed, fc7, extras at every odd layer index)."""

    input_size: int = 300
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        tap = None
        for si, (n_convs, ch) in enumerate(VGG16_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1,
                            kernel_init=conv_init("kaiming"),
                            dtype=self.dtype,
                            name=f"conv{si + 1}_{ci + 1}")(x)
                x = relu(x)
            if si == 3:  # conv4_3 output (before pool4)
                tap = x
            if si < 4:
                x = ceil_max_pool_2x2(x)
            else:  # pool5: 3x3 stride 1 (SSD modification, :54-57)
                x = max_pool(x, 3, 1, padding=1)
        # dilated fc6 + fc7 (:58-65)
        x = relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=(6, 6),
                            kernel_init=conv_init("kaiming"),
                            dtype=self.dtype, name="fc6")(x))
        x = relu(nn.Conv(1024, (1, 1), kernel_init=conv_init("kaiming"),
                            dtype=self.dtype, name="fc7")(x))
        outs = [L2Norm(name="l2norm")(tap), x]

        # extra layers per the S-pattern (_make_extra_layers :112-135):
        # kernel alternates 1/3 by layer count; 'S' -> 3x3 stride-2 pad-1 to
        # the next width (which is then skipped); plain entries are VALID
        # convs; every odd-index layer's relu output is collected (:102-105)
        setting = EXTRA_SETTING[self.input_size]
        li = 0
        skip_next = False
        for i, v in enumerate(setting):
            if skip_next:
                skip_next = False
                continue
            k = (1, 3)[li % 2]
            if v == "S":
                x = nn.Conv(setting[i + 1], (k, k), strides=(2, 2), padding=1,
                            kernel_init=conv_init("xavier"),
                            dtype=self.dtype, name=f"extra{li}")(x)
                skip_next = True
            else:
                x = nn.Conv(v, (k, k), padding=0,
                            kernel_init=conv_init("xavier"),
                            dtype=self.dtype, name=f"extra{li}")(x)
            x = relu(x)
            if li % 2 == 1:
                outs.append(x)
            li += 1
        if self.input_size == 512:  # final 4x4 conv (:133-134)
            x = relu(nn.Conv(256, (4, 4), padding=1,
                                kernel_init=conv_init("xavier"),
                                dtype=self.dtype, name=f"extra{li}")(x))
            if li % 2 == 1:
                outs.append(x)
        return tuple(outs)
