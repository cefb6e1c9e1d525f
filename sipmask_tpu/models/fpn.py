"""Feature Pyramid Network P3..P7 (flax.linen, NHWC).

Rewrite of mmdet/models/necks/fpn.py:10-178 with the SipMask configuration
(config :13-21): start_level=1 (C3..C5), add_extra_convs=True on outputs
(P6 from P5, P7 from relu(P6)), relu_before_extra_convs=True, no norms,
xavier-uniform init (fpn.py:132-135).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_init, relu, resize_nearest


class FPN(nn.Module):
    out_channels: int = 256
    start_level: int = 1
    num_outs: int = 5
    add_extra_convs: bool = True
    extra_convs_on_inputs: bool = False
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Tuple[jnp.ndarray, ...]):
        used = inputs[self.start_level:]
        n = len(used)

        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=True,
                    kernel_init=conv_init("xavier"), dtype=self.dtype,
                    name=f"lateral_{i}")(used[i])
            for i in range(n)
        ]
        # top-down pathway, nearest 2x (fpn.py:149-152)
        for i in range(n - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_nearest(laterals[i], h, w)

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=True,
                    kernel_init=conv_init("xavier"), dtype=self.dtype,
                    name=f"fpn_{i}")(laterals[i])
            for i in range(n)
        ]
        # extra levels from stride-2 convs on outputs (fpn.py:160-177)
        if self.add_extra_convs and self.num_outs > n:
            src = inputs[-1] if self.extra_convs_on_inputs else outs[-1]
            for i in range(n, self.num_outs):
                if i > n and self.relu_before_extra_convs:
                    src = relu(src)
                src = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                              padding=1, use_bias=True,
                              kernel_init=conv_init("xavier"),
                              dtype=self.dtype, name=f"fpn_{i}")(src)
                outs.append(src)
        return tuple(outs)
