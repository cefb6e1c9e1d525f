"""BFP — Balanced Feature Pyramid neck (mmdet/models/necks/bfp.py,
"Libra R-CNN": gather all levels to one resolution, average (integrate),
refine with a conv, and scatter the residual back to every level).

Wraps an existing pyramid (applied AFTER FPN/HRFPN); not used by SipMask
configs, provided for neck-surface parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_init, resize_bilinear, max_pool


class BFP(nn.Module):
    out_channels: int = 256
    refine_level: int = 2  # which pyramid level to integrate at
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        n = len(feats)
        rh, rw = feats[self.refine_level].shape[1:3]
        gathered = []
        for i, f in enumerate(feats):
            if i < self.refine_level:   # higher res -> downsample (max pool)
                k = 2 ** (self.refine_level - i)
                gathered.append(max_pool(f, k, k))
            elif i > self.refine_level:  # lower res -> upsample
                gathered.append(resize_bilinear(f, rh, rw))
            else:
                gathered.append(f)
        bsf = sum(gathered) / n
        bsf = nn.Conv(self.out_channels, (3, 3), padding=1,
                      kernel_init=conv_init("kaiming"), dtype=self.dtype,
                      name="refine")(bsf)
        outs = []
        for i, f in enumerate(feats):
            h, w = f.shape[1:3]
            if i < self.refine_level:
                r = resize_bilinear(bsf, h, w)
            elif i > self.refine_level:
                k = 2 ** (i - self.refine_level)
                r = max_pool(bsf, k, k)
            else:
                r = bsf
            outs.append(f + r)
        return tuple(outs)
