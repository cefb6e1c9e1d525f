"""BFP — Balanced Feature Pyramid neck (mmdet/models/necks/bfp.py,
"Libra R-CNN": gather all levels to one resolution, average (integrate),
optionally refine, and scatter the residual back to every level).

Exact reference semantics: gather/scatter resizes are NEAREST
(bfp.py:80-82,95-98; integer-factor nearest == pixel repetition) and
adaptive max pool (== plain max pool at the power-of-2 level ratios);
``refine_type`` in {None, 'conv', 'non_local'} where 'conv' is a biased
3x3 + ReLU (ConvModule default act, bfp.py:49-56) and 'non_local' is the
embedded-gaussian NonLocal2D block with reduction=1, use_scale=False
(bfp.py:57-63, ops/non_local.py). Wraps an existing pyramid (applied
AFTER FPN/HRFPN); not used by SipMask configs, provided for neck-surface
parity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import conv_init, max_pool, relu, repeat2d


class NonLocal2D(nn.Module):
    """Embedded-gaussian non-local block (mmdet/ops/non_local.py:8-105):
    1x1 g/theta/phi, softmax pairwise weights (scaled by
    1/sqrt(inter_channels) when use_scale), zero-init 1x1 conv_out on a
    residual path."""

    reduction: int = 2
    use_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = c // self.reduction
        conv = lambda name, ch, init: nn.Conv(  # noqa: E731
            ch, (1, 1), kernel_init=init, dtype=self.dtype, name=name)
        g = conv("g", inter, conv_init("normal0.01"))(x).reshape(b, h * w,
                                                                 inter)
        theta = conv("theta", inter,
                     conv_init("normal0.01"))(x).reshape(b, h * w, inter)
        phi = conv("phi", inter,
                   conv_init("normal0.01"))(x).reshape(b, h * w, inter)
        pw = jnp.einsum("bic,bjc->bij", theta, phi)
        if self.use_scale:
            pw = pw / jnp.sqrt(jnp.asarray(inter, pw.dtype))
        pw = jax.nn.softmax(pw, axis=-1)
        y = jnp.einsum("bij,bjc->bic", pw, g).reshape(b, h, w, inter)
        out = conv("conv_out", c, nn.initializers.zeros)(y)
        return x + out


class BFP(nn.Module):
    out_channels: int = 256
    refine_level: int = 2  # which pyramid level to integrate at
    refine_type: Optional[str] = "conv"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        n = len(feats)
        gathered = []
        for i, f in enumerate(feats):
            if i < self.refine_level:   # higher res -> adaptive max pool
                k = 2 ** (self.refine_level - i)
                gathered.append(max_pool(f, k, k))
            elif i > self.refine_level:  # lower res -> nearest upsample
                gathered.append(repeat2d(f, 2 ** (i - self.refine_level)))
            else:
                gathered.append(f)
        bsf = sum(gathered) / n
        if self.refine_type == "conv":
            bsf = relu(nn.Conv(self.out_channels, (3, 3), padding=1,
                                  kernel_init=conv_init("xavier"),
                                  dtype=self.dtype, name="refine")(bsf))
        elif self.refine_type == "non_local":
            bsf = NonLocal2D(reduction=1, use_scale=False, dtype=self.dtype,
                             name="refine")(bsf)
        outs = []
        for i, f in enumerate(feats):
            if i < self.refine_level:
                r = repeat2d(bsf, 2 ** (self.refine_level - i))
            elif i > self.refine_level:
                k = 2 ** (i - self.refine_level)
                r = max_pool(bsf, k, k)
            else:
                r = bsf
            outs.append(f + r)
        return tuple(outs)
