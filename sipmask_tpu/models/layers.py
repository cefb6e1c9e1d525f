"""Shared nn building blocks (flax.linen, NHWC).

TPU-native equivalents of the reference's ConvModule/Scale/norm builder
(mmdet/ops/conv_module.py:11, ops/scale.py:5, ops/norm.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


@jax.custom_vjp
def relu(x):
    """ReLU whose VJP keys off the OUTPUT instead of a saved `x > 0` pred.

    jax.nn.relu's autodiff saves a bool mask per call; on TPU those pred
    residuals cost a write + a (often relayouted) read per site (~2 ms/step
    of pure `copy` in the hi-acc train profile). The output y is already a
    residual of the next layer (conv/GN input), so saving y instead is free
    after CSE, and `dy * (y > 0)` is exact: y > 0 iff x > 0, and the
    gradient at x == 0 is 0 either way (jax.nn.relu's convention).
    """
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, dy):
    return (jnp.where(y > 0, dy, jnp.zeros_like(dy)),)


relu.defvjp(_relu_fwd, _relu_bwd)


def repeat2d(x, f: int):
    """Integer-factor nearest-neighbor upsample (== pixel repetition) for
    NHWC tensors; used by BFP gather and HRNet exchange units."""
    return jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with affine params and running stats all frozen.

    Matches the reference backbone's ``norm_cfg=dict(type='BN',
    requires_grad=False)`` + ``norm_eval=True`` (resnet.py / config :11):
    a fixed per-channel affine transform whose statistics come from the
    pretrained checkpoint. Stored in the ``constants`` collection so the
    optimizer never sees them.

    ``affine()`` exposes the folded per-channel (scale, bias) so callers
    can fold the whole BN into an adjacent conv's weights (see
    ConvFoldedBN) instead of paying an elementwise pass over the
    activation.
    """

    features: int
    eps: float = 1e-5

    def setup(self):
        init = lambda fill: (lambda shape: jnp.full(shape, fill, jnp.float32))
        self._gamma = self.variable("constants", "gamma", init(1.0),
                                    (self.features,))
        self._beta = self.variable("constants", "beta", init(0.0),
                                   (self.features,))
        self._mean = self.variable("constants", "mean", init(0.0),
                                   (self.features,))
        self._var = self.variable("constants", "var", init(1.0),
                                  (self.features,))

    def affine(self):
        """Folded (scale, bias) in f32: y = x*scale + bias."""
        scale = self._gamma.value * jax.lax.rsqrt(self._var.value + self.eps)
        bias = self._beta.value - self._mean.value * scale
        return scale, bias

    def __call__(self, x):
        scale, bias = self.affine()
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class ConvFoldedBN(nn.Module):
    """Conv (no bias) with a frozen-BN affine folded into its weights.

    ``conv(x, W)*s + b == conv(x, W*s) + b`` because the BN scale is
    per-output-channel and constant: the fold is a weight-sized f32
    multiply per step instead of an elementwise pass (plus its backward
    ``dy*s`` pass) over the full activation. Parameter name/shape
    ('kernel', HWIO) match nn.Conv so checkpoints and the torch converter
    are unaffected; the frozen-BN constants stay under their own sibling
    module (see Bottleneck). Gradients: dW = conv_grad * s by the chain
    rule through the fold — identical math to the unfolded graph.
    """

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    weight_init: str = "kaiming"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale, bias):
        ks = self.kernel_size
        kernel = self.param(
            "kernel", conv_init(self.weight_init),
            (ks, ks, x.shape[-1] // self.groups, self.features), jnp.float32)
        folded = (kernel * scale[None, None, None, :]).astype(self.dtype)
        p = ks // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), folded,
            window_strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(y.dtype)


class Scale(nn.Module):
    """Learnable scalar multiplier (mmdet/ops/scale.py:5)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale",
                       lambda key: jnp.asarray(self.init_value, jnp.float32))
        return x * s.astype(x.dtype)


def _gn_fwd_impl(x, scale, bias, groups: int, eps: float):
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32)
    s1 = xf.sum(axis=(1, 2))           # (B, C); XLA fuses both sums into
    s2 = (xf * xf).sum(axis=(1, 2))    # one read of x
    n = float(h * w * cg)
    mean = s1.reshape(b, groups, cg).sum(-1) / n          # (B, G)
    var = s2.reshape(b, groups, cg).sum(-1) / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)                        # (B, G)
    g_sc = scale.astype(jnp.float32).reshape(groups, cg)
    g_bi = bias.astype(jnp.float32).reshape(groups, cg)
    sc = (rstd[:, :, None] * g_sc).reshape(b, c)
    bi = (g_bi - (mean * rstd)[:, :, None] * g_sc).reshape(b, c)
    y = xf * sc[:, None, None, :] + bi[:, None, None, :]
    return y.astype(x.dtype), mean, rstd


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def group_norm_nhwc(x, scale, bias, groups: int, eps: float):
    """GroupNorm over NHWC without materializing the (B,H,W,G,C/G) view.

    flax's nn.GroupNorm reshapes the activation into the grouped form, which
    on TPU materializes a relayouted f32 copy per call (~4.7 ms/step across
    the 587 GN sites of the hi-acc train profile). This formulation keeps
    every large tensor in its native NHWC layout: one fused pass produces
    per-(image, channel) sum and sum-of-squares, the (B, C) -> (B, G) group
    reduce is trivial, and mean/rstd fold into a per-channel affine so the
    apply is a single elementwise pass (which XLA fuses into the following
    ReLU/conv). Same single-pass variance as flax's use_fast_variance
    default; stats in f32.

    The VJP is hand-written: autodiff of the formula above keeps the f32
    upcast of the activation (plus its relayout copies) alive as a residual
    and differentiates through the stats chain pass by pass. The custom
    backward saves only (x, mean, rstd), recomputes xhat on the fly, and is
    two fused passes over the big tensors: one (read dy, x) reduction
    producing all per-(B,C)/per-channel sums, one elementwise
    `dx = A*dy + B*x + C` apply with per-(B,C) coefficients.
    """
    y, _, _ = _gn_fwd_impl(x, scale, bias, groups, eps)
    return y


def _gn_vjp_fwd(x, scale, bias, groups, eps):
    y, mean, rstd = _gn_fwd_impl(x, scale, bias, groups, eps)
    return y, (x, scale, mean, rstd)


def _gn_vjp_bwd(groups, eps, res, dy):
    x, scale, mean, rstd = res
    b, h, w, c = x.shape
    cg = c // groups
    n = float(h * w * cg)
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    r1 = dyf.sum(axis=(1, 2))          # (B, C); both reductions fuse into
    r2 = (dyf * xf).sum(axis=(1, 2))   # one read of (dy, x)
    scf = scale.astype(jnp.float32)
    mean_c = jnp.repeat(mean, cg, axis=1)   # (B, C) — tiny
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    sdx = (r2 - mean_c * r1) * rstd_c       # sum_{hw} dy*xhat per (B, C)
    dscale = sdx.sum(axis=0)
    dbias = r1.sum(axis=0)
    # group means of dxhat and dxhat*xhat (dxhat = dy * scale_c)
    m1 = (r1 * scf).reshape(b, groups, cg).sum(-1) / n    # (B, G)
    m2 = (sdx * scf).reshape(b, groups, cg).sum(-1) / n   # (B, G)
    m1_c = jnp.repeat(m1, cg, axis=1)
    m2_c = jnp.repeat(m2, cg, axis=1)
    # dx = rstd*(dxhat - m1 - xhat*m2) folded to one affine in (dy, x)
    a = rstd_c * scf[None, :]
    b2 = -(rstd_c * rstd_c) * m2_c
    c2 = rstd_c * (mean_c * rstd_c * m2_c - m1_c)
    dx = (a[:, None, None, :] * dyf + b2[:, None, None, :] * xf
          + c2[:, None, None, :])
    return (dx.astype(x.dtype), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


group_norm_nhwc.defvjp(_gn_vjp_fwd, _gn_vjp_bwd)


class GroupNorm32(nn.Module):
    """Drop-in for nn.GroupNorm(num_groups, epsilon) with NHWC-native stats.

    Parameter names/shapes ('scale', 'bias', per-channel) match flax's
    GroupNorm so checkpoints and the torch converter are unaffected.

    ``act=True`` fuses the following ReLU into the norm: on TPU at
    tower-sized shapes both lower to the streaming Pallas kernels
    (ops/pallas/group_norm.py — measured 2x less GN/ReLU overhead than
    XLA's lowering at the hi-acc P3 shape); elsewhere the XLA
    ``group_norm_nhwc`` (+ ``relu``) path runs, same math to bf16
    rounding.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    act: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        from ..ops.pallas.group_norm import fused_gn_relu, use_pallas_gn
        if use_pallas_gn(x.shape, self.num_groups):
            return fused_gn_relu(x, scale, bias, self.num_groups,
                                 self.epsilon, self.act)
        y = group_norm_nhwc(x, scale, bias, self.num_groups, self.epsilon)
        return relu(y) if self.act else y


class ConvModule(nn.Module):
    """conv -> (GroupNorm32) -> (ReLU), matching mmdet's ConvModule defaults.

    ``norm``: None or 'gn'. Bias is used iff there is no norm (conv_module.py
    logic at the SipMask head call sites, sipmask_head.py:164-185).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    norm: Optional[str] = None
    act: bool = True
    use_bias: Optional[bool] = None
    weight_init: str = "normal0.01"  # 'normal<std>' | 'xavier' | 'kaiming'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=self.kernel_size // 2,
                    use_bias=bias,
                    kernel_init=conv_init(self.weight_init),
                    dtype=self.dtype, name="conv")(x)
        if self.norm == "gn":
            # the ReLU rides the norm (fused on TPU)
            return GroupNorm32(num_groups=32, epsilon=1e-5, act=self.act,
                               name="gn")(x)
        if self.act:
            x = relu(x)
        return x


def conv_init(spec: str):
    """Map the reference's init names to flax initializers.

    - normal<std>: torch normal_init(std) (head towers etc.)
    - xavier: xavier_uniform (FPN, fpn.py:132-135)
    - kaiming: msra / he-normal fan_out (torch kaiming_init default in mmcv
      uses fan_out + relu nonlinearity)
    """
    if spec.startswith("normal"):
        std = float(spec[len("normal"):] or 0.01)
        if std == 0.0:
            return nn.initializers.zeros
        return nn.initializers.normal(stddev=std)
    if spec == "xavier":
        return nn.initializers.xavier_uniform()
    if spec == "kaiming":
        return nn.initializers.variance_scaling(2.0, "fan_out",
                                                "truncated_normal")
    raise ValueError(spec)


def bias_init_with_prob(prior_prob: float = 0.01):
    """Focal-loss classifier bias init (mmdet/models/utils, used :231-232)."""
    import math
    b = -math.log((1 - prior_prob) / prior_prob)
    return nn.initializers.constant(b)


def resize_bilinear(x, out_h: int, out_w: int):
    """F.interpolate(mode='bilinear', align_corners=False) equivalent (NHWC)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_h, out_w, c), method="bilinear")


def resize_nearest(x, out_h: int, out_w: int):
    """F.interpolate(mode='nearest') equivalent (NHWC)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_h, out_w, c), method="nearest")


def max_pool(x, window: int, stride: int, padding: int = 0):
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=((padding, padding), (padding, padding)))
