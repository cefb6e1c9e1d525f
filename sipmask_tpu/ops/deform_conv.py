"""Deformable convolution v1/v2 for TPU.

Replaces the reference's im2col CUDA kernels
(mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu, ~2000 LoC) with an XLA
formulation: per kernel tap, bilinearly gather the shifted feature map, then
contract with that tap's weight slice on the MXU. Peak memory is one
(B, H, W, C) buffer per tap instead of the full im2col matrix; JAX autodiff
through the gather yields the scatter-add backward (offset gradients
included) that the CUDA version hand-writes.

Semantics replicated from the CUDA kernel:
- offset channel layout per deformable group g and kernel tap (i, j):
  [dy, dx] interleaved, group-major — channel = g*2*K + 2*(i*kw + j) + {0,1}
  (deform_conv_cuda_kernel.cu ``data_offset_h/w_ptr``).
- sampling position: p = (h*stride - pad + i*dilation + dy,
                          w*stride - pad + j*dilation + dx).
- bilinear interpolation with zero outside the feature map (taps whose 4
  neighbours are all out of bounds contribute 0).
- input channels are split into G deformable groups; group g uses offset g.
- v2 (modulated) multiplies each tap's sampled value by a per-tap mask.

Used by FeatureAlign (sipmask_head.py:21-55, deformable_groups=4) and the
SipMask++ DCN backbone stages (configs/sipmask/sipmask++_*.py:13-14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(x, py, px):
    """Bilinear sample x (B, H, W, G, Cg) at (py, px) (B, Ho, Wo, G).

    Zero padding outside [0, H-1] x [0, W-1], matching the CUDA
    ``deformable_im2col_bilinear`` (values gathered only from in-bounds
    integer neighbours).
    """
    b, h, w, g, cg = x.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0  # weight for y0+1
    wx1 = px - x0
    out = 0.0
    xf = x.reshape(b, h * w, g, cg)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yy = y0 + dy
        xx = x0 + dx
        wgt = ((wy1 if dy else (1.0 - wy1)) * (wx1 if dx else (1.0 - wx1)))
        inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat = yi * w + xi  # (B, Ho, Wo, G)
        bo, ho, wo, _ = flat.shape
        gathered = jnp.take_along_axis(
            xf, flat.reshape(b, ho * wo, g, 1).astype(jnp.int32),
            axis=1).reshape(b, ho, wo, g, cg)
        out = out + gathered * (wgt * inb.astype(x.dtype))[..., None]
    return out  # (B, Ho, Wo, G, Cg)


def deform_conv2d(x, offsets, weight, *, stride: int = 1, padding: int = 1,
                  dilation: int = 1, deform_groups: int = 1, mask=None,
                  bias=None):
    """Deformable conv (NHWC).

    Args:
      x: (B, H, W, C).
      offsets: (B, Ho, Wo, G*K*2) in the CUDA layout ([dy, dx] per tap,
        group-major), where K = kh*kw.
      weight: (kh, kw, C, O) HWIO.
      mask: optional (B, Ho, Wo, G*K) modulation (sigmoid already applied),
        making this DCNv2.
    Returns:
      (B, Ho, Wo, O).
    """
    b, h, w, c = x.shape
    kh, kw, wc, o = weight.shape
    assert wc == c, (wc, c)
    g = deform_groups
    assert c % g == 0
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offsets.shape == (b, ho, wo, g * k * 2), (offsets.shape, (b, ho, wo, g * k * 2))

    off = offsets.reshape(b, ho, wo, g, k, 2)
    xg = x.reshape(b, h, w, g, c // g)
    base_y = (jnp.arange(ho, dtype=x.dtype) * stride - padding)[None, :, None, None]
    base_x = (jnp.arange(wo, dtype=x.dtype) * stride - padding)[None, None, :, None]

    out = jnp.zeros((b, ho, wo, o), jnp.promote_types(x.dtype, jnp.float32))
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            py = base_y + i * dilation + off[..., t, 0]  # (B, Ho, Wo, G)
            px = base_x + j * dilation + off[..., t, 1]
            sampled = _bilinear_gather(xg, py, px)  # (B, Ho, Wo, G, Cg)
            if mask is not None:
                m = mask.reshape(b, ho, wo, g, k)[..., t]
                sampled = sampled * m[..., None]
            sampled = sampled.reshape(b, ho, wo, c)
            out = out + jax.lax.dot_general(
                sampled, weight[i, j],
                dimension_numbers=(((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def modulated_deform_conv2d(x, offsets, mask, weight, **kw):
    """DCNv2: ``mask`` is the (B, Ho, Wo, G*K) post-sigmoid modulation."""
    return deform_conv2d(x, offsets, weight, mask=mask, **kw)
