"""Deformable convolution v1/v2 for TPU.

Replaces the reference's im2col CUDA kernels
(mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu, ~2000 LoC). Semantics
replicated from the CUDA kernel:

- offset channel layout per deformable group g and kernel tap (i, j):
  [dy, dx] interleaved, group-major — channel = g*2*K + 2*(i*kw + j) + {0,1}
  (deform_conv_cuda_kernel.cu ``data_offset_h/w_ptr``).
- sampling position: p = (h*stride - pad + i*dilation + dy,
                          w*stride - pad + j*dilation + dx).
- bilinear interpolation with zero outside the feature map (corners outside
  [0, H-1] x [0, W-1] contribute 0).
- input channels split into G deformable groups; group g uses offset set g.
- v2 (modulated) multiplies each tap's sampled value by a per-tap mask.

TPU design: sampling positions are decomposed on the host-XLA side into 4
integer corner indices + bilinear weights per (tap, pixel); the gather runs
as a banded one-hot matmul Pallas kernel on the MXU
(ops/pallas/deform_gather.py — XLA's native gather is ~8x slower than the
rest of the SipMask forward combined), and all K taps are contracted in ONE
(B*P, K*C) @ (K*C, O) matmul. Gradients (including offset gradients through
the bilinear weights) flow via a custom VJP over the XLA reference
formulation — the scatter-add backward the CUDA version hand-writes falls
out of autodiff.

Used by FeatureAlign (sipmask_head.py:21-55, deformable_groups=4) and the
SipMask++ DCN backbone stages (configs/sipmask/sipmask++_*.py:13-14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pallas.deform_gather import sample_bilinear_rows


def _sample_positions(offsets, kh, kw, stride, padding, dilation,
                      deform_groups):
    """Offsets -> absolute sampling positions per tap.

    offsets: (B, Ho, Wo, G*K*2) in the CUDA layout.
    Returns pyx (B*G, K, P, 2) f32, P = Ho*Wo.
    """
    b, ho, wo, _ = offsets.shape
    g, k = deform_groups, kh * kw
    off = offsets.astype(jnp.float32).reshape(b, ho, wo, g, k, 2)
    off = off.transpose(0, 3, 4, 1, 2, 5)  # (B, G, K, Ho, Wo, 2)

    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)
    tap_dy = (jnp.arange(kh, dtype=jnp.float32) * dilation)[:, None]
    tap_dx = (jnp.arange(kw, dtype=jnp.float32) * dilation)[None, :]
    tap_dy = jnp.broadcast_to(tap_dy, (kh, kw)).reshape(k)
    tap_dx = jnp.broadcast_to(tap_dx, (kh, kw)).reshape(k)

    py = (base_y[None, None, None, :, None] +
          tap_dy[None, None, :, None, None] + off[..., 0])  # (B,G,K,Ho,Wo)
    px = (base_x[None, None, None, None, :] +
          tap_dx[None, None, :, None, None] + off[..., 1])
    pyx = jnp.stack([py, px], -1)
    return pyx.reshape(b * g, k, ho * wo, 2)


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
    cg = c // g
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    p = ho * wo
    assert offsets.shape == (b, ho, wo, g * k * 2), \
        (offsets.shape, (b, ho, wo, g * k * 2))

    pyx = _sample_positions(offsets, kh, kw, stride, padding, dilation, g)

    # (B, H, W, G, Cg) -> (B*G, H*W, Cg) row-major feature rows
    x_rows = x.reshape(b, h * w, g, cg).transpose(0, 2, 1, 3)
    x_rows = x_rows.reshape(b * g, h * w, cg)

    sampled = sample_bilinear_rows(x_rows, pyx, h, w)  # (B*G, P, K, Cg)
    sampled = sampled.reshape(b, g, p, k, cg)

    if mask is not None:
        m = mask.reshape(b, p, g, k).transpose(0, 2, 1, 3)  # (B,G,P,K)
        sampled = sampled * m[..., None].astype(sampled.dtype)

    # group-batched tap contraction straight off the kernel's p-major
    # layout: contracting (K, Cg) are the two minor dims, so no transpose
    # of the big sampled tensor is materialized (the former
    # (B*P, K*C) @ (K*C, O) form relayouted ~120 MB/step at hi-acc)
    w2 = weight.reshape(k, g, cg, o).transpose(1, 0, 2, 3)  # (G, K, Cg, O)
    out = jnp.einsum("bgpkc,gkco->bpo", sampled,
                     w2.astype(sampled.dtype),
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, ho, wo, o)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def modulated_deform_conv2d(x, offsets, mask, weight, **kw):
    """DCNv2: ``mask`` is the (B, Ho, Wo, G*K) post-sigmoid modulation."""
    return deform_conv2d(x, offsets, weight, mask=mask, **kw)
