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

import functools
import os

import jax
import jax.numpy as jnp

from .pallas.deform_gather import (DENSE_BWD_MAX_Q, DX_RESIDENT_MAX_BYTES,
                                   P_BLK, _deform_bwd_pallas,
                                   pallas_available, sample_bilinear_rows,
                                   sample_bilinear_rows_t)


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


# ------------------------ fused TPU path (kc-major, one-kernel backward)

# dW accumulator (K*Cg, O) f32 must stay comfortably VMEM-resident next to
# the level-resident dX block; FeatureAlign (576, 256) is 0.6 MB, backbone
# DCN stages with deform_groups=1 blow past this and take the XLA path.
# Env-overridable so candidate shapes can be A/B-measured on hardware.
DW_RESIDENT_MAX_BYTES = int(os.environ.get(
    "SIPMASK_DW_RESIDENT_MAX_BYTES", str(2 * 1024 * 1024)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _deform_core(x_rows, pyx, w2, h, w, b_n, interpret=False):
    """sampled-then-contracted deformable conv with a fully fused backward.

    Args: x_rows (N=G*B, Q, Cg) g-major; pyx (N, K, P, 2); w2
    (G, K, Cg, O). Returns (B, P, O) f32-accumulated in compute dtype.

    Forward: the kc-major sampling kernel (deform_gather.py) emits
    (N, K*Cg, Ppad) with p MINOR — exactly the layout both the tap
    contraction here and the weight gradient want, so the custom-call
    boundary carries no relayout copies (the p-major pipeline paid
    ~2.3 ms/step of pure copies at hi-acc, plus the same flip at
    inference). Backward: ONE banded Pallas pass (_bwd_conv_kernel)
    computes dX, dpyx, AND dW while deriving dsampled from (dy, W)
    in-kernel — the (N, Ppad, K*Cg) dsampled tensor never exists in HBM
    and the dW einsum's separate read of sampled disappears.
    """
    n, q, cg = x_rows.shape
    g_n, k, _, o = w2.shape
    sampT = sample_bilinear_rows_t(x_rows, pyx, h, w,
                                   interpret=interpret)  # (N, K*Cg, Ppad)
    b = n // g_n
    out = jnp.einsum("gbxp,gxo->bpo",
                     sampT.reshape(g_n, b, k * cg, -1),
                     w2.reshape(g_n, k * cg, o).astype(sampT.dtype),
                     preferred_element_type=jnp.float32)
    return out[:, :pyx.shape[2], :].astype(x_rows.dtype)


def _deform_core_fwd(x_rows, pyx, w2, h, w, b_n, interpret=False):
    n, q, cg = x_rows.shape
    g_n, k, _, o = w2.shape
    sampT = sample_bilinear_rows_t(x_rows, pyx, h, w, interpret=interpret)
    b = n // g_n
    w_flat = w2.reshape(g_n, k * cg, o).astype(sampT.dtype)
    out = jnp.einsum("gbxp,gxo->bpo",
                     sampT.reshape(g_n, b, k * cg, -1), w_flat,
                     preferred_element_type=jnp.float32)
    out = out[:, :pyx.shape[2], :].astype(x_rows.dtype)
    return out, (x_rows, pyx, sampT, w_flat)


def _deform_core_bwd(h, w, b_n, interpret, res, dout):
    x_rows, pyx, sampT, w_flat = res
    g_n, kcg, o = w_flat.shape
    wT = w_flat.transpose(0, 2, 1)                        # (G, O, K*Cg)
    dx, dpyx, dw = _deform_bwd_pallas(x_rows, pyx, sampT,
                                      dout.astype(x_rows.dtype), wT, h, w,
                                      b_n, interpret=interpret)
    k = pyx.shape[1]
    dw2 = dw.reshape(g_n, k, kcg // k, o)
    return dx, dpyx, dw2.astype(jnp.float32)


_deform_core.defvjp(_deform_core_fwd, _deform_core_bwd)


def _use_fused_core(h, w, cg, k, o, mask) -> bool:
    if mask is not None or not pallas_available():
        return False
    if h * w <= DENSE_BWD_MAX_Q:
        return False  # tiny levels: plain XLA autodiff fuses best
    qpad = -(-(h * w) // 512) * 512
    return (qpad * cg * 4 <= DX_RESIDENT_MAX_BYTES
            and k * cg * o * 4 <= DW_RESIDENT_MAX_BYTES)


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

    if _use_fused_core(h, w, cg, k, o, mask):
        # g-major N ordering: the fused backward accumulates dW per g
        # across consecutive (b, p-block) grid steps
        x_rows_g = x.reshape(b, h * w, g, cg).transpose(2, 0, 1, 3)
        x_rows_g = x_rows_g.reshape(g * b, h * w, cg)
        pyx_g = pyx.reshape(b, g, k, p, 2).transpose(1, 0, 2, 3, 4)
        pyx_g = pyx_g.reshape(g * b, k, p, 2)
        w2 = weight.reshape(k, g, cg, o).transpose(1, 0, 2, 3)
        out = _deform_core(x_rows_g, pyx_g, w2, h, w, b)
        out = out.reshape(b, ho, wo, o)
        if bias is not None:
            out = out + bias
        return out.astype(x.dtype)

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
