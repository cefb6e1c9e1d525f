"""Fused SP mask-loss Pallas kernel: assembly + BCE with zero HBM blowup.

The XLA mask-loss path (ops/crop_split.py mask_bce_loss_indexed) materializes
(h, w, K) f32 logits per image — 550MB at 800x1344 K=512 — and its backward
re-reads them; the device profile attributes ~36ms of the 197ms high-accuracy
train step to these tensors (docs/KERNEL_NOTES.md round 3). This kernel
computes the per-positive pixel-summed BCE

    pre[k] = sum_p inb[p,k] * BCE(sel[p,k], y[p,k])
    sel[p,k] = basis[p] @ cof_q(p,k)[k]      (q = quadrant of p in box k)
    y[p,k]   = gt_masks[gt_idx[k], p]

entirely in VMEM: per (image, pixel-tile) it runs the four quadrant matmuls
(PB, NB) @ (NB, K) on the MXU, selects by in-kernel quadrant indicators
(CropSplit semantics, crop_split_cuda_kernel.cu:45-56 — +0.1 half-split
guard, strict upper bounds), gathers gt by a {0,1} one-hot matmul (exact in
bf16), and reduces the stable BCE-with-logits into a K-vector accumulator
that stays VMEM-resident for the whole image. HBM traffic per image drops
from ~2-3GB to basis+gt reads (~21MB).

The backward recomputes sel per tile (matmul-cheap) and emits
    dbasis[p] = sum_q (dsel * mask_q) @ cof_q
    dcof_q[k] = basis^T @ (dsel * mask_q),  dsel = g[k]*(sigmoid(sel)-y)*inb
with dcof accumulated in VMEM across pixel tiles. Boxes and gt carry no
gradient (the reference crops with stop-gradient boxes,
sipmask_head.py:407-417).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .deform_gather import pallas_available, _compiler_params

P_TILE = 512   # flat pixels per grid step (v5e sweep: 512 beats 256-4096)


def _pad_axis(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pixel_coords(pt, pb, w):
    """Flat pixel index -> (py, px, valid-row broadcastable) as f32 columns."""
    i = (jax.lax.broadcasted_iota(jnp.int32, (pb, 1), 0) + pt * pb)
    fi = i.astype(jnp.float32)
    # +0.5 keeps the f32 reciprocal-multiply away from integer boundaries:
    # floor(fi/w) via rounded 1/w is off by one at exact multiples of w for
    # 38 of the widths <= 2048 (e.g. 656, 752); floor((fi+0.5)/w) is exact
    # while py * 2^-22 < 0.5/w, i.e. any mask wider than a few pixels.
    py = jnp.floor((fi + 0.5) * (1.0 / w))
    px = fi - py * w
    return py, px, i


def _quadrant_preds(py, px, boxes_ref):
    """In-kernel CropSplit indicators. boxes_ref: (1, 8, K) f32 rows
    [x1, y1, x2, y2, pad...]; returns (inb, right, bottom) each (PB, K)."""
    x1 = boxes_ref[0, 0:1, :]
    y1 = boxes_ref[0, 1:2, :]
    x2 = boxes_ref[0, 2:3, :]
    y2 = boxes_ref[0, 3:4, :]
    inb = (px >= x1) & (px < x2) & (py >= y1) & (py < y2)
    right = px >= (x1 + (x2 - x1 + 0.1) * 0.5)
    bottom = py >= (y1 + (y2 - y1 + 0.1) * 0.5)
    return inb, right, bottom


def _sel_logits(basis_blk, cof4_ref, right, bottom, kp):
    """Quadrant-selected logits (PB, K) f32.

    cof4_ref holds the four quadrant matrices stacked along the N axis
    ((NB, 4*K), quadrant-major lanes), so all four products run as ONE
    (PB, NB) @ (NB, 4K) MXU call — the K=NB=32 contraction underfills the
    MXU (32/128 of peak); batching N keeps its pipeline full instead of
    issuing four half-empty (PB,K) dots. Per output element the arithmetic
    is identical to the four separate dots. Returns (sel, sel_all) so the
    backward can reuse the product."""
    sel_all = jnp.dot(basis_blk, cof4_ref[0],
                      preferred_element_type=jnp.float32)   # (PB, 4K)
    m = [sel_all[:, q * kp:(q + 1) * kp] for q in range(4)]
    mtop = jnp.where(right, m[1], m[0])
    mbot = jnp.where(right, m[3], m[2])
    return jnp.where(bottom, mbot, mtop)


def _fwd_kernel(basis_ref, gtT_ref, onehotT_ref, cof4_ref, boxes_ref,
                pre_ref, *, kp, w, hw):
    import jax.experimental.pallas as pl

    pt = pl.program_id(1)
    py, px, i = _pixel_coords(pt, basis_ref.shape[1], w)
    inb, right, bottom = _quadrant_preds(py, px, boxes_ref)
    inb = inb & (i < hw)                                  # flat padding
    basis_blk = basis_ref[0]                              # (PB, NB)
    sel = _sel_logits(basis_blk, cof4_ref, right, bottom, kp)
    y = jnp.dot(gtT_ref[0], onehotT_ref[0],
                preferred_element_type=jnp.float32)       # (PB, K) exact 0/1
    bce = (jnp.maximum(sel, 0.0) - sel * y +
           jnp.log1p(jnp.exp(-jnp.abs(sel))))
    contrib = jnp.where(inb, bce, 0.0).sum(0)             # (K,)

    @pl.when(pt == 0)
    def _():
        pre_ref[...] = jnp.zeros_like(pre_ref)

    pre_ref[0, 0, :] += contrib


def _bwd_kernel(basis_ref, gtT_ref, onehotT_ref, cof4_ref, boxes_ref, g_ref,
                dbasis_ref, dcof4_ref, *, kp, w, hw):
    import jax.experimental.pallas as pl

    pt = pl.program_id(1)
    py, px, i = _pixel_coords(pt, basis_ref.shape[1], w)
    inb, right, bottom = _quadrant_preds(py, px, boxes_ref)
    inb = inb & (i < hw)
    basis_blk = basis_ref[0]
    sel = _sel_logits(basis_blk, cof4_ref, right, bottom, kp)
    y = jnp.dot(gtT_ref[0], onehotT_ref[0],
                preferred_element_type=jnp.float32)
    dsel = jnp.where(inb, (jax.nn.sigmoid(sel) - y) * g_ref[0, 0:1, :], 0.0)
    dsel = dsel.astype(basis_blk.dtype)

    @pl.when(pt == 0)
    def _():
        dcof4_ref[...] = jnp.zeros_like(dcof4_ref)

    # Mask dsel into the quadrant-stacked (PB, 4K) layout matching cof4:
    # both backward contractions then run as ONE full-K MXU call each
    # (K=PB for dcof, K=4Kp for dbasis) instead of four half-empty dots
    # plus four separate masked copies.
    zero = jnp.zeros_like(dsel)
    m = jnp.concatenate(
        [jnp.where(right, zero, jnp.where(bottom, zero, dsel)),
         jnp.where(right, jnp.where(bottom, zero, dsel), zero),
         jnp.where(right, zero, jnp.where(bottom, dsel, zero)),
         jnp.where(right, jnp.where(bottom, dsel, zero), zero)],
        axis=1)                                           # (PB, 4K)
    # dcof4 (NB, 4K) += basis^T @ m   (contract PB on both)
    dcof4_ref[0] += jax.lax.dot_general(
        basis_blk, m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dcof4_ref.dtype)
    # dbasis (PB, NB) = m @ cof4^T    (contract the stacked 4K axis)
    dbasis = jax.lax.dot_general(m, cof4_ref[0], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbasis_ref[0] = dbasis.astype(dbasis_ref.dtype)


def _prep(basis, cofs, boxes, gt_masks_g, gt_idx, mm_dtype):
    b, h, w, nb = basis.shape
    k = cofs.shape[1]
    g = gt_masks_g.shape[1]
    kp = -(-k // 128) * 128
    gp = max(-(-g // 16) * 16, 16)
    hw = h * w
    hwp = -(-hw // P_TILE) * P_TILE

    basis2 = _pad_axis(basis.reshape(b, hw, nb).astype(mm_dtype),
                       P_TILE, 1)
    gtT = gt_masks_g.reshape(b, g, hw).transpose(0, 2, 1)
    gtT = _pad_axis(_pad_axis(gtT.astype(mm_dtype), 16, 2), P_TILE, 1)
    onehotT = jax.nn.one_hot(gt_idx, gp, dtype=mm_dtype,
                             axis=1)                       # (B, Gp, K)
    onehotT = _pad_axis(onehotT, 128, 2)
    # quadrant matrices stacked along N (quadrant-major lanes): (B, NB, 4*Kp)
    cof4 = _pad_axis(
        cofs.astype(mm_dtype).reshape(b, k, 4, nb).transpose(0, 3, 2, 1), 128,
        3).reshape(b, nb, 4 * kp)
    boxesT = jnp.concatenate(
        [boxes.astype(jnp.float32).transpose(0, 2, 1),
         jnp.zeros((b, 4, k), jnp.float32)], 1)            # (B, 8, K)
    boxesT = _pad_axis(boxesT, 128, 2)
    return basis2, gtT, onehotT, cof4, boxesT, (b, hw, hwp, nb, k, kp, gp,
                                                h, w)


@functools.partial(jax.jit, static_argnames=("h", "w", "kp", "interpret"))
def _fused_fwd_call(basis2, gtT, onehotT, cof4, boxesT, h, w, kp,
                    interpret=False):
    import jax.experimental.pallas as pl

    b, hwp, nb = basis2.shape
    gp = gtT.shape[2]
    pt_n = hwp // P_TILE
    grid = (b, pt_n)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kp=kp, w=w, hw=h * w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P_TILE, nb), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, P_TILE, gp), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, gp, kp), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, nb, 4 * kp), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, 8, kp), lambda bb, pt: (bb, 0, 0)),
        ],
        # (B, 8, Kp) with row 0 live: Mosaic requires the block's trailing
        # two dims be (8, 128)-divisible
        out_specs=pl.BlockSpec((1, 8, kp), lambda bb, pt: (bb, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 8, kp), jnp.float32),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(basis2, gtT, onehotT, cof4, boxesT)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnames=("h", "w", "kp", "interpret"))
def _fused_bwd_call(basis2, gtT, onehotT, cof4, boxesT, gpad, h, w, kp,
                    interpret=False):
    import jax.experimental.pallas as pl

    b, hwp, nb = basis2.shape
    gp = gtT.shape[2]
    pt_n = hwp // P_TILE
    grid = (b, pt_n)
    dbasis, dcof4 = pl.pallas_call(
        functools.partial(_bwd_kernel, kp=kp, w=w, hw=h * w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P_TILE, nb), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, P_TILE, gp), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, gp, kp), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, nb, 4 * kp), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, 8, kp), lambda bb, pt: (bb, 0, 0)),
            pl.BlockSpec((1, 1, kp), lambda bb, pt: (bb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, P_TILE, nb), lambda bb, pt: (bb, pt, 0)),
            pl.BlockSpec((1, nb, 4 * kp), lambda bb, pt: (bb, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hwp, nb), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 4 * kp), jnp.float32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(basis2, gtT, onehotT, cof4, boxesT, gpad)
    return dbasis, dcof4


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mask_bce_core(basis, cofs, boxes, gt_masks_g, gt_idx, interpret,
                   mm_dtype):
    basis2, gtT, onehotT, cof4, boxesT, meta = _prep(
        basis, cofs, boxes, gt_masks_g, gt_idx, mm_dtype)
    (b, hw, hwp, nb, k, kp, gp, h, w) = meta
    out = _fused_fwd_call(basis2, gtT, onehotT, cof4, boxesT, h, w, kp,
                          interpret=interpret)
    return out[:, :k]


def _core_fwd(basis, cofs, boxes, gt_masks_g, gt_idx, interpret, mm_dtype):
    return (_mask_bce_core(basis, cofs, boxes, gt_masks_g, gt_idx,
                           interpret, mm_dtype),
            (basis, cofs, boxes, gt_masks_g, gt_idx))


def _core_bwd(interpret, mm_dtype, res, g):
    basis, cofs, boxes, gt_masks_g, gt_idx = res
    basis2, gtT, onehotT, cof4, boxesT, meta = _prep(
        basis, cofs, boxes, gt_masks_g, gt_idx, mm_dtype)
    (b, hw, hwp, nb, k, kp, gp, h, w) = meta
    gpad = _pad_axis(g.astype(jnp.float32), 128, 1)[:, None, :]  # (B, 1, Kp)
    dbasis2, dcof4 = _fused_bwd_call(basis2, gtT, onehotT, cof4, boxesT,
                                     gpad, h, w, kp, interpret=interpret)
    dbasis = dbasis2[:, :hw, :].reshape(basis.shape).astype(basis.dtype)
    # (B, NB, 4*Kp) quadrant-major lanes -> (B, K, 4*NB)
    dcof = dcof4.reshape(b, nb, 4, kp)[:, :, :, :k].transpose(
        0, 3, 2, 1).reshape(b, k, 4 * nb).astype(cofs.dtype)
    return dbasis, dcof, jnp.zeros_like(boxes), _zero_cot(gt_masks_g), \
        _zero_cot(gt_idx)


def _zero_cot(x):
    """Zero cotangent; integer arrays take float0 per JAX's tangent rules."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    import numpy as np
    return np.zeros(x.shape, jax.dtypes.float0)


_mask_bce_core.defvjp(_core_fwd, _core_bwd)


def mask_bce_fused_available() -> bool:
    return pallas_available()


def mask_bce_loss_fused(basis, cofs, boxes, gt_masks_g, gt_idx,
                        interpret=False, mm_dtype=jnp.bfloat16):
    """Batched fused mask BCE.

    Args:
      basis: (B, h, w, NB) basis masks.
      cofs: (B, K, 4*NB) selected quadrant coefficients.
      boxes: (B, K, 4) xyxy in mask (stride-2) coordinates.
      gt_masks_g: (B, G, h, w) binary {0,1} gt masks.
      gt_idx: (B, K) int32 gt index per positive.
      mm_dtype: dtype the assembly/gather matmuls run in (f32 accumulate
        either way). Pass the MODEL's compute dtype: when the model runs
        bf16, basis/cofs values are already bf16-representable, so the
        bf16 cast is lossless and the kernel matches the f32 XLA fallback
        up to summation order; when the model runs f32, pass float32 so
        the fused path does not silently quantize (slower MXU passes, but
        that configuration is chosen for precision).
    Returns:
      (B, K) pixel-summed BCE per positive — same values as
      vmap(mask_bce_loss_indexed) (ops/crop_split.py) up to summation order.
      Differentiable in basis and cofs; boxes/gt carry zero gradient.
    """
    return _mask_bce_core(basis, cofs, boxes,
                          jax.lax.stop_gradient(gt_masks_g),
                          gt_idx, interpret,
                          jax.dtypes.canonicalize_dtype(mm_dtype))
