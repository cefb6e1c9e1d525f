"""Spatial-Preservation mask assembly: the TPU-native crop_split.

Replaces the reference's CropSplit/CropSplitGt CUDA kernels
(mmdet/ops/crop/src/crop_split_cuda_kernel.cu:18-155, crop_split_gt_*.cu)
with pure-XLA arithmetic that fuses into the basis@coefficients matmuls.

Exact semantics replicated from the CUDA kernel (:45-56):
- pixel (ph, pw) is inside box n iff  pw >= x1 & ph >= y1 & pw < x2 & ph < y2
  (float compares, no clamping);
- half-split sizes are roi_w = (x2-x1+0.1)/2, roi_h = (y2-y1+0.1)/2 (the +0.1
  guard makes the int() quadrant index land in {0,1});
- quadrant plane = idx_h*2 + idx_w, i.e. planes ordered [00, 01, 10, 11] =
  [top-left, top-right, bottom-left, bottom-right], matching the stack order
  at sipmask_head.py:452;
- pixels outside the box produce 0.

On TPU we never materialize the (4, h, w, n) sigmoid stack: assembly is
``sum_q quadrant_mask_q * sigmoid(basis @ cof_q)`` and the training loss is
computed directly on logits per quadrant (numerically identical to
BCE(crop(sigmoid), crop(gt)) because each pixel lies in exactly one quadrant
and outside-box pixels contribute exactly 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quadrant_masks(boxes, h: int, w: int, dtype=jnp.float32):
    """Per-detection quadrant indicator masks.

    Args:
      boxes: (N, 4) xyxy in *mask* coordinates (i.e. already divided by 2).
      h, w: mask grid size.
    Returns:
      q: (4, h, w, N) float {0,1}; planes ordered [00, 01, 10, 11].
    """
    pw = jnp.arange(w, dtype=boxes.dtype)[None, :, None]  # (1, w, 1)
    ph = jnp.arange(h, dtype=boxes.dtype)[:, None, None]  # (h, 1, 1)
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2, y2 = boxes[:, 2], boxes[:, 3]
    in_box = ((pw >= x1) & (pw < x2) & (ph >= y1) & (ph < y2))
    roi_w = (x2 - x1 + 0.1) / 2
    roi_h = (y2 - y1 + 0.1) / 2
    right = pw >= (x1 + roi_w)
    bottom = ph >= (y1 + roi_h)
    q00 = in_box & ~right & ~bottom
    q01 = in_box & right & ~bottom
    q10 = in_box & ~right & bottom
    q11 = in_box & right & bottom
    return jnp.stack([q00, q01, q10, q11], 0).astype(dtype)


def box_crop_mask(boxes, h: int, w: int, dtype=jnp.float32):
    """Whole-box indicator (h, w, N): the CropSplitGt kernel (forward-only)."""
    pw = jnp.arange(w, dtype=boxes.dtype)[None, :, None]
    ph = jnp.arange(h, dtype=boxes.dtype)[:, None, None]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    in_box = ((pw >= x1) & (pw < x2) & (ph >= y1) & (ph < y2))
    return in_box.astype(dtype)


def crop_split(stack, boxes):
    """Drop-in equivalent of the CropSplit CUDA op.

    stack: (4, h, w, N) quadrant value planes; boxes: (N, 4) mask coords.
    Returns (h, w, N): plane value of the pixel's quadrant, 0 outside box.
    """
    _, h, w, _ = stack.shape
    q = quadrant_masks(boxes, h, w, stack.dtype)
    return (stack * q).sum(0)


def _quadrant_bounds(boxes, h, w):
    """Shared per-pixel comparisons: (in_box, right, bottom), each (h, w, N).

    These are pure broadcasted comparisons, so XLA fuses them into whatever
    elementwise consumer follows — the (4, h, w, N) plane stack of the CUDA
    kernel is never materialized.
    """
    pw = jnp.arange(w, dtype=boxes.dtype)[None, :, None]
    ph = jnp.arange(h, dtype=boxes.dtype)[:, None, None]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    in_box = ((pw >= x1) & (pw < x2) & (ph >= y1) & (ph < y2))
    right = pw >= (x1 + (x2 - x1 + 0.1) / 2)
    bottom = ph >= (y1 + (y2 - y1 + 0.1) / 2)
    return in_box, right, bottom


def _colmix_logits(basis, cofs, boxes):
    """Each pixel's quadrant logit via column-mixed coefficients.

    The quadrant index factorizes into a column indicator (right of the
    half-split) and a row indicator (below it). Both are BINARY, so mixing
    the coefficients BEFORE the matmul —
      ctop(x, k) = (1-r)·c00 + r·c01,  cbot(x, k) = (1-r)·c10 + r·c11
    — selects exactly the same c_q as a post-matmul 4-way select (bitwise:
    no reassociation, the mix weights are 0/1). Two (h, w, N) matmul
    outputs replace the (h, w, 4, N) plane stack of the CUDA kernel: half
    the HBM traffic and no 4-way select over the wide tensor (measured
    4.4x faster fwd+bwd at 544^2 bs8 K=256 on v5e).

    Returns (sel (h, w, N) f32 logits, in_box (h, w, N) bool).
    """
    h, w, nb = basis.shape
    n = cofs.shape[0]
    in_box, right, bottom = _quadrant_bounds(boxes.astype(jnp.float32), h, w)
    r = right[0].astype(cofs.dtype)           # (w, N): right is row-constant
    c = cofs.reshape(n, 4, nb)
    ctop = (1 - r)[:, :, None] * c[:, 0][None] + r[:, :, None] * c[:, 1][None]
    cbot = (1 - r)[:, :, None] * c[:, 2][None] + r[:, :, None] * c[:, 3][None]
    bt = jnp.moveaxis(basis, 1, 0)            # (w, h, nb)
    mtop = jnp.einsum("whn,wkn->hwk", bt, ctop.astype(bt.dtype),
                      preferred_element_type=jnp.float32)
    mbot = jnp.einsum("whn,wkn->hwk", bt, cbot.astype(bt.dtype),
                      preferred_element_type=jnp.float32)
    bm = bottom.astype(jnp.float32)           # (h, 1, N): column-constant
    sel = mtop * (1 - bm) + mbot * bm
    return sel, in_box


def assemble_masks(basis, cofs, boxes):
    """SP mask assembly for inference (sipmask_head.py:614-633).

    Args:
      basis: (h, w, nb) basis masks (stride-2 grid).
      cofs: (N, 4*nb) per-detection quadrant coefficients [00|01|10|11].
      boxes: (N, 4) xyxy in mask (stride-2) coordinates.
    Returns:
      masks: (h, w, N) assembled sigmoid probabilities, 0 outside boxes.
    """
    sel, in_box = _colmix_logits(basis, cofs, boxes)
    return jax.nn.sigmoid(sel) * in_box.astype(sel.dtype)


def mask_bce_loss(basis, cofs, boxes, gt_masks):
    """Per-detection mask BCE, fused with SP assembly (training path).

    Numerically equal to the reference sequence (sipmask_head.py:446-458):
    sigmoid -> stack -> CropSplit -> CropSplitGt(gt) -> BCE, but computed on
    logits per quadrant (stable) with column-mixed coefficient matmuls — the
    4-plane stack is never materialized.

    Args:
      basis: (h, w, nb); cofs: (K, 4*nb); boxes: (K, 4) mask coords;
      gt_masks: (h, w, K) binary {0,1} gt at mask resolution.
    Returns:
      pixel-summed BCE per detection: (K,).
    """
    sel, in_box = _colmix_logits(basis, cofs, boxes)
    # stable BCE-with-logits on the selected quadrant's logit; pixels
    # outside the box (where each quadrant mask is 0) contribute exactly 0
    bce = (jnp.clip(sel, 0) - sel * gt_masks +
           jnp.log1p(jnp.exp(-jnp.abs(sel))))
    return (bce * in_box.astype(bce.dtype)).sum((0, 1))


def mask_bce_loss_indexed(basis, cofs, boxes, gt_masks_g, gt_idx):
    """:func:`mask_bce_loss` with the gt gather folded into a matmul.

    The K selected positives index only G << K distinct gt masks, so
    materializing the gathered (h, w, K) gt tensor (75MB/image at 544^2
    K=256, plus its transpose) wastes HBM. BCE splits into a gt-independent
    elementwise part and the linear term ``-sum_p sel*gt``; with gt in
    {0,1} the latter is an (h*w) contraction against the G distinct masks —
    one MXU einsum — followed by a (K, G) diagonal pick.

    Args:
      basis: (h, w, nb); cofs: (K, 4*nb); boxes: (K, 4) mask coords;
      gt_masks_g: (G, h, w) binary {0,1} distinct gt masks;
      gt_idx: (K,) int32 index of each detection's gt in gt_masks_g.
    Returns:
      pixel-summed BCE per detection: (K,) — same values as mask_bce_loss
      up to matmul summation order.
    """
    sel, in_box = _colmix_logits(basis, cofs, boxes)
    inb = in_box.astype(sel.dtype)
    pos = ((jnp.clip(sel, 0) + jnp.log1p(jnp.exp(-jnp.abs(sel)))) * inb
           ).sum((0, 1))                                       # (K,)
    # HIGHEST precision: this einsum directly replaces an exact f32
    # elementwise sum; default TPU matmul precision would add bf16 drift
    # to the BCE linear term that the CPU parity tests cannot see
    t = jnp.einsum("hwk,ghw->kg", sel * inb,
                   gt_masks_g.astype(sel.dtype),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)         # (K, G)
    gt_term = jnp.take_along_axis(t, gt_idx[:, None], axis=1).squeeze(1)
    return pos - gt_term
