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


def assemble_masks(basis, cofs, boxes):
    """SP mask assembly for inference (sipmask_head.py:614-633).

    Args:
      basis: (h, w, nb) basis masks (stride-2 grid).
      cofs: (N, 4*nb) per-detection quadrant coefficients [00|01|10|11].
      boxes: (N, 4) xyxy in mask (stride-2) coordinates.
    Returns:
      masks: (h, w, N) assembled sigmoid probabilities, 0 outside boxes.
    """
    h, w, nb = basis.shape
    n = cofs.shape[0]
    flat = basis.reshape(h * w, nb)
    q = quadrant_masks(boxes, h, w, basis.dtype)  # (4, h, w, N)
    out = jnp.zeros((h, w, n), basis.dtype)
    for qi in range(4):
        logits = jnp.dot(flat, cofs[:, qi * nb:(qi + 1) * nb].T,
                         preferred_element_type=jnp.float32)
        out = out + q[qi] * jax.nn.sigmoid(logits.reshape(h, w, n))
    return out


def mask_bce_loss(basis, cofs, boxes, gt_masks):
    """Per-detection mask BCE, fused with SP assembly (training path).

    Numerically equal to the reference sequence (sipmask_head.py:446-458):
    sigmoid -> stack -> CropSplit -> CropSplitGt(gt) -> BCE, but computed on
    logits per quadrant for stability and without materializing the 4-plane
    stack.

    Args:
      basis: (h, w, nb); cofs: (K, 4*nb); boxes: (K, 4) mask coords;
      gt_masks: (h, w, K) binary {0,1} gt at mask resolution.
    Returns:
      pixel-summed BCE per detection: (K,).
    """
    h, w, nb = basis.shape
    k = cofs.shape[0]
    flat = basis.reshape(h * w, nb)
    q = quadrant_masks(boxes, h, w, basis.dtype)  # (4, h, w, K)
    total = jnp.zeros((k,), basis.dtype)
    for qi in range(4):
        logits = jnp.dot(flat, cofs[:, qi * nb:(qi + 1) * nb].T,
                         preferred_element_type=jnp.float32).reshape(h, w, k)
        # stable BCE-with-logits, applied only inside the pixel's quadrant
        bce = (jnp.clip(logits, 0) - logits * gt_masks +
               jnp.log1p(jnp.exp(-jnp.abs(logits))))
        total = total + (bce * q[qi]).sum((0, 1))
    return total
