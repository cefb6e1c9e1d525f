"""Box geometry utilities.

TPU-native rewrites of the reference's box math, preserving exact numerics:
- ``bbox_overlaps``: mmdet/core/bbox/geometry.py:4-96 (note the +1 pixel
  convention in widths/heights/areas).
- ``distance2bbox``: mmdet/core/bbox/transforms.py:202-230.
- ``center_size``: mmdet/models/anchor_heads/sipmask_head.py:16-18.

All functions are pure jnp, broadcast-friendly, and safe under vmap/jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def bbox_overlaps(bboxes1, bboxes2, mode: str = "iou", is_aligned: bool = False,
                  eps: float = 0.0):
    """IoU/IoF with mmdet-v1's +1 convention.

    Args:
      bboxes1: (..., M, 4) xyxy.
      bboxes2: (..., N, 4) xyxy (or (..., M, 4) when aligned).
      mode: 'iou' or 'iof'.
      is_aligned: pairwise (M,N) if False, elementwise (M,) if True.
      eps: added to denominator for padded/degenerate boxes.
    """
    assert mode in ("iou", "iof")
    if is_aligned:
        lt = jnp.maximum(bboxes1[..., :2], bboxes2[..., :2])
        rb = jnp.minimum(bboxes1[..., 2:], bboxes2[..., 2:])
        wh = jnp.clip(rb - lt + 1, 0)
        overlap = wh[..., 0] * wh[..., 1]
        area1 = (bboxes1[..., 2] - bboxes1[..., 0] + 1) * (
            bboxes1[..., 3] - bboxes1[..., 1] + 1)
        if mode == "iou":
            area2 = (bboxes2[..., 2] - bboxes2[..., 0] + 1) * (
                bboxes2[..., 3] - bboxes2[..., 1] + 1)
            denom = area1 + area2 - overlap
        else:
            denom = area1
    else:
        lt = jnp.maximum(bboxes1[..., :, None, :2], bboxes2[..., None, :, :2])
        rb = jnp.minimum(bboxes1[..., :, None, 2:], bboxes2[..., None, :, 2:])
        wh = jnp.clip(rb - lt + 1, 0)
        overlap = wh[..., 0] * wh[..., 1]
        area1 = (bboxes1[..., 2] - bboxes1[..., 0] + 1) * (
            bboxes1[..., 3] - bboxes1[..., 1] + 1)
        if mode == "iou":
            area2 = (bboxes2[..., 2] - bboxes2[..., 0] + 1) * (
                bboxes2[..., 3] - bboxes2[..., 1] + 1)
            denom = area1[..., :, None] + area2[..., None, :] - overlap
        else:
            denom = area1[..., :, None]
    return overlap / (denom + eps)


def jaccard_nop1(box_a, box_b):
    """IoU without the +1 convention (YOLACT-style), used by fast_nms.

    Reference: sipmask_head.py:912-960 (``jaccard``/``intersect``).
    box_a: (..., A, 4), box_b: (..., B, 4) -> (..., A, B).
    """
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = ((box_a[..., 2] - box_a[..., 0]) *
              (box_a[..., 3] - box_a[..., 1]))[..., :, None]
    area_b = ((box_b[..., 2] - box_b[..., 0]) *
              (box_b[..., 3] - box_b[..., 1]))[..., None, :]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def distance2bbox(points, distance, max_shape=None):
    """Decode (l, t, r, b) distances at ``points`` into xyxy boxes.

    points: (..., 2) [x, y]; distance: (..., 4); max_shape: (H, W) clamp.
    Reference: mmdet/core/bbox/transforms.py:202-230.
    """
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def center_size(boxes):
    """xyxy -> (cx, cy, w, h). Reference: sipmask_head.py:16-18."""
    return jnp.concatenate(
        [(boxes[..., 2:] + boxes[..., :2]) / 2, boxes[..., 2:] - boxes[..., :2]],
        axis=-1)
