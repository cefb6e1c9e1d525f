"""FCOS target assignment, dense and static-shape (TPU-first).

Faithful rewrite of ``SipMaskHead.fcos_target_single``
(sipmask_head.py:773-857) and ``centerness_target`` (:859-866). The reference
is already dense over a (num_points x num_gts) grid; here gts are padded to a
static MAX_GTS with a validity mask (label 0 == pad), so the whole assignment
runs under jit/vmap with no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = 1e8


def fcos_targets_single(gt_bboxes, gt_labels, points, regress_ranges,
                        strides, center_sampling: bool,
                        center_sample_radius: float):
    """Assign FCOS targets for one image.

    Args:
      gt_bboxes: (G, 4) xyxy, padded rows arbitrary.
      gt_labels: (G,) int32 in [1..C], 0 for padded rows.
      points: (P, 2) all-level points.
      regress_ranges: (P, 2) per-point level regress range.
      strides: (P,) per-point stride.
      center_sampling / center_sample_radius: config :38-39.

    Returns dict with:
      labels: (P,) int32, 0 = background.
      bbox_targets: (P, 4) (l, t, r, b) in input pixels.
      gt_inds: (P,) int32 index into gt rows (valid only where labels > 0).
    """
    num_points = points.shape[0]

    valid = gt_labels > 0  # (G,)
    # +1 area convention, as in the reference (:782-783)
    areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0] + 1) * (
        gt_bboxes[:, 3] - gt_bboxes[:, 1] + 1)  # (G,)
    areas = jnp.where(valid, areas, INF)
    areas = jnp.broadcast_to(areas[None, :], (num_points, areas.shape[0]))

    xs = points[:, 0][:, None]  # (P, 1)
    ys = points[:, 1][:, None]

    left = xs - gt_bboxes[None, :, 0]
    right = gt_bboxes[None, :, 2] - xs
    top = ys - gt_bboxes[None, :, 1]
    bottom = gt_bboxes[None, :, 3] - ys
    bbox_targets = jnp.stack([left, top, right, bottom], axis=-1)  # (P, G, 4)

    if center_sampling:
        # condition1: inside a `center bbox` of radius*stride (:801-835)
        radius = center_sample_radius
        center_xs = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2  # (G,)
        center_ys = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2
        stride_r = strides[:, None] * radius  # (P, 1)
        x_mins = center_xs[None, :] - stride_r
        y_mins = center_ys[None, :] - stride_r
        x_maxs = center_xs[None, :] + stride_r
        y_maxs = center_ys[None, :] + stride_r
        cg_x1 = jnp.maximum(x_mins, gt_bboxes[None, :, 0])
        cg_y1 = jnp.maximum(y_mins, gt_bboxes[None, :, 1])
        cg_x2 = jnp.minimum(x_maxs, gt_bboxes[None, :, 2])
        cg_y2 = jnp.minimum(y_maxs, gt_bboxes[None, :, 3])
        cb = jnp.stack([xs - cg_x1, ys - cg_y1, cg_x2 - xs, cg_y2 - ys], -1)
        inside_gt = cb.min(-1) > 0
    else:
        inside_gt = bbox_targets.min(-1) > 0  # (:837-838)

    # condition2: level regress range on max(l,t,r,b) (:841-844)
    max_dist = bbox_targets.max(-1)
    inside_range = ((max_dist >= regress_ranges[:, None, 0]) &
                    (max_dist <= regress_ranges[:, None, 1]))

    areas = jnp.where(inside_gt, areas, INF)
    areas = jnp.where(inside_range, areas, INF)
    min_area = areas.min(axis=1)  # (P,)

    # First-minimum one-hot over the tiny G axis instead of argmin + gather:
    # TPU gathers with (P,)-sized index vectors run at ~28 GB/s (kCustom
    # fusions, ~1.8 ms/step in the hi-acc train profile) while the masked
    # reductions below fuse into ordinary vector code. Exact: `areas ==
    # min_area` is bit-exact (min returns one of the compared values) and the
    # cumsum==1 guard reproduces argmin's first-match tie-break (:845-846).
    is_min = areas == min_area[:, None]  # (P, G)
    onehot = is_min & (jnp.cumsum(is_min.astype(jnp.int32), axis=1) == 1)
    g = gt_labels.shape[0]
    min_inds = (onehot * jnp.arange(g, dtype=jnp.int32)[None, :]).sum(1)
    labels = (onehot * gt_labels[None, :].astype(jnp.int32)).sum(1)
    labels = jnp.where(min_area >= INF, 0, labels)
    bbox_targets = (onehot[:, :, None] * bbox_targets).sum(axis=1)  # (P, 4)
    return dict(labels=labels.astype(jnp.int32),
                bbox_targets=bbox_targets,
                gt_inds=min_inds.astype(jnp.int32))


def fcos_targets(gt_bboxes, gt_labels, points, regress_ranges, strides,
                 center_sampling: bool = True, center_sample_radius: float = 1.5):
    """Batched assignment: gt_bboxes (B, G, 4), gt_labels (B, G)."""
    fn = lambda b, l: fcos_targets_single(
        b, l, points, regress_ranges, strides, center_sampling,
        center_sample_radius)
    return jax.vmap(fn)(gt_bboxes, gt_labels)


def centerness_target(bbox_targets, eps: float = 1e-12):
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))). Reference :859-866.

    ``eps`` guards padded/negative rows (reference only evaluates positives).
    """
    lr = bbox_targets[..., 0::2]
    tb = bbox_targets[..., 1::2]
    ratio = (lr.min(-1) / jnp.maximum(lr.max(-1), eps)) * (
        tb.min(-1) / jnp.maximum(tb.max(-1), eps))
    return jnp.sqrt(jnp.clip(ratio, 0.0))
