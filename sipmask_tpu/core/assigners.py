"""Box assigners + samplers (mmdet/core/bbox/assigners + samplers).

SipMask's own target assignment is the FCOS point assigner
(sipmask_tpu/core/targets.py); these utilities cover the reference's
declared train_cfg interface (MaxIoUAssigner / RandomSampler,
configs/sipmask/sipmask_r50_caffe_fpn_gn_1x.py:42-49 — declared though the
head never calls them) and anchor-based heads generally. Static shapes:
results are fixed-size index arrays + validity masks.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


class AssignResult(NamedTuple):
    # per-box: -1 = ignore, 0 = negative (background), >0 = 1-based gt index
    gt_inds: jnp.ndarray       # (N,) int32
    max_overlaps: jnp.ndarray  # (N,) f32
    labels: jnp.ndarray        # (N,) int32 assigned gt label, 0 where bg


def max_iou_assign(boxes, gt_boxes, gt_labels, gt_valid,
                   pos_iou_thr: float = 0.5, neg_iou_thr: float = 0.4,
                   min_pos_iou: float = 0.0,
                   match_low_quality: bool = True) -> AssignResult:
    """MaxIoUAssigner (mmdet max_iou_assigner.py semantics):

    1. every box -> -1 (ignore);
    2. overlap < neg_iou_thr -> 0 (negative);
    3. overlap >= pos_iou_thr -> that gt (argmax over gts);
    4. low-quality match: each gt claims its argmax box if its best overlap
       >= min_pos_iou (later gts override earlier on ties, as in mmdet).

    gt_valid masks padded gt rows. Boxes/gts are xyxy.
    """
    n = boxes.shape[0]
    ious = bbox_overlaps(boxes, gt_boxes)                  # (N, G)
    ious = jnp.where(gt_valid[None, :], ious, -1.0)
    max_ov = ious.max(1)
    arg = ious.argmax(1).astype(jnp.int32)

    gt_inds = jnp.full((n,), -1, jnp.int32)
    gt_inds = jnp.where((max_ov >= 0) & (max_ov < neg_iou_thr), 0, gt_inds)
    gt_inds = jnp.where(max_ov >= pos_iou_thr, arg + 1, gt_inds)

    if match_low_quality:
        # per-gt best box (step 4): override in gt order
        gt_best = ious.max(0)                              # (G,)
        gt_argbest = ious.argmax(0).astype(jnp.int32)      # (G,)
        g = gt_boxes.shape[0]

        def body(gi, inds):
            claim = gt_valid[gi] & (gt_best[gi] >= min_pos_iou) & \
                (gt_best[gi] > 0)
            return jnp.where(
                claim & (jnp.arange(n) == gt_argbest[gi]), gi + 1, inds)

        gt_inds = jax.lax.fori_loop(0, g, body, gt_inds)

    labels = jnp.where(gt_inds > 0,
                       jnp.take(gt_labels, jnp.clip(gt_inds - 1, 0)), 0)
    return AssignResult(gt_inds, max_ov, labels.astype(jnp.int32))


class SampleResult(NamedTuple):
    pos_inds: jnp.ndarray   # (num_pos_cap,) int32, -1 padded
    neg_inds: jnp.ndarray   # (num_neg_cap,) int32, -1 padded
    pos_valid: jnp.ndarray  # (num_pos_cap,) bool
    neg_valid: jnp.ndarray  # (num_neg_cap,) bool


def random_sample(assign: AssignResult, key, num: int = 256,
                  pos_fraction: float = 0.5) -> SampleResult:
    """RandomSampler (mmdet random_sampler.py): sample up to
    num*pos_fraction positives and fill the rest with negatives, uniformly,
    with static output sizes."""
    n = assign.gt_inds.shape[0]
    pos_cap = int(num * pos_fraction)
    neg_cap = num - pos_cap
    kp, kn = jax.random.split(key)

    def pick(mask, k, cap):
        # random priority; invalid entries sink to the bottom
        prio = jax.random.uniform(k, (n,)) + (~mask) * 10.0
        order = jnp.argsort(prio)[:cap].astype(jnp.int32)
        valid = jnp.take(mask, order)
        return jnp.where(valid, order, -1), valid

    pos_inds, pos_valid = pick(assign.gt_inds > 0, kp, pos_cap)
    neg_inds, neg_valid = pick(assign.gt_inds == 0, kn, neg_cap)
    return SampleResult(pos_inds, neg_inds, pos_valid, neg_valid)
