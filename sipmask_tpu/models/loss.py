"""SipMask training loss (static shapes, jit/pjit-compatible).

Faithful rewrite of ``SipMaskHead.loss`` (sipmask_head.py:289-498):
- focal classification loss, avg_factor = num_pos + num_imgs (:364-366);
- centerness-weighted IoU box loss on stride-normalized decoded boxes
  (:376-384);
- centerness BCE (:385-386);
- SP mask loss: per-positive pixel-summed BCE of the quadrant-assembled mask
  vs the box-cropped gt, / box_w / box_h / n_pos, weighted by the normalized
  (no-grad) cls_score x IoU(pred box, gt box) (:407-463);
- optional SipMask++ rescoring MSE (:466-483).

TPU re-design vs the reference's per-image Python loops and dynamic
``pos_inds`` gathers: positives for the mask loss are selected as a static
top-``max_pos`` per image ranked by the (no-grad) weighting score; when an
image has <= max_pos positives this is numerically identical to the
reference (the weighting is renormalized over the selected set). Padding
slots contribute exactly zero.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import HeadConfig
from ..core import losses as L
from ..core.boxes import bbox_overlaps, distance2bbox, center_size
from ..core.points import all_points
from ..core.targets import fcos_targets, centerness_target
from ..ops.crop_split import mask_bce_loss_indexed, assemble_masks


def flatten_outputs(outputs):
    """Per-level NHWC lists -> (B, P, *) level-major flat tensors."""
    cls = jnp.concatenate(
        [x.reshape(x.shape[0], -1, x.shape[-1]) for x in outputs["cls_scores"]], 1)
    box = jnp.concatenate(
        [x.reshape(x.shape[0], -1, 4) for x in outputs["bbox_preds"]], 1)
    ctr = jnp.concatenate(
        [x.reshape(x.shape[0], -1) for x in outputs["centernesses"]], 1)
    cof = jnp.concatenate(
        [x.reshape(x.shape[0], -1, x.shape[-1]) for x in outputs["cof_preds"]], 1)
    return cls, box, ctr, cof


def compute_losses(outputs, batch, cfg: HeadConfig, max_pos: int = 256,
                   rescore_fn: Optional[Callable] = None):
    """Args:
      outputs: SipMaskHead output dict.
      batch: dict with gt_bboxes (B, G, 4) in input coords, gt_labels (B, G)
        int32 (0 = pad), gt_masks (B, G, Hm, Wm) {0,1} at the stride-2 basis
        resolution.
      rescore_fn: bound apply of the RescoringHead, needed iff cfg.rescoring.
    Returns: dict of scalar losses.
    """
    featmap_sizes = [x.shape[1:3] for x in outputs["cls_scores"]]
    points, strides, ranges = all_points(featmap_sizes, cfg.strides,
                                         cfg.regress_ranges)
    cls_logits, bbox_preds, ctr_logits, cof_preds = flatten_outputs(outputs)
    cls_logits = cls_logits.astype(jnp.float32)
    bbox_preds = bbox_preds.astype(jnp.float32)
    ctr_logits = ctr_logits.astype(jnp.float32)
    cof_preds = cof_preds.astype(jnp.float32)
    model_dtype = outputs["feat_masks"].dtype  # pre-upcast compute dtype
    feat_masks = outputs["feat_masks"].astype(jnp.float32)
    b, p, nc = cls_logits.shape

    gt_bboxes = batch["gt_bboxes"].astype(jnp.float32)
    gt_labels = batch["gt_labels"].astype(jnp.int32)

    tgt = fcos_targets(gt_bboxes, gt_labels, points, ranges, strides,
                       cfg.center_sampling, cfg.center_sample_radius)
    labels = tgt["labels"]            # (B, P)
    bbox_targets = tgt["bbox_targets"]  # (B, P, 4)
    gt_inds = tgt["gt_inds"]          # (B, P)
    pos = labels > 0

    num_pos = pos.sum()
    # --- classification (:364-366). mmdet normalizes by num_pos + num_imgs;
    # the benchmark fork by max(num_pos, 1) (fcos_core loss.py:377-383, the
    # cross-GPU reduce_sum falls out of global-batch SPMD).
    cls_avg = (jnp.maximum(num_pos, 1) if cfg.benchmark_loss_extras
               else num_pos + b)
    loss_cls = L.sigmoid_focal_loss(
        cls_logits, labels, nc, cfg.focal_gamma, cfg.focal_alpha,
        avg_factor=cls_avg) * cfg.loss_cls_weight

    # --- box + centerness (:371-389)
    ctr_targets = centerness_target(jnp.clip(bbox_targets, 0.0))
    posf = pos.astype(jnp.float32)
    w_ctr = ctr_targets * posf
    pts = jnp.broadcast_to(points[None], (b, p, 2))
    strd = strides[None, :, None]
    if cfg.benchmark_loss_extras:
        # benchmark fork (NORM_REG_TARGETS): relu'd stride-normalized ltrb
        # through fcos_core's giou formula (sipmask.py:162-166, loss.py:394-399)
        loss_bbox = L.giou_loss_ltrb(
            jax.nn.relu(bbox_preds) / strd, bbox_targets / strd, weight=w_ctr,
            avg_factor=jnp.maximum(w_ctr.sum(), 1e-6)) * cfg.loss_bbox_weight
    else:
        # mmdet fork stride-normalizes the decoded boxes (:376-378); the VIS
        # fork decodes unnormalized (SipMask-VIS sipmask_head.py:410-414) —
        # with the +1 IoU convention this changes per-level magnitudes
        # (ADVICE.md round 1), so follow each fork exactly.
        div = 1.0 if cfg.track else strd
        decoded_pred = distance2bbox(pts, bbox_preds / div)
        decoded_tgt = distance2bbox(pts, bbox_targets / div)
        iou_fn = L.giou_loss if cfg.iou_loss_mode == "giou" else L.iou_loss
        loss_bbox = iou_fn(decoded_pred, decoded_tgt, weight=w_ctr,
                           avg_factor=jnp.maximum(w_ctr.sum(), 1e-6)
                           ) * cfg.loss_bbox_weight
    loss_centerness = L.bce_with_logits(
        ctr_logits, ctr_targets, weight=posf,
        avg_factor=jnp.maximum(num_pos, 1)) * cfg.loss_centerness_weight

    # --- mask loss (:391-463), per image with static top-max_pos selection.
    # benchmark fork decodes det boxes from the relu'd regression
    # (loss.py:340-346 via decode_for_single_feature_map)
    det_dist = (jax.nn.relu(bbox_preds) if cfg.benchmark_loss_extras
                else bbox_preds)
    det_bboxes = distance2bbox(pts, jax.lax.stop_gradient(det_dist))

    def per_image(labels_i, gt_inds_i, cof_i, cls_i, det_i,
                  gt_boxes_i):
        bbox_dt = det_i / 2.0  # mask (stride-2) coordinates (:409)
        area = (bbox_dt[:, 2] - bbox_dt[:, 0]) * (bbox_dt[:, 3] - bbox_dt[:, 1])
        valid = (labels_i > 0) & (area > 1.0)  # (:411,421)

        # weighting = sigmoid(cls_score at gt label) * IoU(gt/2, dt) (:429-434)
        # Both selects run as one-hot reductions rather than gathers: a
        # (P,)-indexed gather lowers to a ~28 GB/s kCustom fusion on TPU,
        # the masked reduce fuses at full vector throughput.
        lbl = jnp.clip(labels_i - 1, 0)
        lbl_oh = lbl[:, None] == jnp.arange(cls_i.shape[1])[None, :]
        cls_score = jax.nn.sigmoid(
            jnp.where(lbl_oh, cls_i, 0.0).sum(axis=1))
        gt_oh = (gt_inds_i[:, None] ==
                 jnp.arange(gt_boxes_i.shape[0])[None, :])  # (P, G)
        gt_sel = (gt_oh[:, :, None] * gt_boxes_i[None]).sum(axis=1)  # (P, 4)
        ious = bbox_overlaps(gt_sel / 2.0, bbox_dt, is_aligned=True, eps=1e-9)
        w_raw = jax.lax.stop_gradient(cls_score * ious)

        score = jnp.where(valid, w_raw, -1.0)
        k = min(max_pos, score.shape[0])
        topw, topi = jax.lax.top_k(score, k)
        sel_valid = topw > -0.5
        n_sel = sel_valid.sum()
        n_self = jnp.maximum(n_sel.astype(jnp.float32), 1.0)

        cof_sel = jnp.take(cof_i, topi, axis=0)              # (K, 128)
        box_sel = jnp.take(bbox_dt, topi, axis=0)            # (K, 4)
        gtidx_sel = jnp.take(gt_inds_i, topi, axis=0)        # (K,)
        w_sel = jnp.where(sel_valid, jnp.take(w_raw, topi), 0.0)
        # normalize weighting over the selected set (:433-435). The mmdet
        # fork adds +1e-4 to the denominator; the benchmark fork does not
        # (fcos_core loss.py:450-451) — guard against exact zero instead.
        eps = 0.0 if cfg.benchmark_loss_extras else 1e-4
        w_norm = w_sel / jnp.maximum(w_sel.sum() + eps, 1e-20) * n_self

        if cfg.benchmark_loss_extras:
            # benchmark fork: NMS-0.9 dedup of positives ranked by cls score
            # (fcos_core loss.py:452-456; its _box_nms keeps the +1 IoU
            # convention, csrc/cuda/nms.cu:16-19). Exact whenever the image
            # has <= max_pos positives (then the static selection is the
            # full positive set, like the rest of the top-K design). The
            # weighting normalizer above uses the pre-dedup count
            # (:450-451); the per-pixel divisor below uses the post-dedup
            # count (:487).
            from ..ops.nms import hard_nms, NEG
            nms_scores = jnp.where(sel_valid, jnp.take(cls_score, topi), NEG)
            kidx, _, kvalid = hard_nms(box_sel, nms_scores, 0.9, k)
            kept = (jnp.zeros((k,), jnp.int32)
                    .at[jnp.where(kvalid, kidx, k)]
                    .add(1, mode="drop")) > 0
            final_valid = sel_valid & kept
        else:
            final_valid = sel_valid
        n_final = jnp.maximum(final_valid.sum().astype(jnp.float32), 1.0)

        aux = dict(topi=topi, sel_valid=sel_valid, box_sel=box_sel,
                   cof_sel=cof_sel, gtidx_sel=gtidx_sel,
                   labels_sel=jnp.take(lbl, topi))
        return w_norm, final_valid, n_final, aux

    w_norm, final_valid, n_final, aux = jax.vmap(per_image)(
        labels, gt_inds, cof_preds, cls_logits, det_bboxes, gt_bboxes)

    # Per-positive pixel-summed BCE of the assembled mask. On TPU this runs
    # the fused Pallas kernel (ops/pallas/mask_loss.py) — assembly, quadrant
    # select, gt gather and reduction in VMEM, no (Hm, Wm, K) HBM tensors;
    # elsewhere the XLA colmix path (gt gather folded into the BCE's linear
    # matmul term, mask_bce_loss_indexed). The kernel's matmuls run in the
    # MODEL's compute dtype: under bf16 training the f32-upcast values here
    # are still exactly bf16-representable, so the two paths agree up to
    # summation order; under f32 training the kernel runs f32 too.
    from ..ops.pallas.mask_loss import (mask_bce_fused_available,
                                        mask_bce_loss_fused)
    if mask_bce_fused_available():
        # final_valid lets the kernel's y-banding skip dead lanes entirely
        # (their pre becomes exactly 0; the weighting below zeroes them
        # anyway, so the loss is unchanged)
        pre = mask_bce_loss_fused(feat_masks, aux["cof_sel"],
                                  aux["box_sel"], batch["gt_masks"],
                                  aux["gtidx_sel"],
                                  mm_dtype=model_dtype,
                                  valid=final_valid)          # (B, K)
    else:
        pre = jax.vmap(mask_bce_loss_indexed)(
            feat_masks, aux["cof_sel"], aux["box_sel"],
            batch["gt_masks"], aux["gtidx_sel"])              # (B, K)

    csz = center_size(aux["box_sel"])                         # (B, K, 4)
    bw = jnp.where(final_valid, csz[..., 2], 1.0)
    bh = jnp.where(final_valid, csz[..., 3], 1.0)
    pre = pre / bw / bh / n_final[:, None]  # (:459-462)
    loss_mask_b = jnp.where(final_valid, pre * w_norm, 0.0).sum(1)
    loss_mask = loss_mask_b.sum() / b  # (:484)
    if cfg.benchmark_loss_extras:
        # benchmark fork caps runaway mask loss (fcos_core loss.py:487-488)
        loss_mask = jnp.where(loss_mask > 1.0, loss_mask * 0.5, loss_mask)

    out = dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
               loss_centerness=loss_centerness, loss_mask=loss_mask)

    if cfg.rescoring:
        assert rescore_fn is not None
        out["loss_iou"] = _rescoring_loss(
            aux, feat_masks, batch["gt_masks"], rescore_fn)

    if cfg.track and "track_feats_ref" in outputs:
        from .track import track_match_loss
        out["loss_match"], match_acc = track_match_loss(outputs, batch, aux)
        out["match_acc"] = jax.lax.stop_gradient(match_acc)  # metric only
    return out


def _rescoring_loss(aux, feat_masks, gt_masks, rescore_fn):
    """SipMask++ rescoring MSE (sipmask_head.py:466-486).

    iou_targets compare the thresholded cropped pred mask against the
    *uncropped* selected gt mask (:474-478); weights keep 0.1 < iou <= 1 with
    gt area >= 100; total = 10 * sum(MSE) / (0.1 + sum(weights)).
    """
    def per_image(basis_i, gt_masks_i, a):
        pred = assemble_masks(basis_i, a["cof_sel"], a["box_sel"])  # (H, W, K)
        pred = jax.lax.stop_gradient(pred)
        gt_m = jnp.take(gt_masks_i, a["gtidx_sel"], axis=0)
        gt_m = jnp.moveaxis(gt_m, 0, -1).astype(jnp.float32)      # (H, W, K)
        mp = (pred > 0.4).astype(jnp.float32)
        inter = (mp * gt_m).sum((0, 1))
        mp_area = mp.sum((0, 1))
        gt_area = gt_m.sum((0, 1))
        iou_t = inter / (mp_area + gt_area - inter + 0.1)
        w = ((iou_t > 0.1) & (iou_t <= 1.0) & (gt_area >= 100)
             & a["sel_valid"]).astype(jnp.float32)
        return pred, iou_t, w, a["labels_sel"]

    pred, iou_t, w, lbl = jax.vmap(per_image)(feat_masks, gt_masks, aux)
    bk = pred.shape[0] * pred.shape[3]
    masks_in = jnp.moveaxis(pred, 3, 1).reshape(
        bk, pred.shape[1], pred.shape[2], 1)
    scores = rescore_fn(masks_in)  # (B*K, C)
    pred_iou = jnp.take_along_axis(
        scores, lbl.reshape(bk)[:, None], axis=1).squeeze(1)
    mse = ((pred_iou - iou_t.reshape(bk)) ** 2 * w.reshape(bk)).sum()
    # reference divides by num_iou exactly (:486); max(., 0.1) only guards
    # the empty case (where the reference would produce 0/0) and is exact
    # whenever >= 1 target survives the weighting
    return mse * 10.0 / jnp.maximum(jax.lax.stop_gradient(w.sum()), 0.1)
