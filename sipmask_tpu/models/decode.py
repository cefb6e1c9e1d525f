"""Inference decode: scores -> top-k prefilter -> NMS -> SP mask assembly.

Static-shape rewrite of ``SipMaskHead.get_bboxes`` / ``get_bboxes_single``
(sipmask_head.py:500-662). The whole path runs under jit on device; the only
host-side steps left are the per-image resize of the returned stride-2 masks
to the original image size and RLE encoding (sipmask_tpu/eval).

Per image the reference does:
- per level: sigmoid scores/centerness, top nms_pre=1000 ranked by
  max_c(score * centerness) (:570-578), decode boxes clamped to img_shape;
- concat levels; rescale boxes by /scale_factor;
- hard multiclass NMS with kept indices (ssd_flag=False, :595-601) or
  fast_nms on score*centerness (:603-605);
- gather kept SP coefficients, 4 basis matmuls + sigmoid + CropSplit with
  boxes mapped back to the stride-2 grid (:613-633).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..core.boxes import distance2bbox
from ..core.points import all_points
from ..ops.crop_split import assemble_masks
from ..ops.nms import multiclass_nms_idx, fast_nms
from .loss import flatten_outputs


def decode_batch(outputs, img_shapes, scale_factors, cfg: ModelConfig,
                 rescore_fn: Optional[Callable] = None):
    """Args:
      outputs: SipMaskHead output dict.
      img_shapes: (B, 2) float (h, w) of the resized image *before* padding
        (img_metas['img_shape']); boxes are clamped to it.
      scale_factors: (B, 4) (sx, sy, sx, sy) resized/original scale.
      rescore_fn: bound RescoringHead apply (SipMask++).

    Returns dict of per-image padded results:
      boxes (B, D, 4) in original-image coords, scores (B, D),
      labels (B, D) 0-based, masks (B, D, Hm, Wm) sigmoid probs at the
      stride-2 grid (box-cropped), valid (B, D)
      [+ mask_scores (B, D) when rescoring].
    """
    t = cfg.test
    h = cfg.head
    featmap_sizes = [x.shape[1:3] for x in outputs["cls_scores"]]
    points, _, _ = all_points(featmap_sizes, h.strides)
    level_sizes = [hw[0] * hw[1] for hw in featmap_sizes]

    cls_logits, bbox_preds, ctr_logits, cof_preds = flatten_outputs(outputs)
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    ctr_all = jax.nn.sigmoid(ctr_logits.astype(jnp.float32))
    bbox_all = bbox_preds.astype(jnp.float32)
    cof_all = cof_preds.astype(jnp.float32)
    feat_masks = outputs["feat_masks"].astype(jnp.float32)
    use_fast = t.use_fast_nms or h.ssd_flag

    def per_image(scores, ctr, bbox, cof, basis, img_shape, scale_factor):
        # --- per-level top-k prefilter (:570-578)
        sel_pts, sel_box, sel_cof, sel_scores, sel_ctr = [], [], [], [], []
        start = 0
        for n in level_sizes:
            sl = slice(start, start + n)
            start += n
            k = min(t.nms_pre, n)
            rank = (scores[sl] * ctr[sl, None]).max(1)
            _, idx = jax.lax.top_k(rank, k)
            sel_pts.append(jnp.take(points[sl], idx, axis=0))
            sel_box.append(jnp.take(bbox[sl], idx, axis=0))
            sel_cof.append(jnp.take(cof[sl], idx, axis=0))
            sel_scores.append(jnp.take(scores[sl], idx, axis=0))
            sel_ctr.append(jnp.take(ctr[sl], idx, axis=0))
        pts = jnp.concatenate(sel_pts, 0)
        box = jnp.concatenate(sel_box, 0)
        cofs = jnp.concatenate(sel_cof, 0)
        scr = jnp.concatenate(sel_scores, 0)
        ctrs = jnp.concatenate(sel_ctr, 0)

        # decode + clamp to the (dynamic-valued, static-shape) image shape
        boxes = distance2bbox(pts, box)
        hh, ww = img_shape[0], img_shape[1]
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, ww - 1), jnp.clip(boxes[:, 1], 0, hh - 1),
            jnp.clip(boxes[:, 2], 0, ww - 1), jnp.clip(boxes[:, 3], 0, hh - 1),
        ], -1)
        boxes = boxes / scale_factor[None, :]  # rescale to original coords

        if not use_fast:
            res = multiclass_nms_idx(boxes, scr, t.score_thr, t.nms_iou_thr,
                                     t.max_per_img, score_factors=ctrs,
                                     pre_nms_top_n=t.pre_nms_pairs,
                                     nms_type=t.nms_type,
                                     soft_method=t.soft_nms_method,
                                     soft_sigma=t.soft_nms_sigma,
                                     soft_min_score=t.soft_nms_min_score)
            det_cofs = jnp.take(cofs, res["idxs"], axis=0) * \
                res["valid"][:, None]
        else:
            eff = scr * ctrs[:, None]
            res = fast_nms(boxes, eff.T, cofs, iou_thr=t.nms_iou_thr,
                           top_k=t.fast_nms_top_k, score_thr=t.score_thr,
                           max_out=t.max_per_img)
            det_cofs = res["cofs"]

        # --- SP mask assembly on the stride-2 grid (:613-633)
        crop_boxes = res["boxes"] * scale_factor[None, :] / 2.0
        masks = assemble_masks(basis, det_cofs, crop_boxes)  # (Hm, Wm, D)
        masks = jnp.moveaxis(masks, -1, 0)  # (D, Hm, Wm)
        return dict(boxes=res["boxes"], scores=res["scores"],
                    labels=res["labels"], valid=res["valid"], masks=masks)

    out = jax.vmap(per_image)(scores_all, ctr_all, bbox_all, cof_all,
                              feat_masks, img_shapes.astype(jnp.float32),
                              scale_factors.astype(jnp.float32))

    if h.rescoring and rescore_fn is not None:
        b, d, mh, mw = out["masks"].shape
        pred_iou = rescore_fn(out["masks"].reshape(b * d, mh, mw, 1))
        lbl = jnp.clip(out["labels"].reshape(b * d), 0)
        pred_iou = jnp.take_along_axis(pred_iou, lbl[:, None], 1).squeeze(1)
        out["mask_scores"] = (pred_iou.reshape(b, d) * out["scores"] *
                              out["valid"])
    return out
