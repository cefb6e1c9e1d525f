"""SipMask-VIS tracking: match loss (training) + streaming tracker (test).

Rewrites of SipMask-VIS/mmdet/models/anchor_heads/sipmask_head.py:
- ``extract_center_feats``: :768-781 — embedding at floor(box center / 8).
- ``track_match_loss``: :470-499 — current-frame positives vs (jittered)
  reference-frame gts; score = cur @ ref^T with a prepended zero column
  ("new object"); CE against gt_pids; also reports match accuracy.
- ``TrackerState``/``tracker_step``: :544-562,597-673 — stateful cross-frame
  matching with comprehensive score match_logprob + 1.0*log(det_score) +
  2.0*iou + 10*same_label, greedy best-score dedup per previous object.

TPU re-design: the tracker memory is a fixed-capacity (max_tracks) array
with an occupancy mask, carried functionally through the per-frame jitted
step (lax-scan-friendly); the reference's Python-side mutation of
``self.prev_roi_feats`` becomes pure state threading.

Capacity policy: the reference's memory is unbounded (sipmask_head.py:
653-667 appends rows forever). A fixed-capacity TPU memory instead issues
monotonically increasing object ids (``count``), and when every slot is
occupied a NEW object EVICTS the least-recently-seen slot (slots matched
by a detection in the current frame are protected from eviction).
``overflow`` counts evictions so callers can detect that a crowded video
exceeded capacity instead of silently diverging; ids of evicted objects
are never reused.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.boxes import bbox_overlaps

NEG = -1.0e4


def extract_center_feats(track_feats, boxes, stride: int = 8):
    """track_feats: (Hf, Wf, 512); boxes: (N, 4) in input coords -> (N, 512)."""
    hf, wf = track_feats.shape[:2]
    cx = jnp.floor((boxes[:, 0] + boxes[:, 2]) / 2.0 / stride).astype(jnp.int32)
    cy = jnp.floor((boxes[:, 1] + boxes[:, 3]) / 2.0 / stride).astype(jnp.int32)
    cx = jnp.clip(cx, 0, wf - 1)
    cy = jnp.clip(cy, 0, hf - 1)
    return track_feats[cy, cx, :]


def jitter_boxes(boxes, key, amplitude: float = 0.05):
    """Reference-frame gt box jitter (:471-484), on device with explicit rng."""
    off = jax.random.uniform(key, (boxes.shape[0], 4), minval=-amplitude,
                             maxval=amplitude)
    cxcy = (boxes[:, 2:4] + boxes[:, :2]) / 2
    wh = jnp.abs(boxes[:, 2:4] - boxes[:, :2])
    new_cxcy = cxcy + wh * off[:, :2]
    new_wh = wh * (1 + off[:, 2:])
    return jnp.concatenate([new_cxcy - new_wh / 2, new_cxcy + new_wh / 2], 1)


def track_match_loss_single(track_feats, track_feats_ref, box_sel, sel_valid,
                            gtidx_sel, gt_pids, ref_boxes, ref_valid):
    """Per-image match CE (:487-499), static shapes.

    box_sel: (K, 4) selected positive boxes in *mask* coords (bbox_dt);
    gt_pids: (G,) 1-based index into ref gts, 0 = unmatched;
    ref_boxes: (G, 4) jittered ref gt boxes; ref_valid: (G,) bool.
    Returns (ce_sum_mean, acc_weighted, n_valid).
    """
    cur_feats = extract_center_feats(track_feats, box_sel * 2.0)   # (K, 512)
    ref_feats = extract_center_feats(track_feats_ref, ref_boxes)   # (G, 512)
    prod = cur_feats @ ref_feats.T                                 # (K, G)
    prod = jnp.where(ref_valid[None, :], prod, NEG)
    logits = jnp.concatenate(
        [jnp.zeros((prod.shape[0], 1), prod.dtype), prod], axis=1)  # (K, 1+G)
    targets = jnp.take(gt_pids, gtidx_sel)  # (K,) in [0..G]
    logp = jax.nn.log_softmax(logits, axis=1)
    ce = -jnp.take_along_axis(logp, targets[:, None], axis=1).squeeze(1)
    vf = sel_valid.astype(jnp.float32)
    n = jnp.maximum(vf.sum(), 1.0)
    ce_mean = (ce * vf).sum() / n
    acc = ((logits.argmax(1) == targets).astype(jnp.float32) * vf).sum() / n
    return ce_mean, acc, vf.sum()


def track_match_loss(outputs, batch, aux):
    """Batched match loss; aux comes from compute_losses' positive selection.

    batch needs: ref_bboxes_jit (B, G, 4) input coords (host-jittered or via
    jitter_boxes), ref_labels (B, G), gt_pids (B, G).
    """
    ce, acc, n = jax.vmap(track_match_loss_single)(
        outputs["track_feats"], outputs["track_feats_ref"],
        aux["box_sel"], aux["sel_valid"], aux["gtidx_sel"],
        batch["gt_pids"].astype(jnp.int32),
        batch["ref_bboxes_jit"].astype(jnp.float32),
        batch["ref_labels"] > 0)
    b = ce.shape[0]
    loss_match = ce.sum() / b  # (:537 loss_match / num_imgs)
    match_acc = (acc * n).sum() / jnp.maximum(n.sum(), 1.0)
    return loss_match, match_acc


# --------------------------------------------------------------- inference

class TrackerState(NamedTuple):
    feats: jnp.ndarray      # (M, 512)
    boxes: jnp.ndarray      # (M, 5) xyxy+score, original-image coords
    labels: jnp.ndarray     # (M,)
    active: jnp.ndarray     # (M,) bool occupancy
    count: jnp.ndarray      # () int32 — number of object ids issued
    ids: jnp.ndarray        # (M,) int32 — object id held by each slot
    last_seen: jnp.ndarray  # (M,) int32 — frame of each slot's last write
    frame: jnp.ndarray      # () int32 — frames processed
    overflow: jnp.ndarray   # () int32 — LRU evictions (capacity exceeded)


def tracker_init(max_tracks: int, feat_dim: int = 512) -> TrackerState:
    return TrackerState(
        feats=jnp.zeros((max_tracks, feat_dim)),
        boxes=jnp.zeros((max_tracks, 5)),
        labels=jnp.full((max_tracks,), -1, jnp.int32),
        active=jnp.zeros((max_tracks,), bool),
        count=jnp.zeros((), jnp.int32),
        ids=jnp.full((max_tracks,), -1, jnp.int32),
        last_seen=jnp.full((max_tracks,), -1, jnp.int32),
        frame=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), jnp.int32))


def tracker_step(state: TrackerState, det_boxes, det_scores, det_labels,
                 det_valid, det_feats, is_first,
                 match_coeff=(1.0, 2.0, 10.0)):
    """One frame of the streaming tracker (:597-667), static shapes.

    det_boxes (D, 4) original coords; det_feats (D, 512) embeddings at box
    centers (input coords); is_first: () bool. Returns (new_state,
    det_obj_ids (D,) int32, -1 for invalid dets). Object ids are issued
    monotonically and survive slot eviction (ids of evicted objects are
    retired, never reused); ``new_state.overflow`` counts evictions.
    """
    m = state.feats.shape[0]
    d = det_boxes.shape[0]
    fresh = is_first | (state.count == 0)

    # comprehensive scores vs memory (:544-562)
    prod = det_feats @ state.feats.T  # (D, M)
    match_score = jnp.concatenate(
        [jnp.zeros((d, 1)), jnp.where(state.active[None, :], prod, NEG)], 1)
    match_logprob = jax.nn.log_softmax(match_score, axis=1)
    label_delta = (state.labels[None, :] == det_labels[:, None]).astype(
        jnp.float32)
    label_delta = jnp.concatenate([jnp.ones((d, 1)), label_delta], 1)
    ious = bbox_overlaps(det_boxes, state.boxes[:, :4])
    ious = jnp.concatenate([jnp.zeros((d, 1)), ious], 1)
    comp = (match_logprob +
            match_coeff[0] * jnp.log(jnp.maximum(det_scores, 1e-12))[:, None] +
            match_coeff[1] * ious + match_coeff[2] * label_delta)
    comp = jnp.where(
        jnp.concatenate([jnp.ones((1,), bool), state.active])[None, :],
        comp, NEG)
    match_ids = comp.argmax(1)  # (D,) 0 = new object
    match_vals = comp.max(1)

    # slots matched by ANY valid detection this frame are protected from
    # LRU eviction: their match targets were scored against the PRE-frame
    # memory, so overwriting them mid-frame would hand a matched det the
    # wrong (freshly issued) id
    protected = jnp.zeros((m,), bool).at[
        jnp.clip(match_ids - 1, 0, m - 1)].max(
        det_valid & (match_ids > 0) & ~fresh)
    far_future = jnp.int32(2 ** 30)

    def assign_det(i, carry):
        st, obj_ids, best = carry
        valid = det_valid[i]
        mid = match_ids[i]
        is_new = fresh | (mid == 0)
        # new-object slot: first free slot, else evict the least-recently-
        # seen unprotected slot (all-protected falls back to plain LRU)
        any_free = ~st.active.all()
        first_free = jnp.argmin(st.active)
        evict_key = jnp.where(protected, far_future, st.last_seen)
        evict_key = jnp.where(st.active, evict_key, far_future)
        slot_new = jnp.where(any_free, first_free, jnp.argmin(evict_key))
        evicts = is_new & ~any_free
        obj = jnp.where(is_new, slot_new, jnp.clip(mid - 1, 0, m - 1))
        better = (~is_new) & (match_vals[i] > best[jnp.clip(mid - 1, 0, m - 1)])
        write = valid & (is_new | better)
        new_id = st.count  # ids issued monotonically, survive eviction
        obj_id = jnp.where(write, jnp.where(is_new, new_id, st.ids[obj]), -1)
        # reference keeps the earlier det's id when outscored later; we mirror
        # that by only giving ids to (new | best-so-far) dets and letting the
        # host overwrite per-object output by detection order (:668-675)
        feats = jnp.where(write, det_feats[i], st.feats[obj])
        boxes5 = jnp.concatenate([det_boxes[i], det_scores[i][None]])
        boxes = jnp.where(write, boxes5, st.boxes[obj])
        # matched objects keep their original label: the reference updates
        # prev_roi_feats/prev_bboxes but never prev_det_labels (:664-667)
        labels = jnp.where(write & is_new, det_labels[i], st.labels[obj])
        st = st._replace(
            feats=st.feats.at[obj].set(feats),
            boxes=st.boxes.at[obj].set(boxes),
            labels=st.labels.at[obj].set(labels),
            active=st.active.at[obj].set(st.active[obj] | write),
            count=st.count + (valid & is_new).astype(jnp.int32),
            ids=st.ids.at[obj].set(
                jnp.where(write & is_new, new_id, st.ids[obj])),
            last_seen=st.last_seen.at[obj].set(
                jnp.where(write, st.frame, st.last_seen[obj])),
            overflow=st.overflow + (valid & evicts).astype(jnp.int32))
        best = best.at[jnp.clip(mid - 1, 0, m - 1)].set(
            jnp.where(better & valid, match_vals[i],
                      best[jnp.clip(mid - 1, 0, m - 1)]))
        obj_ids = obj_ids.at[i].set(obj_id)
        return st, obj_ids, best

    init = (state, jnp.full((d,), -1, jnp.int32), jnp.full((m,), -100.0))
    new_state, obj_ids, _ = jax.lax.fori_loop(0, d, assign_det, init)
    new_state = new_state._replace(frame=new_state.frame + 1)
    return new_state, obj_ids
