"""Loss functions (pure JAX, elementwise -> fused by XLA).

Replaces the reference's loss zoo, including its CUDA sigmoid-focal-loss
kernel (mmdet/ops/sigmoid_focal_loss/) which on TPU is a trivial fused
elementwise expression:
- ``sigmoid_focal_loss``: mmdet/models/losses/focal_loss.py (py_sigmoid path).
- ``iou_loss``: mmdet/models/losses/iou_loss.py:10-27 (-log IoU).
- ``giou_loss``: iou_loss.py:73-115 (benchmark's IOU_LOSS_TYPE 'giou').
- ``binary_cross_entropy``: torch F.binary_cross_entropy semantics.
- ``mse``: re-scoring loss (sum reduction).

All take explicit ``weight`` / ``avg_factor`` like mmdet's weighted_loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps


def sigmoid_focal_loss(logits, labels, num_classes: int, gamma: float = 2.0,
                       alpha: float = 0.25, avg_factor=None):
    """Focal loss with integer labels (0 = background, 1..C foreground).

    logits: (..., C); labels: (...,) int.
    Matches mmdet's py_sigmoid_focal_loss: with one-hot targets t,
    pt = (1-p)*t + p*(1-t); w = (alpha*t + (1-alpha)*(1-t)) * pt**gamma;
    loss = BCE(p, t) * w, summed, / avg_factor.
    """
    t = jax.nn.one_hot(labels - 1, num_classes, dtype=logits.dtype)
    t = t * (labels > 0)[..., None].astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = (1 - p) * t + p * (1 - t)
    focal_weight = (alpha * t + (1 - alpha) * (1 - t)) * pt ** gamma
    bce = optax_sigmoid_bce(logits, t)
    loss = bce * focal_weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / avg_factor
    return loss


def optax_sigmoid_bce(logits, targets):
    """Numerically-stable BCE with logits (elementwise)."""
    # max(x,0) - x*t + log(1 + exp(-|x|))
    return (jnp.clip(logits, 0) - logits * targets +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))


def binary_cross_entropy(probs, targets, eps_log: float = -100.0):
    """BCE on probabilities, clamping logs at -100 like torch (elementwise)."""
    log_p = jnp.clip(jnp.log(jnp.clip(probs, 1e-45)), eps_log)
    log_1p = jnp.clip(jnp.log(jnp.clip(1 - probs, 1e-45)), eps_log)
    return -(targets * log_p + (1 - targets) * log_1p)


def iou_loss(pred, target, weight=None, avg_factor=None, eps: float = 1e-6):
    """-log(IoU) with the mmdet +1 convention (iou_loss.py:10-27)."""
    ious = jnp.clip(bbox_overlaps(pred, target, is_aligned=True), eps)
    loss = -jnp.log(ious)
    return _reduce(loss, weight, avg_factor)


def giou_loss(pred, target, weight=None, avg_factor=None, eps: float = 1e-7):
    """GIoU loss with +1 convention (iou_loss.py:73-115)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt + 1, 0)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0] + 1) * (pred[..., 3] - pred[..., 1] + 1)
    ag = (target[..., 2] - target[..., 0] + 1) * (target[..., 3] - target[..., 1] + 1)
    union = ap + ag - overlap + eps
    ious = overlap / union
    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    enc_wh = jnp.clip(enc_rb - enc_lt + 1, 0)
    enclose = enc_wh[..., 0] * enc_wh[..., 1] + eps
    gious = ious - (enclose - union) / enclose
    return _reduce(1 - gious, weight, avg_factor)


def giou_loss_ltrb(pred, target, weight=None, avg_factor=None):
    """fcos_core's IOULoss(loss_type='giou') (SipMask-benchmark
    fcos_core/layers/iou_loss.py:12-56): operates on (l, t, r, b) distances
    (stride-normalized under NORM_REG_TARGETS), areas = (l+r)*(t+b) with NO
    +1 side convention, smoothed ious = (inter + 1)/(union + 1), enclosing
    box + 1e-7."""
    pl, pt, pr, pb = (pred[..., i] for i in range(4))
    tl, tt, tr, tb = (target[..., i] for i in range(4))
    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl + pr) * (pt + pb)
    w_inter = jnp.minimum(pl, tl) + jnp.minimum(pr, tr)
    g_w = jnp.maximum(pl, tl) + jnp.maximum(pr, tr)
    h_inter = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_h = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)
    ac_union = g_w * g_h + 1e-7
    inter = w_inter * h_inter
    union = target_area + pred_area - inter
    ious = (inter + 1.0) / (union + 1.0)
    gious = ious - (ac_union - union) / ac_union
    return _reduce(1 - gious, weight, avg_factor)


def bounded_iou_loss(pred, target, weight=None, avg_factor=None,
                     beta: float = 0.2, eps: float = 1e-3):
    """BoundedIoULoss (mmdet iou_loss.py BIoU: per-coordinate bounded IoU
    deltas through a smooth-L1), completing the reference's IoU-loss family.
    pred/target: (..., 4) xyxy."""
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0] + 1
    ph = pred[..., 3] - pred[..., 1] + 1
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    tw = target[..., 2] - target[..., 0] + 1
    th = target[..., 3] - target[..., 1] + 1

    dx = 1 - jnp.clip((tw - 2 * jnp.abs(px - tx)) / (tw + 2 * jnp.abs(px - tx)
                                                     + eps), 0)
    dy = 1 - jnp.clip((th - 2 * jnp.abs(py - ty)) / (th + 2 * jnp.abs(py - ty)
                                                     + eps), 0)
    dw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    dh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    d = jnp.stack([dx, dy, dw, dh], -1)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta).sum(-1)
    return _reduce(loss, weight, avg_factor)


def bce_with_logits(logits, targets, weight=None, avg_factor=None):
    loss = optax_sigmoid_bce(logits, targets)
    return _reduce(loss, weight, avg_factor)


def mse_sum(pred, target, weight=None):
    loss = (pred - target) ** 2
    if weight is not None:
        loss = loss * weight
    return loss.sum()


def _reduce(loss, weight, avg_factor):
    if weight is not None:
        loss = loss * weight
    loss = loss.sum()
    if avg_factor is not None:
        loss = loss / avg_factor
    return loss
