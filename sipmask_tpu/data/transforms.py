"""Host-side (numpy/cv2) image + annotation transforms.

Rewrite of the reference pipeline (mmdet/datasets/pipelines/transforms.py:
24-904, loading.py:11-190) with TPU static-shape outputs:
- keep-ratio resize to (long, short) like mmdet Resize (bilinear for images,
  nearest for masks), or fixed-size resize for the real-time variant;
- horizontal flip; caffe-BGR normalization (mean sub, std 1);
- pad to a static bucket (landscape/portrait) instead of dynamic div-32 pads;
- SSD-style photometric distortion / expand / min-IoU random crop for the
  6x real-time recipe (sipmask_r50_caffe_fpn_ssd_6x.py:64-100);
- gt masks are emitted at the stride-2 basis-mask resolution, binarized the
  same way as the reference's in-loss F.interpolate(gt, 0.5, bilinear) > 0.5
  (sipmask_head.py:437-442).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import cv2

from ..config import DataConfig


def imrescale_factor(h: int, w: int, scale: Tuple[int, int]) -> float:
    """mmcv.imrescale's SCALAR factor: scale=(long, short). The reference
    scales bboxes (and later rescales decoded boxes) by this one float, not
    by per-axis out/in ratios (transforms.py:122-141; imrescale returns a
    single scale_factor in keep_ratio mode)."""
    long_side, short_side = max(scale), min(scale)
    return min(long_side / max(h, w), short_side / min(h, w))


def imrescale_size(h: int, w: int, scale: Tuple[int, int]) -> Tuple[int, int]:
    """mmdet keep-ratio target size: scale=(long, short)."""
    f = imrescale_factor(h, w, scale)
    return int(h * f + 0.5), int(w * f + 0.5)


def resize_image(img, out_h, out_w, interp=cv2.INTER_LINEAR):
    return cv2.resize(img, (out_w, out_h), interpolation=interp)


def sample_ms_scale(scales, mode: str, rng) -> Tuple[int, int]:
    """One train scale per image — the reference's Resize.random_sample /
    random_scale semantics (transforms.py:82-96, VIS utils.py:30-60).
    'range' (the reference default for every ms config): draw the long
    edge then the short edge by randint between the two scales' endpoints.
    'value': pick one scale from the list."""
    if len(scales) == 1:
        return scales[0]
    if mode == "range":
        if len(scales) != 2:
            raise ValueError("range mode needs exactly 2 scales")
        longs = [max(s) for s in scales]
        shorts = [min(s) for s in scales]
        long_e = rng.randint(min(longs), max(longs) + 1)
        short_e = rng.randint(min(shorts), max(shorts) + 1)
        return (int(long_e), int(short_e))
    if mode == "value":
        return scales[rng.randint(len(scales))]
    raise ValueError(f"unknown ms_mode {mode!r}")


def photometric_distortion(img, rng, brightness_delta=32,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5), hue_delta=18):
    """SSD photometric aug — exact reference semantics AND rng draw order
    (PhotoMetricDistortion, transforms.py:460-537). img: BGR f32 0..255.

    The reference works in float throughout: cv2's float BGR<->HSV (H in
    degrees [0,360), S in [0,1], V in the input scale), hue delta a float
    in degrees, saturation unclipped, and it ALWAYS roundtrips through
    HSV (each of saturation/hue is an independent p=0.5 gate). Bit-for-bit
    parity with the reference class under a shared MT19937 seed is tested
    in tests/test_reference_parity.py."""
    img = img.copy()
    if rng.randint(2):
        img += rng.uniform(-brightness_delta, brightness_delta)
    mode = rng.randint(2)
    if mode == 1:
        if rng.randint(2):
            img *= rng.uniform(*contrast_range)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    if rng.randint(2):
        img[..., 1] *= rng.uniform(*saturation_range)
    if rng.randint(2):
        img[..., 0] += rng.uniform(-hue_delta, hue_delta)
        img[..., 0][img[..., 0] > 360] -= 360
        img[..., 0][img[..., 0] < 0] += 360
    img = cv2.cvtColor(img, cv2.COLOR_HSV2BGR)
    if mode == 0:
        if rng.randint(2):
            img *= rng.uniform(*contrast_range)
    if rng.randint(2):
        img = img[..., rng.permutation(3)]
    return img


def expand(img, boxes, masks, rng, mean, ratio_range=(1, 4), prob=0.5):
    """SSD Expand: paste into a larger mean-filled canvas — exact reference
    semantics and rng draw order (Expand, transforms.py:551-600: gate by
    uniform(0,1) > prob, then ratio, then LEFT before TOP via
    int(uniform(0, size*ratio - size)))."""
    if rng.uniform(0, 1) > prob:
        return img, boxes, masks
    h, w, c = img.shape
    ratio = rng.uniform(*ratio_range)
    eh, ew = int(h * ratio), int(w * ratio)
    left = int(rng.uniform(0, w * ratio - w))
    top = int(rng.uniform(0, h * ratio - h))
    # single-pass C fill+paste; bit-identical to a mean-filled np canvas
    # and ~6x faster at 4x ratios (26 MB canvas)
    canvas = cv2.copyMakeBorder(img, top, eh - h - top, left, ew - w - left,
                                cv2.BORDER_CONSTANT,
                                value=np.asarray(mean, np.float64).tolist())
    boxes = boxes + np.array([left, top, left, top], boxes.dtype)
    if masks is not None and len(masks):
        mcan = np.zeros((len(masks), eh, ew), masks.dtype)
        mcan[:, top:top + h, left:left + w] = masks
        masks = mcan
    return canvas, boxes, masks


def min_iou_random_crop(img, boxes, labels, masks, rng,
                        min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                        min_crop_size=0.3, max_tries=50):
    """SSD MinIoURandomCrop — exact reference semantics and rng draw order
    (MinIoURandomCrop, transforms.py:632-720): mode via rng.choice over
    (1, *min_ious, 0); patch offsets via the reference's ONE-ARG uniform
    (numpy treats the argument as `low` with high=1.0 — a quirk the
    reference relies on, so offsets land in (1, slack] instead of
    [0, slack)); +1-convention IoU against the INT patch; strict
    center-in-patch keep; clip to the patch edge with NO -1; and empty-gt
    images still get cropped (only the box/mask adjustment is skipped).
    Bit-for-bit parity with the reference class under a shared MT19937
    seed is tested in tests/test_reference_parity.py."""
    h, w = img.shape[:2]
    sample_mode = (1, *min_ious, 0)
    while True:
        mode = rng.choice(sample_mode)
        if mode == 1:
            return img, boxes, labels, masks
        min_iou = mode
        for _ in range(max_tries):
            new_w = rng.uniform(min_crop_size * w, w)
            new_h = rng.uniform(min_crop_size * h, h)
            if new_h / new_w < 0.5 or new_h / new_w > 2:
                continue
            left = rng.uniform(w - new_w)   # reference quirk: low=slack
            top = rng.uniform(h - new_h)
            patch = np.array((int(left), int(top),
                              int(left + new_w), int(top + new_h)))
            if len(boxes):
                pf = patch.astype(np.float32)
                bf = boxes.astype(np.float32)
                lt = np.maximum(bf[:, :2], pf[:2])
                rb = np.minimum(bf[:, 2:], pf[2:])
                wh = np.clip(rb - lt + 1, 0, None)          # +1 convention
                inter = wh[:, 0] * wh[:, 1]
                area_b = ((bf[:, 2] - bf[:, 0] + 1) *
                          (bf[:, 3] - bf[:, 1] + 1))
                area_p = (pf[2] - pf[0] + 1) * (pf[3] - pf[1] + 1)
                ious = inter / (area_b + area_p - inter)
                if ious.min() < min_iou:
                    continue
                centers = (boxes[:, :2] + boxes[:, 2:]) / 2
                keep = ((centers[:, 0] > patch[0]) &
                        (centers[:, 1] > patch[1]) &
                        (centers[:, 0] < patch[2]) &
                        (centers[:, 1] < patch[3]))
                if not keep.any():
                    continue
                boxes = boxes[keep].copy()
                boxes[:, 2:] = np.minimum(boxes[:, 2:],
                                          patch[2:].astype(boxes.dtype))
                boxes[:, :2] = np.maximum(boxes[:, :2],
                                          patch[:2].astype(boxes.dtype))
                boxes -= np.tile(patch[:2], 2).astype(boxes.dtype)
                labels = labels[keep]
                if masks is not None and len(masks):
                    masks = masks[keep][:, patch[1]:patch[3],
                                        patch[0]:patch[2]]
            img = img[patch[1]:patch[3], patch[0]:patch[2]]
            return img, boxes, labels, masks


@dataclasses.dataclass
class Sample:
    """One transformed example in static-shape layout."""
    image: np.ndarray        # (H, W, 3) float32
    gt_bboxes: np.ndarray    # (G, 4)
    gt_labels: np.ndarray    # (G,)
    gt_masks: np.ndarray     # (G, H/2, W/2) uint8
    img_shape: np.ndarray    # (2,) resized pre-pad (h, w)
    ori_shape: Tuple[int, int]
    scale_factor: np.ndarray  # (4,) sx, sy, sx, sy
    landscape: bool = True
    image_id: int = -1


class TrainTransform:
    def __init__(self, cfg: DataConfig, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.mean = np.asarray(cfg.mean, np.float32)
        self.std = np.asarray(cfg.std, np.float32)

    def bucket_shape(self, landscape: bool) -> Tuple[int, int]:
        c = self.cfg
        if c.fixed_size is not None:
            # train stretch size (576 RT) when set; test pads fixed_size (544)
            return c.train_size or c.fixed_size
        scales = c.ms_scales or (c.img_scale,)
        long_s = max(max(sc) for sc in scales)
        short_s = max(min(sc) for sc in scales)
        d = c.size_divisor
        pad = lambda v: (v + d - 1) // d * d
        return ((pad(short_s), pad(long_s)) if landscape
                else (pad(long_s), pad(short_s)))

    def __call__(self, img, boxes, labels, masks, image_id=-1) -> Sample:
        """img: (H, W, 3) uint8 BGR; boxes (N,4) f32; labels (N,) int;
        masks (N, H, W) uint8."""
        cfg = self.cfg
        rng = self.rng
        ori_shape = img.shape[:2]
        boxes = boxes.astype(np.float32).copy()
        labels = labels.copy()

        if cfg.ssd_augs:
            # the SSD recipes load to_float32=True and resize FLOAT; the
            # keep-ratio recipes load uint8 (LoadImageFromFile default)
            # and mmcv resizes the UINT8 image (rounding) before
            # Normalize - so only cast up front here
            img = img.astype(np.float32)
            img = photometric_distortion(img, rng)
            img, boxes, masks = expand(img, boxes, masks, rng, self.mean)
            img, boxes, labels, masks = min_iou_random_crop(
                img, boxes, labels, masks, rng)

        h, w = img.shape[:2]
        if cfg.fixed_size is not None:
            # the real-time recipes TRAIN at train_size (576x576 stretch,
            # sipmask_r50_caffe_fpn_ssd_6x.py:83 Resize keep_ratio=False)
            # and TEST at fixed_size (544x544)
            out_h, out_w = cfg.train_size or cfg.fixed_size
            landscape = True
        else:
            scale = cfg.img_scale
            if cfg.ms_scales:  # multi-scale train: sample one per image
                scale = sample_ms_scale(cfg.ms_scales, cfg.ms_mode, rng)
            out_h, out_w = imrescale_size(h, w, scale)
            landscape = out_w >= out_h
        if cfg.fixed_size is not None:
            sx, sy = out_w / w, out_h / h     # imresize per-axis factors
        else:
            sx = sy = imrescale_factor(h, w, scale)  # imrescale scalar
        img = resize_image(img, out_h, out_w)
        boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
        # Resize clips boxes into the resized image (transforms.py:134-140)
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, out_w - 1)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, out_h - 1)

        if rng.rand() < cfg.flip_ratio:
            img = img[:, ::-1]
            flipped = boxes.copy()
            flipped[:, 0] = out_w - boxes[:, 2] - 1
            flipped[:, 2] = out_w - boxes[:, 0] - 1
            boxes = flipped
            flip = True
        else:
            flip = False

        if img.dtype != np.float32:
            img = img.astype(np.float32)  # copies (materializes any flip)
        elif flip:  # flipped view -> materialize once, normalize in place
            img = np.ascontiguousarray(img)
        img -= self.mean
        img /= self.std

        pad_h, pad_w = self.bucket_shape(landscape)
        canvas = np.zeros((pad_h, pad_w, 3), np.float32)
        canvas[:out_h, :out_w] = img[:pad_h, :pad_w]

        # gt masks at the stride-2 basis resolution (bilinear + >0.5, matching
        # the reference's in-loss downsample)
        g = cfg.max_gts
        mh, mw = pad_h // 2, pad_w // 2
        gm = np.zeros((g, mh, mw), np.uint8)
        n = min(len(boxes), g)
        for i in range(n):
            if masks is None or not len(masks):
                break
            # NEAREST-resize to the network input, THEN flip — the
            # reference's order (Resize before RandomFlip; nearest's
            # asymmetric grid makes flip-then-resize differ) — zero-pad to
            # the bucket, then 0.5x bilinear + >0.5 — the in-loss sequence
            m = resize_image(masks[i].astype(np.float32), out_h, out_w,
                             interp=cv2.INTER_NEAREST)
            if flip:
                m = m[:, ::-1]
            mp = np.zeros((pad_h, pad_w), np.float32)
            mp[:out_h, :out_w] = m[:pad_h, :pad_w]
            m2 = cv2.resize(mp, (mw, mh), interpolation=cv2.INTER_LINEAR)
            gm[i] = (m2 > 0.5)

        gb = np.zeros((g, 4), np.float32)
        gl = np.zeros((g,), np.int32)
        gb[:n] = boxes[:n]
        gl[:n] = labels[:n]
        return Sample(
            image=canvas, gt_bboxes=gb, gt_labels=gl, gt_masks=gm,
            img_shape=np.array([out_h, out_w], np.float32),
            ori_shape=ori_shape,
            scale_factor=np.array([sx, sy, sx, sy], np.float32),
            landscape=landscape, image_id=image_id)


class TestTransform:
    """Resize keep-ratio (no flip), normalize, pad to bucket."""

    __test__ = False  # not a pytest test class despite the name

    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        self.mean = np.asarray(cfg.mean, np.float32)
        self.std = np.asarray(cfg.std, np.float32)

    def bucket_shape(self, landscape: bool) -> Tuple[int, int]:
        if self.cfg.fixed_size is not None:
            return self.cfg.fixed_size  # RT tests at 544 (train stretches 576)
        return TrainTransform.bucket_shape(self, landscape)  # same logic

    def __call__(self, img, image_id=-1) -> Sample:
        cfg = self.cfg
        # every reference test pipeline loads uint8 (no to_float32), so
        # the resize runs on the original dtype; normalize casts after
        ori_shape = img.shape[:2]
        h, w = ori_shape
        if cfg.fixed_size is not None:
            out_h, out_w = cfg.fixed_size
            landscape = True
        else:
            # test-time always uses the canonical img_scale (no ms sampling)
            out_h, out_w = imrescale_size(h, w, cfg.img_scale)
            landscape = out_w >= out_h
        if cfg.fixed_size is not None:
            sx, sy = out_w / w, out_h / h     # imresize per-axis factors
        else:
            sx = sy = imrescale_factor(h, w, cfg.img_scale)
        img = resize_image(img, out_h, out_w)
        img = (img.astype(np.float32) - self.mean) / self.std
        pad_h, pad_w = self.bucket_shape(landscape)
        canvas = np.zeros((pad_h, pad_w, 3), np.float32)
        canvas[:out_h, :out_w] = img[:pad_h, :pad_w]
        return Sample(
            image=canvas, gt_bboxes=np.zeros((0, 4), np.float32),
            gt_labels=np.zeros((0,), np.int32),
            gt_masks=np.zeros((0, 1, 1), np.uint8),
            img_shape=np.array([out_h, out_w], np.float32),
            ori_shape=ori_shape,
            scale_factor=np.array([sx, sy, sx, sy], np.float32),
            landscape=landscape, image_id=image_id)


class VISPairTransform:
    """Current+reference frame pair transform for VIS training
    (SipMask-VIS ytvos.py prepare_train_img: same scale and flip applied to
    both frames; reference gt boxes jittered ±5% on the host, the in-loss
    equivalent of sipmask_head.py:471-484)."""

    def __init__(self, cfg: DataConfig, seed: int = 0,
                 jitter_amplitude: float = 0.0):
        # jitter_amplitude is the ytvos.py bbox_aug analog
        # (aug_ref_bbox_param); the reference VIS configs leave it None ->
        # default 0 = train on exact scaled ref boxes like the reference
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.mean = np.asarray(cfg.mean, np.float32)
        self.std = np.asarray(cfg.std, np.float32)
        self.amp = jitter_amplitude

    def bucket_shape(self, landscape: bool):
        return TrainTransform.bucket_shape(self, landscape)

    def __call__(self, pair: dict) -> dict:
        cfg, rng = self.cfg, self.rng
        # mmcv.imread feeds ImageTransform uint8; imrescale runs on uint8
        # and imnormalize casts f32 AFTER the resize (VIS transforms.py:31-40)
        img = pair["img"]
        ref = pair["ref_img"]
        boxes, labels, masks = pair["boxes"], pair["labels"], pair["masks"]
        rboxes, rlabels = pair["ref_boxes"].copy(), pair["ref_labels"]
        h, w = img.shape[:2]

        # the VIS fork draws flip BEFORE the train scale
        # (ytvos.py:240-242: np.random.rand() then random_scale)
        flip = rng.rand() < cfg.flip_ratio
        if cfg.fixed_size is not None:
            # same train-stretch rule as TrainTransform (and its
            # bucket_shape, which this class delegates to)
            out_h, out_w = cfg.train_size or cfg.fixed_size
            landscape = True
            sx, sy = out_w / w, out_h / h     # imresize per-axis factors
        else:
            scale = cfg.img_scale
            if cfg.ms_scales:  # multi-scale train: sample one per image
                scale = sample_ms_scale(cfg.ms_scales, cfg.ms_mode, rng)
            out_h, out_w = imrescale_size(h, w, scale)
            landscape = out_w >= out_h
            sx = sy = imrescale_factor(h, w, scale)  # imrescale scalar
        scale = np.array([sx, sy, sx, sy], np.float32)
        img = resize_image(img, out_h, out_w)
        ref = resize_image(ref, out_h, out_w)
        boxes = boxes * scale
        rboxes = rboxes * scale

        if flip:
            img, ref = img[:, ::-1], ref[:, ::-1]
            for bb in (boxes, rboxes):
                x1 = bb[:, 0].copy()
                bb[:, 0] = out_w - bb[:, 2] - 1
                bb[:, 2] = out_w - x1 - 1

        img = (img.astype(np.float32) - self.mean) / self.std
        ref = (ref.astype(np.float32) - self.mean) / self.std
        pad_h, pad_w = self.bucket_shape(landscape)
        can = np.zeros((pad_h, pad_w, 3), np.float32)
        can[:out_h, :out_w] = img[:pad_h, :pad_w]
        rcan = np.zeros((pad_h, pad_w, 3), np.float32)
        rcan[:out_h, :out_w] = ref[:pad_h, :pad_w]

        g = cfg.max_gts
        mh, mw = pad_h // 2, pad_w // 2
        gm = np.zeros((g, mh, mw), np.uint8)
        n = min(len(boxes), g)
        for i in range(n):
            if not len(masks):
                break
            # resize nearest THEN flip — the reference's Resize-before-
            # RandomFlip order (see TrainTransform)
            m = resize_image(masks[i].astype(np.float32), out_h, out_w,
                             interp=cv2.INTER_NEAREST)
            if flip:
                m = m[:, ::-1]
            mp = np.zeros((pad_h, pad_w), np.float32)
            mp[:out_h, :out_w] = m[:pad_h, :pad_w]
            gm[i] = cv2.resize(mp, (mw, mh),
                               interpolation=cv2.INTER_LINEAR) > 0.5

        # host-side ref box jitter (ytvos.py bbox_aug analog); amp=0 (the
        # reference default, aug_ref_bbox_param=None) draws NOTHING so the
        # rng stream stays aligned with the reference's
        nr = min(len(rboxes), g)
        rj = rboxes[:nr].copy()
        if nr and self.amp:
            off = self.rng.uniform(-self.amp, self.amp, (nr, 4))
            cxcy = (rj[:, 2:] + rj[:, :2]) / 2
            wh = np.abs(rj[:, 2:] - rj[:, :2])
            ncxcy = cxcy + wh * off[:nr, :2]
            nwh = wh * (1 + off[:nr, 2:])
            rj = np.concatenate([ncxcy - nwh / 2, ncxcy + nwh / 2], 1)

        def padded(arr, shape, dtype):
            out = np.zeros(shape, dtype)
            k = min(len(arr), shape[0])
            if k:
                out[:k] = arr[:k]
            return out

        return dict(
            image=can, ref_image=rcan,
            gt_bboxes=padded(boxes, (g, 4), np.float32),
            gt_labels=padded(labels, (g,), np.int32),
            gt_masks=gm,
            gt_pids=padded(pair["gt_pids"], (g,), np.int32),
            ref_bboxes_jit=padded(rj, (g, 4), np.float32),
            ref_labels=padded(rlabels, (g,), np.int32),
            img_shape=np.array([out_h, out_w], np.float32),
            scale_factor=scale)
