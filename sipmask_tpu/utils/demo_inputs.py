"""Deterministic synthetic batches for tests/demos.

TPU analog of the reference's ``_demo_mm_inputs`` fixture
(SipMask-mmdetection/tests/test_forward.py:329-390): fixed-seed random
images + random boxes/labels/masks in the framework's static-shape batch
layout, so real model + loss + decode paths run on CPU without datasets.
"""

from __future__ import annotations

import numpy as np


def demo_batch(batch_size=2, height=64, width=64, max_gts=8, num_gts=None,
               num_classes=80, seed=0):
    """Returns a dict matching the training batch contract:
      images (B, H, W, 3) float32 normalized-ish,
      gt_bboxes (B, G, 4) xyxy input coords,
      gt_labels (B, G) int32 in [1..C], 0 pad,
      gt_masks (B, G, H//2, W//2) uint8 at the stride-2 basis resolution,
      img_shapes (B, 2) float32, scale_factors (B, 4) float32.
    """
    rng = np.random.RandomState(seed)
    images = rng.randn(batch_size, height, width, 3).astype(np.float32) * 10
    g = max_gts
    n = num_gts if num_gts is not None else max(1, g // 2)
    cx = rng.uniform(0.2, 0.8, (batch_size, g)) * width
    cy = rng.uniform(0.2, 0.8, (batch_size, g)) * height
    bw = rng.uniform(0.15, 0.6, (batch_size, g)) * width
    bh = rng.uniform(0.15, 0.6, (batch_size, g)) * height
    boxes = np.stack([
        np.clip(cx - bw / 2, 0, width - 1),
        np.clip(cy - bh / 2, 0, height - 1),
        np.clip(cx + bw / 2, 0, width - 1),
        np.clip(cy + bh / 2, 0, height - 1)], -1).astype(np.float32)
    labels = rng.randint(1, num_classes + 1,
                         (batch_size, g)).astype(np.int32)
    labels[:, n:] = 0

    mh, mw = height // 2, width // 2
    masks = np.zeros((batch_size, g, mh, mw), np.uint8)
    for b in range(batch_size):
        for i in range(n):
            x1, y1, x2, y2 = (boxes[b, i] / 2).astype(int)
            masks[b, i, y1:y2 + 1, x1:x2 + 1] = \
                (rng.rand(y2 + 1 - y1, x2 + 1 - x1) > 0.3)
    img_shapes = np.tile([[height, width]], (batch_size, 1)).astype(np.float32)
    scale_factors = np.ones((batch_size, 4), np.float32)
    return dict(images=images, gt_bboxes=boxes, gt_labels=labels,
                gt_masks=masks, img_shapes=img_shapes,
                scale_factors=scale_factors)
