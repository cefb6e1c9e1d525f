"""FCOS point (anchor-free location) generation.

Reference: sipmask_head.py:685-695 — per level, points are the pixel-grid
centers ``(x, y) * stride + stride // 2``. Everything here is static-shape
(featmap sizes are compile-time constants under jit).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def level_points(h: int, w: int, stride: int, dtype=jnp.float32):
    """Points for one level: ((h*w), 2) in input-image coordinates."""
    xs = np.arange(0, w * stride, stride, dtype=np.float32) + stride // 2
    ys = np.arange(0, h * stride, stride, dtype=np.float32) + stride // 2
    x, y = np.meshgrid(xs, ys)  # (h, w)
    pts = np.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
    return jnp.asarray(pts, dtype=dtype)


def all_points(featmap_sizes: Sequence[Tuple[int, int]],
               strides: Sequence[int],
               regress_ranges: Sequence[Tuple[float, float]] = None,
               dtype=jnp.float32):
    """Concatenated points / strides / regress-ranges across levels.

    Returns (points (P,2), strides (P,), ranges (P,2) or None) where
    P = sum(h*w). Computed in numpy (host, trace-time constant).
    """
    pts, strs, rngs = [], [], []
    for i, ((h, w), s) in enumerate(zip(featmap_sizes, strides)):
        xs = np.arange(0, w * s, s, dtype=np.float32) + s // 2
        ys = np.arange(0, h * s, s, dtype=np.float32) + s // 2
        x, y = np.meshgrid(xs, ys)
        p = np.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
        pts.append(p)
        strs.append(np.full((h * w,), s, dtype=np.float32))
        if regress_ranges is not None:
            rngs.append(np.tile(np.asarray(regress_ranges[i], np.float32), (h * w, 1)))
    points = jnp.asarray(np.concatenate(pts, 0), dtype=dtype)
    strides_arr = jnp.asarray(np.concatenate(strs, 0), dtype=dtype)
    ranges = (jnp.asarray(np.concatenate(rngs, 0), dtype=dtype)
              if regress_ranges is not None else None)
    return points, strides_arr, ranges
