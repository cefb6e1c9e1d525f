"""Native (C++) mask/RLE operations with auto-build + numpy fallback.

The reference's eval stack leans on pycocotools' C core (maskApi.c); this
package provides the TPU framework's equivalent: ``maskops.cpp`` compiled on
first import with g++ into a cached shared library, bound via ctypes. When
no compiler is available the callers fall back to ``sipmask_tpu/eval/rle.py``
(byte-identical numpy implementation).

Public API (all numpy in/out):
  available() -> bool
  encode_mask(mask_u8_hw) -> {'size': [h, w], 'counts': bytes}
  encode_masks(masks_u8_nhw) -> list of RLE dicts
  decode_mask(rle) -> (h, w) uint8
  rle_area(rle) -> int
  iou_matrix(dt_rles, gt_rles, iscrowd) -> (n_dt, n_gt) float64, run-space
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "maskops.cpp")
_LIB_PATH = os.path.join(_HERE, "libmaskops.so")
_lib = None
_tried = False


def _build() -> Optional[str]:
    """Compile maskops.cpp -> libmaskops.so next to this file (cached)."""
    if os.path.exists(_LIB_PATH) and (
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return _LIB_PATH
    tmp = None
    try:
        # build in a temp file then atomically rename, so concurrent
        # importers never load a half-written library
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
        os.close(fd)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except (OSError, subprocess.CalledProcessError):
        if tmp and os.path.exists(tmp):
            os.unlink(tmp)
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.runs_from_mask.restype = ctypes.c_int
    lib.runs_from_mask.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u32p,
                                   ctypes.c_int]
    lib.mask_from_runs.restype = ctypes.c_int
    lib.mask_from_runs.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, u8p]
    lib.string_from_runs.restype = ctypes.c_int
    lib.string_from_runs.argtypes = [u32p, ctypes.c_int, ctypes.c_char_p,
                                     ctypes.c_int]
    lib.runs_from_string.restype = ctypes.c_int
    lib.runs_from_string.argtypes = [ctypes.c_char_p, ctypes.c_int, u32p,
                                     ctypes.c_int]
    lib.encode_mask.restype = ctypes.c_int
    lib.encode_mask.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_char_p, ctypes.c_int]
    lib.area_from_runs.restype = ctypes.c_int64
    lib.area_from_runs.argtypes = [u32p, ctypes.c_int]
    lib.rle_iou_matrix.restype = None
    lib.rle_iou_matrix.argtypes = [u32p, i64p, ctypes.c_int,
                                   u32p, i64p, ctypes.c_int, u8p, dp]
    lib.rle_inter_matrix.restype = None
    lib.rle_inter_matrix.argtypes = [u32p, i64p, ctypes.c_int,
                                     u32p, i64p, ctypes.c_int, dp]
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.greedy_match.restype = None
    lib.greedy_match.argtypes = [dp, ctypes.c_int, ctypes.c_int,
                                 dp, ctypes.c_int, u8p, u8p, i32p, u8p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def encode_mask(mask: np.ndarray) -> dict:
    lib = _load()
    if lib is None:
        from ..eval import rle as _rle
        return _rle.encode_mask(mask)
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    cap = 2 * h * w + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.encode_mask(_u8p(mask), h, w, buf, cap)
    assert n >= 0
    return {"size": [h, w], "counts": buf.raw[:n]}


def encode_masks(masks: np.ndarray) -> List[dict]:
    """(n, h, w) batch encode."""
    return [encode_mask(m) for m in masks]


def _runs_of(rle: dict) -> np.ndarray:
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = counts.encode()
    if isinstance(counts, bytes):
        lib = _load()
        cap = len(counts) + 8
        runs = np.empty(cap, np.uint32)
        n = lib.runs_from_string(counts, len(counts), _u32p(runs), cap)
        assert n >= 0
        return runs[:n]
    return np.asarray(counts, np.uint32)


def decode_mask(rle: dict) -> np.ndarray:
    lib = _load()
    if lib is None:
        from ..eval import rle as _rle
        return _rle.decode_mask(rle)
    h, w = rle["size"]
    runs = np.ascontiguousarray(_runs_of(rle))
    mask = np.zeros((h, w), np.uint8)
    lib.mask_from_runs(_u32p(runs), len(runs), h, w, _u8p(mask))
    return mask


def rle_area(rle: dict) -> int:
    lib = _load()
    if lib is None:
        from ..eval import rle as _rle
        return _rle.rle_area(rle)
    runs = np.ascontiguousarray(_runs_of(rle))
    return int(lib.area_from_runs(_u32p(runs), len(runs)))


def _pack_runs(rles):
    runs = [_runs_of(r) for r in rles]
    cat = np.ascontiguousarray(
        np.concatenate(runs) if runs else np.zeros(0, np.uint32), np.uint32)
    offs = np.zeros(len(runs) + 1, np.int64)
    if runs:
        np.cumsum([len(r) for r in runs], out=offs[1:])
    return cat, offs


def inter_matrix(dt_rles: Sequence[dict], gt_rles: Sequence[dict]
                 ) -> np.ndarray:
    """Raw intersection areas (n_dt, n_gt) in run space. An RLE of
    {'size': [h, w], 'counts': b':'} (single zero-run) stands in for an
    absent/empty mask."""
    n_dt, n_gt = len(dt_rles), len(gt_rles)
    if n_dt == 0 or n_gt == 0:
        return np.zeros((n_dt, n_gt))
    lib = _load()
    if lib is None:
        from ..eval.rle import decode_mask as dm
        out = np.zeros((n_dt, n_gt))
        dts = [dm(r) for r in dt_rles]
        gts = [dm(r) for r in gt_rles]
        for i, d in enumerate(dts):
            for j, g in enumerate(gts):
                out[i, j] = float(np.bitwise_and(d, g).sum())
        return out
    dcat, doffs = _pack_runs(dt_rles)
    gcat, goffs = _pack_runs(gt_rles)
    out = np.zeros((n_dt, n_gt), np.float64)
    lib.rle_inter_matrix(_u32p(dcat), _i64p(doffs), n_dt,
                         _u32p(gcat), _i64p(goffs), n_gt,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def greedy_match(ious: np.ndarray, thrs: np.ndarray, gt_ig: np.ndarray,
                 iscrowd: np.ndarray):
    """COCOeval greedy matching over IoU thresholds (pycocotools
    evaluateImg inner loop). ious (n_dt, n_gt) with gt columns sorted
    ignore-last. Returns (dtm int32 (T, D) 1-based, dt_ig uint8 (T, D)).
    Pure-python fallback when the library is unavailable."""
    n_dt, n_gt = ious.shape
    n_thr = len(thrs)
    lib = _load()
    dtm = np.zeros((n_thr, n_dt), np.int32)
    dt_ig = np.zeros((n_thr, n_dt), np.uint8)
    if n_dt == 0 or n_gt == 0:
        return dtm, dt_ig
    ious = np.ascontiguousarray(ious, np.float64)
    thrs = np.ascontiguousarray(thrs, np.float64)
    gt_ig = np.ascontiguousarray(gt_ig, np.uint8)
    iscrowd = np.ascontiguousarray(iscrowd, np.uint8)
    if lib is not None:
        dp = ctypes.POINTER(ctypes.c_double)
        lib.greedy_match(
            ious.ctypes.data_as(dp), n_dt, n_gt,
            thrs.ctypes.data_as(dp), n_thr,
            _u8p(gt_ig), _u8p(iscrowd),
            dtm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _u8p(dt_ig))
        return dtm, dt_ig
    for ti, t in enumerate(thrs):
        gtm = np.zeros(n_gt, np.int32)
        for di in range(n_dt):
            best = min(t, 1 - 1e-10)
            m = -1
            for gi in range(n_gt):
                if gtm[gi] > 0 and not iscrowd[gi]:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best = ious[di, gi]
                m = gi
            if m >= 0:
                dtm[ti, di] = m + 1
                dt_ig[ti, di] = gt_ig[m]
                gtm[m] = di + 1
    return dtm, dt_ig


def iou_matrix(dt_rles: Sequence[dict], gt_rles: Sequence[dict],
               iscrowd=None) -> np.ndarray:
    """Run-space IoU matrix (pycocotools rleIou equivalent): never decodes
    to dense masks. Crowd gt uses inter/area_dt."""
    n_dt, n_gt = len(dt_rles), len(gt_rles)
    if n_dt == 0 or n_gt == 0:
        return np.zeros((n_dt, n_gt))
    lib = _load()
    if lib is None:
        # dense fallback
        from ..eval.rle import decode_mask as dm
        from ..eval.coco_eval import mask_iou
        crowd = np.zeros(n_gt, bool) if iscrowd is None else \
            np.asarray(iscrowd, bool)
        return mask_iou([dm(r) for r in dt_rles], [dm(r) for r in gt_rles],
                        crowd)
    dcat, doffs = _pack_runs(dt_rles)
    gcat, goffs = _pack_runs(gt_rles)
    crowd = np.zeros(n_gt, np.uint8) if iscrowd is None else \
        np.ascontiguousarray(np.asarray(iscrowd), np.uint8)
    out = np.zeros((n_dt, n_gt), np.float64)
    lib.rle_iou_matrix(_u32p(dcat), _i64p(doffs), n_dt,
                       _u32p(gcat), _i64p(goffs), n_gt,
                       _u8p(crowd),
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
