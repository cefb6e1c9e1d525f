"""Fused SP mask-loss Pallas kernel: assembly + BCE with zero HBM blowup.

The XLA mask-loss path (ops/crop_split.py mask_bce_loss_indexed) materializes
(h, w, K) f32 logits per image — 550MB at 800x1344 K=512 — and its backward
re-reads them; the device profile attributes ~36ms of the 197ms high-accuracy
train step to these tensors (docs/KERNEL_NOTES.md round 3). This kernel
computes the per-positive pixel-summed BCE

    pre[k] = sum_p inb[p,k] * BCE(sel[p,k], y[p,k])
    sel[p,k] = basis[p] @ cof_q(p,k)[k]      (q = quadrant of p in box k)
    y[p,k]   = gt_masks[gt_idx[k], p]

entirely in VMEM: per (image, pixel-tile) it runs the four quadrant matmuls
(PB, NB) @ (NB, K) on the MXU, selects by in-kernel quadrant indicators
(CropSplit semantics, crop_split_cuda_kernel.cu:45-56 — +0.1 half-split
guard, strict upper bounds), gathers gt by a {0,1} one-hot matmul (exact in
bf16), and reduces the stable BCE-with-logits into a K-vector accumulator
that stays VMEM-resident for the whole image. HBM traffic per image drops
from ~2-3GB to basis+gt reads (~21MB).

The backward recomputes sel per tile (matmul-cheap) and emits
    dbasis[p] = sum_q (dsel * mask_q) @ cof_q
    dcof_q[k] = basis^T @ (dsel * mask_q),  dsel = g[k]*(sigmoid(sel)-y)*inb
with dcof accumulated in VMEM across pixel tiles. Boxes and gt carry no
gradient (the reference crops with stop-gradient boxes,
sipmask_head.py:407-417).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .deform_gather import pallas_available, _compiler_params

P_TILE = 512   # flat pixels per grid step (v5e sweep: 512 beats 256-4096)


def _pad_axis(x, mult, axis):
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pixel_coords(pt, pb, w):
    """Flat pixel index -> (py, px, valid-row broadcastable) as f32 columns."""
    i = (jax.lax.broadcasted_iota(jnp.int32, (pb, 1), 0) + pt * pb)
    fi = i.astype(jnp.float32)
    # +0.5 keeps the f32 reciprocal-multiply away from integer boundaries:
    # floor(fi/w) via rounded 1/w is off by one at exact multiples of w for
    # 38 of the widths <= 2048 (e.g. 656, 752); floor((fi+0.5)/w) is exact
    # while py * 2^-22 < 0.5/w, i.e. any mask wider than a few pixels.
    py = jnp.floor((fi + 0.5) * (1.0 / w))
    px = fi - py * w
    return py, px, i


def _quadrant_preds(py, px, bx):
    """In-kernel CropSplit indicators. bx: (8, Kc) f32 rows
    [x1, y1, x2, y2, pad...]; returns (inb, right, bottom) each (PB, Kc)."""
    x1 = bx[0:1, :]
    y1 = bx[1:2, :]
    x2 = bx[2:3, :]
    y2 = bx[3:4, :]
    inb = (px >= x1) & (px < x2) & (py >= y1) & (py < y2)
    right = px >= (x1 + (x2 - x1 + 0.1) * 0.5)
    bottom = py >= (y1 + (y2 - y1 + 0.1) * 0.5)
    return inb, right, bottom


CHUNK = 128  # positives per skippable lane chunk


def _sel_logits(basis_blk, cof4c, right, bottom):
    """Quadrant-selected logits (PB, Kc) f32 for one chunk.

    cof4c holds the chunk's four quadrant matrices stacked along the N
    axis ((NB, 4*Kc), quadrant-major lanes), so all four products run as
    ONE (PB, NB) @ (NB, 4Kc) MXU call — the K=NB=32 contraction underfills
    the MXU (32/128 of peak); batching N keeps its pipeline full instead
    of issuing four half-empty dots. Per output element the arithmetic is
    identical to the four separate dots."""
    sel_all = jnp.dot(basis_blk, cof4c,
                      preferred_element_type=jnp.float32)   # (PB, 4Kc)
    kc = cof4c.shape[1] // 4
    m = [sel_all[:, q * kc:(q + 1) * kc] for q in range(4)]
    mtop = jnp.where(right, m[1], m[0])
    mbot = jnp.where(right, m[3], m[2])
    return jnp.where(bottom, mbot, mtop)


def _fwd_kernel(flags_ref, basis_ref, gtT_ref, onehotT_ref, cof4_ref,
                boxes_ref, pre_ref, *, kp, w, hw, c_n, t_n):
    """Per (image, pixel-tile): only y-band-active 128-positive chunks run
    (callers sort positives by y1 so chunk bands are tight; out-of-band
    pixels carry inb=0 and contribute exactly 0, so skipping is exact)."""
    import jax.experimental.pallas as pl

    bb, pt = pl.program_id(0), pl.program_id(1)
    py, px, i = _pixel_coords(pt, basis_ref.shape[1], w)
    rowmask = i < hw                                      # flat padding
    basis_blk = basis_ref[0]                              # (PB, NB)

    @pl.when(pt == 0)
    def _():
        pre_ref[...] = jnp.zeros_like(pre_ref)

    for c in range(c_n):
        @pl.when(flags_ref[(bb * t_n + pt) * c_n + c] > 0)
        def _(c=c):
            bx = boxes_ref[0, :, c * CHUNK:(c + 1) * CHUNK]
            inb, right, bottom = _quadrant_preds(py, px, bx)
            inb = inb & rowmask
            sel = _sel_logits(
                basis_blk, cof4_ref[0, :, c * 4 * CHUNK:(c + 1) * 4 * CHUNK],
                right, bottom)
            y = jnp.dot(gtT_ref[0],
                        onehotT_ref[0, :, c * CHUNK:(c + 1) * CHUNK],
                        preferred_element_type=jnp.float32)  # exact 0/1
            bce = (jnp.maximum(sel, 0.0) - sel * y +
                   jnp.log1p(jnp.exp(-jnp.abs(sel))))
            contrib = jnp.where(inb, bce, 0.0).sum(0)     # (Kc,)
            pre_ref[0, 0, c * CHUNK:(c + 1) * CHUNK] += contrib


def _bwd_kernel(flags_ref, basis_ref, gtT_ref, onehotT_ref, cof4_ref,
                boxes_ref, g_ref, dbasis_ref, dcof4_ref, acc_ref, *,
                kp, w, hw, c_n, t_n):
    import jax.experimental.pallas as pl

    bb, pt = pl.program_id(0), pl.program_id(1)
    py, px, i = _pixel_coords(pt, basis_ref.shape[1], w)
    rowmask = i < hw
    basis_blk = basis_ref[0]

    @pl.when(pt == 0)
    def _():
        dcof4_ref[...] = jnp.zeros_like(dcof4_ref)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    for c in range(c_n):
        @pl.when(flags_ref[(bb * t_n + pt) * c_n + c] > 0)
        def _(c=c):
            bx = boxes_ref[0, :, c * CHUNK:(c + 1) * CHUNK]
            inb, right, bottom = _quadrant_preds(py, px, bx)
            inb = inb & rowmask
            cof4c = cof4_ref[0, :, c * 4 * CHUNK:(c + 1) * 4 * CHUNK]
            sel = _sel_logits(basis_blk, cof4c, right, bottom)
            y = jnp.dot(gtT_ref[0],
                        onehotT_ref[0, :, c * CHUNK:(c + 1) * CHUNK],
                        preferred_element_type=jnp.float32)
            gk = g_ref[0, 0:1, c * CHUNK:(c + 1) * CHUNK]
            dsel = jnp.where(inb, (jax.nn.sigmoid(sel) - y) * gk, 0.0)
            dsel = dsel.astype(basis_blk.dtype)
            # Mask dsel into the quadrant-stacked (PB, 4Kc) layout matching
            # cof4: both backward contractions then run as ONE full-K MXU
            # call each (K=PB for dcof, K=4Kc for dbasis) instead of four
            # half-empty dots plus four separate masked copies.
            zero = jnp.zeros_like(dsel)
            m = jnp.concatenate(
                [jnp.where(right, zero, jnp.where(bottom, zero, dsel)),
                 jnp.where(right, jnp.where(bottom, zero, dsel), zero),
                 jnp.where(right, zero, jnp.where(bottom, dsel, zero)),
                 jnp.where(right, jnp.where(bottom, dsel, zero), zero)],
                axis=1)                                   # (PB, 4Kc)
            # dcof4 chunk (NB, 4Kc) += basis^T @ m  (contract PB on both)
            dcof4_ref[0, :, c * 4 * CHUNK:(c + 1) * 4 * CHUNK] += \
                jax.lax.dot_general(
                    basis_blk, m, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32
                ).astype(dcof4_ref.dtype)
            # dbasis (PB, NB) += m @ cof4c^T  (contract the stacked 4Kc)
            acc_ref[...] += jax.lax.dot_general(
                m, cof4c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    dbasis_ref[0] = acc_ref[...].astype(dbasis_ref.dtype)


def _chunk_flags(boxes, kp, hwp, w):
    """(B * T * C,) int32 activity flags: chunk c of image b is active for
    pixel tile t iff some row of the tile can fall inside some box of the
    chunk's y-band. Conservative (superset) activity is exact: out-of-band
    pixels have inb = 0 and contribute nothing. Callers sort positives by
    y1 (invalid entries degenerate, y-key +inf) so bands are tight and
    trailing all-padding chunks never activate."""
    b, k = boxes.shape[:2]
    c_n = kp // CHUNK
    t_n = hwp // P_TILE
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    real = (x2 > x1) & (y2 > y1)
    big = jnp.float32(1e9)
    y1k = _pad_axis(jnp.where(real, y1, big), kp, 1)
    # padded rows: jnp.pad gives 0, which would widen the band — overwrite
    if kp != k:
        pad_mask = jnp.arange(kp) >= k
        y1k = jnp.where(pad_mask[None, :], big, y1k)
    y2k = _pad_axis(jnp.where(real, y2, -big), kp, 1)
    y1c = y1k.reshape(b, c_n, CHUNK).min(-1)               # (B, C)
    y2c = y2k.reshape(b, c_n, CHUNK).max(-1)
    t = jnp.arange(t_n, dtype=jnp.float32)
    row_lo = jnp.floor(t * P_TILE / w)                     # first row of tile
    row_hi = jnp.floor((t * P_TILE + P_TILE - 1) / w)      # last row
    act = ((row_hi[None, :, None] >= y1c[:, None, :]) &
           (row_lo[None, :, None] < y2c[:, None, :]))      # (B, T, C)
    return act.astype(jnp.int32).reshape(-1)


def _prep(basis, cofs, boxes, gt_masks_g, gt_idx, mm_dtype):
    b, h, w, nb = basis.shape
    k = cofs.shape[1]
    g = gt_masks_g.shape[1]
    kp = -(-k // CHUNK) * CHUNK
    gp = max(-(-g // 16) * 16, 16)
    hw = h * w
    hwp = -(-hw // P_TILE) * P_TILE

    basis2 = _pad_axis(basis.reshape(b, hw, nb).astype(mm_dtype),
                       P_TILE, 1)
    gtT = gt_masks_g.reshape(b, g, hw).transpose(0, 2, 1)
    gtT = _pad_axis(_pad_axis(gtT.astype(mm_dtype), 16, 2), P_TILE, 1)
    onehotT = jax.nn.one_hot(gt_idx, gp, dtype=mm_dtype,
                             axis=1)                       # (B, Gp, K)
    onehotT = _pad_axis(onehotT, CHUNK, 2)
    # chunk-major, quadrant-stacked coefficient lanes: chunk c occupies
    # lanes [c*4*CHUNK, (c+1)*4*CHUNK), quadrant-major within the chunk
    c_n = kp // CHUNK
    cof4 = _pad_axis(cofs.astype(mm_dtype), kp, 1)         # (B, Kp, 4*NB)
    cof4 = cof4.reshape(b, c_n, CHUNK, 4, nb).transpose(
        0, 4, 1, 3, 2).reshape(b, nb, 4 * kp)
    boxesT = jnp.concatenate(
        [boxes.astype(jnp.float32).transpose(0, 2, 1),
         jnp.zeros((b, 4, k), jnp.float32)], 1)            # (B, 8, K)
    boxesT = _pad_axis(boxesT, CHUNK, 2)
    flags = _chunk_flags(boxes, kp, hwp, w)
    return basis2, gtT, onehotT, cof4, boxesT, flags, (b, hw, hwp, nb, k,
                                                       kp, gp, h, w)


@functools.partial(jax.jit, static_argnames=("h", "w", "kp", "interpret"))
def _fused_fwd_call(basis2, gtT, onehotT, cof4, boxesT, flags, h, w, kp,
                    interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hwp, nb = basis2.shape
    gp = gtT.shape[2]
    pt_n = hwp // P_TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, pt_n),
        in_specs=[
            pl.BlockSpec((1, P_TILE, nb), lambda bb, pt, *_: (bb, pt, 0)),
            pl.BlockSpec((1, P_TILE, gp), lambda bb, pt, *_: (bb, pt, 0)),
            pl.BlockSpec((1, gp, kp), lambda bb, pt, *_: (bb, 0, 0)),
            pl.BlockSpec((1, nb, 4 * kp), lambda bb, pt, *_: (bb, 0, 0)),
            pl.BlockSpec((1, 8, kp), lambda bb, pt, *_: (bb, 0, 0)),
        ],
        # (B, 8, Kp) with row 0 live: Mosaic requires the block's trailing
        # two dims be (8, 128)-divisible
        out_specs=pl.BlockSpec((1, 8, kp), lambda bb, pt, *_: (bb, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, kp=kp, w=w, hw=h * w,
                          c_n=kp // CHUNK, t_n=pt_n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 8, kp), jnp.float32),
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(flags, basis2, gtT, onehotT, cof4, boxesT)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnames=("h", "w", "kp", "interpret"))
def _fused_bwd_call(basis2, gtT, onehotT, cof4, boxesT, flags, gpad, h, w,
                    kp, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hwp, nb = basis2.shape
    gp = gtT.shape[2]
    pt_n = hwp // P_TILE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, pt_n),
        in_specs=[
            pl.BlockSpec((1, P_TILE, nb), lambda bb, pt, *_: (bb, pt, 0)),
            pl.BlockSpec((1, P_TILE, gp), lambda bb, pt, *_: (bb, pt, 0)),
            pl.BlockSpec((1, gp, kp), lambda bb, pt, *_: (bb, 0, 0)),
            pl.BlockSpec((1, nb, 4 * kp), lambda bb, pt, *_: (bb, 0, 0)),
            pl.BlockSpec((1, 8, kp), lambda bb, pt, *_: (bb, 0, 0)),
            pl.BlockSpec((1, 1, kp), lambda bb, pt, *_: (bb, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, P_TILE, nb), lambda bb, pt, *_: (bb, pt, 0)),
            pl.BlockSpec((1, nb, 4 * kp), lambda bb, pt, *_: (bb, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((P_TILE, nb), jnp.float32)],
    )
    dbasis, dcof4 = pl.pallas_call(
        functools.partial(_bwd_kernel, kp=kp, w=w, hw=h * w,
                          c_n=kp // CHUNK, t_n=pt_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hwp, nb), jnp.float32),
            jax.ShapeDtypeStruct((b, nb, 4 * kp), jnp.float32),
        ],
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(flags, basis2, gtT, onehotT, cof4, boxesT, gpad)
    return dbasis, dcof4


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mask_bce_core(basis, cofs, boxes, gt_masks_g, gt_idx, interpret,
                   mm_dtype):
    basis2, gtT, onehotT, cof4, boxesT, flags, meta = _prep(
        basis, cofs, boxes, gt_masks_g, gt_idx, mm_dtype)
    (b, hw, hwp, nb, k, kp, gp, h, w) = meta
    out = _fused_fwd_call(basis2, gtT, onehotT, cof4, boxesT, flags, h, w,
                          kp, interpret=interpret)
    return out[:, :k]


def _core_fwd(basis, cofs, boxes, gt_masks_g, gt_idx, interpret, mm_dtype):
    return (_mask_bce_core(basis, cofs, boxes, gt_masks_g, gt_idx,
                           interpret, mm_dtype),
            (basis, cofs, boxes, gt_masks_g, gt_idx))


def _core_bwd(interpret, mm_dtype, res, g):
    basis, cofs, boxes, gt_masks_g, gt_idx = res
    basis2, gtT, onehotT, cof4, boxesT, flags, meta = _prep(
        basis, cofs, boxes, gt_masks_g, gt_idx, mm_dtype)
    (b, hw, hwp, nb, k, kp, gp, h, w) = meta
    gpad = _pad_axis(g.astype(jnp.float32), CHUNK, 1)[:, None, :]  # (B,1,Kp)
    dbasis2, dcof4 = _fused_bwd_call(basis2, gtT, onehotT, cof4, boxesT,
                                     flags, gpad, h, w, kp,
                                     interpret=interpret)
    dbasis = dbasis2[:, :hw, :].reshape(basis.shape).astype(basis.dtype)
    # chunk-major quadrant-stacked lanes -> (B, K, 4*NB)
    c_n = kp // CHUNK
    dcof = dcof4.reshape(b, nb, c_n, 4, CHUNK).transpose(
        0, 2, 4, 3, 1).reshape(b, kp, 4 * nb)[:, :k].astype(cofs.dtype)
    return dbasis, dcof, jnp.zeros_like(boxes), _zero_cot(gt_masks_g), \
        _zero_cot(gt_idx)


def _zero_cot(x):
    """Zero cotangent; integer arrays take float0 per JAX's tangent rules."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    import numpy as np
    return np.zeros(x.shape, jax.dtypes.float0)


_mask_bce_core.defvjp(_core_fwd, _core_bwd)


def mask_bce_fused_available() -> bool:
    return pallas_available()


def mask_bce_loss_fused(basis, cofs, boxes, gt_masks_g, gt_idx,
                        interpret=False, mm_dtype=jnp.bfloat16, valid=None):
    """Batched fused mask BCE.

    Args:
      basis: (B, h, w, NB) basis masks.
      cofs: (B, K, 4*NB) selected quadrant coefficients.
      boxes: (B, K, 4) xyxy in mask (stride-2) coordinates.
      gt_masks_g: (B, G, h, w) binary {0,1} gt masks.
      gt_idx: (B, K) int32 gt index per positive.
      mm_dtype: dtype the assembly/gather matmuls run in (f32 accumulate
        either way). Pass the MODEL's compute dtype: when the model runs
        bf16, basis/cofs values are already bf16-representable, so the
        bf16 cast is lossless and the kernel matches the f32 XLA fallback
        up to summation order; when the model runs f32, pass float32 so
        the fused path does not silently quantize (slower MXU passes, but
        that configuration is chosen for precision).
      valid: optional (B, K) bool. False entries are treated as degenerate
        boxes: their pre is exactly 0 and their whole chunk can be skipped
        by the kernels' y-banding. Callers that multiply pre by a
        0-for-invalid weight (the training loss) get identical results.
    Returns:
      (B, K) pixel-summed BCE per positive — same values as
      vmap(mask_bce_loss_indexed) (ops/crop_split.py) up to summation order
      (valid=None), with invalid entries zeroed when ``valid`` is given.
      Differentiable in basis and cofs; boxes/gt carry zero gradient.

    The kernels skip (pixel-tile, 128-positive-chunk) pairs whose y-bands
    do not intersect — exact, because out-of-band pixels carry inb = 0.
    To make the bands tight, positives are sorted by box y1 here
    (invalid/degenerate keys +inf, so dead lanes collect in trailing
    chunks that never activate) and the per-positive outputs/gradients are
    unsorted on the way out; sorting changes no per-k value.
    """
    boxes = jax.lax.stop_gradient(boxes)
    if valid is not None:
        boxes = jnp.where(valid[..., None], boxes, 0.0)
    real = (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])
    key = jnp.where(real, boxes[..., 1], jnp.float32(1e9))
    order = jnp.argsort(key, axis=1)                      # (B, K)
    inv = jnp.argsort(order, axis=1)
    take = lambda x, o: jnp.take_along_axis(
        x, o.reshape(o.shape + (1,) * (x.ndim - 2)), axis=1)
    pre_s = _mask_bce_core(basis, take(cofs, order), take(boxes, order),
                           jax.lax.stop_gradient(gt_masks_g),
                           take(gt_idx, order), interpret,
                           jax.dtypes.canonicalize_dtype(mm_dtype))
    return take(pre_s, inv)
