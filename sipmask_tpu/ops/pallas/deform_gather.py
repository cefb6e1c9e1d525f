"""Pallas TPU kernel for the deformable-conv bilinear gather.

XLA's TPU gather lowering is latency-bound: the per-tap bilinear sampling of
deformable convolution (reference CUDA ``deformable_im2col``,
mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu) costs ~57ms for one P3-sized
level via ``take_along_axis`` — 8x the rest of the SipMask forward pass
combined. This kernel reformulates the gather as a **banded one-hot matmul
on the MXU**:

    sampled[p, :] = sum_q S[p, q] * X[q, :]

where the selection matrix is built arithmetically from the *tent identity*
of bilinear interpolation: for a sampling position (py, px) and an integer
grid point (qy, qx),

    S[p, q] = relu(1 - |qy - py|) * relu(1 - |qx - px|)

which is exactly the bilinear corner weight (and exactly 0 for every grid
point that is not one of the 4 corners, including all out-of-bounds
corners). This needs only the raw sampling positions — no corner indices or
precomputed weights — so the kernel streams 2 floats per (tap, pixel).

The Q contraction is tiled with a data-dependent skip: the q-tiles a
P-block samples from always form a contiguous range (corner positions span
[y0*w+x0, y1*w+x1], contiguous in flattened row-major order), so each
(n, p-block, tap) carries a scalar-prefetched [lo, hi] tile range and a
tile's (tent-build + matmul) only runs inside it. For typical deformable
offsets that is 2-4 of tens of tiles, collapsing the dense one-hot cost to
a band around the diagonal while remaining EXACT for arbitrarily large
offsets.

The backward is two kernels sharing the banded tiling:
- position gradients, gridded like the forward over (n, p-block):
    d py[p] = sum_q tent'(qy-py) * tx * M[p, q],  M = g @ X^T  (MXU)
- dX, gridded transposed over (n, q-tile, p-block) so only one q-tile of
  dX is VMEM-resident (no whole-level residency -> no size cap):
    dX[q, :] += sum_p S[p, q] * g[p, :]           (S^T @ g on the MXU)

tent'(u) is the one-sided floor-based derivative (-1 on (-1,0], +1 on
(0,1]): using sign(u) with sign(0)=0 would zero ALL offset gradients at
exactly-integer sampling positions — every position at zero-offset init —
freezing the offset convs forever.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

P_BLK = 256   # measured on v5e: 256 runs the banded fwd ~1.75x faster than
              # 512 at P3-sized levels (less VMEM pressure per step)
Q_BLK = 512

# levels with q = h*w at or below this skip Pallas entirely: a dense
# (P, Q) tent one-hot einsum in plain XLA is faster than the kernel-launch
# + banding machinery at these sizes, is exact the same way, and is
# natively differentiable (measured: P4 at 544^2 1.8ms dense vs 3.3ms
# Pallas; P5-P7 together ~1.4ms dense vs ~3ms)
import os
# Fwd/bwd thresholds differ (round-5 re-sweep on the loop-based kernels):
# the dense FORWARD einsum fuses and beats the kernels up to mid-sized
# levels (RT infer 23.7 ms dense-P4 vs 24.5 Pallas-P4), but the dense
# BACKWARD materializes (N,K,P,Q) tent/product tensors and loses badly
# (hi-acc train 137.2 -> 135.5 ms moving P5's bwd off dense; RT train
# 46.6 -> 39.7 moving P4's). Levels in (DENSE_BWD_MAX_Q, DENSE_MAX_Q]
# run dense fwd + banded Pallas bwd via _sample_dense_pbwd.
DENSE_MAX_Q = int(os.environ.get("SIPMASK_DENSE_MAX_Q", "1536"))
DENSE_BWD_MAX_Q = int(os.environ.get("SIPMASK_DENSE_BWD_MAX_Q", "300"))


def _compiler_params():
    """Raise this kernel family's scoped-VMEM budget: at large levels XLA
    stack-allocates the (N, Ppad, 2K) dpyx output in VMEM (~20MB at
    800x1344 bs4), exceeding the 16MB v5e default and failing compilation.
    The kernels' real block residency stays a few MB."""
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def sample_ref(x_rows, pyx, h, w):
    """XLA reference: bilinear sample of flattened rows at positions pyx.

    x_rows: (N, Q=h*w, Cg); pyx: (N, K, P, 2) float (py, px); returns
    (N, P, K, Cg) — p-major, so the caller's tap contraction consumes the
    kernel output without a relayout (the (N, K, P, Cg) form cost ~10 ms of
    transpose copies per hi-acc train step).
    Out-of-bounds corners contribute 0 (CUDA ``deformable_im2col_bilinear``
    semantics). Differentiable in x_rows and pyx; used for the CPU fallback,
    parity tests, and gradient cross-checks.
    """
    py, px = pyx[..., 0], pyx[..., 1]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0 + dy
            xx = x0 + dx
            wgt = ((py - y0 if dy else 1.0 - (py - y0)) *
                   (px - x0 if dx else 1.0 - (px - x0)))
            inb = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
            qi = (jnp.clip(yy, 0, h - 1) * w +
                  jnp.clip(xx, 0, w - 1)).astype(jnp.int32)

            def per_n(xr, qi_n):
                return jnp.take(xr, qi_n.reshape(-1), axis=0).reshape(
                    qi_n.shape + (xr.shape[-1],))

            g = jax.vmap(per_n)(x_rows, qi)
            out = out + g * (wgt * inb).astype(x_rows.dtype)[..., None]
    return out.transpose(0, 2, 1, 3)


def _tile_ranges(pyxp, h, w, n, k, pb, q_blk):
    """Contiguous [lo, hi] q-tile range per (n, p-block, tap), interleaved
    into a flat (N*PB*K*2,) int32 array for scalar-prefetch.

    Padded positions (marked -2 by _prep) are excluded from the min/max:
    clipping them to corner (0, 0) would stretch the final p-block's range
    to [tile 0, last tile] — at 800x1344 that made the tail block dense
    (33 tiles) instead of ~3. A fully-padded block gets lo > hi and the
    kernel's tile loop never fires (its acc stays zero, which is correct).
    """
    py, px = pyxp[..., 0], pyxp[..., 1]
    real = py > -1.5                                       # -2 marks padding
    y0 = jnp.clip(jnp.floor(py), 0, h - 1)
    x0 = jnp.clip(jnp.floor(px), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    q_lo = (y0 * w + x0).astype(jnp.int32)
    q_hi = (y1 * w + x1).astype(jnp.int32)
    big = jnp.int32(2 ** 30)
    t_lo = jnp.where(real, q_lo // q_blk, big
                     ).reshape(n, k, pb, -1).min(-1)       # (N, K, PB)
    t_hi = jnp.where(real, q_hi // q_blk, -1
                     ).reshape(n, k, pb, -1).max(-1)
    rng = jnp.stack([t_lo, t_hi], -1)                      # (N, K, PB, 2)
    return rng.transpose(0, 2, 1, 3).reshape(-1)


def _tent(u):
    return jnp.maximum(0.0, 1.0 - jnp.abs(u))


def _dtent(u):
    """One-sided floor-based derivative of tent(q - p) w.r.t. p."""
    inside = (u > -1.0) & (u <= 1.0)
    return jnp.where(inside, jnp.where(u > 0.0, 1.0, -1.0), 0.0)


def _grid_coords(q0, q_blk, w):
    # q0 may be a traced scalar (dx kernel indexes tiles by program_id)
    j = (jax.lax.broadcasted_iota(jnp.int32, (1, q_blk), 1) +
         q0).astype(jnp.float32)
    # +0.5: exact floor-divide under f32 reciprocal multiply for every
    # width (the bare product is off by one at exact multiples of some
    # widths >= 328 — see mask_loss._pixel_coords)
    qy = jnp.floor((j + 0.5) * (1.0 / w))
    qx = j - qy * w
    return qy, qx


def _pack_pyx(pyxp, n, ppad, k):
    """(N, K, Ppad, 2) -> (N, Ppad, 2K): the tiny trailing dim must never
    pad the 128-lane axis."""
    return pyxp.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(
        n, ppad, 2 * k)


def _pack_pyx_t(pyxp, n, ppad, k):
    """(N, K, Ppad, 2) -> (N, 2K, Ppad): positions as LANE vectors for the
    transposed kernels (pixels live in lanes there)."""
    return pyxp.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(
        n, 2 * k, ppad)


def _prep(x_rows, pyx, g=None):
    n, q, cg = x_rows.shape
    _, k, p, _ = pyx.shape
    qpad = -(-q // Q_BLK) * Q_BLK
    ppad = -(-p // P_BLK) * P_BLK
    xp = _pad_to(x_rows, qpad, 1)
    pyxp = _pad_to(pyx, ppad, 2)
    if ppad != p:
        # padded positions at -2 -> every tent weight is exactly 0
        mask = (jnp.arange(ppad) < p)[None, None, :, None]
        pyxp = jnp.where(mask, pyxp, -2.0)
    # g (the out-cotangent) is p-major (N, P, K, Cg): flatten the tap/channel
    # dims (the kernels read per-tap lane slices) and pad the p axis
    gp = (_pad_to(g.reshape(n, p, k * cg), ppad, 1)
          if g is not None else None)
    return xp, pyxp, gp, (n, q, cg, k, p, qpad, ppad)


# --------------------------------------- forward (separable row-window)

# Use the separable kernel only while the whole (row-padded) level fits
# VMEM comfortably; bigger levels take the banded kernel.
XWIN_MAX_BYTES = 8 * 1024 * 1024


def _row_ranges(pyxp, h, n, k, pb):
    """Scalar-prefetch arrays for the separable kernel: per (n, p-block)
    the min corner row (ws) and max corner row (rhi) over ALL taps and
    positions. Padded positions (-2) are excluded the same way as
    _tile_ranges; a fully-padded block gets ws > rhi and the row loop
    never fires."""
    py = pyxp[..., 0]
    real = py > -1.5
    r_lo = jnp.clip(jnp.floor(py), 0, h - 1).astype(jnp.int32)
    r_hi = jnp.clip(jnp.floor(py) + 1, 0, h - 1).astype(jnp.int32)
    big = jnp.int32(2 ** 30)
    lo_bt = jnp.where(real, r_lo, big).reshape(n, k, pb, -1).min(-1)
    hi_bt = jnp.where(real, r_hi, -1).reshape(n, k, pb, -1).max(-1)
    ws = lo_bt.min(1)                                     # (N, PB)
    rhi = hi_bt.max(1)                                    # (N, PB)
    return ws.reshape(-1), rhi.reshape(-1)


def _fwd_sep_kernel(scal_ref, pyx_ref, x_ref, out_ref, sx_ref, pys_ref,
                    acc_ref, *, k_n, pb_n, wpad):
    """Separable forward: one pixel-block per grid step, one dynamic
    fori_loop over the block's ACTUAL corner-row span [ws, rhi].

    The bilinear tent factorizes as tent_y * tent_x. The column tents
    depend only on px and the (identical for every row) column iota, so
    Sx (k*P_BLK, wpad) is built ONCE per block; per row the work is one
    MXU dot (k*P_BLK, wpad) @ (wpad, cg), one vectorized row-tent over the
    pre-stacked py, and one FMA. That cuts the per-MAC VPU tent cost ~4x
    vs the banded kernel (whose tent matrices recompute qy/qx per tile
    element), and the dynamic row range processes no wasted rows — the
    earlier static-window + residual variant paid for margin rows at
    every block. Exact for arbitrary offsets; no residual pass needed."""
    import jax.experimental.pallas as pl

    bn, bp = pl.program_id(0), pl.program_id(1)
    npb = pl.num_programs(0) * pb_n
    ws = scal_ref[bn * pb_n + bp]
    rhi = scal_ref[npb + bn * pb_n + bp]
    qx = jax.lax.broadcasted_iota(jnp.int32, (1, wpad), 1
                                  ).astype(jnp.float32)
    p_blk = pyx_ref.shape[1]

    for t in range(k_n):
        py = pyx_ref[0, :, 2 * t:2 * t + 1]
        px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
        sx_ref[t * p_blk:(t + 1) * p_blk, :] = _tent(qx - px).astype(
            sx_ref.dtype)
        pys_ref[t * p_blk:(t + 1) * p_blk, :] = py

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(r, carry):
        row = x_ref[0, pl.ds(r * wpad, wpad), :]          # (wpad, cg)
        m = jnp.dot(sx_ref[...], row, preferred_element_type=jnp.float32)
        ty = _tent(r.astype(jnp.float32) - pys_ref[...])  # (k*P_BLK, 1)
        acc_ref[...] += ty * m
        return carry

    jax.lax.fori_loop(ws, rhi + 1, body, 0)

    cg = acc_ref.shape[-1]
    for t in range(k_n):
        out_ref[0, :, t * cg:(t + 1) * cg] = acc_ref[
            t * p_blk:(t + 1) * p_blk, :].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _sample_pallas_sep(x_rows, pyx, h, w, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, q, cg = x_rows.shape
    _, k, p, _ = pyx.shape
    # 16-row-multiple padding: bf16 VMEM tiles pack 2 sublanes, so dynamic
    # sublane slice starts must be multiples of 16 to stay aligned.
    wpad = -(-w // 16) * 16
    ppad = -(-p // P_BLK) * P_BLK
    pb = ppad // P_BLK

    # row-pad x so every row slice starts 16-sublane-aligned for any w;
    # padded columns are zero so any tent weight they carry contributes 0
    # (same rule as out-of-bounds corners).
    xw = x_rows.reshape(n, h, w, cg)
    if wpad != w:
        xw = jnp.pad(xw, ((0, 0), (0, 0), (0, wpad - w), (0, 0)))
    xw = xw.reshape(n, h * wpad, cg)

    pyxp = _pad_to(pyx, ppad, 2)
    if ppad != p:
        mask = (jnp.arange(ppad) < p)[None, None, :, None]
        pyxp = jnp.where(mask, pyxp, -2.0)
    ws, rhi = _row_ranges(pyxp.astype(jnp.float32), h, n, k, pb)
    scal = jnp.concatenate([ws, rhi]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, pb),
        in_specs=[
            pl.BlockSpec((1, P_BLK, 2 * k), lambda bn, bp, *_: (bn, bp, 0)),
            pl.BlockSpec((1, h * wpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P_BLK, k * cg),
                               lambda bn, bp, *_: (bn, bp, 0)),
        scratch_shapes=[
            pltpu.VMEM((k * P_BLK, wpad), x_rows.dtype),
            pltpu.VMEM((k * P_BLK, 1), jnp.float32),
            pltpu.VMEM((k * P_BLK, cg), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_sep_kernel, k_n=k, pb_n=pb, wpad=wpad),
        out_shape=jax.ShapeDtypeStruct((n, ppad, k * cg), x_rows.dtype),
        grid_spec=grid_spec,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(scal, _pack_pyx(pyxp, n, ppad, k), xw)
    return out[:, :p, :].reshape(n, p, k, cg)


def _sep_eligible(h, w, cg, xbytes, k):
    wpad = -(-w // 16) * 16
    return (h * wpad * cg * xbytes <= XWIN_MAX_BYTES and
            k * P_BLK * wpad * xbytes <= XWIN_MAX_BYTES)


# --------------------------------------------------------------- forward

def _fwd_kernel(rng_ref, pyx_ref, x_ref, out_ref, acc_ref, *,
                qt_n, k_n, pb_n, w):
    """Per (n, p-block): for each tap, a fori_loop over the ACTIVE q-tile
    range only. A dynamic-trip loop (not an unrolled chain of pl.when
    regions): at 800x1344 qt_n=33 unrolled regions x 9 taps made the
    kernel instruction-bound — the same work ran 3.2x faster (66 -> 21ms)
    as one loop body with a pl.ds slice."""
    import jax.experimental.pallas as pl

    del qt_n
    bn, bp = pl.program_id(0), pl.program_id(1)
    for t in range(k_n):
        py = pyx_ref[0, :, 2 * t:2 * t + 1]      # (P_BLK, 1) f32
        px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
        base = ((bn * pb_n + bp) * k_n + t) * 2
        lo, hi = rng_ref[base], rng_ref[base + 1]
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(qt, carry):
            q0 = qt * Q_BLK
            qy, qx = _grid_coords(q0, Q_BLK, w)
            s = (_tent(qy - py) * _tent(qx - px)).astype(x_ref.dtype)
            acc_ref[...] += jnp.dot(s, x_ref[0, pl.ds(q0, Q_BLK), :],
                                    preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(lo, hi + 1, body, 0)
        cg = acc_ref.shape[-1]
        out_ref[0, :, t * cg:(t + 1) * cg] = acc_ref[...].astype(
            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _sample_pallas(x_rows, pyx, h, w, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp, pyxp, _, (n, q, cg, k, p, qpad, ppad) = _prep(x_rows, pyx)
    pb, qt_n = ppad // P_BLK, qpad // Q_BLK
    ranges = _tile_ranges(pyxp, h, w, n, k, pb, Q_BLK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, pb),
        in_specs=[
            pl.BlockSpec((1, P_BLK, 2 * k), lambda bn, bp, *_: (bn, bp, 0)),
            pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, P_BLK, k * cg),
                               lambda bn, bp, *_: (bn, bp, 0)),
        scratch_shapes=[pltpu.VMEM((P_BLK, cg), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, qt_n=qt_n, k_n=k, pb_n=pb, w=w),
        out_shape=jax.ShapeDtypeStruct((n, ppad, k * cg), x_rows.dtype),
        grid_spec=grid_spec,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(ranges, _pack_pyx(pyxp, n, ppad, k), xp)
    return out[:, :p, :].reshape(n, p, k, cg)


# --------------------------- transposed (kc-major) forward kernel family
#
# The tap-contraction einsum and its weight gradient both want the sampled
# tensor with p MINOR: the r4 profile shows XLA relayouting the p-major
# kernel output to a p-minor layout on both sides of the custom call
# (~2.3 ms/step of pure copies at hi-acc, plus the same flip in inference).
# These kernels emit (N, K*Cg, Ppad) directly — pixels in lanes — so the
# XLA consumers get their preferred layout for free, and every in-kernel
# dot runs in an MXU-native form (A@B or A^T@B contracting sublanes) with
# full 128-lane output width: the p-major sep kernel's row dot had
# N = cg = 64 (half the MXU), the transposed one has N = k*P_BLK.


def _fwd_sep_t_kernel(scal_ref, pyxT_ref, x_ref, out_ref, sx_ref, pys_ref,
                      acc_ref, *, k_n, pb_n, wpad):
    """Transposed separable forward: identical banding/row loop to
    _fwd_sep_kernel, but pixels live in lanes. Per row the dot is
    (wpad, cg)^T-contract-(wpad, k*P_BLK) -> (cg, k*P_BLK): K=wpad,
    N=k*P_BLK — both MXU-saturating (the p-major form had N=cg=64)."""
    import jax.experimental.pallas as pl

    bn, bp = pl.program_id(0), pl.program_id(1)
    npb = pl.num_programs(0) * pb_n
    ws = scal_ref[bn * pb_n + bp]
    rhi = scal_ref[npb + bn * pb_n + bp]
    qx = jax.lax.broadcasted_iota(jnp.int32, (wpad, 1), 0
                                  ).astype(jnp.float32)   # column iota
    p_blk = pyxT_ref.shape[2]

    for t in range(k_n):
        py = pyxT_ref[0, 2 * t:2 * t + 1, :]              # (1, P_BLK)
        px = pyxT_ref[0, 2 * t + 1:2 * t + 2, :]
        sx_ref[:, t * p_blk:(t + 1) * p_blk] = _tent(qx - px).astype(
            sx_ref.dtype)
        pys_ref[0:1, t * p_blk:(t + 1) * p_blk] = py

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(r, carry):
        row = x_ref[0, pl.ds(r * wpad, wpad), :]          # (wpad, cg)
        m = jax.lax.dot_general(row, sx_ref[...], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ty = _tent(r.astype(jnp.float32) - pys_ref[0:1, :])  # (1, k*P_BLK)
        acc_ref[...] += ty * m
        return carry

    jax.lax.fori_loop(ws, rhi + 1, body, 0)

    cg = acc_ref.shape[0]
    for t in range(k_n):
        out_ref[0, t * cg:(t + 1) * cg, :] = acc_ref[
            :, t * p_blk:(t + 1) * p_blk].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _sample_pallas_sep_t(x_rows, pyx, h, w, interpret=False):
    """Separable forward emitting (N, K*Cg, Ppad) — see the section note."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, q, cg = x_rows.shape
    _, k, p, _ = pyx.shape
    wpad = -(-w // 16) * 16
    ppad = -(-p // P_BLK) * P_BLK
    pb = ppad // P_BLK

    xw = x_rows.reshape(n, h, w, cg)
    if wpad != w:
        xw = jnp.pad(xw, ((0, 0), (0, 0), (0, wpad - w), (0, 0)))
    xw = xw.reshape(n, h * wpad, cg)

    pyxp = _pad_to(pyx, ppad, 2)
    if ppad != p:
        mask = (jnp.arange(ppad) < p)[None, None, :, None]
        pyxp = jnp.where(mask, pyxp, -2.0)
    ws, rhi = _row_ranges(pyxp.astype(jnp.float32), h, n, k, pb)
    scal = jnp.concatenate([ws, rhi]).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, pb),
        in_specs=[
            pl.BlockSpec((1, 2 * k, P_BLK), lambda bn, bp, *_: (bn, 0, bp)),
            pl.BlockSpec((1, h * wpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k * cg, P_BLK),
                               lambda bn, bp, *_: (bn, 0, bp)),
        scratch_shapes=[
            pltpu.VMEM((wpad, k * P_BLK), x_rows.dtype),
            pltpu.VMEM((1, k * P_BLK), jnp.float32),
            pltpu.VMEM((cg, k * P_BLK), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_sep_t_kernel, k_n=k, pb_n=pb, wpad=wpad),
        out_shape=jax.ShapeDtypeStruct((n, k * cg, ppad), x_rows.dtype),
        grid_spec=grid_spec,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(scal, _pack_pyx_t(pyxp, n, ppad, k), xw)
    return out


def _fwd_t_kernel(rng_ref, pyxT_ref, x_ref, out_ref, acc_ref, *,
                  k_n, pb_n, w):
    """Transposed banded forward: per (tap, active q-tile) the dot is
    (Q_BLK, cg)^T-contract-(Q_BLK, P_BLK) -> (cg, P_BLK)."""
    import jax.experimental.pallas as pl

    bn, bp = pl.program_id(0), pl.program_id(1)
    cg = acc_ref.shape[0]
    for t in range(k_n):
        py = pyxT_ref[0, 2 * t:2 * t + 1, :]              # (1, P_BLK)
        px = pyxT_ref[0, 2 * t + 1:2 * t + 2, :]
        base = ((bn * pb_n + bp) * k_n + t) * 2
        lo, hi = rng_ref[base], rng_ref[base + 1]
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def body(qt, carry, py=py, px=px):
            q0 = qt * Q_BLK
            j = (jax.lax.broadcasted_iota(jnp.int32, (Q_BLK, 1), 0) +
                 q0).astype(jnp.float32)
            qy = jnp.floor((j + 0.5) * (1.0 / w))         # column coords
            qx = j - qy * w
            s = (_tent(qy - py) * _tent(qx - px)).astype(x_ref.dtype)
            acc_ref[...] += jax.lax.dot_general(
                x_ref[0, pl.ds(q0, Q_BLK), :], s, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return carry

        jax.lax.fori_loop(lo, hi + 1, body, 0)
        out_ref[0, t * cg:(t + 1) * cg, :] = acc_ref[...].astype(
            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _sample_pallas_t(x_rows, pyx, h, w, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp, pyxp, _, (n, q, cg, k, p, qpad, ppad) = _prep(x_rows, pyx)
    pb = ppad // P_BLK
    ranges = _tile_ranges(pyxp, h, w, n, k, pb, Q_BLK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, pb),
        in_specs=[
            pl.BlockSpec((1, 2 * k, P_BLK), lambda bn, bp, *_: (bn, 0, bp)),
            pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k * cg, P_BLK),
                               lambda bn, bp, *_: (bn, 0, bp)),
        scratch_shapes=[pltpu.VMEM((cg, P_BLK), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fwd_t_kernel, k_n=k, pb_n=pb, w=w),
        out_shape=jax.ShapeDtypeStruct((n, k * cg, ppad), x_rows.dtype),
        grid_spec=grid_spec,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(ranges, _pack_pyx_t(pyxp, n, ppad, k), xp)
    return out


def sample_dense_t(x_rows, pyx, h, w):
    """Dense tent einsum emitting (N, K*Cg, P) — the mid/small-level
    forward for the kc-major pipeline (same math as sample_dense)."""
    n, q, cg = x_rows.shape
    _, k, p, _ = pyx.shape
    j = jnp.arange(h * w, dtype=jnp.float32)
    qy = jnp.floor((j + 0.5) * (1.0 / w))
    qx = j - qy * w
    py, px = pyx[..., 0], pyx[..., 1]                     # (N, K, P)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(qy[None, None, None, :] - py[..., None]))
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(qx[None, None, None, :] - px[..., None]))
    s = (ty * tx).astype(x_rows.dtype)                    # (N, K, P, Q)
    out = jnp.einsum("nkpq,nqc->nkcp", s, x_rows,
                     preferred_element_type=jnp.float32).astype(x_rows.dtype)
    return out.reshape(n, k * cg, p)


def sample_bilinear_rows_t(x_rows, pyx, h, w, interpret=False):
    """Deformable bilinear sampling, kc-major output (N, K*Cg, Ppad).

    Same dispatch tiers as sample_bilinear_rows; used by the fused
    deform-conv custom-VJP path (ops/deform_conv.py) whose consumers want
    p minor. NOTE: the Ppad axis keeps its P_BLK padding (callers slice)."""
    n, q, cg = x_rows.shape
    _, k, p, _ = pyx.shape
    ppad = -(-p // P_BLK) * P_BLK
    if h * w <= DENSE_MAX_Q:
        return _pad_to(sample_dense_t(x_rows, pyx, h, w), ppad, 2)
    if _sep_eligible(h, w, cg, x_rows.dtype.itemsize, k):
        return _sample_pallas_sep_t(x_rows, pyx, h, w, interpret=interpret)
    return _sample_pallas_t(x_rows, pyx, h, w, interpret=interpret)


# -------------------------------------------------------------- backward

def _bwd_dpyx_kernel(rng_ref, pyx_ref, x_ref, g_ref, dpyx_ref, *,
                     qt_n, k_n, pb_n, w):
    """Position gradients; same dynamic-trip banded loop as the forward."""
    import jax.experimental.pallas as pl

    del qt_n
    bn, bp = pl.program_id(0), pl.program_id(1)
    cg = x_ref.shape[-1]
    for t in range(k_n):
        py = pyx_ref[0, :, 2 * t:2 * t + 1]
        px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
        g = g_ref[0, :, t * cg:(t + 1) * cg]     # (P_BLK, Cg)
        base = ((bn * pb_n + bp) * k_n + t) * 2
        lo, hi = rng_ref[base], rng_ref[base + 1]

        def body(qt, carry, py=py, px=px, g=g):
            dy, dx = carry
            q0 = qt * Q_BLK
            qy, qx = _grid_coords(q0, Q_BLK, w)
            uy, ux = qy - py, qx - px
            m = jnp.dot(g, x_ref[0, pl.ds(q0, Q_BLK), :].T,
                        preferred_element_type=jnp.float32)
            dy = dy + (_dtent(uy) * _tent(ux) * m).sum(1, keepdims=True)
            dx = dx + (_tent(uy) * _dtent(ux) * m).sum(1, keepdims=True)
            return dy, dx

        zero = jnp.zeros((py.shape[0], 1), jnp.float32)
        dy, dx = jax.lax.fori_loop(lo, hi + 1, body, (zero, zero))
        dpyx_ref[0, :, 2 * t:2 * t + 1] = dy
        dpyx_ref[0, :, 2 * t + 1:2 * t + 2] = dx


# VMEM budget for the resident-dX block (f32): one P3 level at 800x1344
# with cg=64 is 4.3MB; the backbone DCN stages (cg=128) reach ~8.6MB. The
# pipeline needs headroom for the g block + pyx + double buffering.
DX_RESIDENT_MAX_BYTES = 10 * 1024 * 1024


def _bwd_fused_kernel(rng_ref, pyx_ref, x_ref, g_ref, dpyx_ref, dx_ref, *,
                      k_n, pb_n, w):
    """Fused backward: dpyx and level-resident dX in ONE banded pass.

    Both gradients iterate exactly the same active q-tiles per (p-block,
    tap); fusing them builds each tile's tent factors once and reads each
    x tile once instead of twice. Used whenever the resident-dX block fits
    the VMEM budget (the common case); otherwise the two split kernels run.
    """
    import jax.experimental.pallas as pl

    bn, bp = pl.program_id(0), pl.program_id(1)

    @pl.when(bp == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    cg = x_ref.shape[-1]
    for t in range(k_n):
        py = pyx_ref[0, :, 2 * t:2 * t + 1]
        px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
        g = g_ref[0, :, t * cg:(t + 1) * cg]     # (P_BLK, Cg)
        base = ((bn * pb_n + bp) * k_n + t) * 2
        lo, hi = rng_ref[base], rng_ref[base + 1]

        def body(qt, carry, py=py, px=px, g=g):
            dy, dx = carry
            q0 = qt * Q_BLK
            qy, qx = _grid_coords(q0, Q_BLK, w)
            uy, ux = qy - py, qx - px
            ty, tx = _tent(uy), _tent(ux)
            s = (ty * tx).astype(g.dtype)
            dx_ref[0, pl.ds(q0, Q_BLK), :] += jnp.dot(
                s.T, g, preferred_element_type=jnp.float32
            ).astype(dx_ref.dtype)
            m = jnp.dot(g, x_ref[0, pl.ds(q0, Q_BLK), :].T,
                        preferred_element_type=jnp.float32)
            dy = dy + (_dtent(uy) * tx * m).sum(1, keepdims=True)
            dx = dx + (ty * _dtent(ux) * m).sum(1, keepdims=True)
            return dy, dx

        zero = jnp.zeros((py.shape[0], 1), jnp.float32)
        dy, dx = jax.lax.fori_loop(lo, hi + 1, body, (zero, zero))
        dpyx_ref[0, :, 2 * t:2 * t + 1] = dy
        dpyx_ref[0, :, 2 * t + 1:2 * t + 2] = dx


def _bwd_dx_kernel(rng_ref, pyx_ref, g_ref, dx_ref, *, k_n, pb_n, w):
    """Transposed accumulation: grid (n, q-tile, p-block); the dx block for
    the current q-tile revisits across p-blocks (sequential grid), so only
    one q-tile of dX is ever VMEM-resident."""
    import jax.experimental.pallas as pl

    bn, bq, bp = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(bp == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    for t in range(k_n):
        base = ((bn * pb_n + bp) * k_n + t) * 2
        lo, hi = rng_ref[base], rng_ref[base + 1]

        @pl.when((bq >= lo) & (bq <= hi))
        def _(t=t):
            py = pyx_ref[0, :, 2 * t:2 * t + 1]
            px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
            qy, qx = _grid_coords(bq * Q_BLK, Q_BLK, w)
            cg = dx_ref.shape[-1]
            s = (_tent(qy - py) * _tent(qx - px)).astype(g_ref.dtype)
            dx_ref[0] += jnp.dot(
                s.T, g_ref[0, :, t * cg:(t + 1) * cg],
                preferred_element_type=jnp.float32).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _sample_pallas_bwd(x_rows, pyx, g, h, w, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp, pyxp, gp, (n, q, cg, k, p, qpad, ppad) = _prep(x_rows, pyx, g)
    pb, qt_n = ppad // P_BLK, qpad // Q_BLK
    ranges = _tile_ranges(pyxp, h, w, n, k, pb, Q_BLK)
    pyx_packed = _pack_pyx(pyxp, n, ppad, k)
    gp = gp.astype(x_rows.dtype)

    if qpad * cg * 4 <= DX_RESIDENT_MAX_BYTES:
        fused_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, pb),
            in_specs=[
                pl.BlockSpec((1, P_BLK, 2 * k),
                             lambda bn, bp, *_: (bn, bp, 0)),
                pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
                pl.BlockSpec((1, P_BLK, k * cg),
                             lambda bn, bp, *_: (bn, bp, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, P_BLK, 2 * k),
                             lambda bn, bp, *_: (bn, bp, 0)),
                pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
            ],
        )
        dpyx, dx = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, k_n=k, pb_n=pb, w=w),
            out_shape=[jax.ShapeDtypeStruct((n, ppad, 2 * k), jnp.float32),
                       jax.ShapeDtypeStruct((n, qpad, cg), jnp.float32)],
            grid_spec=fused_spec,
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(ranges, pyx_packed, xp, gp)
        dpyx = dpyx.reshape(n, ppad, k, 2).transpose(0, 2, 1, 3)
    else:
        dpyx_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, pb),
            in_specs=[
                pl.BlockSpec((1, P_BLK, 2 * k),
                             lambda bn, bp, *_: (bn, bp, 0)),
                pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
                pl.BlockSpec((1, P_BLK, k * cg),
                             lambda bn, bp, *_: (bn, bp, 0)),
            ],
            out_specs=pl.BlockSpec((1, P_BLK, 2 * k),
                                   lambda bn, bp, *_: (bn, bp, 0)),
        )
        dpyx = pl.pallas_call(
            functools.partial(_bwd_dpyx_kernel, qt_n=qt_n, k_n=k, pb_n=pb,
                              w=w),
            out_shape=jax.ShapeDtypeStruct((n, ppad, 2 * k), jnp.float32),
            grid_spec=dpyx_spec,
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(ranges, pyx_packed, xp, gp)
        dpyx = dpyx.reshape(n, ppad, k, 2).transpose(0, 2, 1, 3)
        dx_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, qt_n, pb),
            in_specs=[
                pl.BlockSpec((1, P_BLK, 2 * k),
                             lambda bn, bq, bp, *_: (bn, bp, 0)),
                pl.BlockSpec((1, P_BLK, k * cg),
                             lambda bn, bq, bp, *_: (bn, bp, 0)),
            ],
            out_specs=pl.BlockSpec((1, Q_BLK, cg),
                                   lambda bn, bq, bp, *_: (bn, bq, 0)),
        )
        dx = pl.pallas_call(
            functools.partial(_bwd_dx_kernel, k_n=k, pb_n=pb, w=w),
            out_shape=jax.ShapeDtypeStruct((n, qpad, cg), jnp.float32),
            grid_spec=dx_spec,
            compiler_params=None if interpret else _compiler_params(),
            interpret=interpret,
        )(ranges, pyx_packed, gp)
    return dx[:, :q, :].astype(x_rows.dtype), dpyx[:, :, :p, :]


# ------------------------- fused deform-conv backward (kc-major pipeline)

def _bwd_conv_kernel(rng_ref, pyx_ref, xT_ref, sampT_ref, dy_ref, wT_ref,
                     dpyx_ref, dx_ref, dw_ref, *, k_n, pb_n, b_n, w):
    """One banded pass computing ALL deform-conv gradients per (n, p-block):

        dsamp = dy_blk @ W_g^T            (never materialized in HBM)
        dW_g += sampT_blk @ dy_blk        (tap-contraction weight grad)
        dX   += s^T @ dsamp_t             (level-resident, as before)
        dpyx  = tent' reductions on m = dsamp_t @ xT_tile

    vs the previous split (XLA einsums for dsampled/dW + a Pallas dX/dpyx
    pass), this removes the (N, Ppad, K*Cg) dsampled HBM round-trip, the
    separate sampled read of the dW einsum, and every layout copy at the
    custom-call boundary (the saved sampled tensor is already kc-major,
    which is the layout the weight-grad contraction wants). Every dot is
    MXU-native: dsamp/dW/m are A@B, dX is A^T@B contracting sublanes.

    Grid (N = G*B + b with g OUTER, p-block): dW blocks revisit
    consecutively across all (b, pb) of one g, dy re-streams per g.
    """
    import jax.experimental.pallas as pl

    bn, bp = pl.program_id(0), pl.program_id(1)

    @pl.when(bp == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    @pl.when((bn % b_n == 0) & (bp == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    cg = xT_ref.shape[1]
    dy_blk = dy_ref[0]                                    # (P_BLK, O)
    dw_ref[0] += jax.lax.dot_general(
        sampT_ref[0], dy_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw_ref.dtype)
    dsamp = jax.lax.dot_general(
        dy_blk, wT_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(xT_ref.dtype)

    for t in range(k_n):
        py = pyx_ref[0, :, 2 * t:2 * t + 1]               # (P_BLK, 1)
        px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
        g = dsamp[:, t * cg:(t + 1) * cg]                 # (P_BLK, Cg)
        base = ((bn * pb_n + bp) * k_n + t) * 2
        lo, hi = rng_ref[base], rng_ref[base + 1]

        def body(qt, carry, py=py, px=px, g=g):
            dy, dx = carry
            q0 = qt * Q_BLK
            qy, qx = _grid_coords(q0, Q_BLK, w)
            uy, ux = qy - py, qx - px
            ty, tx = _tent(uy), _tent(ux)
            s = (ty * tx).astype(g.dtype)
            dx_ref[0, pl.ds(q0, Q_BLK), :] += jax.lax.dot_general(
                s, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dx_ref.dtype)
            m = jax.lax.dot_general(
                g, xT_ref[0, :, pl.ds(q0, Q_BLK)], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (P_BLK, Q_BLK)
            dy = dy + (_dtent(uy) * tx * m).sum(1, keepdims=True)
            dx = dx + (ty * _dtent(ux) * m).sum(1, keepdims=True)
            return dy, dx

        zero = jnp.zeros((py.shape[0], 1), jnp.float32)
        dyv, dxv = jax.lax.fori_loop(lo, hi + 1, body, (zero, zero))
        dpyx_ref[0, :, 2 * t:2 * t + 1] = dyv
        dpyx_ref[0, :, 2 * t + 1:2 * t + 2] = dxv


@functools.partial(jax.jit, static_argnames=("h", "w", "b_n", "interpret"))
def _deform_bwd_pallas(x_rows, pyx, sampT, dy, wT, h, w, b_n,
                       interpret=False):
    """Fused deform-conv backward dispatch.

    Args: x_rows (N, Q, Cg) g-major N = G*B + b; pyx (N, K, P, 2);
    sampT (N, K*Cg, Ppad) — the forward kernel's saved output; dy
    (B, P, O) out-cotangent; wT (G, O, K*Cg).
    Returns dx (N, Q, Cg), dpyx (N, K, P, 2), dw (G, K*Cg, O) f32.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp, pyxp, _, (n, q, cg, k, p, qpad, ppad) = _prep(x_rows, pyx)
    pb = ppad // P_BLK
    ranges = _tile_ranges(pyxp, h, w, n, k, pb, Q_BLK)
    pyx_packed = _pack_pyx(pyxp, n, ppad, k)
    xT = xp.transpose(0, 2, 1)                            # (N, Cg, Qpad)
    dyp = _pad_to(dy, ppad, 1).astype(x_rows.dtype)       # (B, Ppad, O)
    o = dy.shape[-1]
    g_n = n // b_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, pb),
        in_specs=[
            pl.BlockSpec((1, P_BLK, 2 * k), lambda bn, bp, *_: (bn, bp, 0)),
            pl.BlockSpec((1, cg, qpad), lambda bn, bp, *_: (bn, 0, 0)),
            pl.BlockSpec((1, k * cg, P_BLK),
                         lambda bn, bp, *_: (bn, 0, bp)),
            pl.BlockSpec((1, P_BLK, o),
                         lambda bn, bp, *_: (bn % b_n, bp, 0)),
            pl.BlockSpec((1, o, k * cg),
                         lambda bn, bp, *_: (bn // b_n, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, P_BLK, 2 * k), lambda bn, bp, *_: (bn, bp, 0)),
            pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
            pl.BlockSpec((1, k * cg, o),
                         lambda bn, bp, *_: (bn // b_n, 0, 0)),
        ],
    )
    dpyx, dx, dw = pl.pallas_call(
        functools.partial(_bwd_conv_kernel, k_n=k, pb_n=pb, b_n=b_n, w=w),
        out_shape=[
            jax.ShapeDtypeStruct((n, ppad, 2 * k), jnp.float32),
            jax.ShapeDtypeStruct((n, qpad, cg), jnp.float32),
            jax.ShapeDtypeStruct((g_n, k * cg, o), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=None if interpret else _compiler_params(),
        interpret=interpret,
    )(ranges, pyx_packed, xT, sampT.astype(x_rows.dtype), dyp, wT)
    dpyx = dpyx.reshape(n, ppad, k, 2).transpose(0, 2, 1, 3)
    return (dx[:, :q, :].astype(x_rows.dtype), dpyx[:, :, :p, :], dw)


def sample_dense(x_rows, pyx, h, w):
    """Small-level path: the full (P, Q) tent matrix as a plain XLA einsum.

    Same tent identity as the kernel, no banding — at q <= DENSE_MAX_Q the
    dense matmul is cheaper than any bookkeeping and XLA fuses it into the
    surrounding graph. Differentiable natively (tent' at exactly-integer
    positions follows XLA's abs/max subgradients; those positions carry
    tent weight 0 or 1 with a 0-valued partner corner, so dx matches the
    CUDA scatter exactly and dpyx matches up to the measure-zero tie the
    banded kernel resolves with its one-sided rule)."""
    q = h * w
    j = jnp.arange(q, dtype=jnp.float32)
    qy = jnp.floor((j + 0.5) * (1.0 / w))  # exact for every w (see above)
    qx = j - qy * w
    py, px = pyx[..., 0], pyx[..., 1]                     # (N, K, P)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(qy[None, None, None, :] - py[..., None]))
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(qx[None, None, None, :] - px[..., None]))
    s = (ty * tx).astype(x_rows.dtype)                    # (N, K, P, Q)
    return jnp.einsum("nkpq,nqc->npkc", s, x_rows,
                      preferred_element_type=jnp.float32).astype(x_rows.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample_banded(x_rows, pyx, h, w):
    """Large-level path: separable row-window kernel when the level fits
    VMEM (the common case), banded kernel otherwise; XLA gather off-TPU."""
    if pallas_available():
        if _sep_eligible(h, w, x_rows.shape[-1], x_rows.dtype.itemsize,
                         pyx.shape[1]):
            return _sample_pallas_sep(x_rows, pyx, h, w)
        return _sample_pallas(x_rows, pyx, h, w)
    return sample_ref(x_rows, pyx, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sample_dense_pbwd(x_rows, pyx, h, w):
    """Dense XLA forward + banded Pallas backward, for mid-sized levels:
    the fused dense fwd is cheapest, but its autodiff materializes
    (N, K, P, Q) tensors — the Pallas backward avoids that entirely.
    dpyx uses the kernels' one-sided tent derivative (the CUDA col2im
    convention; nonzero at exactly-integer positions, i.e. zero-offset
    init), same as the large-level path."""
    return sample_dense(x_rows, pyx, h, w)


def _dense_pbwd_fwd(x_rows, pyx, h, w):
    return sample_dense(x_rows, pyx, h, w), (x_rows, pyx)


def _dense_pbwd_bwd(h, w, res, g):
    x_rows, pyx = res
    if pallas_available():
        return _sample_pallas_bwd(x_rows, pyx, g, h, w)
    _, vjp = jax.vjp(lambda xr, pp: sample_dense(xr, pp, h, w), x_rows, pyx)
    return vjp(g)


_sample_dense_pbwd.defvjp(_dense_pbwd_fwd, _dense_pbwd_bwd)


def sample_bilinear_rows(x_rows, pyx, h, w):
    """Deformable bilinear row sampling.

    Args:
      x_rows: (N, h*w, Cg) flattened feature rows (N = batch*groups).
      pyx: (N, K, P, 2) f32 sampling positions (py, px) per tap and pixel.
    Returns:
      (N, P, K, Cg) sampled values, p-major so the caller's (K*Cg)
      tap-contraction consumes it without a relayout. Differentiable in
      x_rows and pyx.

    Dispatch: tiny levels (q <= DENSE_BWD_MAX_Q) run the dense XLA einsum
    end to end; mid levels (q <= DENSE_MAX_Q) run dense fwd + Pallas bwd;
    large levels run the banded Pallas kernels (TPU) or the XLA gather
    reference (CPU).
    """
    if h * w <= DENSE_BWD_MAX_Q and pallas_available():
        return sample_dense(x_rows, pyx, h, w)
    if h * w <= DENSE_MAX_Q and pallas_available():
        return _sample_dense_pbwd(x_rows, pyx, h, w)
    return _sample_banded(x_rows, pyx, h, w)


def _fwd(x_rows, pyx, h, w):
    return _sample_banded(x_rows, pyx, h, w), (x_rows, pyx)


def _bwd(h, w, res, g):
    x_rows, pyx = res
    if pallas_available():
        return _sample_pallas_bwd(x_rows, pyx, g, h, w)
    _, vjp = jax.vjp(lambda xr, pp: sample_ref(xr, pp, h, w), x_rows, pyx)
    return vjp(g)


_sample_banded.defvjp(_fwd, _bwd)
