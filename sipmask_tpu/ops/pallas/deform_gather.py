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
precomputed weights — so the kernel streams 2 floats per (tap, pixel)
instead of 8.

The Q contraction is tiled with a data-dependent skip: a tile's
(tent-build + matmul) only runs when some pixel in the P-block samples from
it (bit-mask per (n, tap, p-block), scalar-prefetched). For typical
deformable offsets each P-block touches 2-4 of ~10 tiles, so the dense
one-hot cost collapses to a band around the diagonal while remaining EXACT
for arbitrarily large offsets.

Gradients route through the XLA reference formulation via
``jax.custom_vjp`` (offset gradients flow through the tent weights; the
hand-written CUDA scatter-add backward falls out of autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

P_BLK = 512
Q_BLK = 512       # forward tile sizes
P_BLK_BWD = 256
Q_BLK_BWD = 256   # narrower backward tiles (more live temps per tile)


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

    x_rows: (N, Q=h*w, Cg); pyx: (N, K, P, 2) float (py, px).
    Out-of-bounds corners contribute 0 (CUDA ``deformable_im2col_bilinear``
    semantics). Differentiable in x_rows and pyx; used for the CPU fallback,
    parity tests, and the Pallas backward pass.
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
    return out


def _kernel(bits_ref, pyx_ref, x_ref, out_ref, acc_ref, *,
            qt_n, k_n, pb_n, w):
    import jax.experimental.pallas as pl

    bn, bp = pl.program_id(0), pl.program_id(1)
    inv_w = 1.0 / w
    for t in range(k_n):
        acc_ref[...] = jnp.zeros_like(acc_ref)
        # positions packed (P_BLK, K*2) so the tiny trailing dim never
        # pads the 128-lane axis
        py = pyx_ref[0, :, 2 * t:2 * t + 1]      # (P_BLK, 1) f32
        px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
        nw = _n_words(qt_n)
        base = ((bn * pb_n + bp) * k_n + t) * nw
        for qt in range(qt_n):
            @pl.when((bits_ref[base + qt // 31] >> (qt % 31)) & 1 > 0)
            def _(qt=qt):
                q0 = qt * Q_BLK
                j = jax.lax.broadcasted_iota(
                    jnp.int32, (1, Q_BLK), 1).astype(jnp.float32) + float(q0)
                qy = jnp.floor(j * inv_w)
                qx = j - qy * w
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(qy - py))  # (P_BLK, QB)
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(qx - px))
                s = (ty * tx).astype(x_ref.dtype)
                acc_ref[...] += jnp.dot(
                    s, x_ref[0, q0:q0 + Q_BLK, :],
                    preferred_element_type=jnp.float32)
        out_ref[0, t] = acc_ref[...].astype(out_ref.dtype)


def _n_words(qt_n):
    return -(-qt_n // 31)


def _tile_bits(pyxp, h, w, n, k, pb, qt_n, q_blk):
    """Bit mask of q-tiles touched, per (n, tap, p-block), from the 4
    clipped corner positions of each pixel. Packed into 31-bit int32 words
    (n_words per mask) and flattened (N*PB*K*n_words,) for scalar-prefetch,
    word-major within a mask."""
    py, px = pyxp[..., 0], pyxp[..., 1]
    y0 = jnp.clip(jnp.floor(py), 0, h - 1)
    x0 = jnp.clip(jnp.floor(px), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    # the touched tiles form a contiguous range (corner q values span
    # [y0*w+x0, y1*w+x1] which is contiguous in flattened order), so a
    # min/max reduction replaces the one-hot membership test
    q_lo = (y0 * w + x0).astype(jnp.int32)        # (N, K, Ppad)
    q_hi = (y1 * w + x1).astype(jnp.int32)
    t_lo = (q_lo // q_blk).reshape(n, k, pb, -1).min(-1)   # (N, K, PB)
    t_hi = (q_hi // q_blk).reshape(n, k, pb, -1).max(-1)
    nw = _n_words(qt_n)
    w0 = jnp.arange(nw) * 31                       # word base tile index
    lo = jnp.clip(t_lo[..., None] - w0, 0, 31)     # (N, K, PB, NW)
    hi = jnp.clip(t_hi[..., None] + 1 - w0, 0, 31)
    ones = jnp.int32(1)
    bits = (ones << hi) - (ones << lo)             # range mask per word
    return bits.transpose(0, 2, 1, 3).reshape(-1)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _sample_pallas(x_rows, pyx, h, w, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, q, cg = x_rows.shape
    _, k, p, _ = pyx.shape
    assert q == h * w, (q, h, w)
    qpad = -(-q // Q_BLK) * Q_BLK
    ppad = -(-p // P_BLK) * P_BLK
    pb, qt_n = ppad // P_BLK, qpad // Q_BLK

    xp = _pad_to(x_rows, qpad, 1)
    # pad positions with -2 -> every tent weight is 0 -> padded rows output 0
    pyxp = _pad_to(pyx, ppad, 2)
    if ppad != p:
        mask = (jnp.arange(ppad) < p)[None, None, :, None]
        pyxp = jnp.where(mask, pyxp, -2.0)
    bits = _tile_bits(pyxp, h, w, n, k, pb, qt_n, Q_BLK)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, pb),
        in_specs=[
            pl.BlockSpec((1, P_BLK, 2 * k), lambda bn, bp, *_: (bn, bp, 0)),
            pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, k, P_BLK, cg),
                               lambda bn, bp, *_: (bn, 0, bp, 0)),
        scratch_shapes=[pltpu.VMEM((P_BLK, cg), jnp.float32)],
    )
    pyx_packed = pyxp.astype(jnp.float32).transpose(0, 2, 1, 3)
    pyx_packed = pyx_packed.reshape(n, ppad, 2 * k)
    out = pl.pallas_call(
        functools.partial(_kernel, qt_n=qt_n, k_n=k, pb_n=pb, w=w),
        out_shape=jax.ShapeDtypeStruct((n, k, ppad, cg), x_rows.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bits, pyx_packed, xp)
    return out[:, :, :p, :]


def _bwd_kernel(bits_ref, pyx_ref, x_ref, g_ref, dx_ref, dpyx_ref,
                *, qt_n, k_n, pb_n, w, q_blk):
    """Backward of the tent sampling, same banded tiling as the forward:

      dX[q, :]  += sum_p S[p, q] * g[p, :]            (S^T @ g on the MXU)
      d py[p]    = sum_q  tent'(qy-py) * tx * M[p, q]
      d px[p]    = sum_q  ty * tent'(qx-px) * M[p, q]
      M[p, q]    = g[p, :] . X[q, :]                   (g @ X^T on the MXU)

    with tent'(u) = -sign(u) on |u| < 1 (zero outside and at u = 0; exact
    integer positions are a measure-zero subgradient choice).

    dX accumulates across the p-block grid dimension (the dx block revisits
    with bp, which Pallas runs sequentially).
    """
    import jax.experimental.pallas as pl

    bn, bp = pl.program_id(0), pl.program_id(1)
    inv_w = 1.0 / w

    @pl.when(bp == 0)
    def _():
        dx_ref[...] = jnp.zeros_like(dx_ref)

    for t in range(k_n):
        py = pyx_ref[0, :, 2 * t:2 * t + 1]      # (P_BLK, 1) f32
        px = pyx_ref[0, :, 2 * t + 1:2 * t + 2]
        g = g_ref[0, t]                          # (P_BLK, Cg)
        nw = _n_words(qt_n)
        base = ((bn * pb_n + bp) * k_n + t) * nw
        dpyx_ref[0, :, 2 * t:2 * t + 2] = jnp.zeros_like(
            dpyx_ref[0, :, 2 * t:2 * t + 2])
        for qt in range(qt_n):
            @pl.when((bits_ref[base + qt // 31] >> (qt % 31)) & 1 > 0)
            def _(qt=qt, py=py, px=px, g=g, t=t):
                q0 = qt * q_blk
                j = jax.lax.broadcasted_iota(
                    jnp.int32, (1, q_blk), 1).astype(jnp.float32) + float(q0)
                qy = jnp.floor(j * inv_w)
                qx = j - qy * w
                uy = qy - py
                ux = qx - px
                ty = jnp.maximum(0.0, 1.0 - jnp.abs(uy))   # (P_BLK, QB)
                tx = jnp.maximum(0.0, 1.0 - jnp.abs(ux))
                s = (ty * tx).astype(x_ref.dtype)
                xt = x_ref[0, q0:q0 + q_blk, :]
                dx_ref[0, q0:q0 + q_blk, :] += jnp.dot(
                    s.T, g.astype(x_ref.dtype),
                    preferred_element_type=jnp.float32
                ).astype(dx_ref.dtype)
                m = jnp.dot(g.astype(x_ref.dtype), xt.T,
                            preferred_element_type=jnp.float32)
                # d tent(qy - py)/d py: -1 on (-1, 0], +1 on (0, 1], 0
                # outside — the one-sided choice of the floor-based bilinear
                # formula (CUDA get_coordinate_weight / autodiff of
                # sample_ref). Using sign(u) with sign(0)=0 instead would
                # zero ALL offset gradients at exactly-integer sampling
                # positions — which is every position at zero-offset init,
                # freezing the offset convs forever.
                def dtent(u):
                    inside = (u > -1.0) & (u <= 1.0)
                    return jnp.where(inside,
                                     jnp.where(u > 0.0, 1.0, -1.0), 0.0)

                dty = dtent(uy)
                dtx = dtent(ux)
                dpyx_ref[0, :, 2 * t:2 * t + 1] += (
                    dty * tx * m).sum(1, keepdims=True)
                dpyx_ref[0, :, 2 * t + 1:2 * t + 2] += (
                    ty * dtx * m).sum(1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def _sample_pallas_bwd(x_rows, pyx, g, h, w, interpret=False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, q, cg = x_rows.shape
    _, k, p, _ = pyx.shape
    qpad = -(-q // Q_BLK_BWD) * Q_BLK_BWD
    ppad = -(-p // P_BLK_BWD) * P_BLK_BWD
    pb, qt_n = ppad // P_BLK_BWD, qpad // Q_BLK_BWD

    xp = _pad_to(x_rows, qpad, 1)
    gp = _pad_to(g, ppad, 2)
    pyxp = _pad_to(pyx, ppad, 2)
    if ppad != p:
        mask = (jnp.arange(ppad) < p)[None, None, :, None]
        pyxp = jnp.where(mask, pyxp, -2.0)
    bits = _tile_bits(pyxp, h, w, n, k, pb, qt_n, Q_BLK_BWD)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, pb),
        in_specs=[
            pl.BlockSpec((1, P_BLK_BWD, 2 * k),
                         lambda bn, bp, *_: (bn, bp, 0)),
            pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
            pl.BlockSpec((1, k, P_BLK_BWD, cg),
                         lambda bn, bp, *_: (bn, 0, bp, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, qpad, cg), lambda bn, bp, *_: (bn, 0, 0)),
            pl.BlockSpec((1, P_BLK_BWD, 2 * k),
                         lambda bn, bp, *_: (bn, bp, 0)),
        ),
    )
    pyx_packed = pyxp.astype(jnp.float32).transpose(0, 2, 1, 3)
    pyx_packed = pyx_packed.reshape(n, ppad, 2 * k)
    dx, dpyx = pl.pallas_call(
        functools.partial(_bwd_kernel, qt_n=qt_n, k_n=k, pb_n=pb, w=w,
                          q_blk=Q_BLK_BWD),
        out_shape=(
            jax.ShapeDtypeStruct((n, qpad, cg), jnp.float32),
            jax.ShapeDtypeStruct((n, ppad, 2 * k), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bits, pyx_packed, xp, gp.astype(x_rows.dtype))
    dpyx = dpyx.reshape(n, ppad, k, 2).transpose(0, 2, 1, 3)
    return dx[:, :q, :].astype(x_rows.dtype), dpyx[:, :, :p, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sample_bilinear_rows(x_rows, pyx, h, w):
    """Deformable bilinear row sampling, Pallas on TPU / XLA elsewhere.

    Args:
      x_rows: (N, h*w, Cg) flattened feature rows (N = batch*groups).
      pyx: (N, K, P, 2) f32 sampling positions (py, px) per tap and pixel.
    Returns:
      (N, K, P, Cg) sampled values. Differentiable in x_rows and pyx.
    """
    if pallas_available():
        return _sample_pallas(x_rows, pyx, h, w)
    return sample_ref(x_rows, pyx, h, w)


def _fwd(x_rows, pyx, h, w):
    return sample_bilinear_rows(x_rows, pyx, h, w), (x_rows, pyx)


# The backward kernel keeps the full dX row block resident in VMEM while
# accumulating across p-block grid revisits; beyond this many rows it no
# longer fits the 16MB scoped VMEM (dx f32 + x/g blocks + tile temps), so
# larger levels route through the XLA reference VJP (correct, slower).
# TODO(round 2): q-tiled transposed dx kernel to lift the cap.
_BWD_MAX_Q = 8192


def _bwd(h, w, res, g):
    x_rows, pyx = res
    if pallas_available() and x_rows.shape[1] <= _BWD_MAX_Q:
        return _sample_pallas_bwd(x_rows, pyx, g, h, w)
    _, vjp = jax.vjp(lambda xr, pp: sample_ref(xr, pp, h, w), x_rows, pyx)
    return vjp(g)


sample_bilinear_rows.defvjp(_fwd, _bwd)
