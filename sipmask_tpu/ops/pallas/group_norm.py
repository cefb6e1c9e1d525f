"""Fused GroupNorm(+ReLU) Pallas kernels for the head towers.

Why: XLA's lowering of GN between convs is far off its bandwidth floor —
measured on v5e at the hi-acc P3 tower shape (4,100,168,256) bf16, a
4x(conv+GN+ReLU) stack runs 16.4 ms fwd+bwd vs 8.6 ms for the bare convs,
i.e. GN+ReLU costs ~7.8 ms against a ~0.6 ms traffic floor (relayout
copies + unfused reduction/apply passes + an extra ReLU-mask pass in the
backward; see docs/KERNEL_NOTES.md). These kernels stream x once per
pass with clean layouts and fold the ReLU into the GN epilogue/backward
mask, cutting the same stack to 12.6 ms.

Structure (all blocks (1, P_TILE, 128) over a (B, P, C) view; C % 128 == 0
and groups aligned so every 128-lane block holds whole groups):

- fwd = 2 kernels: streaming (s1, s2) per-(image, channel) stats with
  in-kernel tail masking, then an apply pass ``y = relu(x*sc + bi)`` with
  the per-channel affine folded outside on the tiny (B, C) stats.
- bwd = 2 kernels: one streaming (r1, r2) = (sum dy_eff, sum dy_eff*x)
  reduction (dy_eff = dy masked by the recomputed pre-ReLU sign — no bool
  residual is ever stored), then ``dx = a*dy_eff + b2*x + c2`` with the
  per-(image, channel) coefficients computed outside. Residuals are only
  (x, scale, bias, mean, rstd) — x is already a conv-backward residual.

Same math as models/layers.group_norm_nhwc (the XLA fallback everywhere
the gate fails); parity pinned in tests/test_ops.py::TestFusedGroupNorm.

Reference semantics: torch nn.GroupNorm(32, C) + inplace ReLU inside
mmcv ConvModule (SipMask-mmdetection/mmdet/models/anchor_heads/
sipmask_head.py:241-287 tower construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

LANE = 128
P_TILE = 4096


def use_pallas_gn(shape, groups: int) -> bool:
    """Gate: TPU backend, NHWC with C a lane multiple, whole groups per
    128-lane block, and enough pixels for the kernels to beat dispatch."""
    if jax.default_backend() != "tpu":
        return False
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    cg = c // groups
    return (c % LANE == 0 and c % groups == 0 and LANE % cg == 0
            and h * w >= 2048)


def _tiles(p: int):
    p_tile = min(P_TILE, -(-p // 512) * 512)
    return p_tile, -(-p // p_tile)


def _stats_kernel(x_ref, s_ref, *, p_total, p_tile):
    pt = pl.program_id(2)

    @pl.when(pt == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    x = x_ref[0].astype(jnp.float32)
    rid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + pt * p_tile
    x = jnp.where(rid < p_total, x, 0.0)
    s_ref[0, 0, :] += jnp.sum(x, axis=0)
    s_ref[0, 1, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, sc_ref, bi_ref, y_ref, *, act):
    x = x_ref[0].astype(jnp.float32)
    u = x * sc_ref[0, 0, :] + bi_ref[0, 0, :]
    if act:
        u = jnp.maximum(u, 0.0)
    y_ref[0] = u.astype(y_ref.dtype)


def _bwd_reduce_kernel(x_ref, dy_ref, sc_ref, bi_ref, r_ref, *, act,
                       p_total, p_tile):
    pt = pl.program_id(2)

    @pl.when(pt == 0)
    def _():
        r_ref[...] = jnp.zeros_like(r_ref)

    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    rid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + pt * p_tile
    live = rid < p_total
    dy = jnp.where(live, dy, 0.0)
    x = jnp.where(live, x, 0.0)
    if act:
        u = x * sc_ref[0, 0, :] + bi_ref[0, 0, :]
        dy = jnp.where(u > 0, dy, 0.0)
    r_ref[0, 0, :] += jnp.sum(dy, axis=0)
    r_ref[0, 1, :] += jnp.sum(dy * x, axis=0)


def _bwd_apply_kernel(x_ref, dy_ref, co_ref, dx_ref, *, act):
    x = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    if act:
        u = x * co_ref[0, 3, :] + co_ref[0, 4, :]
        dy = jnp.where(u > 0, dy, 0.0)
    dx = co_ref[0, 0, :] * dy + co_ref[0, 1, :] * x + co_ref[0, 2, :]
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _affine(scale, bias, mean, rstd, cg):
    """Per-(image, channel) apply coefficients from the (B, G) stats."""
    scf = scale.astype(jnp.float32)
    sc = jnp.repeat(rstd, cg, 1) * scf[None]
    bi = (bias.astype(jnp.float32)[None]
          - jnp.repeat(mean * rstd, cg, 1) * scf[None])
    return sc, bi


def _fwd_impl(x, scale, bias, groups, eps, act, interpret):
    b, h, w, c = x.shape
    p = h * w
    cg = c // groups
    p_tile, pt = _tiles(p)
    xf = x.reshape(b, p, c)
    s = pl.pallas_call(
        functools.partial(_stats_kernel, p_total=p, p_tile=p_tile),
        grid=(b, c // LANE, pt),
        in_specs=[pl.BlockSpec((1, p_tile, LANE),
                               lambda bi_, ci, pi: (bi_, pi, ci))],
        out_specs=pl.BlockSpec((1, 2, LANE), lambda bi_, ci, pi: (bi_, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(xf)
    n = float(p * cg)
    mean = s[:, 0].reshape(b, groups, cg).sum(-1) / n          # (B, G)
    var = s[:, 1].reshape(b, groups, cg).sum(-1) / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    sc, bi = _affine(scale, bias, mean, rstd, cg)
    y = pl.pallas_call(
        functools.partial(_apply_kernel, act=act),
        grid=(b, c // LANE, pt),
        in_specs=[
            pl.BlockSpec((1, p_tile, LANE), lambda bi_, ci, pi: (bi_, pi, ci)),
            pl.BlockSpec((1, 1, LANE), lambda bi_, ci, pi: (bi_, 0, ci)),
            pl.BlockSpec((1, 1, LANE), lambda bi_, ci, pi: (bi_, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, p_tile, LANE),
                               lambda bi_, ci, pi: (bi_, pi, ci)),
        out_shape=jax.ShapeDtypeStruct((b, p, c), x.dtype),
        interpret=interpret,
    )(xf, sc[:, None, :], bi[:, None, :])
    return y.reshape(b, h, w, c), mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_gn_relu(x, scale, bias, groups: int, eps: float, act: bool = True,
                  interpret: bool = False):
    """GroupNorm(+ReLU) over NHWC as streaming Pallas passes. Exact same
    math as models/layers.group_norm_nhwc (+ relu when act=True)."""
    y, _, _ = _fwd_impl(x, scale, bias, groups, eps, act, interpret)
    return y


def _vjp_fwd(x, scale, bias, groups, eps, act, interpret):
    y, mean, rstd = _fwd_impl(x, scale, bias, groups, eps, act, interpret)
    return y, (x, scale, bias, mean, rstd)


def _vjp_bwd(groups, eps, act, interpret, res, dy):
    x, scale, bias, mean, rstd = res
    b, h, w, c = x.shape
    p = h * w
    cg = c // groups
    n = float(p * cg)
    p_tile, pt = _tiles(p)
    xf = x.reshape(b, p, c)
    dyf = dy.reshape(b, p, c)
    sc, bi = _affine(scale, bias, mean, rstd, cg)
    r = pl.pallas_call(
        functools.partial(_bwd_reduce_kernel, act=act, p_total=p,
                          p_tile=p_tile),
        grid=(b, c // LANE, pt),
        in_specs=[
            pl.BlockSpec((1, p_tile, LANE), lambda bi_, ci, pi: (bi_, pi, ci)),
            pl.BlockSpec((1, p_tile, LANE), lambda bi_, ci, pi: (bi_, pi, ci)),
            pl.BlockSpec((1, 1, LANE), lambda bi_, ci, pi: (bi_, 0, ci)),
            pl.BlockSpec((1, 1, LANE), lambda bi_, ci, pi: (bi_, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, 2, LANE), lambda bi_, ci, pi: (bi_, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(xf, dyf, sc[:, None, :], bi[:, None, :])
    r1, r2 = r[:, 0], r[:, 1]                                  # (B, C)
    scf = scale.astype(jnp.float32)
    mean_c = jnp.repeat(mean, cg, 1)
    rstd_c = jnp.repeat(rstd, cg, 1)
    sdx = (r2 - mean_c * r1) * rstd_c      # sum_hw dy_eff * xhat per (B, C)
    dscale = sdx.sum(0)
    dbias = r1.sum(0)
    m1_c = jnp.repeat((r1 * scf).reshape(b, groups, cg).sum(-1) / n, cg, 1)
    m2_c = jnp.repeat((sdx * scf).reshape(b, groups, cg).sum(-1) / n, cg, 1)
    a = rstd_c * scf[None]
    b2 = -(rstd_c * rstd_c) * m2_c
    c2 = rstd_c * (mean_c * rstd_c * m2_c - m1_c)
    co = jnp.stack([a, b2, c2, sc, bi], 1)                     # (B, 5, C)
    dx = pl.pallas_call(
        functools.partial(_bwd_apply_kernel, act=act),
        grid=(b, c // LANE, pt),
        in_specs=[
            pl.BlockSpec((1, p_tile, LANE), lambda bi_, ci, pi: (bi_, pi, ci)),
            pl.BlockSpec((1, p_tile, LANE), lambda bi_, ci, pi: (bi_, pi, ci)),
            pl.BlockSpec((1, 5, LANE), lambda bi_, ci, pi: (bi_, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, p_tile, LANE),
                               lambda bi_, ci, pi: (bi_, pi, ci)),
        out_shape=jax.ShapeDtypeStruct((b, p, c), x.dtype),
        interpret=interpret,
    )(xf, dyf, co)
    return (dx.reshape(b, h, w, c), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


fused_gn_relu.defvjp(_vjp_fwd, _vjp_bwd)
