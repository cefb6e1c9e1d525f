"""Pallas TPU kernel for SP mask assembly (inference decode).

The XLA column-mix formulation (ops/crop_split.py:_colmix_logits) lowers to
w-many tiny batched matmuls ((h, nb) @ (nb, K) per column) because the mixed
coefficients vary per column — measured ~2.5ms at 544^2 bs8 D=100 on v5e.
**Measured outcome (v5e, 544^2 bs8 D=100): the XLA colmix path wins
end-to-end — 316.9 img/s vs 308.5 img/s with this kernel dispatched in
decode — because XLA fuses the colmix einsums with their producers and
overlaps them with the surrounding decode work, while a pallas_call is an
opaque custom call it cannot fuse across. decode therefore keeps colmix;
this kernel is retained as a tested, documented alternative formulation
(and a template for workloads where assembly dominates).**

This kernel restores the plain ``basis @ c_q`` form — but as ONE
(tile, nb) @ (nb, 4*Kpad) MXU dot per pixel tile (quadrants concatenated
along lanes, K padded to the 128-lane boundary so the quadrant slices are
register-aligned) — and applies the quadrant *select* in the epilogue,
entirely in VMEM: the (h, w, 4, N) plane stack of the reference CUDA kernel
(crop_split_cuda_kernel.cu:18-155) never reaches HBM, and the only HBM
traffic is basis in + assembled masks out.

Semantics are bit-identical to crop_split.assemble_masks: the quadrant
boundaries (x1 + (x2-x1+0.1)/2 etc.) are computed OUTSIDE in the same f32
expressions as _quadrant_bounds, and the kernel only compares against them.
Forward-only: decode never differentiates through assembly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

P_TILE = 4096
LANE = 128


def _kernel(rc_ref, b_ref, cq_ref, bx_ref, out_ref, *, npad):
    basis = b_ref[0]                       # (P_TILE, nb)
    col = rc_ref[:, 0:1]                   # (P_TILE, 1) f32
    row = rc_ref[:, 1:2]
    x1 = bx_ref[0, 0:1, :]                 # (1, npad)
    y1 = bx_ref[0, 1:2, :]
    x2 = bx_ref[0, 2:3, :]
    y2 = bx_ref[0, 3:4, :]
    rx = bx_ref[0, 4:5, :]
    by = bx_ref[0, 5:6, :]
    # One MXU dot over the 4 quadrants at once: (P_TILE, nb) @ (nb, 4*npad).
    m = jnp.dot(basis, cq_ref[0], preferred_element_type=jnp.float32)
    m0 = m[:, 0 * npad:1 * npad]           # lane-aligned slices (npad % 128 == 0)
    m1 = m[:, 1 * npad:2 * npad]
    m2 = m[:, 2 * npad:3 * npad]
    m3 = m[:, 3 * npad:4 * npad]
    right = col >= rx
    bottom = row >= by
    sel = jnp.where(bottom, jnp.where(right, m3, m2),
                    jnp.where(right, m1, m0))
    in_box = (col >= x1) & (col < x2) & (row >= y1) & (row < y2)
    out_ref[0] = jnp.where(in_box, jax.nn.sigmoid(sel), 0.0
                           ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "out_dtype", "interpret"))
def assemble_masks_pallas(basis, cofs, boxes, h, w, out_dtype=jnp.float32,
                          interpret=False):
    """Fused SP assembly: (B, h, w, nb), (B, N, 4*nb), (B, N, 4) ->
    (B, h, w, N) sigmoid masks, 0 outside boxes. Boxes in mask coords."""
    import jax.experimental.pallas as pl

    bsz, _, _, nb = basis.shape
    n = cofs.shape[1]
    npad = -(-n // LANE) * LANE
    # Cap the pixel tile so the double-buffered f32 output block stays ~<4MB
    # of VMEM (sweep on v5e: 4096 best at npad=128; 16384 OOMs scoped vmem).
    p_tile = max(512, min(P_TILE, (1 << 22) // (npad * 4) // 512 * 512))
    p = h * w
    ppad = -(-p // p_tile) * p_tile
    pt = ppad // p_tile

    flat = basis.reshape(bsz, p, nb)
    if ppad != p:
        flat = jnp.pad(flat, ((0, 0), (0, ppad - p), (0, 0)))
    # (B, nb, 4, N) -> pad N -> (B, nb, 4*npad), quadrants along lanes.
    cq = cofs.reshape(bsz, n, 4, nb).transpose(0, 3, 2, 1)
    if npad != n:
        cq = jnp.pad(cq, ((0, 0), (0, 0), (0, 0), (0, npad - n)))
    cq = cq.reshape(bsz, nb, 4 * npad)

    bxf = boxes.astype(jnp.float32)
    x1, y1, x2, y2 = bxf[..., 0], bxf[..., 1], bxf[..., 2], bxf[..., 3]
    rx = x1 + (x2 - x1 + 0.1) / 2          # same expr as _quadrant_bounds
    by = y1 + (y2 - y1 + 0.1) / 2
    params = jnp.stack([x1, y1, x2, y2, rx, by], 1)       # (B, 6, N)
    pad6 = jnp.zeros((bsz, 2, n), jnp.float32)
    params = jnp.concatenate([params, pad6], 1)           # (B, 8, N)
    if npad != n:
        params = jnp.pad(params, ((0, 0), (0, 0), (0, npad - n)))

    idx = jnp.arange(ppad, dtype=jnp.int32)
    rowcol = jnp.stack([(idx % w).astype(jnp.float32),
                        (idx // w).astype(jnp.float32)], -1)  # (ppad, 2)

    out = pl.pallas_call(
        functools.partial(_kernel, npad=npad),
        grid=(bsz, pt),
        in_specs=[
            pl.BlockSpec((p_tile, 2), lambda bi, pi: (pi, 0)),
            pl.BlockSpec((1, p_tile, nb), lambda bi, pi: (bi, pi, 0)),
            pl.BlockSpec((1, nb, 4 * npad), lambda bi, pi: (bi, 0, 0)),
            pl.BlockSpec((1, 8, npad), lambda bi, pi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, p_tile, npad), lambda bi, pi: (bi, pi, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, ppad, npad), out_dtype),
        interpret=interpret,
    )(rowcol, flat.astype(basis.dtype), cq.astype(basis.dtype), params)
    return out[:, :p, :n].reshape(bsz, h, w, n)
