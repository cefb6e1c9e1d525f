"""RoI feature extraction ops (XLA-native, static shapes).

TPU equivalents of the reference's CUDA RoIAlign / RoIPool
(mmdet/ops/roi_align/src/roi_align_kernel.cu, roi_pool/src/*) and the
DeformRoIPooling family (mmdet/ops/dcn/src/deform_pool_cuda*). Not used by
the SipMask path itself (two-stage heads only) but part of the reference's
op surface. All ops take NHWC features and a fixed-size ROI batch; autodiff
provides the backward (the CUDA versions hand-write atomicAdd scatters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as _nn


def _bilinear(feat, py, px):
    """feat (H, W, C); py/px (...,): bilinear sample with zero outside."""
    h, w, _ = feat.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0 + dy
            xx = x0 + dx
            wgt = ((py - y0 if dy else 1.0 - (py - y0)) *
                   (px - x0 if dx else 1.0 - (px - x0)))
            inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            out = out + feat[yi, xi] * (wgt * inb)[..., None]
    return out


def roi_align(feats, rois, out_size: int, spatial_scale: float,
              sample_num: int = 2, aligned: bool = False):
    """RoIAlign (roi_align_kernel.cu semantics, sample_num grid per bin).

    Args:
      feats: (B, H, W, C).
      rois: (R, 5) [batch_idx, x1, y1, x2, y2] in input coords.
      aligned: mmdet v1 uses aligned=False (no -0.5 shift).
    Returns:
      (R, out_size, out_size, C).
    """
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * spatial_scale - off
    y1 = rois[:, 2] * spatial_scale - off
    x2 = rois[:, 3] * spatial_scale - off
    y2 = rois[:, 4] * spatial_scale - off
    if not aligned:  # legacy: clamp roi size >= 1
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
    else:
        rw, rh = x2 - x1, y2 - y1
    bin_w = rw / out_size
    bin_h = rh / out_size
    s = sample_num
    # sample grid: s x s points per bin at (i + (j+0.5)/s) * bin
    grid = (jnp.arange(out_size)[:, None] +
            (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)  # (out*s,)

    def per_roi(bidx, ys, xs):
        feat = feats[bidx]
        pts = _bilinear(feat, ys[:, None], xs[None, :])  # (oy*s, ox*s, C)
        c = pts.shape[-1]
        pts = pts.reshape(out_size, s, out_size, s, c)
        return pts.mean((1, 3))

    ys = y1[:, None] + grid[None, :] * bin_h[:, None]  # (R, out*s)
    xs = x1[:, None] + grid[None, :] * bin_w[:, None]
    bidx = rois[:, 0].astype(jnp.int32)
    return jax.vmap(per_roi)(bidx, ys, xs)


def roi_pool(feats, rois, out_size: int, spatial_scale: float):
    """RoIPool: max over each quantized bin (roi_pool_kernel.cu).

    Implemented as dense max over the bin membership mask (static shapes).
    """
    b, h, w, c = feats.shape
    x1 = jnp.round(rois[:, 1] * spatial_scale)
    y1 = jnp.round(rois[:, 2] * spatial_scale)
    x2 = jnp.round(rois[:, 3] * spatial_scale)
    y2 = jnp.round(rois[:, 4] * spatial_scale)
    rw = jnp.maximum(x2 - x1 + 1, 1.0)
    rh = jnp.maximum(y2 - y1 + 1, 1.0)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)

    def per_roi(bidx, px1, py1, bw, bh):
        feat = feats[bidx]  # (H, W, C)
        # bin index of each pixel, -1 if outside the roi
        by = jnp.floor((ys - py1) / bh * out_size)
        bx = jnp.floor((xs - px1) / bw * out_size)
        by = jnp.where((ys >= py1) & (by < out_size) & (by >= 0), by, -1)
        bx = jnp.where((xs >= px1) & (bx < out_size) & (bx >= 0), bx, -1)
        onehot_y = (by[None, :] == jnp.arange(out_size)[:, None])  # (o, H)
        onehot_x = (bx[None, :] == jnp.arange(out_size)[:, None])  # (o, W)
        neg = jnp.finfo(jnp.float32).min / 4
        fy = jnp.where(onehot_y[:, :, None, None], feat[None], neg)
        my = fy.max(1)  # (oy, W, C)
        fx = jnp.where(onehot_x[:, None, :, None], my[None], neg)
        out = fx.max(2).transpose(1, 0, 2)  # (oy, ox, C)
        return jnp.where(out > neg / 2, out, 0.0)  # empty bin -> 0

    return jax.vmap(per_roi)(rois[:, 0].astype(jnp.int32), x1, y1, rw, rh)


def grid_sample(feats, grid, align_corners: bool = True):
    """F.grid_sample equivalent (the reference vendors grid_sampler CUDA,
    mmdet/ops/grid_sampler): bilinear, zero padding.

    feats: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized coords in [-1, 1]
    ordered (x, y) like torch.
    """
    b, h, w, _ = feats.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        px = (gx + 1) * 0.5 * (w - 1)
        py = (gy + 1) * 0.5 * (h - 1)
    else:
        px = ((gx + 1) * w - 1) * 0.5
        py = ((gy + 1) * h - 1) * 0.5
    return jax.vmap(_bilinear)(feats, py, px)


def masked_conv2d(x, mask, weight, bias=None, padding: int = 1):
    """MaskedConv2d (mmdet/ops/masked_conv): conv evaluated only where
    mask > 0, zero elsewhere. On TPU the dense conv is cheaper than any
    sparse bookkeeping, so: conv(x) * mask."""
    out = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out * (mask > 0).astype(out.dtype)[..., None]


def carafe(x, kernels, up_factor: int = 2, k_up: int = 5):
    """CARAFE content-aware upsampling (mmdet/ops/carafe CUDA):
    each upsampled pixel is a k_up x k_up weighted sum of source pixels
    around its low-res parent, with per-pixel predicted (softmaxed) kernels.

    x: (B, H, W, C); kernels: (B, H*up, W*up, k_up*k_up) already softmaxed.
    Returns (B, H*up, W*up, C).
    """
    b, h, w, c = x.shape
    r = k_up // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    # neighborhood stack: (B, H, W, k*k, C)
    patches = jnp.stack(
        [xp[:, dy:dy + h, dx:dx + w] for dy in range(k_up)
         for dx in range(k_up)], 3)
    # upsample patches to high-res grid (nearest: parent pixel)
    patches = jnp.repeat(jnp.repeat(patches, up_factor, 1), up_factor, 2)
    return (patches * kernels[..., None]).sum(3)


def deform_roi_pool(feats, rois, trans, out_size: int, spatial_scale: float,
                    out_channels: int, no_trans: bool, group_size: int = 1,
                    part_size: int | None = None, sample_per_part: int = 4,
                    trans_std: float = 0.0):
    """Deformable PS-RoI pooling (deform_pool_cuda_kernel.cu:53-139 /
    deform_pool.py:11 `deform_roi_pooling`).

    Per output cell (ctop, ph, pw): average of a sample_per_part^2 bilinear
    sample grid inside the bin, the whole bin shifted by a learned per-part
    normalized offset (trans * trans_std * roi_size), reading the
    position-sensitive channel (ctop*G + gh)*G + gw. Out-of-image samples
    are skipped (count-normalized mean), matching the CUDA kernel's
    `continue` + `count` bookkeeping.

    Args:
      feats: (B, H, W, C) with C == out_channels * group_size**2.
      rois: (R, 5) [batch_idx, x1, y1, x2, y2] in input coords.
      trans: (R, num_classes*2, part_size, part_size) offsets, layout as the
        reference's NCHW trans tensor ((cls, {x,y}) interleaved on axis 1);
        ignored when no_trans.
      out_size/group_size/part_size/sample_per_part/trans_std: as reference
        (part_size defaults to out_size, deform_pool.py:36).
    Returns:
      (R, out_size, out_size, out_channels)  [NHWC view of the CUDA
      (R, out_channels, P, P) output].
    """
    if part_size is None:
        part_size = out_size
    h, w, _ = feats.shape[1:]
    p, s, d, g = out_size, sample_per_part, out_channels, group_size
    if no_trans:
        num_classes = 1
        trans = jnp.zeros((rois.shape[0], 2, part_size, part_size),
                          feats.dtype)
    else:
        num_classes = trans.shape[1] // 2
    ch_each = d // num_classes

    # roi box: rounded coords, half-pixel shift (kernel :84-87). C round()
    # is half-away-from-zero, not jnp.round's half-to-even: floor(x + 0.5)
    # matches it for the non-negative roi coords used here.
    def _c_round(x):
        return jnp.floor(x + 0.5)
    start_w = _c_round(rois[:, 1]) * spatial_scale - 0.5
    start_h = _c_round(rois[:, 2]) * spatial_scale - 0.5
    end_w = (_c_round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    end_h = (_c_round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(end_w - start_w, 0.1)
    roi_h = jnp.maximum(end_h - start_h, 0.1)

    ph = jnp.arange(p)
    # index arithmetic in f32 regardless of feats.dtype: a bf16 floor of
    # ph/p*part_size can land one part/PS-group index off the CUDA kernel
    part_h = jnp.floor(ph.astype(jnp.float32) / p * part_size).astype(jnp.int32)
    gh = jnp.clip(jnp.floor(ph.astype(jnp.float32) * g / p), 0, g - 1).astype(jnp.int32)
    cls_id = jnp.arange(d) // ch_each                       # (D,)
    # position-sensitive source channel (kernel :131); the output is square
    # (deform_pool.py:28 asserts out_h == out_w) so gw(pw) == gh evaluated
    # at pw and one index vector serves both axes.
    chan = (jnp.arange(d)[:, None, None] * g + gh[None, :, None]) * g \
        + gh[None, None, :]                                  # (D, P, P)

    def per_roi(bidx, sw, sh, rw, rh, tr):
        feat = feats[bidx]                                   # (H, W, C)
        bin_w, bin_h = rw / p, rh / p
        sub_w, sub_h = bin_w / s, bin_h / s
        tr = tr.reshape(num_classes, 2, part_size, part_size)
        tx = tr[cls_id[:, None, None], 0, part_h[None, :, None],
                part_h[None, None, :]] * trans_std            # (D, P, P)
        ty = tr[cls_id[:, None, None], 1, part_h[None, :, None],
                part_h[None, None, :]] * trans_std
        wstart = ph[None, None, :] * bin_w + sw + tx * rw     # (D, P, P)
        hstart = ph[None, :, None] * bin_h + sh + ty * rh
        xs = wstart[..., None, None] + jnp.arange(s)[None, None, None, None, :] * sub_w
        ys = hstart[..., None, None] + jnp.arange(s)[None, None, None, :, None] * sub_h
        valid = ((xs >= -0.5) & (xs <= w - 0.5) &
                 (ys >= -0.5) & (ys <= h - 0.5))              # (D,P,P,S,S)
        xc = jnp.clip(xs, 0.0, w - 1.0)
        yc = jnp.clip(ys, 0.0, h - 1.0)
        # bilinear with floor/ceil corners (kernel bilinear_interp :30-50)
        x0 = jnp.floor(xc); x1i = jnp.ceil(xc)
        y0 = jnp.floor(yc); y1i = jnp.ceil(yc)
        dx = xc - x0
        dy = yc - y0
        cb = chan[..., None, None]                            # (D,P,P,1,1)
        def at(yy, xx):
            return feat[yy.astype(jnp.int32), xx.astype(jnp.int32), cb]
        val = ((1 - dx) * (1 - dy) * at(y0, x0) + (1 - dx) * dy * at(y1i, x0)
               + dx * (1 - dy) * at(y0, x1i) + dx * dy * at(y1i, x1i))
        val = jnp.where(valid, val, 0.0)
        cnt = valid.sum((-1, -2))
        out = jnp.where(cnt > 0, val.sum((-1, -2)) / jnp.maximum(cnt, 1), 0.0)
        return out.transpose(1, 2, 0)                         # (P, P, D)

    return jax.vmap(per_roi)(rois[:, 0].astype(jnp.int32), start_w, start_h,
                             roi_w, roi_h, trans)


class DeformRoIPoolingPack(_nn.Module):
    """deform_pool.py:111 DeformRoIPoolingPack: a first no-trans PS-RoI pool
    feeds an FC stack that predicts one (x, y) offset per output cell
    (zero-init last layer -> starts as plain PS-RoI pooling), then the
    deformable pool runs with those offsets.

    Call: (feats (B,H,W,C), rois (R,5)) -> (R, P, P, out_channels).
    """
    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool = False
    group_size: int = 1
    sample_per_part: int = 4
    trans_std: float = 0.0
    num_offset_fcs: int = 3
    deform_fc_channels: int = 1024

    @_nn.compact
    def __call__(self, feats, rois):
        p, d = self.out_size, self.out_channels
        pool = lambda tr, nt: deform_roi_pool(
            feats, rois, tr, p, self.spatial_scale, d, nt,
            group_size=self.group_size, sample_per_part=self.sample_per_part,
            trans_std=self.trans_std)
        if self.no_trans:
            return pool(None, True)
        x = pool(None, True).reshape(rois.shape[0], -1)
        for i in range(self.num_offset_fcs):
            last = i == self.num_offset_fcs - 1
            x = _nn.Dense(p * p * 2 if last else self.deform_fc_channels,
                          kernel_init=_nn.initializers.zeros if last else
                          _nn.initializers.lecun_normal(),
                          bias_init=_nn.initializers.zeros)(x)
            if not last:
                x = jax.nn.relu(x)
        trans = x.reshape(rois.shape[0], 2, p, p)
        return pool(trans, False)


class ModulatedDeformRoIPoolingPack(_nn.Module):
    """deform_pool.py:176 ModulatedDeformRoIPoolingPack: DeformRoIPoolingPack
    plus a second FC stack predicting a per-cell sigmoid mask (zero-init ->
    starts at 0.5) that scales the pooled output."""
    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool = False
    group_size: int = 1
    sample_per_part: int = 4
    trans_std: float = 0.0
    num_offset_fcs: int = 3
    num_mask_fcs: int = 2
    deform_fc_channels: int = 1024

    @_nn.compact
    def __call__(self, feats, rois):
        p, d = self.out_size, self.out_channels
        pool = lambda tr, nt: deform_roi_pool(
            feats, rois, tr, p, self.spatial_scale, d, nt,
            group_size=self.group_size, sample_per_part=self.sample_per_part,
            trans_std=self.trans_std)
        if self.no_trans:
            return pool(None, True)
        n = rois.shape[0]
        flat = pool(None, True).reshape(n, -1)
        x = flat
        for i in range(self.num_offset_fcs):
            last = i == self.num_offset_fcs - 1
            x = _nn.Dense(p * p * 2 if last else self.deform_fc_channels,
                          kernel_init=_nn.initializers.zeros if last else
                          _nn.initializers.lecun_normal(),
                          bias_init=_nn.initializers.zeros)(x)
            if not last:
                x = jax.nn.relu(x)
        trans = x.reshape(n, 2, p, p)
        m = flat
        for i in range(self.num_mask_fcs):
            last = i == self.num_mask_fcs - 1
            m = _nn.Dense(p * p if last else self.deform_fc_channels,
                          kernel_init=_nn.initializers.zeros if last else
                          _nn.initializers.lecun_normal(),
                          bias_init=_nn.initializers.zeros)(m)
            m = jax.nn.sigmoid(m) if last else jax.nn.relu(m)
        mask = m.reshape(n, p, p, 1)
        return pool(trans, False) * mask
