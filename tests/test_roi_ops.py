"""RoI op family: numeric parity against naive numpy oracles with the
reference CUDA kernels' semantics (roi_align_kernel.cu, roi_pool_kernel.cu,
grid_sampler, masked_conv, carafe)."""

import numpy as np
import jax.numpy as jnp

from sipmask_tpu.ops import (roi_align, roi_pool, grid_sample,
                             masked_conv2d, carafe)


def _bilinear_np(feat, y, x):
    h, w, _ = feat.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    val = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            yy, xx = y0 + dy, x0 + dx
            wgt = ((y - y0 if dy else 1 - (y - y0)) *
                   (x - x0 if dx else 1 - (x - x0)))
            if 0 <= yy <= h - 1 and 0 <= xx <= w - 1:
                val = val + feat[yy, xx] * wgt
    return val


class TestRoIAlign:
    def test_matches_naive_oracle(self):
        rng = np.random.RandomState(0)
        feats = rng.randn(2, 16, 16, 3).astype(np.float32)
        rois = np.array([[0, 4.0, 4.0, 12.0, 12.0],
                         [1, 1.5, 2.5, 9.0, 14.0]], np.float32)
        out_size, scale, s = 4, 0.5, 2
        got = np.asarray(roi_align(jnp.asarray(feats), jnp.asarray(rois),
                                   out_size, scale, sample_num=s))
        for r, roi in enumerate(rois):
            b = int(roi[0])
            x1, y1, x2, y2 = roi[1:] * scale
            rw = max(x2 - x1, 1.0)
            rh = max(y2 - y1, 1.0)
            bw, bh = rw / out_size, rh / out_size
            for oy in range(out_size):
                for ox in range(out_size):
                    acc = 0.0
                    for iy in range(s):
                        for ix in range(s):
                            py = y1 + (oy + (iy + 0.5) / s) * bh
                            px = x1 + (ox + (ix + 0.5) / s) * bw
                            acc = acc + _bilinear_np(feats[b], py, px)
                    np.testing.assert_allclose(got[r, oy, ox], acc / (s * s),
                                               rtol=1e-4, atol=1e-4)


class TestRoIPool:
    def test_max_per_bin(self):
        rng = np.random.RandomState(1)
        feats = rng.randn(1, 12, 12, 2).astype(np.float32)
        rois = np.array([[0, 2.0, 2.0, 9.0, 9.0]], np.float32)
        out_size = 2
        got = np.asarray(roi_pool(jnp.asarray(feats), jnp.asarray(rois),
                                  out_size, 1.0))
        x1, y1, x2, y2 = 2, 2, 9, 9
        rw, rh = x2 - x1 + 1, y2 - y1 + 1
        for oy in range(out_size):
            for ox in range(out_size):
                ys = [y for y in range(12)
                      if y >= y1 and 0 <= np.floor((y - y1) / rh * out_size) == oy]
                xs = [x for x in range(12)
                      if x >= x1 and 0 <= np.floor((x - x1) / rw * out_size) == ox]
                want = feats[0][np.ix_(ys, xs)].reshape(-1, 2).max(0)
                np.testing.assert_allclose(got[0, oy, ox], want, rtol=1e-5)


class TestGridSample:
    def test_identity_grid(self):
        rng = np.random.RandomState(2)
        feats = rng.randn(1, 8, 10, 2).astype(np.float32)
        ys, xs = np.meshgrid(np.linspace(-1, 1, 8), np.linspace(-1, 1, 10),
                             indexing="ij")
        grid = np.stack([xs, ys], -1)[None].astype(np.float32)
        got = np.asarray(grid_sample(jnp.asarray(feats), jnp.asarray(grid),
                                     align_corners=True))
        np.testing.assert_allclose(got, feats, rtol=1e-4, atol=1e-5)

    def test_out_of_range_is_zero(self):
        feats = jnp.ones((1, 4, 4, 1))
        grid = jnp.full((1, 2, 2, 2), -3.0)
        got = np.asarray(grid_sample(feats, grid))
        assert (got == 0).all()


class TestMaskedConv:
    def test_conv_masked(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 2, 4).astype(np.float32))
        mask = jnp.zeros((1, 6, 6)).at[0, 2:4, 2:4].set(1.0)
        got = np.asarray(masked_conv2d(x, mask, w))
        import jax
        full = np.asarray(jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
        assert (got[0, 0, 0] == 0).all()
        np.testing.assert_allclose(got[0, 2, 3], full[0, 2, 3], rtol=1e-5)


class TestCarafe:
    def test_uniform_kernel_is_box_filter_upsample(self):
        rng = np.random.RandomState(4)
        x = rng.randn(1, 4, 4, 2).astype(np.float32)
        k_up, up = 3, 2
        kernels = np.full((1, 8, 8, k_up * k_up), 1.0 / (k_up * k_up),
                          np.float32)
        got = np.asarray(carafe(jnp.asarray(x), jnp.asarray(kernels),
                                up_factor=up, k_up=k_up))
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for hy in range(8):
            for hx in range(8):
                sy, sx = hy // up, hx // up
                want = xp[0, sy:sy + 3, sx:sx + 3].reshape(-1, 2).mean(0)
                np.testing.assert_allclose(got[0, hy, hx], want, rtol=1e-4,
                                           atol=1e-5)
