"""RoI op family: numeric parity against naive numpy oracles with the
reference CUDA kernels' semantics (roi_align_kernel.cu, roi_pool_kernel.cu,
grid_sampler, masked_conv, carafe)."""

import numpy as np
import jax.numpy as jnp

from sipmask_tpu.ops import (roi_align, roi_pool, grid_sample,
                             masked_conv2d, carafe, deform_roi_pool)


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


class TestDeformRoIPool:
    """Oracle: direct numpy transcription of DeformablePSROIPoolForwardKernel
    (deform_pool_cuda_kernel.cu:53-139)."""

    @staticmethod
    def _oracle(feats, rois, trans, P, scale, D, no_trans, G, part, S, std):
        _, H, W, _ = feats.shape
        R = rois.shape[0]
        num_classes = 1 if no_trans else trans.shape[1] // 2
        ch_each = D // num_classes
        out = np.zeros((R, D, P, P), np.float32)
        for n in range(R):
            b = int(rois[n, 0])
            # C round() = half-away-from-zero, NOT python round (half-to-even)
            sw = np.floor(float(rois[n, 1]) + 0.5) * scale - 0.5
            sh = np.floor(float(rois[n, 2]) + 0.5) * scale - 0.5
            ew = (np.floor(float(rois[n, 3]) + 0.5) + 1.0) * scale - 0.5
            eh = (np.floor(float(rois[n, 4]) + 0.5) + 1.0) * scale - 0.5
            rw, rh = max(ew - sw, 0.1), max(eh - sh, 0.1)
            bw, bh = rw / P, rh / P
            subw, subh = bw / S, bh / S
            for ctop in range(D):
                cls = ctop // ch_each
                for ph in range(P):
                    for pw in range(P):
                        part_h = int(np.floor(ph / P * part))
                        part_w = int(np.floor(pw / P * part))
                        tx = 0.0 if no_trans else \
                            trans[n, cls * 2, part_h, part_w] * std
                        ty = 0.0 if no_trans else \
                            trans[n, cls * 2 + 1, part_h, part_w] * std
                        ws = pw * bw + sw + tx * rw
                        hs = ph * bh + sh + ty * rh
                        gw = min(max(int(np.floor(pw * G / P)), 0), G - 1)
                        gh = min(max(int(np.floor(ph * G / P)), 0), G - 1)
                        c = (ctop * G + gh) * G + gw
                        acc, cnt = 0.0, 0
                        for ih in range(S):
                            for iw in range(S):
                                x = ws + iw * subw
                                y = hs + ih * subh
                                if x < -0.5 or x > W - 0.5 or \
                                   y < -0.5 or y > H - 0.5:
                                    continue
                                x = min(max(x, 0.0), W - 1.0)
                                y = min(max(y, 0.0), H - 1.0)
                                x0, x1 = int(np.floor(x)), int(np.ceil(x))
                                y0, y1 = int(np.floor(y)), int(np.ceil(y))
                                dx, dy = x - x0, y - y0
                                f = feats[b, :, :, c]
                                acc += ((1 - dx) * (1 - dy) * f[y0, x0]
                                        + (1 - dx) * dy * f[y1, x0]
                                        + dx * (1 - dy) * f[y0, x1]
                                        + dx * dy * f[y1, x1])
                                cnt += 1
                        out[n, ctop, ph, pw] = acc / cnt if cnt else 0.0
        return out

    def test_with_trans_and_groups(self):
        rng = np.random.RandomState(3)
        P, D, G, S, std, scale = 3, 4, 2, 2, 0.1, 0.5
        C = D * G * G
        feats = rng.randn(2, 12, 14, C).astype(np.float32)
        rois = np.array([[0, 2.0, 2.0, 20.0, 16.0],
                         [1, -4.0, 1.0, 30.0, 30.0],   # extends past image
                         [0, 6.3, 7.8, 9.2, 11.9],
                         [0, 2.5, 3.5, 18.5, 15.5]],   # exact .5: C round up
                        np.float32)
        trans = (rng.randn(4, 2, P, P) * 2).astype(np.float32)  # 1 class
        got = np.asarray(deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), jnp.asarray(trans),
            P, scale, D, False, group_size=G, sample_per_part=S,
            trans_std=std))
        want = self._oracle(feats, rois, trans, P, scale, D, False, G, P, S,
                            std).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_no_trans_multiclass_channels(self):
        rng = np.random.RandomState(4)
        P, D, S, scale = 4, 6, 3, 0.25
        feats = rng.randn(1, 10, 10, D).astype(np.float32)
        rois = np.array([[0, 0.0, 0.0, 36.0, 36.0]], np.float32)
        got = np.asarray(deform_roi_pool(
            jnp.asarray(feats), jnp.asarray(rois), None, P, scale, D, True,
            sample_per_part=S))
        want = self._oracle(feats, rois, None, P, scale, D, True, 1, P, S,
                            0.0).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_grad_flows_to_trans(self):
        import jax
        rng = np.random.RandomState(5)
        feats = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
        rois = jnp.asarray(np.array([[0, 1.0, 1.0, 6.0, 6.0]], np.float32))
        trans = jnp.asarray(rng.randn(1, 2, 2, 2).astype(np.float32) * 0.1)
        g = jax.grad(lambda t: deform_roi_pool(
            feats, rois, t, 2, 1.0, 2, False, trans_std=0.5).sum())(trans)
        assert np.abs(np.asarray(g)).sum() > 0


class TestDeformRoIPoolingPack:
    def test_zero_init_equals_plain_psroi(self):
        """Zero-init offset FC -> Pack output == no-trans pooling
        (deform_pool.py:144-145 zero-inits the last FC)."""
        import jax
        from sipmask_tpu.ops.roi import (DeformRoIPoolingPack,
                                         ModulatedDeformRoIPoolingPack)
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
        rois = jnp.asarray(np.array([[0, 2, 2, 12, 12]], np.float32))
        plain = deform_roi_pool(feats, rois, None, 7, 0.5, 4, True)
        m = DeformRoIPoolingPack(spatial_scale=0.5, out_size=7,
                                 out_channels=4, trans_std=0.1)
        out = m.apply(m.init(jax.random.PRNGKey(0), feats, rois), feats, rois)
        np.testing.assert_allclose(np.asarray(out), np.asarray(plain),
                                   rtol=1e-6, atol=1e-6)
        mm = ModulatedDeformRoIPoolingPack(spatial_scale=0.5, out_size=7,
                                           out_channels=4, trans_std=0.1)
        out2 = mm.apply(mm.init(jax.random.PRNGKey(0), feats, rois),
                        feats, rois)
        # zero-init mask FC -> sigmoid(0) = 0.5 scaling
        np.testing.assert_allclose(np.asarray(out2), np.asarray(plain) * 0.5,
                                   rtol=1e-6, atol=1e-6)
