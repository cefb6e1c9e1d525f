"""End-to-end model smoke tests on tiny inputs (the reference's
test_forward.py pattern): build a real detector, run train loss and decode.
Includes the SipMask case the reference never registered (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sipmask_tpu.config import get_config, _r
from sipmask_tpu.models import build_model
from sipmask_tpu.models.loss import compute_losses
from sipmask_tpu.models.decode import decode_batch
from sipmask_tpu.utils import demo_batch


def _tiny_cfg(preset="sipmask_r50_fpn_gn_1x", **head_kw):
    cfg = get_config(preset)
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2, **head_kw)
    cfg = _r(cfg, "model.test", nms_pre=50, max_per_img=10, fast_nms_top_k=20)
    return cfg


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = _tiny_cfg()
    model = build_model(cfg.model)
    batch = demo_batch(batch_size=2, height=64, width=64)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(batch["images"]))
    fwd = jax.jit(model.apply)
    return cfg, model, variables, batch, fwd


class TestForward:
    def test_output_shapes(self, model_and_vars):
        cfg, model, variables, batch, fwd = model_and_vars
        out = fwd(variables, jnp.asarray(batch["images"]))
        # P3..P7 for 64x64 input: 8,4,2,1,1
        sizes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        for lvl, (h, w) in enumerate(sizes):
            assert out["cls_scores"][lvl].shape == (2, h, w, 80)
            assert out["bbox_preds"][lvl].shape == (2, h, w, 4)
            assert out["centernesses"][lvl].shape == (2, h, w, 1)
            assert out["cof_preds"][lvl].shape == (2, h, w, 128)
        assert out["feat_masks"].shape == (2, 32, 32, 32)

    def test_loss_finite_and_structure(self, model_and_vars):
        cfg, model, variables, batch, fwd = model_and_vars
        loss_jit = jax.jit(lambda o, b: compute_losses(
            o, b, cfg.model.head, max_pos=16))
        out = fwd(variables, jnp.asarray(batch["images"]))
        losses = loss_jit(out, {k: jnp.asarray(v) for k, v in batch.items()})
        assert set(losses) == {"loss_cls", "loss_bbox", "loss_centerness",
                               "loss_mask"}
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        assert float(losses["loss_cls"]) > 0

    def test_empty_gt_zero_box_loss_nonzero_cls(self, model_and_vars):
        # reference test_heads.py pattern: empty gt => zero box/mask loss
        cfg, model, variables, batch, fwd = model_and_vars
        out = fwd(variables, jnp.asarray(batch["images"]))
        empty = dict(batch)
        empty["gt_labels"] = np.zeros_like(batch["gt_labels"])
        loss_jit = jax.jit(lambda o, b: compute_losses(
            o, b, cfg.model.head, max_pos=16))
        losses = loss_jit(out, {k: jnp.asarray(v) for k, v in empty.items()})
        assert float(losses["loss_bbox"]) == 0.0
        assert float(losses["loss_mask"]) == 0.0
        assert float(losses["loss_cls"]) > 0

    def test_grads_finite(self, model_and_vars):
        cfg, model, variables, batch, fwd = model_and_vars
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        def loss_fn(params):
            out = model.apply(
                {"params": params, "constants": variables["constants"]},
                jb["images"])
            # at random init the decoded boxes are degenerate (area<1), which
            # faithfully zeroes the mask loss like the reference; offset the
            # (detached-in-mask-path) box preds to exercise the mask branch
            out = dict(out, bbox_preds=[b + 16.0 for b in out["bbox_preds"]])
            losses = compute_losses(out, jb, cfg.model.head, max_pos=16)
            return sum(losses.values())

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # the SP coefficient branch must receive gradient through mask loss
        g_cof = grads["head"]["sip_cof"]["kernel"]
        assert np.abs(np.asarray(g_cof)).sum() > 0

    def test_decode_shapes_and_validity(self, model_and_vars):
        cfg, model, variables, batch, fwd = model_and_vars
        out = fwd(variables, jnp.asarray(batch["images"]))
        dec_jit = jax.jit(lambda o, s, f: decode_batch(o, s, f, cfg.model))
        dets = dec_jit(out, jnp.asarray(batch["img_shapes"]),
                       jnp.asarray(batch["scale_factors"]))
        d = cfg.model.test.max_per_img
        assert dets["boxes"].shape == (2, d, 4)
        assert dets["masks"].shape == (2, d, 32, 32)
        assert dets["labels"].shape == (2, d)
        m = np.asarray(dets["masks"])
        assert ((m >= 0) & (m <= 1)).all()


class TestSSDVariant:
    def test_fast_nms_decode(self):
        cfg = _tiny_cfg("sipmask_r50_fpn_ssd_6x")
        model = build_model(cfg.model)
        batch = demo_batch(batch_size=1, height=64, width=64)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                        jnp.asarray(batch["images"]))

        @jax.jit
        def infer(variables, images, shapes, sf):
            out = model.apply(variables, images)
            return decode_batch(out, shapes, sf, cfg.model)

        dets = infer(variables, jnp.asarray(batch["images"]),
                     jnp.asarray(batch["img_shapes"]),
                     jnp.asarray(batch["scale_factors"]))
        assert dets["boxes"].shape[1] == cfg.model.test.max_per_img
        assert np.isfinite(np.asarray(dets["scores"])).all()


class TestResNeXt:
    def test_grouped_bottleneck_shapes(self):
        """ResNeXt-50 32x4d: grouped conv2 with width=planes*2."""
        import jax
        import jax.numpy as jnp
        from sipmask_tpu.models.resnet import ResNet
        m = ResNet(depth=50, groups=32, base_width=4)
        v = jax.jit(m.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
        outs = jax.jit(m.apply)(v, jnp.zeros((1, 64, 64, 3)))
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
        k = v["params"]["layer1_0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 4, 128)  # 128 width, 32 groups -> in 4

    def test_x101_preset_builds(self):
        from sipmask_tpu.config import get_config
        cfg = get_config("sipmask_x101_fpn_gn_ms_2x")
        assert cfg.model.backbone.groups == 32
        assert cfg.model.backbone.depth == 101


class TestHRNet:
    def test_branch_shapes_and_hrfpn_levels(self):
        import jax
        import jax.numpy as jnp
        from sipmask_tpu.models.hrnet import HRNet, HRFPN
        m = HRNet(width=18)
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = jax.jit(m.apply)(v, x)
        assert [o.shape[1:] for o in outs] == [
            (16, 16, 18), (8, 8, 36), (4, 4, 72), (2, 2, 144)]
        neck = HRFPN(out_channels=32, num_outs=5)
        vn = jax.jit(neck.init)(jax.random.PRNGKey(0), outs)
        levels = jax.jit(neck.apply)(vn, outs)
        # base_pool=1: strides 8..128 -> 8x8 first level on a 64px input
        assert [l.shape[1:3] for l in levels] == [
            (8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        assert all(l.shape[-1] == 32 for l in levels)

    def test_full_detector_with_hrnet_preset(self):
        import jax
        import jax.numpy as jnp
        from sipmask_tpu.config import get_config, _r
        from sipmask_tpu.models import build_model
        cfg = get_config("sipmask_hrnet_w32_fpn_gn_1x")
        cfg = _r(cfg, "model.backbone", hrnet_width=18)
        cfg = _r(cfg, "model.fpn", out_channels=32)
        cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
                 stacked_convs=2)
        model = build_model(cfg.model)
        x = jnp.zeros((1, 64, 64, 3))
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out = jax.jit(model.apply)(v, x)
        assert len(out["cls_scores"]) == 5
        assert out["feat_masks"].shape[1:3] == (32, 32)  # stride-2 grid


class TestSSDVGG:
    def test_output_levels(self):
        import jax
        import jax.numpy as jnp
        from sipmask_tpu.models.ssd_vgg import SSDVGG
        m = SSDVGG(input_size=300)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 300, 300, 3).astype(np.float32))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = jax.jit(m.apply)(v, x)
        # canonical SSD300 pyramid (reference ssd_vgg.py docstring):
        # conv4_3 38x38 (ceil pools), fc7 19x19, extras 10/5/3/1
        assert [o.shape[1:3] for o in outs] == [
            (38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)]
        assert outs[0].shape[-1] == 512 and outs[1].shape[-1] == 1024
        assert [o.shape[-1] for o in outs[2:]] == [512, 256, 256, 256]
        # L2Norm normalizes conv4_3 channel vectors to ~|gamma|
        n = np.linalg.norm(np.asarray(outs[0][0, 0, 0])) / 20.0
        assert 0.5 < n < 2.0


class TestBFP:
    def test_residual_refinement_preserves_shapes(self):
        import jax
        import jax.numpy as jnp
        from sipmask_tpu.models.bfp import BFP
        rng = np.random.RandomState(0)
        feats = tuple(jnp.asarray(rng.randn(1, s, s, 16).astype(np.float32))
                      for s in (32, 16, 8, 4, 2))
        m = BFP(out_channels=16, refine_level=2)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), feats)
        outs = jax.jit(m.apply)(v, feats)
        assert [o.shape for o in outs] == [f.shape for f in feats]
        # residual: output differs from input everywhere
        assert all(float(jnp.abs(o - f).max()) > 0
                   for o, f in zip(outs, feats))


class TestConfigSmoke:
    def test_every_preset_builds_and_is_consistent(self):
        """mmdet test_config.py analog: every named preset constructs and
        its fields are mutually consistent."""
        from sipmask_tpu.config import get_config, list_configs
        from sipmask_tpu.models import build_model
        for name in list_configs():
            cfg = get_config(name)
            assert cfg.name == name
            assert len(cfg.model.head.strides) == cfg.model.fpn.num_outs
            assert len(cfg.model.head.regress_ranges) == \
                len(cfg.model.head.strides)
            if cfg.model.head.ssd_flag:
                assert cfg.model.test.use_fast_nms
            if cfg.model.head.track:
                assert cfg.model.test.use_fast_nms
            build_model(cfg.model)  # module construction (no init)

    def test_unknown_preset_raises_with_known_list(self):
        from sipmask_tpu.config import get_config
        try:
            get_config("nope")
            assert False
        except KeyError as e:
            assert "sipmask_r50_fpn_gn_1x" in str(e)


class TestLayersVJP:
    """Custom VJPs in models/layers.py vs plain autodiff of the same math."""

    def test_group_norm_custom_vjp_matches_autodiff(self):
        from sipmask_tpu.models.layers import group_norm_nhwc, _gn_fwd_impl
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 7, 9, 64).astype(np.float32))
        sc = jnp.asarray(rng.randn(64).astype(np.float32))
        bi = jnp.asarray(rng.randn(64).astype(np.float32))
        dy = jnp.asarray(rng.randn(2, 7, 9, 64).astype(np.float32))
        plain = lambda *a: _gn_fwd_impl(*a, 8, 1e-5)[0]  # autodiff path
        custom = lambda *a: group_norm_nhwc(*a, 8, 1e-5)
        y1, v1 = jax.vjp(plain, x, sc, bi)
        y2, v2 = jax.vjp(custom, x, sc, bi)
        np.testing.assert_allclose(y1, y2, atol=0, rtol=0)
        for a, b, tol in zip(v1(dy), v2(dy), (1e-5, 1e-5, 1e-6)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=tol * float(jnp.abs(a).max()))

    def test_group_norm_custom_vjp_bf16_input(self):
        # bf16 activation, f32 params: cotangent dtypes must match inputs
        from sipmask_tpu.models.layers import group_norm_nhwc
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 5, 6, 32), jnp.bfloat16)
        sc = jnp.ones((32,), jnp.float32)
        bi = jnp.zeros((32,), jnp.float32)
        y, vjp = jax.vjp(lambda *a: group_norm_nhwc(*a, 4, 1e-5), x, sc, bi)
        dx, dsc, dbi = vjp(jnp.ones_like(y))
        assert dx.dtype == jnp.bfloat16
        assert dsc.dtype == jnp.float32 and dbi.dtype == jnp.float32
        assert np.isfinite(np.asarray(dx, np.float32)).all()

    def test_relu_output_vjp_matches_jax_nn(self):
        from sipmask_tpu.models.layers import relu
        x = jnp.asarray(np.r_[-2.0, -0.0, 0.0, 0.5, 3.0], jnp.float32)
        g1 = jax.grad(lambda t: jnp.sum(jax.nn.relu(t) * t))(x)
        g2 = jax.grad(lambda t: jnp.sum(relu(t) * t))(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
