"""Gradient + SGD-trajectory parity vs the reference's torch autograd.

Closes VERDICT round-3 weak item 4: every earlier cross-framework test
pinned forward values (head outputs, loss scalars, decoded detections);
nothing compared ``jax.grad`` against torch autograd. A sign/scale bug in
any custom VJP that preserves loss values would have passed the suite and
silently missed AP at convergence.

What runs here (CPU, fp32, converted weights, identical batch):

1. whole-model gradient parity: the reference's full ResNet50-caffe ->
   FPN -> SipMaskHead -> head.loss stack (mmdet/models/backbones/
   resnet.py:13-521, necks/fpn.py:10-178, anchor_heads/sipmask_head.py:
   289-486) under ``total.backward()`` vs ``jax.grad`` of the same total
   loss through the JAX model — EVERY parameter gradient compared, the
   torch grads mapped into the flax tree by the same converter the
   weights use (gradients transform exactly like weights: conv
   transposes, name mapping; frozen-BN folding only touches constants,
   which carry no gradient).
2. a 10-step SGD trajectory: momentum 0.9, weight decay 1e-4 with the
   reference's paramwise options (bias_lr_mult=2, bias_decay_mult=0,
   config sipmask_r50_caffe_fpn_gn_1x.py:108-113), constant warmup then
   a x0.1 step drop mid-run (mmcv LrUpdaterHook math) — per-step losses
   and final parameters must track torch.optim.SGD.
3. rescoring-tower gradient parity (SipMask++ ``loss_iou``,
   sipmask_head.py:466-486) through the converted six-conv tower.

The frozen stem/stage-1 check rides along: torch ``requires_grad=False``
params are mapped to zero grads, which must equal the zeros produced by
the backbone's ``stop_gradient`` (models/resnet.py:134-135).

On CPU these cover the XLA loss path; the fused Pallas kernels' backwards
are pinned against that same XLA path in tests/test_ops.py (TestFusedMaskBce,
deform-gather gradient tests), closing the chain
torch autograd == XLA grad == Pallas grad.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_loader import (reference_available,  # noqa: E402
                              load_reference_detector, load_reference)
from sipmask_tpu.config import get_config, _r  # noqa: E402
from sipmask_tpu.models import build_model  # noqa: E402
from sipmask_tpu.models.loss import compute_losses  # noqa: E402
from sipmask_tpu.utils import demo_batch  # noqa: E402
from sipmask_tpu.utils.torch_convert import torch_to_flax  # noqa: E402

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not present")

MODULE_PREFIXES = (("backbone",), ("neck",), ("bbox_head",))


def _randomize(backbone, neck, head, seed=42):
    """Same perturbation as test_full_model_parity: nontrivial BN stats,
    GN affine, deform offsets, lifted cls scores, positive box extents."""
    g = torch.Generator().manual_seed(seed)
    for m in (backbone, neck, head):
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
                mod.weight.data.uniform_(0.8, 1.2, generator=g)
                mod.bias.data.normal_(0, 0.1, generator=g)
            elif isinstance(mod, torch.nn.GroupNorm):
                mod.weight.data.uniform_(0.8, 1.2, generator=g)
                mod.bias.data.normal_(0, 0.1, generator=g)
    head.feat_align.conv_offset.weight.data.normal_(0, 0.2, generator=g)
    head.fcos_cls.bias.data.normal_(0, 1.5, generator=g)
    head.fcos_reg.bias.data.normal_(1.0, 0.2, generator=g)
    for s in head.scales:
        s.scale.data.uniform_(0.7, 1.5, generator=g)


def _gt_lists(batch_np):
    """Exact-length torch gt lists from the padded demo batch (the same
    construction as TestFullLossParity)."""
    gt_bboxes, gt_labels, gt_masks_list = [], [], []
    for i in range(batch_np["gt_labels"].shape[0]):
        n = int((batch_np["gt_labels"][i] > 0).sum())
        gt_bboxes.append(torch.from_numpy(batch_np["gt_bboxes"][i, :n]))
        gt_labels.append(torch.from_numpy(
            batch_np["gt_labels"][i, :n].astype(np.int64)))
        m = batch_np["gt_masks"][i, :n].astype(np.float32)
        gt_masks_list.append(m.repeat(2, axis=1).repeat(2, axis=2))
    return gt_bboxes, gt_labels, gt_masks_list


def _torch_total_loss(backbone, neck, head, img_t, gts):
    gt_bboxes, gt_labels, gt_masks_list = gts
    feats = neck(backbone(img_t))
    outs = head(feats)
    losses = head.loss(*outs, gt_bboxes, gt_labels,
                       img_metas=[{}] * img_t.shape[0], cfg=None,
                       gt_masks_list=gt_masks_list)
    return sum(losses.values()), {k: float(v) for k, v in losses.items()}


def _torch_grad_tree(modules, sd_values, depth=50):
    """Map torch .grad tensors into the flax param-tree layout via the
    weight converter (valid because every param conversion is a pure
    transpose/rename). requires_grad=False params -> zeros (must match the
    stop_gradient zeros on the JAX side); buffers keep their real values
    (they only feed the constants tree, which carries no gradient)."""
    sd_g = {}
    for prefix, m in modules:
        params = dict(m.named_parameters())
        for k, v in m.state_dict(keep_vars=True).items():
            kk = f"{prefix}.{k}"
            if k in params:
                p = params[k]
                if p.requires_grad and p.grad is not None:
                    sd_g[kk] = p.grad.detach().numpy()
                else:
                    sd_g[kk] = np.zeros_like(p.detach().numpy())
            else:
                sd_g[kk] = sd_values[kk]
    grads, _ = torch_to_flax(sd_g, depth=depth)
    return grads


def _assert_tree_close(got, want, rtol=2e-3, what="grad", min_nonzero=50):
    from flax import traverse_util
    fg = traverse_util.flatten_dict(got)
    fw = traverse_util.flatten_dict(want)
    assert set(fg) == set(fw), (
        f"param-tree mismatch: only-jax={sorted(set(fg) - set(fw))[:5]} "
        f"only-torch={sorted(set(fw) - set(fg))[:5]}")
    n_nonzero = 0
    for path in sorted(fw):
        g = np.asarray(fg[path], np.float32)
        w = np.asarray(fw[path], np.float32)
        scale = max(float(np.abs(w).max()), 1e-3)
        np.testing.assert_allclose(
            g, w, rtol=rtol, atol=rtol * scale,
            err_msg=f"{what} mismatch at {'/'.join(path)}")
        if np.abs(w).max() > 0:
            n_nonzero += 1
    # the comparison must not be trivially passing on a zero tree
    assert n_nonzero >= min_nonzero, \
        f"only {n_nonzero} nonzero leaves compared"


@pytest.fixture(scope="module")
def setup():
    d = load_reference_detector()
    torch.manual_seed(0)
    backbone, neck, head = d["make_r50_gn_detector"](num_fg_classes=8)
    _randomize(backbone, neck, head)
    # freeze exactly what the reference freezes during training
    # (ResNet._freeze_stages: stem + stage 1 requires_grad=False); BN stays
    # in eval (norm_eval) which the folded frozen-BN constants reproduce
    backbone._freeze_stages()
    backbone.eval(); neck.eval(); head.eval()

    modules = (("backbone", backbone), ("neck", neck), ("bbox_head", head))
    sd = {f"{p}.{k}": v.detach().numpy()
          for p, m in modules for k, v in m.state_dict().items()}
    params, constants = torch_to_flax(sd, depth=50)

    batch_np = demo_batch(batch_size=2, height=64, width=96, max_gts=8,
                          seed=13, num_classes=8)
    img_t = torch.from_numpy(
        np.moveaxis(batch_np["images"], -1, 1).copy())
    gts = _gt_lists(batch_np)

    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.head", num_classes=8)
    model = build_model(cfg.model)

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def loss_fn(p):
        out = model.apply({"params": p, "constants": constants},
                          batch["images"])
        losses = compute_losses(out, batch, cfg.model.head, max_pos=129)
        losses = {k: v for k, v in losses.items() if k.startswith("loss")}
        return sum(jnp.asarray(v) for v in losses.values()), losses

    return dict(modules=modules, sd=sd, params=params, constants=constants,
                img_t=img_t, gts=gts, cfg=cfg, model=model, batch=batch,
                loss_fn=loss_fn)


class TestWholeModelGradParity:
    def test_every_parameter_gradient_matches(self, setup):
        backbone = dict(setup["modules"])["backbone"]
        neck = dict(setup["modules"])["neck"]
        head = dict(setup["modules"])["bbox_head"]
        for _, m in setup["modules"]:
            m.zero_grad(set_to_none=True)
        total_t, losses_t = _torch_total_loss(backbone, neck, head,
                                              setup["img_t"], setup["gts"])
        total_t.backward()
        grads_want = _torch_grad_tree(setup["modules"], setup["sd"])

        (total_j, losses_j), grads_got = jax.jit(jax.value_and_grad(
            setup["loss_fn"], has_aux=True))(setup["params"])

        # the loss itself must agree THROUGH the real model (the earlier
        # loss-parity test used handcrafted head outputs)
        assert float(losses_t["loss_mask"]) > 0
        for k, v in losses_t.items():
            np.testing.assert_allclose(float(losses_j[k]), v, rtol=5e-4,
                                       atol=1e-6, err_msg=k)
        _assert_tree_close(grads_got, grads_want, rtol=2e-3)

    def test_frozen_stage_gradients_are_zero(self, setup):
        _, grads = jax.jit(jax.value_and_grad(
            setup["loss_fn"], has_aux=True))(setup["params"])
        bb = grads["backbone"]
        frozen = [k for k in bb if k == "conv1" or k.startswith("layer1")]
        assert frozen, list(bb)[:8]
        for k in frozen:
            leaves = jax.tree_util.tree_leaves(bb[k])
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves), k
        # and something outside the frozen set is nonzero
        assert any(float(jnp.abs(l).max()) > 0 for l in
                   jax.tree_util.tree_leaves(grads["backbone"]["layer2_0"]))


class TestSGDTrajectoryParity:
    N_STEPS = 10

    def _lr_at(self, optim_cfg, steps_per_epoch, step):
        base = optim_cfg.lr * (
            0.1 ** sum(step >= e * steps_per_epoch
                       for e in optim_cfg.lr_steps))
        if step < optim_cfg.warmup_iters:
            return optim_cfg.lr * optim_cfg.warmup_ratio
        return base

    def test_ten_step_losses_and_params_track_torch(self, setup):
        """Same converted weights + same batch, 10 SGD steps on each side.
        warmup_iters=4 / step drop at global step 6 so the run crosses
        both schedule regimes (mmdet/apis/train.py:59-81 semantics)."""
        from sipmask_tpu.train.optim import make_optimizer

        steps_per_epoch = 3
        cfg = _r(setup["cfg"], "train.optim", warmup_iters=4, lr_steps=(2,))

        # ---- torch: fresh param copies (the fixture tensors must stay
        # pristine for other tests), reference paramwise groups
        d = load_reference_detector()
        torch.manual_seed(0)
        backbone, neck, head = d["make_r50_gn_detector"](num_fg_classes=8)
        modules = (("backbone", backbone), ("neck", neck),
                   ("bbox_head", head))
        for (_, m_new), (_, m_old) in zip(modules, setup["modules"]):
            m_new.load_state_dict(m_old.state_dict())
        backbone._freeze_stages()
        backbone.eval(); neck.eval(); head.eval()

        decay_params, bias_params = [], []
        for _, m in modules:
            for name, p in m.named_parameters():
                if not p.requires_grad:
                    continue
                (bias_params if name.endswith(".bias")
                 else decay_params).append(p)
        opt = torch.optim.SGD(
            [dict(params=decay_params, lr=cfg.train.optim.lr,
                  weight_decay=cfg.train.optim.weight_decay),
             dict(params=bias_params,
                  lr=cfg.train.optim.lr * cfg.train.optim.bias_lr_mult,
                  weight_decay=cfg.train.optim.weight_decay
                  * cfg.train.optim.bias_decay_mult)],
            momentum=cfg.train.optim.momentum)

        losses_t = []
        for step in range(self.N_STEPS):
            lr = self._lr_at(cfg.train.optim, steps_per_epoch, step)
            opt.param_groups[0]["lr"] = lr
            opt.param_groups[1]["lr"] = lr * cfg.train.optim.bias_lr_mult
            opt.zero_grad(set_to_none=True)
            total, _ = _torch_total_loss(backbone, neck, head,
                                         setup["img_t"], setup["gts"])
            total.backward()
            opt.step()
            losses_t.append(float(total))

        # ---- jax: make_optimizer (multi_transform labels + schedule)
        params = jax.tree_util.tree_map(jnp.asarray, setup["params"])
        tx = make_optimizer(cfg.train.optim, steps_per_epoch, params,
                            frozen_stages=1)
        opt_state = tx.init(params)

        @jax.jit
        def step_fn(params, opt_state):
            (total, _), grads = jax.value_and_grad(
                setup["loss_fn"], has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                            updates)
            return params, opt_state, total

        losses_j = []
        for _ in range(self.N_STEPS):
            params, opt_state, total = step_fn(params, opt_state)
            losses_j.append(float(total))

        # loss curves agree step by step (error compounds; loosen with t)
        for t, (lj, lt) in enumerate(zip(losses_j, losses_t)):
            np.testing.assert_allclose(
                lj, lt, rtol=1e-3 + 3e-4 * t,
                err_msg=f"loss diverged at step {t}: jax={losses_j} "
                        f"torch={losses_t}")
        assert losses_t[-1] < losses_t[0]  # the run actually trains

        # final parameters agree (converted through the same mapping)
        sd_final = {f"{p}.{k}": v.detach().numpy()
                    for p, m in modules for k, v in m.state_dict().items()}
        params_want, _ = torch_to_flax(sd_final, depth=50)
        _assert_tree_close(jax.tree_util.tree_map(np.asarray, params),
                           params_want, rtol=5e-3, what="param")


class TestRescoringGradParity:
    def test_tower_gradients_match(self):
        """loss_iou gradient through the converted six-conv rescoring
        tower (sipmask_head.py:466-486): torch autograd on the reference's
        own tower vs jax.grad on RescoringHead params."""
        from sipmask_tpu.models.sipmask_head import RescoringHead

        ref = load_reference()
        torch.manual_seed(2)
        head = ref["make_head"](num_fg_classes=8, center_sampling=True,
                                rescoring_flag=True)
        g = torch.Generator().manual_seed(3)
        for m in head.convs_scoring:
            m.conv.weight.data.normal_(0, 0.05, generator=g)
            m.conv.bias.data.normal_(0, 0.2, generator=g)
        head.mask_scoring.weight.data.normal_(0, 0.2, generator=g)
        head.mask_scoring.bias.data.normal_(0, 0.3, generator=g)

        sizes = [(32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]
        rng = np.random.RandomState(23)
        b = 2
        outs = dict(
            cls_scores=[rng.randn(b, h, w, 8).astype(np.float32)
                        for h, w in sizes],
            bbox_preds=[(rng.rand(b, h, w, 4) * 60 + 20).astype(np.float32)
                        for h, w in sizes],
            centernesses=[rng.randn(b, h, w, 1).astype(np.float32)
                          for h, w in sizes],
            cof_preds=[(rng.randn(b, h, w, 128) * 0.1).astype(np.float32)
                       for h, w in sizes],
            feat_masks=rng.randn(b, 128, 128, 32).astype(np.float32),
        )
        batch_np = demo_batch(batch_size=b, height=256, width=256,
                              max_gts=8, seed=29, num_classes=8)
        t = lambda x: torch.from_numpy(np.moveaxis(x, -1, 1).copy())
        gts = _gt_lists(batch_np)

        gt_bboxes, gt_labels, gt_masks_list = gts
        losses = head.loss(
            [t(x) for x in outs["cls_scores"]],
            [t(x) for x in outs["bbox_preds"]],
            [t(x) for x in outs["centernesses"]],
            [t(x) for x in outs["cof_preds"]],
            t(outs["feat_masks"]), gt_bboxes, gt_labels,
            img_metas=[{}] * b, cfg=None, gt_masks_list=gt_masks_list)
        assert float(losses["loss_iou"]) > 0
        losses["loss_iou"].backward()
        sd_g = {}
        for k, v in head.state_dict(keep_vars=True).items():
            if "scoring" not in k:
                continue
            sd_g[f"bbox_head.{k}"] = (
                v.grad.detach().numpy() if v.grad is not None
                else np.zeros_like(v.detach().numpy()))
        grads_want, _ = torch_to_flax(sd_g)

        sd = {f"bbox_head.{k}": v.detach().numpy()
              for k, v in head.state_dict().items() if "scoring" in k}
        params, _ = torch_to_flax(sd)
        cfg = get_config("sipmask_r50_fpn_gn_1x")
        head_cfg = _r(cfg, "model.head", num_classes=8,
                      rescoring=True).model.head
        rs = RescoringHead(num_classes=8)
        outs_j = {k: ([jnp.asarray(x) for x in v] if isinstance(v, list)
                      else jnp.asarray(v)) for k, v in outs.items()}
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        def loss_iou(rp):
            rescore_fn = lambda m: rs.apply({"params": rp}, m)
            losses = compute_losses(outs_j, batch, head_cfg, max_pos=129,
                                    rescore_fn=rescore_fn)
            return losses["loss_iou"]

        grads_got = jax.jit(jax.grad(loss_iou))(params["rescoring"])
        _assert_tree_close(grads_got, grads_want["rescoring"], rtol=2e-3,
                           min_nonzero=10)
