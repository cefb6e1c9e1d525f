"""Golden-number regression tests: deterministic end-to-end loss values at a
fixed seed (the reference has none — SURVEY.md §4 'no golden-number
regression tests'; these guard this framework's refactors instead).

Recorded on the CPU backend (fp32, highest matmul precision). If an
intentional change shifts the math, re-record with:
  SIPMASK_RECORD_GOLDEN=1 python -m pytest tests/test_golden.py -s
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN_FILE = os.path.join(os.path.dirname(__file__), "golden.json")


def _compute():
    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.models import build_model
    from sipmask_tpu.models.loss import compute_losses
    from sipmask_tpu.utils import demo_batch

    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2)
    model = build_model(cfg.model)
    batch_np = demo_batch(batch_size=2, height=64, width=96, max_gts=8,
                          seed=7)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(3), batch["images"][:1])

    @jax.jit
    def losses_fn(variables, batch):
        out = model.apply(variables, batch["images"])
        return compute_losses(out, batch, cfg.model.head, max_pos=16)

    losses = losses_fn(variables, batch)
    return {k: float(v) for k, v in losses.items()}


class TestGoldenLosses:
    def test_losses_match_recorded(self):
        got = _compute()
        if os.environ.get("SIPMASK_RECORD_GOLDEN"):
            with open(GOLDEN_FILE, "w") as f:
                json.dump(got, f, indent=1, sort_keys=True)
            pytest.skip(f"recorded {GOLDEN_FILE}: {got}")
        if not os.path.exists(GOLDEN_FILE):
            pytest.skip("no golden file recorded yet")
        want = json.load(open(GOLDEN_FILE))
        assert set(got) == set(want), (got, want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=2e-3, atol=1e-5,
                                       err_msg=k)


def _compute_synthetic_outputs():
    """Golden on handcrafted head outputs with realistic (non-degenerate)
    box predictions so the mask/rescoring paths contribute."""
    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.models.loss import compute_losses
    from sipmask_tpu.utils import demo_batch

    cfg = get_config("sipmask_r50_fpn_gn_1x")
    head = _r(cfg, "model.head", num_classes=8).model.head
    rng = np.random.RandomState(11)
    b, hw = 2, (64, 96)
    sizes = [(hw[0] // s, hw[1] // s) for s in head.strides]
    out = dict(
        cls_scores=[jnp.asarray(rng.randn(b, h, w, 8).astype(np.float32))
                    for h, w in sizes],
        bbox_preds=[jnp.asarray(
            (rng.rand(b, h, w, 4) * 24 + 8).astype(np.float32))
            for h, w in sizes],
        centernesses=[jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32))
                      for h, w in sizes],
        cof_preds=[jnp.asarray(
            rng.randn(b, h, w, 128).astype(np.float32) * 0.1)
            for h, w in sizes],
        feat_masks=jnp.asarray(
            rng.randn(b, hw[0] // 2, hw[1] // 2, 32).astype(np.float32)),
    )
    batch_np = demo_batch(batch_size=b, height=hw[0], width=hw[1], max_gts=8,
                          seed=13, num_classes=8)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    losses = jax.jit(lambda o, bt: compute_losses(o, bt, head, max_pos=16)
                     )(out, batch)
    return {k: float(v) for k, v in losses.items()}


GOLDEN_FILE2 = os.path.join(os.path.dirname(__file__), "golden_loss.json")


class TestGoldenLossMath:
    def test_loss_math_matches_recorded(self):
        got = _compute_synthetic_outputs()
        assert got["loss_mask"] > 0, "synthetic case must exercise mask loss"
        if os.environ.get("SIPMASK_RECORD_GOLDEN"):
            with open(GOLDEN_FILE2, "w") as f:
                json.dump(got, f, indent=1, sort_keys=True)
            pytest.skip(f"recorded {GOLDEN_FILE2}: {got}")
        if not os.path.exists(GOLDEN_FILE2):
            pytest.skip("no golden file recorded yet")
        want = json.load(open(GOLDEN_FILE2))
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=2e-3,
                                       atol=1e-5, err_msg=k)
