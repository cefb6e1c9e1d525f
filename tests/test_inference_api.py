"""Inference API tests: sync + async single-image detectors
(mmdet/apis/inference.py + tests/test_async.py analogs)."""

import asyncio

import numpy as np
import pytest

from sipmask_tpu.apis.inference import (init_detector, inference_detector,
                                        async_inference_detector)
from sipmask_tpu.config import get_config, _r


@pytest.fixture(scope="module")
def small_det():
    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2)
    cfg = _r(cfg, "data", fixed_size=(128, 128), keep_ratio=False)
    return init_detector(cfg)


def _img(seed=0, h=96, w=144):
    return (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)


class TestInferenceAPI:
    def test_sync(self, small_det):
        r = inference_detector(small_det, _img())
        assert set(r) == {"boxes", "scores", "labels", "masks"}
        n = len(r["boxes"])
        assert r["masks"].shape[0] == n
        assert r["masks"].shape[1:] == (96, 144)  # ori-shape masks

    def test_async_matches_sync(self, small_det):
        img = _img(1)
        want = inference_detector(small_det, img)
        got = asyncio.run(async_inference_detector(small_det, img))
        for k in ("boxes", "scores", "labels"):
            np.testing.assert_array_equal(got[k], want[k])
        np.testing.assert_array_equal(got["masks"], want["masks"])

    def test_async_concurrent(self, small_det):
        imgs = [_img(s) for s in range(4)]

        async def run_all():
            return await asyncio.gather(
                *[async_inference_detector(small_det, im) for im in imgs])

        results = asyncio.run(run_all())
        wants = [inference_detector(small_det, im) for im in imgs]
        for got, want in zip(results, wants):
            np.testing.assert_array_equal(got["scores"], want["scores"])


class TestRescoringWeightSwap:
    def test_new_variables_change_rescored_output(self):
        """Regression: rescore_fn once closed over self.variables, baking
        the rescoring tower weights into the first-traced executable, so a
        later load_weights silently kept the old tower. Reassigning
        det.variables must affect mask_scores on the SAME cached jit."""
        import jax
        cfg = get_config("sipmaskpp_r101_fpn_ssd_6x")
        cfg = _r(cfg, "model.backbone", depth=50,
                 stage_with_dcn=(False, False, False, False))
        cfg = _r(cfg, "model.fpn", out_channels=32)
        cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
                 stacked_convs=2)
        # rescoring tower = 6 stride-2 VALID convs; needs mask input
        # (fixed_size/2) >= 128 to survive to the 1x1 head
        cfg = _r(cfg, "data", fixed_size=(256, 256), keep_ratio=False)
        det = init_detector(cfg)
        assert cfg.model.head.rescoring
        img = _img(7)
        r1 = inference_detector(det, img)
        # perturb ONLY the rescoring tower params
        params = jax.tree_util.tree_map(lambda x: x, det.variables["params"])
        resc_keys = [k for k in params if "rescor" in k.lower()]
        assert resc_keys, f"no rescoring params found: {list(params)[:8]}"
        for k in resc_keys:
            params[k] = jax.tree_util.tree_map(
                lambda x: x + 1.0 if x.dtype.kind == "f" else x, params[k])
        det.variables = {"params": params,
                         "constants": det.variables.get("constants", {})}
        r2 = inference_detector(det, img)
        assert "mask_scores" in r1  # SipMask++ exposes segm ranking scores
        if len(r1["mask_scores"]) and len(r2["mask_scores"]):
            assert not np.array_equal(r1["mask_scores"], r2["mask_scores"])
