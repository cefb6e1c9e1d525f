"""StableHLO export roundtrip — the deliverable the reference tests with
its ONNX driver (SipMask-benchmark/onnx/test_fcos_onnx_model.py): export
the jitted inference graph, serialize, deserialize, EXECUTE, and assert
the reloaded module reproduces the live jit outputs."""

import numpy as np
import pytest
import jax

from sipmask_tpu.config import get_config, _r


@pytest.fixture(scope="module")
def exported_bundle():
    from tools.export import export_inference

    # RT preset at a small fixed size keeps the CPU compile tractable while
    # exercising the full detect->mask decode graph (fast_nms + assembly)
    cfg = get_config("sipmask_r50_fpn_ssd_6x")
    cfg = _r(cfg, "model.test", nms_pre=50, max_per_img=10)
    exported, infer, sample = export_inference(cfg, shape=(128, 128),
                                               batch=1)
    return exported, infer, sample


class TestExportRoundtrip:
    def test_serialize_deserialize_execute_matches_jit(self, exported_bundle):
        from jax import export as jax_export

        exported, infer, sample = exported_bundle
        blob = exported.serialize()
        assert len(blob) > 1000
        reloaded = jax_export.deserialize(blob)
        got = jax.jit(reloaded.call)(*sample)
        want = jax.jit(infer)(*sample)
        flat_g, tree_g = jax.tree_util.tree_flatten(got)
        flat_w, tree_w = jax.tree_util.tree_flatten(want)
        assert tree_g == tree_w
        for a, b in zip(flat_g, flat_w):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5)

    def test_in_avals_stable(self, exported_bundle):
        exported, _, sample = exported_bundle
        # the exported signature matches the sample args (deployment
        # contract: fixed shapes, no dynamic dims)
        flat_s, _ = jax.tree_util.tree_flatten(sample)
        assert len(exported.in_avals) == len(flat_s)
        for av, s in zip(exported.in_avals, flat_s):
            assert tuple(av.shape) == tuple(np.shape(s))
