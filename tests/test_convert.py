"""Torch-checkpoint converter roundtrip: every param/constant leaf of the
real R50 model must map to a torch name and back identically (shape layout
transposes included)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from sipmask_tpu.config import get_config, _r
from sipmask_tpu.models import build_model
from sipmask_tpu.utils.torch_convert import torch_to_flax, flax_to_torch_names


def _shaped_tree(tree, seed=0):
    rng = np.random.RandomState(seed)
    flat = traverse_util.flatten_dict(tree)
    out = {k: np.asarray(rng.randn(*v.shape), np.float32)
           for k, v in flat.items()}
    return traverse_util.unflatten_dict(out)


@pytest.mark.parametrize("preset,kw", [
    ("sipmask_r50_fpn_gn_1x", {}),
    ("sipmaskpp_r101_fpn_ssd_6x", {}),
])
def test_roundtrip(preset, kw):
    cfg = get_config(preset)
    model = build_model(cfg.model)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3), jnp.float32))
    params = _shaped_tree(shapes["params"])
    constants = _shaped_tree(shapes["constants"], seed=1)
    if cfg.model.head.rescoring:
        rs = jax.eval_shape(
            lambda r, d: model.init(r, d, method=model.rescore),
            jax.random.PRNGKey(0), jnp.zeros((1, 272, 272, 1)))
        params.update(_shaped_tree(rs["params"], seed=2))

    sd = flax_to_torch_names(params, constants, depth=cfg.model.backbone.depth)
    # all torch names must look like mmdet names
    for k in sd:
        assert k.split(".")[0] in ("backbone", "neck", "bbox_head"), k
        assert "/" not in k and "kernel" not in k and "gamma" not in k, k

    p2, c2 = torch_to_flax(sd, depth=cfg.model.backbone.depth)
    f1, f2 = traverse_util.flatten_dict(params), traverse_util.flatten_dict(p2)
    assert set(f1) == set(f2), (set(f1) ^ set(f2))
    for k in f1:
        np.testing.assert_array_equal(f1[k], f2[k])
    c1, c2f = (traverse_util.flatten_dict(constants),
               traverse_util.flatten_dict(c2))
    assert set(c1) == set(c2f)
    for k in c1:
        np.testing.assert_array_equal(c1[k], c2f[k])
