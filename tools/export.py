#!/usr/bin/env python
"""Export the jitted inference graph as StableHLO (the TPU-native analog of
the reference's ONNX exporter, SipMask-benchmark/onnx/export_model_to_onnx.py).

The exported artifact is a serialized StableHLO module runnable by any XLA
runtime (PJRT), plus the parameters as an orbax checkpoint.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def export_inference(cfg, checkpoint=None, shape=(544, 544), batch=1):
    """Build the jitted inference graph and export it as StableHLO.

    Returns (exported, infer_fn, sample_args): the jax.export Exported
    module, the plain jit-able python callable it was traced from, and the
    concrete sample arguments — so callers (tools CLI, tests) can execute
    the deserialized module and compare against the live graph (the role
    of the reference's onnx/test_fcos_onnx_model.py driver).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from sipmask_tpu.apis.inference import init_detector
    from sipmask_tpu.models.decode import decode_batch

    det = init_detector(cfg, checkpoint=checkpoint)
    h, w = shape
    b = batch
    rng = __import__("numpy").random.RandomState(0)
    images = jnp.asarray(rng.randn(b, h, w, 3).astype("float32") * 20)
    img_shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (b, 1))
    scale_factors = jnp.ones((b, 4), jnp.float32)
    model = det.model

    def infer(variables, images, img_shapes, scale_factors):
        out = model.apply(variables, images)
        return decode_batch(out, img_shapes, scale_factors, cfg.model)

    args = (det.variables, images, img_shapes, scale_factors)
    exported = jax_export.export(jax.jit(infer))(*args)
    return exported, infer, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="sipmask_r50_fpn_ssd_6x")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--shape", type=int, nargs=2, default=[544, 544])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", default="sipmask_export")
    ap.add_argument("--check", action="store_true",
                    help="execute the deserialized module and compare "
                         "against the live jit graph")
    args = ap.parse_args()

    import os
    import jax
    from jax import export as jax_export
    from sipmask_tpu.config import get_config
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = get_config(args.config)
    exported, infer, sample = export_inference(
        cfg, checkpoint=args.checkpoint, shape=tuple(args.shape),
        batch=args.batch)
    os.makedirs(args.out, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(args.out, "sipmask.stablehlo.bin"), "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}/sipmask.stablehlo.bin ({len(blob)} bytes)")
    reloaded = jax_export.deserialize(blob)
    print("export in_avals:", [str(a) for a in reloaded.in_avals][:2], "...")
    if args.check:
        import numpy as np
        got = jax.jit(reloaded.call)(*sample)
        want = jax.jit(infer)(*sample)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                             - np.asarray(b, np.float32)))),
            got, want)
        print("roundtrip max|diff|:", diffs)


if __name__ == "__main__":
    main()
