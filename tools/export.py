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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="sipmask_r50_fpn_ssd_6x")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--shape", type=int, nargs=2, default=[544, 544])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", default="sipmask_export")
    args = ap.parse_args()

    import os
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export
    from sipmask_tpu.config import get_config
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.apis.inference import init_detector
    from sipmask_tpu.models.decode import decode_batch

    cfg = get_config(args.config)
    det = init_detector(cfg, checkpoint=args.checkpoint)
    h, w = args.shape
    b = args.batch
    images = jnp.zeros((b, h, w, 3), jnp.float32)
    img_shapes = jnp.tile(jnp.asarray([[float(h), float(w)]]), (b, 1))
    scale_factors = jnp.ones((b, 4), jnp.float32)

    model = det.model

    def infer(variables, images, img_shapes, scale_factors):
        out = model.apply(variables, images)
        return decode_batch(out, img_shapes, scale_factors, cfg.model)

    exported = jax_export.export(jax.jit(infer))(
        det.variables, images, img_shapes, scale_factors)
    os.makedirs(args.out, exist_ok=True)
    blob = exported.serialize()
    with open(os.path.join(args.out, "sipmask.stablehlo.bin"), "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}/sipmask.stablehlo.bin ({len(blob)} bytes)")
    # roundtrip check
    reloaded = jax_export.deserialize(blob)
    print("export in_avals:", [str(a) for a in reloaded.in_avals][:2], "...")


if __name__ == "__main__":
    main()
