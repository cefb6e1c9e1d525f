"""Benchmark: real-time SipMask R50 (544x544) single-chip inference
throughput, whole detect->mask path on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference real-time SipMask reports ~30 fps on a V100-class
GPU (arXiv 2007.14772; repo README has no fps numbers). vs_baseline is
images/sec/chip divided by that 30 fps.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.models import build_model
    from sipmask_tpu.models.decode import decode_batch

    batch = 8
    cfg = get_config("sipmask_r50_fpn_ssd_6x")
    cfg = _r(cfg, "model", compute_dtype="bfloat16")
    model = build_model(cfg.model)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(batch, 544, 544, 3).astype(np.float32) * 20)
    variables = model.init(jax.random.PRNGKey(0), images[:1])
    img_shapes = jnp.tile(jnp.asarray([[544.0, 544.0]]), (batch, 1))
    scale_factors = jnp.ones((batch, 4), jnp.float32)

    @jax.jit
    def infer(variables, images):
        out = model.apply(variables, images)
        dets = decode_batch(out, img_shapes, scale_factors, cfg.model)
        dets["masks"] = dets["masks"] > cfg.model.test.mask_thr
        return dets

    # warmup / compile
    r = infer(variables, images)
    jax.block_until_ready(r)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        r = infer(variables, images)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    baseline_v100_fps = 30.0
    print(json.dumps({
        "metric": "sipmask_rt_544_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline_v100_fps, 3),
    }))


if __name__ == "__main__":
    main()
