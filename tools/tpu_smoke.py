#!/usr/bin/env python
"""On-device (real TPU) kernel regression smoke suite.

Runs the Pallas deformable-gather kernels (fwd + both bwd kernels) against
the XLA reference on the real chip, plus one jitted decode and one train
step, and writes a JSON artifact. Run once per round and commit the output
(ARTIFACTS/tpu_smoke_r{N}.json) so on-device parity claims are repeatable,
not commit-message folklore (VERDICT.md round-1 item 10).

  python tools/tpu_smoke.py --out ARTIFACTS/tpu_smoke_r2.json
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.ops.pallas import deform_gather as dg

    report = dict(platform=jax.devices()[0].platform,
                  device=str(jax.devices()[0]),
                  jax=jax.__version__,
                  timestamp=time.strftime("%Y-%m-%dT%H:%M:%S"))
    assert report["platform"] != "cpu", (
        "smoke suite must run on the real chip (got cpu); unset "
        "SIPMASK_TEST_PLATFORM/JAX_PLATFORMS overrides")

    rng = np.random.RandomState(0)
    checks = {}

    # --- DCN gather fwd/bwd: Pallas kernels vs XLA reference, P3-like level
    n, h, w, cg, k = 4, 68, 68, 64, 9
    q = h * w
    x = jnp.asarray(rng.randn(n, q, cg).astype(np.float32))
    base_y = rng.randint(0, h, (n, k, q)).astype(np.float32)
    base_x = rng.randint(0, w, (n, k, q)).astype(np.float32)
    # mix of exact-integer positions (zero-offset init case) and fractional
    off = rng.randn(2, n, k, q).astype(np.float32) * 2.0
    off[:, :, :, ::3] = 0.0
    pyx = jnp.asarray(np.stack([base_y + off[0], base_x + off[1]], -1))

    got = dg._sample_pallas(x, pyx, h, w)
    want = dg.sample_ref(x, pyx, h, w)
    # the kernel's tent matmuls run on the MXU (bf16-pass precision); the
    # XLA reference is exact-f32 gathers, so tolerances are bf16-scale
    err = float(jnp.max(jnp.abs(got - want)))
    checks["dcn_fwd_max_abs_err"] = err
    checks["dcn_fwd_mean_abs_err"] = float(jnp.mean(jnp.abs(got - want)))
    assert err < 5e-2, err

    g = jnp.asarray(rng.randn(*want.shape).astype(np.float32))
    got_dx, got_dp = dg._sample_pallas_bwd(x, pyx, g, h, w)
    _, vjp = jax.vjp(lambda xr, pp: dg.sample_ref(xr, pp, h, w), x, pyx)
    want_dx, want_dp = vjp(g)
    err_dx = float(jnp.max(jnp.abs(got_dx - want_dx)))
    err_dp = float(jnp.max(jnp.abs(got_dp - want_dp)))
    checks["dcn_bwd_dx_max_abs_err"] = err_dx
    checks["dcn_bwd_dpyx_max_abs_err"] = err_dp
    checks["dcn_bwd_dx_mean_abs_err"] = float(
        jnp.mean(jnp.abs(got_dx - want_dx)))
    checks["dcn_bwd_dpyx_mean_abs_err"] = float(
        jnp.mean(jnp.abs(got_dp - want_dp)))
    assert err_dx < 5e-2 and err_dp < 0.5, (err_dx, err_dp)
    # nonzero offset grads at exactly-integer positions (the round-1
    # sign(0)=0 bug class): every zero-offset column must carry gradient
    int_cols = np.abs(np.asarray(got_dp[:, :, ::3, :])).sum()
    checks["dcn_bwd_dpyx_integer_positions_grad_nonzero"] = bool(int_cols > 0)
    assert int_cols > 0

    # --- one jitted decode on the flagship real-time model
    from sipmask_tpu.config import get_config
    from sipmask_tpu.models import build_model
    from sipmask_tpu.models.decode import decode_batch
    cfg = get_config("sipmask_r50_fpn_ssd_6x")
    model = build_model(cfg.model)
    images = jnp.asarray(rng.randn(1, 544, 544, 3).astype(np.float32) * 20)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    shapes = jnp.asarray([[544.0, 544.0]])
    sf = jnp.ones((1, 4), jnp.float32)
    dets = jax.jit(lambda v, im: decode_batch(model.apply(v, im), shapes, sf,
                                              cfg.model))(variables, images)
    checks["decode_finite"] = bool(np.isfinite(
        np.asarray(dets["scores"])).all())
    assert checks["decode_finite"]

    # --- one train step with nonzero losses
    from sipmask_tpu.train import create_train_state, make_train_step
    from sipmask_tpu.utils import demo_batch
    batch_np = demo_batch(batch_size=2, height=256, width=256, max_gts=8)
    model2, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), jnp.asarray(batch_np["images"][:1]),
        steps_per_epoch=10)

    # pin fcos_reg to a constant 2-strides-per-side prediction (zero kernel,
    # bias 2) so decoded boxes are non-degenerate regardless of the norm-free
    # tower's response to random inputs, and the mask-loss value path is
    # exercised nonzero (see __graft_entry__.dryrun_multichip)
    def _bump(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if len(keys) >= 2 and keys[-2] == "fcos_reg":
            return jnp.full_like(leaf, 2.0 if keys[-1] == "bias" else 0.0)
        return leaf
    state = state.replace(
        params=jax.tree_util.tree_map_with_path(_bump, state.params))

    step_fn = make_train_step(model2, tx, cfg, donate=False)
    _, metrics = step_fn(state, {k: jnp.asarray(v)
                                 for k, v in batch_np.items()})
    losses = {k: float(v) for k, v in metrics.items()}
    checks["train_step_losses"] = losses
    assert all(np.isfinite(v) for v in losses.values()), losses
    assert losses["loss_mask"] > 0, losses

    # --- golden tolerance bands on device (VERDICT r2 weak item 3): the
    # same fixtures tests/test_golden.py records on CPU fp32 must land
    # within bf16-matmul-pass distance on the TPU. A numeric-scale
    # regression on device (wrong normalization, broken kernel math) fails
    # here instead of slipping past a finite-only assert.
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    import test_golden as tg
    for label, fn, golden_path in (
            ("golden_model_losses", tg._compute, tg.GOLDEN_FILE),
            ("golden_loss_math", tg._compute_synthetic_outputs,
             tg.GOLDEN_FILE2)):
        want = json.load(open(golden_path))
        got = fn()
        checks[label] = dict(got=got, want=want)
        for k, v in want.items():
            assert abs(got[k] - v) <= 2e-2 * abs(v) + 1e-3, (
                label, k, got[k], v)

    report["checks"] = checks
    report["ok"] = True
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
