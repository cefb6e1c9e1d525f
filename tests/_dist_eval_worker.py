"""Worker process for the 2-process distributed EVAL test.

The val set is sharded per process and the per-host result lists are
collected back — both over JAX's cross-host collectives
(collect_results_gather) and over a shared tmpdir (collect_results_cpu)
— the ``multi_gpu_test`` + ``collect_results_cpu/gpu`` analog
(SipMask-mmdetection/mmdet/apis/test.py:30-146).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--imgs", required=True)
    ap.add_argument("--tmpdir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from sipmask_tpu.parallel import init_distributed
    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    assert jax.process_count() == args.num_processes

    from sipmask_tpu.apis.inference import init_detector
    from sipmask_tpu.apis.test import run_inference
    from sipmask_tpu.config import get_config, _r
    from sipmask_tpu.data import CocoDataset

    cfg = get_config("sipmask_r50_fpn_gn_1x")
    cfg = _r(cfg, "model.fpn", out_channels=32)
    cfg = _r(cfg, "model.head", in_channels=32, feat_channels=32,
             stacked_convs=2, num_classes=1)
    cfg = _r(cfg, "data", fixed_size=(128, 128), keep_ratio=False)
    cfg = _r(cfg, "model.test", score_thr=0.005, nms_pre=100,
             max_per_img=20)
    det = init_detector(cfg)
    dataset = CocoDataset(args.ann, args.imgs, test_mode=True, min_size=1)

    by_gather = run_inference(det.model, det.variables, cfg, dataset,
                              batch_size=2, progress=False, distributed=True)
    by_tmpdir = run_inference(det.model, det.variables, cfg, dataset,
                              batch_size=2, progress=False, distributed=True,
                              tmpdir=args.tmpdir)
    with open(args.out, "wb") as f:
        pickle.dump({"gather": by_gather, "tmpdir": by_tmpdir}, f)
    print("eval worker", args.process_id, "ok",
          len(by_gather), len(by_tmpdir))


if __name__ == "__main__":
    main()
