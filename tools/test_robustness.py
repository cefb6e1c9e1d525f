#!/usr/bin/env python
"""Corruption-robustness benchmark (reference tools/test_robustness.py +
robustness_eval.py analog): evaluate a model on COCO val under N corruption
types x severities and report per-corruption AP plus mPC (mean performance
under corruption) and rPC (relative to clean AP)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


class CorruptedDataset:
    """Dataset proxy applying one corruption to every loaded image."""

    def __init__(self, base, name, severity):
        self._base = base
        self._name = name
        self._severity = severity

    def __getattr__(self, k):
        return getattr(self._base, k)

    def __len__(self):
        return len(self._base)

    def load_image(self, idx):
        from sipmask_tpu.data.corruptions import corrupt
        img = self._base.load_image(idx)
        if self._severity == 0:
            return img
        return corrupt(img, self._name, self._severity)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("checkpoint", nargs="?", default=None)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--img-prefix", required=True)
    ap.add_argument("--corruptions", nargs="*", default=None,
                    help="default: the benchmark 15")
    ap.add_argument("--severities", type=int, nargs="*", default=[1, 2, 3, 4, 5])
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--max-images", type=int, default=None)
    ap.add_argument("--out", default="robustness.json")
    args = ap.parse_args()

    from sipmask_tpu.config import get_config
    from sipmask_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from sipmask_tpu.data import CocoDataset
    from sipmask_tpu.data.corruptions import CORRUPTIONS
    from sipmask_tpu.apis.inference import init_detector
    from sipmask_tpu.apis.test import run_inference, evaluate_coco

    cfg = get_config(args.config)
    det = init_detector(args.config, checkpoint=args.checkpoint)
    dataset = CocoDataset(args.ann, args.img_prefix, test_mode=True)
    if args.max_images:
        dataset.images = dataset.images[:args.max_images]
        dataset.anns = dataset.anns[:args.max_images]

    corruptions = args.corruptions or sorted(CORRUPTIONS)
    table = {}

    def run(name, severity):
        ds = CorruptedDataset(dataset, name, severity)
        results = run_inference(det.model, det.variables, cfg, ds,
                                batch_size=args.batch_size, progress=False)
        stats = evaluate_coco(results, args.ann)
        return {k: v["AP"] for k, v in stats.items()}

    print("== clean ==")
    table["clean"] = {0: run(corruptions[0], 0)}
    for name in corruptions:
        table[name] = {}
        for sev in args.severities:
            print(f"== {name} severity {sev} ==")
            table[name][sev] = run(name, sev)

    # aggregate: mPC = mean AP over corruptions x severities; rPC = mPC/clean
    for metric in ("bbox", "segm"):
        clean = table["clean"][0][metric]
        vals = [table[c][s][metric] for c in corruptions
                for s in args.severities]
        mpc = sum(vals) / max(len(vals), 1)
        print(f"{metric}: clean AP {clean:.4f}  mPC {mpc:.4f}  "
              f"rPC {mpc / max(clean, 1e-9):.4f}")

    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
