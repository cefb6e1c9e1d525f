#!/usr/bin/env python
"""Training-log analyzer (tools/analyze_logs.py analog) over the JSON-line
logs written by MetricLogger (train.log.json)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def load(path):
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    return recs


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p1 = sub.add_parser("plot_curve")
    p1.add_argument("log")
    p1.add_argument("--keys", nargs="+", default=["loss_total"])
    p1.add_argument("--out", default="curve.png")
    p2 = sub.add_parser("cal_train_time")
    p2.add_argument("log")
    args = ap.parse_args()

    recs = load(args.log)
    if args.cmd == "plot_curve":
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for k in args.keys:
            xs = [r["step"] for r in recs if k in r]
            ys = [r[k] for r in recs if k in r]
            plt.plot(xs, ys, label=k)
        plt.xlabel("step")
        plt.legend()
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")
    else:
        steps = [r["step"] for r in recs]
        if len(steps) >= 2:
            print(f"{len(steps)} log records, steps {steps[0]}..{steps[-1]}")
        for k in recs[-1]:
            if k.startswith("loss"):
                print(f"  final {k}: {recs[-1][k]:.4f}")


if __name__ == "__main__":
    main()
