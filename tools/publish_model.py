#!/usr/bin/env python
"""Prepare a checkpoint for release (reference tools/publish_model.py
analog): strip the optimizer state, keep params + constants + meta, and
stamp the directory name with a content hash."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import hashlib
import json
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("in_ckpt", help="orbax checkpoint dir (train state)")
    ap.add_argument("out_ckpt", help="output dir; -{hash8} is appended")
    args = ap.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    payload = ckpt.restore(os.path.abspath(args.in_ckpt))
    slim = {k: payload[k] for k in ("params", "constants") if k in payload}

    # content hash over sorted flat leaves
    h = hashlib.sha256()
    import jax
    flat = jax.tree_util.tree_leaves_with_path(slim)
    for path, leaf in sorted(flat, key=lambda kv: str(kv[0])):
        h.update(str(path).encode())
        h.update(np.ascontiguousarray(leaf).tobytes())
    digest = h.hexdigest()[:8]

    out = os.path.abspath(f"{args.out_ckpt.rstrip('/')}-{digest}")
    if os.path.exists(out):
        shutil.rmtree(out)
    ckpt.save(out, slim)
    ckpt.wait_until_finished()
    meta_in = os.path.join(os.path.abspath(args.in_ckpt), "meta.json")
    meta = json.load(open(meta_in)) if os.path.exists(meta_in) else {}
    meta["sha256_8"] = digest
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump(meta, f)
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(slim.get("params", {})))
    print(f"published {out} ({n_params / 1e6:.2f} M params)")


if __name__ == "__main__":
    main()
