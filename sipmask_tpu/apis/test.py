"""Inference/eval driver (mmdet/apis/test.py + coco_utils equivalents):
batched jitted inference over the val set, host RLE post-processing, and the
reimplemented COCOeval for bbox + segm."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SipMaskConfig
from ..data import CocoDataset, TestTransform
from ..data.loader import build_test_loader
from ..eval.coco_eval import COCOEvaluator
from ..eval.results import postprocess_batch
from ..models.decode import decode_batch


def run_inference(model, variables, cfg: SipMaskConfig, dataset,
                  batch_size: int = 4, progress: bool = True,
                  distributed: bool = False, tmpdir: Optional[str] = None):
    """Returns the flat COCO-format result list for the whole dataset.

    ``distributed=True`` is the ``multi_gpu_test`` analog
    (SipMask-mmdetection/mmdet/apis/test.py:30-73): the val set is
    sharded per host (``jax.process_index/process_count``, the
    DistributedGroupSampler stride), each host infers its shard, and the
    per-host result lists are collected across hosts — over JAX's
    cross-host collectives by default, or via a shared ``tmpdir``
    (reference ``collect_results_cpu``) when one is given. Every host
    returns the SAME full list, in an order identical to the
    single-process run (results are re-flattened in canonical
    aspect-group dataset order, so distributed vs single-process output
    is bit-for-bit equal).
    """
    transform = TestTransform(cfg.data)
    if distributed:
        from ..parallel import (process_shard_args, collect_results_gather,
                                collect_results_cpu)
        shard_id, num_shards = process_shard_args()
    else:
        shard_id, num_shards = 0, 1
    loader = build_test_loader(dataset, transform, batch_size=batch_size,
                               shard_id=shard_id, num_shards=num_shards)

    @jax.jit
    def infer(variables, images, img_shapes, scale_factors):
        # variables ride the jit arguments (not the closure) so the weights
        # stay device buffers instead of baked compile-time constants
        out = model.apply(variables, images)
        rescore_fn = None
        if cfg.model.head.rescoring:
            rescore_fn = lambda m: model.apply(variables, m,
                                               method=model.rescore)
        return decode_batch(out, img_shapes, scale_factors, cfg.model,
                            rescore_fn=rescore_fn)

    results = []
    n_done = 0
    for batch, n_valid in loader:
        dets = infer(variables, jnp.asarray(batch["images"]),
                     jnp.asarray(batch["img_shapes"]),
                     jnp.asarray(batch["scale_factors"]))
        dets = {k: np.asarray(v) for k, v in dets.items()}
        dets["scale_factors"] = batch["scale_factors"]
        results.extend(postprocess_batch(
            dets, batch["image_ids"], batch["ori_shapes"],
            dataset.label2cat, mask_thr=cfg.model.test.mask_thr,
            n_valid=n_valid))
        n_done += n_valid
        if progress and n_done % 200 < batch_size:
            print(f"  inference {n_done}/{len(dataset)}", flush=True)
    if not distributed:
        return results

    # Collect per-host parts and re-flatten in the canonical order the
    # single-process loader would have produced (aspect groups in dataset
    # order), so eval output is independent of the host count.
    if tmpdir is not None:
        parts = collect_results_cpu(results, tmpdir)
    else:
        parts = collect_results_gather(results)
    per_image = {}
    for part in parts:
        for r in part:
            per_image.setdefault(r["image_id"], []).append(r)
    flags = np.asarray([dataset.aspect_flag(i) for i in range(len(dataset))])
    order = np.concatenate([np.where(flags)[0], np.where(~flags)[0]])
    return [r for idx in order
            for r in per_image.get(dataset.image_id(int(idx)), [])]


def evaluate_coco(results, ann_file: str, metrics=("bbox", "segm"),
                  dataset=None):
    """COCOeval on bbox + segm; bbox results use the detector score, segm
    uses mask_scores when rescoring produced them. 'proposal_fast' runs
    the greedy proposal-AR protocol (eval/recall.py, the reference's
    fast_eval_recall, datasets/coco.py:239-258 + evaluation/recall.py)."""
    stats = {}
    for it in metrics:
        if it == "proposal_fast":
            from ..data import CocoDataset
            from ..eval.recall import fast_eval_recall
            ds = dataset or CocoDataset(ann_file, "", test_mode=True)
            print("== proposal_fast ==")
            ar = fast_eval_recall(
                [{**r, "score": r.get("det_score", r["score"])}
                 for r in results], ds)
            # mean over IoU 0.5:0.95, the reference's AR@N definition
            # (coco.py evaluate: ar = recalls.mean(axis=1))
            stats[it] = {f"AR@{n}": float(ar[i].mean())
                         for i, n in enumerate((100, 300, 1000))}
            continue
        ev = COCOEvaluator(ann_file, iou_type=it)
        if it == "bbox":
            ev.update([{**r, "score": r.get("det_score", r["score"])}
                       for r in results])
        else:
            ev.update([r for r in results if "segmentation" in r])
        print(f"== {it} ==")
        stats[it] = ev.summarize()
    return stats
