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
                  batch_size: int = 4, progress: bool = True):
    """Returns the flat COCO-format result list for the whole dataset."""
    transform = TestTransform(cfg.data)
    loader = build_test_loader(dataset, transform, batch_size=batch_size)

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
    return results


def evaluate_coco(results, ann_file: str, metrics=("bbox", "segm")):
    """COCOeval on bbox + segm; bbox results use the detector score, segm
    uses mask_scores when rescoring produced them."""
    stats = {}
    for it in metrics:
        ev = COCOEvaluator(ann_file, iou_type=it)
        if it == "bbox":
            ev.update([{**r, "score": r.get("det_score", r["score"])}
                       for r in results])
        else:
            ev.update([r for r in results if "segmentation" in r])
        print(f"== {it} ==")
        stats[it] = ev.summarize()
    return stats
