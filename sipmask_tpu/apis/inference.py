"""Single-image inference + visualization API
(mmdet/apis/inference.py:16-210 equivalents)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import cv2

from ..config import SipMaskConfig, get_config
from ..data.transforms import TestTransform
from ..models import build_model
from ..models.decode import decode_batch
from ..utils.checkpoint import load_weights


class Detector:
    def __init__(self, cfg: SipMaskConfig, model, variables):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.transform = TestTransform(cfg.data)
        self._jitted = {}

    def _infer_fn(self, shape):
        if shape not in self._jitted:
            model, cfg = self.model, self.cfg

            @jax.jit
            def infer(variables, images, img_shapes, scale_factors):
                out = model.apply(variables, images)
                # close over the TRACED variables, not self.variables: a
                # closure on self would bake the rescoring tower weights in
                # as compile-time constants at first trace, so a later
                # load_weights would silently keep the old tower
                rescore_fn = None
                if cfg.model.head.rescoring:
                    rescore_fn = lambda m: model.apply(variables, m,
                                                       method=model.rescore)
                return decode_batch(out, img_shapes, scale_factors, cfg.model,
                                    rescore_fn=rescore_fn)
            self._jitted[shape] = infer
        return self._jitted[shape]


def init_detector(config_name: str, checkpoint: Optional[str] = None,
                  seed: int = 0) -> Detector:
    cfg = (get_config(config_name) if isinstance(config_name, str)
           else config_name)
    model = build_model(cfg.model)
    h, w = cfg.data.fixed_size or (
        min(cfg.data.img_scale), min(cfg.data.img_scale))
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, h, w, 3), jnp.float32))
    if cfg.model.head.rescoring:
        # the rescoring tower is only reachable through model.rescore, so a
        # plain __call__ init leaves its params missing (same merge as
        # train/state.py create_train_state)
        resc = jax.jit(lambda r, d: model.init(r, d, method=model.rescore))(
            jax.random.PRNGKey(seed), jnp.zeros((1, h // 2, w // 2, 1)))
        params = dict(variables["params"])
        params.update(resc["params"])
        variables = {"params": params,
                     "constants": variables.get("constants", {})}
    det = Detector(cfg, model, variables)
    if checkpoint:
        from ..train.state import TrainState
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           constants=variables.get("constants", {}),
                           opt_state=())
        state = load_weights(checkpoint, state)
        det.variables = {"params": state.params,
                         "constants": state.constants}
    return det


def _dispatch(det: Detector, img: np.ndarray):
    """Preprocess + launch the jitted forward. Returns (device_out, sample):
    JAX dispatch is asynchronous, so this returns immediately with on-device
    futures — the async API awaits the host transfer off-thread."""
    s = det.transform(img)
    fn = det._infer_fn(s.image.shape)
    out = fn(det.variables, jnp.asarray(s.image[None]),
             jnp.asarray(s.img_shape[None]),
             jnp.asarray(s.scale_factor[None]))
    return out, s


def _postprocess(det: Detector, out, s):
    out = {k: np.asarray(v[0]) for k, v in out.items()}
    valid = out["valid"].astype(bool)
    oh, ow = s.ori_shape
    masks = []
    for m in out["masks"][valid]:
        mm = cv2.resize(m.astype(np.float32), None,
                        fx=2.0 / s.scale_factor[0], fy=2.0 / s.scale_factor[1],
                        interpolation=cv2.INTER_LINEAR)
        full = np.zeros((oh, ow), bool)
        hh, ww = min(oh, mm.shape[0]), min(ow, mm.shape[1])
        full[:hh, :ww] = mm[:hh, :ww] > det.cfg.model.test.mask_thr
        masks.append(full)
    res = dict(boxes=out["boxes"][valid], scores=out["scores"][valid],
               labels=out["labels"][valid],
               masks=np.stack(masks) if masks else np.zeros((0, oh, ow), bool))
    if "mask_scores" in out:  # SipMask++ rescoring (segm ranking scores)
        res["mask_scores"] = out["mask_scores"][valid]
    return res


def inference_detector(det: Detector, img: np.ndarray):
    """img: (H, W, 3) BGR uint8. Returns dict with boxes (N,4 ori coords),
    scores, labels (0-based), masks (N, oh, ow) bool."""
    out, s = _dispatch(det, img)
    return _postprocess(det, out, s)


async def async_inference_detector(det: Detector, img: np.ndarray):
    """Async variant (mmdet/apis/inference.py async_inference_detector,
    tests/test_async.py). The device compute is launched synchronously (JAX
    dispatch never blocks) and the host transfer + mask paste run in a
    worker thread, so concurrent requests overlap device execution with
    host post-processing instead of serializing on the GIL."""
    import asyncio

    out, s = _dispatch(det, img)
    return await asyncio.to_thread(_postprocess, det, out, s)


def show_result(img, result, class_names, score_thr=0.3, out_file=None):
    """Overlay boxes + masks (mmdet show_result analog)."""
    img = img.copy()
    rng = np.random.RandomState(42)
    colors = rng.randint(0, 255, (80, 3))
    for i in range(len(result["boxes"])):
        if result["scores"][i] < score_thr:
            continue
        x1, y1, x2, y2 = result["boxes"][i].astype(int)
        c = tuple(int(v) for v in colors[int(result["labels"][i]) % 80])
        cv2.rectangle(img, (x1, y1), (x2, y2), c, 2)
        if len(result["masks"]):
            m = result["masks"][i]
            img[m] = img[m] * 0.5 + np.asarray(c) * 0.5
        name = class_names[int(result["labels"][i])]
        cv2.putText(img, f"{name} {result['scores'][i]:.2f}", (x1, y1 - 3),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1)
    if out_file:
        cv2.imwrite(out_file, img)
    return img
