"""Streaming predictor: sources -> letterbox -> jit forward -> NMS -> Results.

Behavioral parity with the reference predictor (ultralytics/engine/predictor.py:70
BasePredictor: stream_inference:277, preprocess:151, setup_source:247) with the
TPU-native difference that preprocess normalization (/255, BGR->RGB) runs
ON-DEVICE fused into the jitted forward, the whole
forward+decode+NMS path is ONE compiled function with static shapes, and
outputs come back as fixed (max_det, 6) arrays + a valid count.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np

from ultralytics_pro_tpu.data.augment import LetterBox
from ultralytics_pro_tpu.engine.results import Results
from ultralytics_pro_tpu.ops.boxes import scale_boxes
from ultralytics_pro_tpu.utils import LOGGER, Profile, colorstr


class BasePredictor:
    """Single-model streaming inference."""

    def __init__(self, model, args: Dict | None = None):
        """model: a BaseModel (task wrapper) with variables loaded."""
        import jax

        self.model = model
        self.args = dict(args or {})
        self.imgsz = int(self.args.get("imgsz", 640))
        self.conf = float(self.args.get("conf", 0.25) or 0.25)
        self.iou = float(self.args.get("iou", 0.45))
        self.max_det = int(self.args.get("max_det", 300))
        self.classes = self.args.get("classes")
        self.agnostic = bool(self.args.get("agnostic_nms", False))
        self.letterbox = LetterBox((self.imgsz, self.imgsz), scaleup=False)
        self._jitted = None
        self._jax = jax

    # -- device path ----------------------------------------------------------
    def _build_jit(self):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.nms import non_max_suppression

        model = self.model
        conf, iou, max_det = self.conf, self.iou, self.max_det
        agnostic = self.agnostic
        classes_mask = None
        if self.classes is not None:
            classes_mask = np.zeros((model.nc,), bool)
            classes_mask[np.array(self.classes, int)] = True

        nc = model.nc
        augment = bool(self.args.get("augment", False))
        head = model._head_spec() if hasattr(model, "_head_spec") else None
        end2end = head is not None and head.type_name == "v10Detect"
        # Fused single-label fast path: for plain Detect heads the per-level
        # raw maps in aux["feats"] are decoded with the class max/argmax fused
        # into the head epilogue, so the (B, A, nc) score tensor is never
        # materialized (the head's own concat-decode output is dead code the
        # compiler removes). Same results as the generic path (test_nms_fused).
        use_fused = (head is not None and head.type_name == "Detect"
                     and not augment and not end2end)
        reg_max = int(dict(head.kwargs).get("reg_max", 16)) if head is not None else 16
        strides = tuple(getattr(model, "stride", (8, 16, 32)))

        def forward(variables, x):
            y, aux = model.apply(variables, x, train=False)
            return y, aux

        def tta_forward(variables, x):
            """Test-time augmentation (reference _predict_augment tasks.py:1342):
            scales (1, 0.83, 0.67) x flips (none, lr, none), decoded preds
            descaled and concatenated along the anchor axis before NMS.
            Per-scale grid tails are clipped like the reference's
            _clip_augmented (tasks.py:1388): the coarsest-level (P5) anchors are
            dropped from the first (unscaled) output and the finest-level (P3)
            anchors from the last (most downscaled) output."""
            import math

            b, h, w, c = x.shape
            ys = []
            aux0 = None
            specs = ((1.0, False), (0.83, True), (0.67, False))
            for si, (scale, flip) in enumerate(specs):
                sh = math.ceil(h * scale / 32) * 32 if scale != 1.0 else h
                sw = math.ceil(w * scale / 32) * 32 if scale != 1.0 else w
                xi = x
                if flip:
                    xi = xi[:, :, ::-1, :]
                if (sh, sw) != (h, w):
                    xi = jax.image.resize(xi, (b, sh, sw, c), method="bilinear")
                yi, aux_i = forward(variables, xi)
                if aux0 is None:
                    aux0 = aux_i
                # descale xywh boxes back to the base frame
                bx = yi[..., :4] / jnp.array([sw / w, sh / h, sw / w, sh / h], yi.dtype)
                if flip:
                    bx = bx.at[..., 0].set(w - bx[..., 0])
                yi = jnp.concatenate([bx, yi[..., 4:]], -1)
                # _clip_augmented: anchors are ordered P3,P4,P5; counts are
                # static inside the trace so plain slicing works.
                n_p3 = (sh // 8) * (sw // 8)
                n_p5 = (sh // 32) * (sw // 32)
                if si == 0:
                    yi = yi[:, : yi.shape[1] - n_p5]
                elif si == len(specs) - 1:
                    yi = yi[:, n_p3:]
                ys.append(yi)
            return jnp.concatenate(ys, axis=1), aux0

        from ultralytics_pro_tpu.ops.boxes import xywh2xyxy

        @jax.jit
        def run(variables, img_u8):
            # on-device preprocess: uint8 BGR HWC -> float RGB /255
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            y, aux = (tta_forward if augment else forward)(variables, x)
            if end2end:
                # v10Detect inference emits (B, max_det, 6) [xywh, conf, cls]
                # NMS-free (reference v10 postprocess head.py:2227); running the
                # generic NMS path here would treat the class-index column as a
                # score. Mirror the validator's branch.
                return {
                    "boxes": xywh2xyxy(y[..., :4]),
                    "scores": y[..., 4],
                    "cls": y[..., 5].astype(jnp.int32),
                    "valid": y[..., 4] > conf,
                }
            if use_fused:
                from ultralytics_pro_tpu.nn.modules.head import decode_single_label
                from ultralytics_pro_tpu.ops.nms import non_max_suppression_fused

                b4, cf, cl = decode_single_label(aux["feats"], strides, nc, reg_max)
                out = non_max_suppression_fused(
                    b4, cf, cl, conf_thres=conf, iou_thres=iou,
                    max_det=max_det, agnostic=agnostic,
                    classes=tuple(classes_mask) if classes_mask is not None else None,
                )
                if "protos" in aux:
                    out["protos"] = aux["protos"]
                return out
            boxes, rest = y[..., :4], y[..., 4:]
            scores = rest[..., :nc]
            extra = rest[..., nc:] if rest.shape[-1] > nc else None
            out = non_max_suppression(
                boxes, scores, extra=extra, conf_thres=conf, iou_thres=iou,
                max_det=max_det, agnostic=agnostic,
                classes=tuple(classes_mask) if classes_mask is not None else None,
            )
            if "protos" in aux:
                out["protos"] = aux["protos"]
            return out

        return run

    # -- host path ------------------------------------------------------------
    def preprocess(self, imgs: List[np.ndarray]):
        """Letterbox on host; returns uint8 batch + per-image ratio_pad."""
        batch = []
        ratio_pads = []
        for im in imgs:
            lb = self.letterbox(image=im)
            batch.append(lb)
            ratio_pads.append(None)  # scale_boxes recomputes from shapes
        return np.stack(batch), ratio_pads

    def __call__(self, source, stream: bool = False):
        gen = self.stream_inference(source)
        return gen if stream else list(gen)

    def load_images(self, source) -> Iterator:
        """Dispatch to the inference loaders (images/videos/streams/arrays)."""
        from ultralytics_pro_tpu.data.loaders import load_inference_source

        loader = load_inference_source(source, vid_stride=int(self.args.get("vid_stride", 1) or 1))
        yield from loader

    def stream_inference(self, source) -> Iterator[Results]:
        if self._jitted is None:
            self._jitted = self._build_jit()
        profilers = (Profile(), Profile(), Profile())
        for path, im0 in self.load_images(source):
            with profilers[0]:
                batch, _ = self.preprocess([im0])
            with profilers[1]:
                out = self._jitted(self.model.variables, batch)
                out = {k: np.asarray(v) for k, v in out.items()}
            with profilers[2]:
                results = self.postprocess(out, batch, [im0], [path])
            r = results[0]
            r.speed = {
                "preprocess": profilers[0].dt * 1e3,
                "inference": profilers[1].dt * 1e3,
                "postprocess": profilers[2].dt * 1e3,
            }
            yield r

    def postprocess(self, out: Dict[str, np.ndarray], batch, im0s, paths) -> List[Results]:
        results = []
        for i, im0 in enumerate(im0s):
            valid = out["valid"][i]
            n = int(valid.sum())
            boxes = out["boxes"][i][:n]
            boxes = np.asarray(scale_boxes(batch.shape[1:3], boxes, im0.shape[:2]))
            data = np.concatenate(
                [boxes, out["scores"][i][:n, None], out["cls"][i][:n, None].astype(np.float32)], 1
            )
            results.append(Results(im0, paths[i], self.model.names, boxes=data))
        return results


class DetectionPredictor(BasePredictor):
    pass


class SegmentationPredictor(BasePredictor):
    """Adds proto-mask combination (reference models/yolo/segment/predict.py)."""

    def postprocess(self, out, batch, im0s, paths):
        from ultralytics_pro_tpu.ops.masks import process_mask_native

        results = []
        for i, im0 in enumerate(im0s):
            valid = out["valid"][i]
            n = int(valid.sum())
            boxes_in = out["boxes"][i][:n]
            data_boxes = np.asarray(scale_boxes(batch.shape[1:3], boxes_in.copy(), im0.shape[:2]))
            masks = None
            if n and "protos" in out and "extra" in out:
                import jax.numpy as jnp

                m = process_mask_native(
                    jnp.asarray(out["protos"][i]), jnp.asarray(out["extra"][i][:n]),
                    jnp.asarray(data_boxes), im0.shape[:2],
                )
                masks = np.asarray(m) > 0.5
            data = np.concatenate(
                [data_boxes, out["scores"][i][:n, None], out["cls"][i][:n, None].astype(np.float32)], 1
            )
            results.append(Results(im0, paths[i], self.model.names, boxes=data, masks=masks))
        return results


class ClassificationPredictor(BasePredictor):
    """Classify-task predictor: probs instead of boxes (reference
    models/yolo/classify/predict.py)."""

    def _build_jit(self):
        import jax
        import jax.numpy as jnp

        model = self.model

        @jax.jit
        def run(variables, img_u8):
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            return model.apply(variables, x, train=False)

        return run

    def preprocess(self, imgs):
        import cv2

        batch = [cv2.resize(im, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR) for im in imgs]
        return np.stack(batch), [None] * len(imgs)

    def stream_inference(self, source):
        if self._jitted is None:
            self._jitted = self._build_jit()
        for path, im0 in self.load_images(source):
            batch, _ = self.preprocess([im0])
            probs = np.asarray(self._jitted(self.model.variables, batch))[0]
            yield Results(im0, path, self.model.names, probs=probs)


class PosePredictor(BasePredictor):
    """Pose-task predictor: boxes + decoded keypoints (reference
    models/yolo/pose/predict.py)."""

    def postprocess(self, out, batch, im0s, paths):
        results = []
        h1, w1 = batch.shape[1:3]
        for i, im0 in enumerate(im0s):
            valid = out["valid"][i]
            n = int(valid.sum())
            boxes = np.asarray(scale_boxes((h1, w1), out["boxes"][i][:n], im0.shape[:2]))
            data = np.concatenate(
                [boxes, out["scores"][i][:n, None], out["cls"][i][:n, None].astype(np.float32)], 1
            )
            kpts = None
            if "extra" in out and n:
                k = out["extra"][i][:n]
                nk = k.shape[-1] // 3 if k.shape[-1] % 3 == 0 else k.shape[-1] // 2
                nd = k.shape[-1] // nk
                k = k.reshape(n, nk, nd)
                gain = min(h1 / im0.shape[0], w1 / im0.shape[1])
                pad_w = round((w1 - im0.shape[1] * gain) / 2 - 0.1)
                pad_h = round((h1 - im0.shape[0] * gain) / 2 - 0.1)
                k = k.copy()
                k[..., 0] = (k[..., 0] - pad_w) / gain
                k[..., 1] = (k[..., 1] - pad_h) / gain
                kpts = k
            results.append(Results(im0, paths[i], self.model.names, boxes=data, keypoints=kpts))
        return results


class OBBPredictor(BasePredictor):
    """OBB-task predictor: rotated NMS, Results.obb (reference
    models/yolo/obb/predict.py)."""

    def _build_jit(self):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.nms import non_max_suppression_rotated

        model = self.model
        conf, iou, max_det = self.conf, self.iou, self.max_det
        nc = model.nc

        @jax.jit
        def run(variables, img_u8):
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            y, aux = model.apply(variables, x, train=False)
            rb = jnp.concatenate([y[..., :4], y[..., 4 + nc:5 + nc]], axis=-1)
            return non_max_suppression_rotated(
                rb, y[..., 4:4 + nc], conf_thres=conf, iou_thres=iou, max_det=max_det,
            )

        return run

    def postprocess(self, out, batch, im0s, paths):
        results = []
        h1, w1 = batch.shape[1:3]
        for i, im0 in enumerate(im0s):
            valid = out["valid"][i]
            n = int(valid.sum())
            rb = out["rboxes"][i][:n].copy()
            gain = min(h1 / im0.shape[0], w1 / im0.shape[1])
            pad_w = round((w1 - im0.shape[1] * gain) / 2 - 0.1)
            pad_h = round((h1 - im0.shape[0] * gain) / 2 - 0.1)
            rb[:, 0] = (rb[:, 0] - pad_w) / gain
            rb[:, 1] = (rb[:, 1] - pad_h) / gain
            rb[:, 2:4] /= gain
            data = np.concatenate(
                [rb, out["scores"][i][:n, None], out["cls"][i][:n, None].astype(np.float32)], 1
            )
            results.append(Results(im0, paths[i], self.model.names, obb=data))
        return results


def predict_files(self, paths, batch: int = 16):
    """High-throughput batched file prediction on the native C++ loader
    (native/fastloader.cpp): decode + letterbox happen in C++ threads, the
    model runs real batches, and boxes are rescaled to each ORIGINAL frame
    from the loader's (h0, w0, r, dw, dh) metadata. Returns one Results per
    file; `orig_img` holds the letterboxed frame (decode once), so `.plot()`
    renders on the letterboxed canvas while `.boxes` are original-frame.

    Falls back to the standard per-image python path when the native
    toolchain is unavailable.
    """
    from ultralytics_pro_tpu.engine.results import Boxes, Results

    try:
        from ultralytics_pro_tpu.native import FastLoader
    except Exception:
        FastLoader = None
    if FastLoader is None:
        return list(self.stream_inference(list(paths)))
    try:
        fl = FastLoader(imgsz=self.imgsz, scaleup=False)
    except RuntimeError:
        return list(self.stream_inference(list(paths)))

    if self._jitted is None:
        self._jitted = self._build_jit()
    paths = [str(p) for p in paths]
    results = []
    for i in range(0, len(paths), batch):
        chunk = paths[i:i + batch]
        imgs, meta = fl.load(chunk)
        out = self._jitted(self.model.variables, imgs)
        out = {k: np.asarray(v) for k, v in out.items()}
        for j, p in enumerate(chunk):
            valid = out["valid"][j]
            n = int(valid.sum())
            boxes = out["boxes"][j][:n].copy()
            h0, w0, r, dw, dh = meta[j]
            if h0 > 0:
                boxes[:, [0, 2]] = (boxes[:, [0, 2]] - dw) / max(r, 1e-9)
                boxes[:, [1, 3]] = (boxes[:, [1, 3]] - dh) / max(r, 1e-9)
                boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, w0)
                boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, h0)
            data = np.concatenate(
                [boxes, out["scores"][j][:n, None], out["cls"][j][:n, None]], 1)
            im = imgs[j]
            if h0 > 0:
                import cv2

                nw, nh = int(round(w0 * r)), int(round(h0 * r))
                top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
                crop = im[max(top, 0):max(top, 0) + nh, max(left, 0):max(left, 0) + nw]
                if crop.size:
                    im = cv2.resize(crop, (int(w0), int(h0)),
                                    interpolation=cv2.INTER_LINEAR)
            results.append(Results(im, p, self.model.names, boxes=data))
    return results


BasePredictor.predict_files = predict_files
