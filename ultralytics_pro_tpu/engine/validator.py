"""Validator: dataloader -> jit forward+NMS -> TP matching -> DetMetrics.

Behavioral parity with the reference validator (ultralytics/engine/validator.py:43
BaseValidator.__call__:131, match_predictions:267; models/yolo/detect/val.py:21
DetectionValidator). The device path (forward + NMS) is one jitted function
over fixed-shape batches; matching and AP run host-side numpy.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER, TQDM, Profile
from ultralytics_pro_tpu.utils.metrics import (
    ConfusionMatrix,
    DetMetrics,
    box_iou_np,
    match_predictions,
)


class DetectionValidator:
    """Evaluate a detection model over a dataloader."""

    def __init__(self, args: Dict | None = None):
        self.args = dict(args or {})
        self.conf = float(self.args.get("conf") or 0.001)
        self.iou = float(self.args.get("iou", 0.7))
        self.max_det = int(self.args.get("max_det", 300))
        self.single_cls = bool(self.args.get("single_cls", False))
        self.plots = bool(self.args.get("plots", False))

    def _build_jit(self, model):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.nms import non_max_suppression

        conf, iou, max_det = self.conf, self.iou, self.max_det
        nc = model.nc

        @jax.jit
        def run(variables, img_u8):
            x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
            y, aux = model.module.apply(variables, x, train=False)
            boxes, rest = y[..., :4], y[..., 4:]
            scores = rest[..., :nc]
            return non_max_suppression(
                boxes, scores, conf_thres=conf, iou_thres=iou, max_det=max_det,
                multi_label=True,
            )

        return run

    def __call__(self, model, dataloader, names: Optional[Dict] = None) -> DetMetrics:
        names = names or model.names
        metrics = DetMetrics(names)
        confusion = ConfusionMatrix(nc=len(names))
        run = self._build_jit(model)
        profilers = (Profile(), Profile(), Profile())

        n_batches = len(dataloader)
        for batch in TQDM(dataloader, total=n_batches, desc="val"):
            with profilers[1]:
                out = run(model.variables, batch["img"])
                out = {k: np.asarray(v) for k, v in out.items()}
            with profilers[2]:
                self.update_metrics(out, batch, metrics, confusion)

        metrics.process()
        metrics.speed = {
            "preprocess": profilers[0].t, "inference": profilers[1].t, "postprocess": profilers[2].t,
        }
        self.print_results(metrics, names)
        self.confusion = confusion
        return metrics

    def update_metrics(self, out: Dict[str, np.ndarray], batch: Dict, metrics: DetMetrics,
                       confusion: ConfusionMatrix):
        b = out["boxes"].shape[0]
        imgsz = batch["img"].shape[1:3]
        h, w = imgsz
        for i in range(b):
            valid = out["valid"][i]
            n = int(valid.sum())
            pred_boxes = out["boxes"][i][:n]
            pred_conf = out["scores"][i][:n]
            pred_cls = out["cls"][i][:n].astype(np.float32)
            if self.single_cls:
                pred_cls = np.zeros_like(pred_cls)

            gmask = batch["mask_gt"][i]
            gt_n = batch["bboxes"][i][gmask]  # normalized xywh in letterbox frame
            gt_cls = batch["cls"][i][gmask]
            # to pixel xyxy
            cx, cy, bw, bh = gt_n[:, 0] * w, gt_n[:, 1] * h, gt_n[:, 2] * w, gt_n[:, 3] * h
            gt_boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1) if len(gt_n) else np.zeros((0, 4))

            iou = box_iou_np(gt_boxes, pred_boxes) if n and len(gt_boxes) else np.zeros((len(gt_boxes), n))
            tp = match_predictions(pred_cls, gt_cls, iou)
            metrics.update_stats(tp, pred_conf, pred_cls, gt_cls)
            if self.plots:
                det = np.concatenate([pred_boxes, pred_conf[:, None], pred_cls[:, None]], 1)
                confusion.process_batch(det, gt_boxes, gt_cls)

    def print_results(self, metrics: DetMetrics, names):
        mp, mr, map50, map5095 = metrics.mean_results()
        LOGGER.info(f"{'all':>12}  P {mp:.3f}  R {mr:.3f}  mAP50 {map50:.3f}  mAP50-95 {map5095:.3f}")


class SegmentationValidator(DetectionValidator):
    """Adds mask TP matching (reference models/yolo/segment/val.py) — lands
    with the segment train path."""
