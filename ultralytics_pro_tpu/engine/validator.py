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
        self.save_json = bool(self.args.get("save_json", False))
        self.jdict = []

    # -- original-frame helpers (reference detect/val.py scale_preds:418) -----
    @staticmethod
    def _to_original_frame(boxes: np.ndarray, imgsz, ori_shape, ratio_pad):
        """Rescale letterbox-frame xyxy boxes to the original image frame and
        clip (reference ops.scale_boxes:102 — both preds and GTs are evaluated
        in the original frame, detect/val.py:274,418)."""
        from ultralytics_pro_tpu.ops.boxes import scale_boxes

        if ori_shape is None or not len(boxes):
            return boxes
        return np.asarray(scale_boxes(imgsz, boxes.copy(), ori_shape, ratio_pad=ratio_pad))

    def pred_to_json(self, boxes_xyxy, conf, cls, im_file):
        """Append predictions (original frame) as COCO-format records
        (reference detect/val.py pred_to_json:385: top-left xywh, numeric
        image_id from the filename stem when possible)."""
        from pathlib import Path

        stem = Path(im_file or "0").stem
        image_id = int(stem) if stem.isnumeric() else stem
        b = boxes_xyxy.copy()
        b[:, 2:] -= b[:, :2]  # xyxy -> top-left xywh
        for j in range(len(b)):
            self.jdict.append({
                "image_id": image_id,
                "category_id": int(cls[j]),
                "bbox": [round(float(x), 3) for x in b[j]],
                "score": round(float(conf[j]), 5),
            })

    def save_predictions_json(self, save_dir) -> Optional[str]:
        """Write accumulated COCO-format predictions (reference
        detect/val.py:430 writes predictions.json before coco_evaluate)."""
        import json
        from pathlib import Path

        if not self.save_json:
            return None
        path = Path(save_dir) / "predictions.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.jdict, f)
        LOGGER.info(f"saved {len(self.jdict)} predictions to {path}")
        return str(path)

    def coco_evaluate(self, anno_json, pred_json):
        """COCO-official eval over the saved JSON (reference detect/val.py
        coco_evaluate:447): pycocotools when installed, else the vendored
        numpy implementation (utils/cocoeval.py) — save_json is verifiable
        end-to-end in this environment either way."""
        try:
            from pycocotools.coco import COCO  # noqa
            from pycocotools.cocoeval import COCOeval

            anno = COCO(str(anno_json))
            pred = anno.loadRes(str(pred_json))
            ev = COCOeval(anno, pred, "bbox")
            ev.evaluate(), ev.accumulate(), ev.summarize()
            return {"map50-95": ev.stats[0], "map50": ev.stats[1]}
        except ImportError:
            from ultralytics_pro_tpu.utils.cocoeval import COCOEvalNp

            stats = COCOEvalNp(str(anno_json), str(pred_json)).run()
            LOGGER.info(f"vendored COCO eval: mAP50-95 {stats['map50-95']:.4f} "
                        f"mAP50 {stats['map50']:.4f}")
            return stats

    def _build_jit(self, model):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.boxes import xywh2xyxy
        from ultralytics_pro_tpu.ops.nms import non_max_suppression

        conf, iou, max_det = self.conf, self.iou, self.max_det
        nc = model.nc
        head = model._head_spec()
        end2end = head is not None and head.type_name == "v10Detect"

        @jax.jit
        def run(variables, img_u8):
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            y, aux = model.apply(variables, x, train=False)
            if end2end:
                # (B, max_det, 6): xywh, conf, cls — NMS-free (reference
                # v10Detect inference path)
                return {
                    "boxes": xywh2xyxy(y[..., :4]),
                    "scores": y[..., 4],
                    "cls": y[..., 5].astype(jnp.int32),
                    "valid": y[..., 4] > conf,
                }
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
        from pathlib import Path as _P

        save_dir = self.args.get("save_dir") or str(
            _P(self.args.get("project") or "runs/val") / (self.args.get("name") or ""))
        if self.plots and hasattr(metrics, "plot_curves"):
            _P(save_dir).mkdir(parents=True, exist_ok=True)
            metrics.plot_curves(save_dir)  # PR/F1/P/R (reference metrics.py:621)
        if self.save_json:
            self.save_predictions_json(save_dir)
        return metrics

    def update_metrics(self, out: Dict[str, np.ndarray], batch: Dict, metrics: DetMetrics,
                       confusion: ConfusionMatrix):
        b = out["boxes"].shape[0] - int(batch.get("pad_count", 0))
        imgsz = batch["img"].shape[1:3]
        h, w = imgsz
        ori_shapes = batch.get("ori_shapes") or [None] * b
        ratio_pads = batch.get("ratio_pads") or [None] * b
        im_files = batch.get("im_files") or [None] * b
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

            # evaluate in the ORIGINAL image frame like the reference
            # (detect/val.py:274 matches scale_preds'd boxes; scale_boxes clips
            # to the original bounds, which letterbox-frame matching misses)
            if ori_shapes[i] is not None:
                pred_boxes = self._to_original_frame(pred_boxes, imgsz, ori_shapes[i], ratio_pads[i])
                gt_boxes = self._to_original_frame(gt_boxes, imgsz, ori_shapes[i], ratio_pads[i])
            if self.save_json and n:
                self.pred_to_json(pred_boxes, pred_conf, pred_cls, im_files[i])

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
    """Box + mask TP matching (reference models/yolo/segment/val.py:249)."""

    def _build_jit(self, model):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.nms import non_max_suppression

        conf, iou, max_det = self.conf, self.iou, self.max_det
        nc = model.nc

        @jax.jit
        def run(variables, img_u8):
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            y, aux = model.apply(variables, x, train=False)
            boxes, rest = y[..., :4], y[..., 4:]
            out = non_max_suppression(
                boxes, rest[..., :nc], extra=rest[..., nc:], conf_thres=conf,
                iou_thres=iou, max_det=max_det, multi_label=True,
            )
            out["protos"] = aux["protos"]
            return out

        return run

    def __call__(self, model, dataloader, names=None):
        from ultralytics_pro_tpu.utils.metrics import SegmentMetrics

        names = names or model.names
        metrics = SegmentMetrics(names)
        confusion = ConfusionMatrix(nc=len(names))
        run = self._build_jit(model)
        for batch in TQDM(dataloader, total=len(dataloader), desc="val"):
            out = run(model.variables, batch["img"])
            out = {k: np.asarray(v) for k, v in out.items()}
            self.update_metrics(out, batch, metrics, confusion)
        metrics.process()
        self.print_results(metrics, names)
        return metrics

    def update_metrics(self, out, batch, metrics, confusion):
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.masks import process_mask
        from ultralytics_pro_tpu.utils.metrics import mask_iou_np

        b = out["boxes"].shape[0] - int(batch.get("pad_count", 0))
        h, w = batch["img"].shape[1:3]
        mask_ratio = h // batch["masks"].shape[2] if "masks" in batch else 4
        ori_shapes = batch.get("ori_shapes") or [None] * b
        ratio_pads = batch.get("ratio_pads") or [None] * b
        for i in range(b):
            valid = out["valid"][i]
            n = int(valid.sum())
            pred_boxes = out["boxes"][i][:n]
            pred_conf = out["scores"][i][:n]
            pred_cls = out["cls"][i][:n].astype(np.float32)

            gmask = batch["mask_gt"][i]
            gt_n = batch["bboxes"][i][gmask]
            gt_cls = batch["cls"][i][gmask]
            cx, cy, bw, bh = gt_n[:, 0] * w, gt_n[:, 1] * h, gt_n[:, 2] * w, gt_n[:, 3] * h
            gt_boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1) if len(gt_n) else np.zeros((0, 4))

            # box matching in the original frame (masks stay in the letterbox
            # frame where protos live — both pred and GT masks share it)
            box_p, box_g = pred_boxes, gt_boxes
            if ori_shapes[i] is not None:
                box_p = self._to_original_frame(pred_boxes, (h, w), ori_shapes[i], ratio_pads[i])
                box_g = self._to_original_frame(gt_boxes, (h, w), ori_shapes[i], ratio_pads[i])
            iou = box_iou_np(box_g, box_p) if n and len(box_g) else np.zeros((len(box_g), n))
            tp = match_predictions(pred_cls, gt_cls, iou)

            tp_m = np.zeros_like(tp)
            if n and len(gt_boxes) and "masks" in batch:
                pm = np.asarray(process_mask(
                    jnp.asarray(out["protos"][i]), jnp.asarray(out["extra"][i][:n]),
                    jnp.asarray(pred_boxes), (h, w),
                )) > 0.5  # (n, mh, mw)
                gm = batch["masks"][i][gmask] > 0.5  # (m, mh, mw)
                miou = mask_iou_np(gm.reshape(len(gm), -1).astype(np.float32),
                                   pm.reshape(n, -1).astype(np.float32))
                tp_m = match_predictions(pred_cls, gt_cls, miou)
            metrics.update_stats(tp, pred_conf, pred_cls, gt_cls, tp_m=tp_m)

    def print_results(self, metrics, names):
        mp, mr, map50, map5095 = metrics.box.mean_results()
        sm = metrics.seg.mean_results()
        LOGGER.info(f"{'all':>12}  box mAP50 {map50:.3f} mAP {map5095:.3f} | mask mAP50 {sm[2]:.3f} mAP {sm[3]:.3f}")


class PoseValidator(DetectionValidator):
    """Box + OKS keypoint matching (reference models/yolo/pose/val.py:259)."""

    def _build_jit(self, model):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.nms import non_max_suppression

        conf, iou, max_det = self.conf, self.iou, self.max_det
        nc = model.nc

        @jax.jit
        def run(variables, img_u8):
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            y, aux = model.apply(variables, x, train=False)
            boxes, rest = y[..., :4], y[..., 4:]
            return non_max_suppression(
                boxes, rest[..., :nc], extra=rest[..., nc:], conf_thres=conf,
                iou_thres=iou, max_det=max_det, multi_label=True,
            )

        return run

    def __call__(self, model, dataloader, names=None):
        from ultralytics_pro_tpu.utils.metrics import PoseMetrics

        names = names or model.names
        metrics = PoseMetrics(names)
        confusion = ConfusionMatrix(nc=len(names))
        run = self._build_jit(model)
        self.kpt_shape = None
        for batch in TQDM(dataloader, total=len(dataloader), desc="val"):
            out = run(model.variables, batch["img"])
            out = {k: np.asarray(v) for k, v in out.items()}
            self.update_metrics(out, batch, metrics, confusion)
        metrics.process()
        mp, mr, map50, map5095 = metrics.box.mean_results()
        pm = metrics.pose.mean_results()
        LOGGER.info(f"{'all':>12}  box mAP50 {map50:.3f} | pose mAP50 {pm[2]:.3f}")
        return metrics

    def update_metrics(self, out, batch, metrics, confusion):
        import numpy as np

        from ultralytics_pro_tpu.ops.iou import kpt_iou

        OKS_SIGMA = np.array([26, 25, 25, 35, 35, 79, 79, 72, 72, 62, 62, 107,
                              107, 87, 87, 89, 89], np.float32) / 1000.0
        b = out["boxes"].shape[0] - int(batch.get("pad_count", 0))
        h, w = batch["img"].shape[1:3]
        for i in range(b):
            valid = out["valid"][i]
            n = int(valid.sum())
            pred_boxes = out["boxes"][i][:n]
            pred_conf = out["scores"][i][:n]
            pred_cls = out["cls"][i][:n].astype(np.float32)
            pred_kpts = out.get("extra")
            gmask = batch["mask_gt"][i]
            gt_n = batch["bboxes"][i][gmask]
            gt_cls = batch["cls"][i][gmask]
            cx, cy, bw, bh = gt_n[:, 0] * w, gt_n[:, 1] * h, gt_n[:, 2] * w, gt_n[:, 3] * h
            gt_boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1) if len(gt_n) else np.zeros((0, 4))

            iou = box_iou_np(gt_boxes, pred_boxes) if n and len(gt_boxes) else np.zeros((len(gt_boxes), n))
            tp = match_predictions(pred_cls, gt_cls, iou)
            tp_p = np.zeros_like(tp)
            if n and len(gt_boxes) and pred_kpts is not None and "keypoints" in batch:
                k3 = batch["keypoints"][i][gmask].copy()  # (m, K, 3) normalized
                k3[..., 0] *= w
                k3[..., 1] *= h
                nk = k3.shape[1]
                pk = pred_kpts[i][:n].reshape(n, nk, -1)
                sigma = OKS_SIGMA if nk == 17 else np.ones(nk, np.float32) / nk
                area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]) * 0.53
                oks = np.asarray(kpt_iou(k3, pk[..., :2], area, sigma))
                tp_p = match_predictions(pred_cls, gt_cls, oks)
            metrics.update_stats(tp, pred_conf, pred_cls, gt_cls, tp_p=tp_p)


class OBBValidator(DetectionValidator):
    """Rotated-box validation via probiou matching + rotated NMS (reference
    models/yolo/obb/val.py:291)."""

    def _build_jit(self, model):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.nms import non_max_suppression_rotated

        conf, iou, max_det = self.conf, self.iou, self.max_det
        nc = model.nc

        @jax.jit
        def run(variables, img_u8):
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            y, aux = model.apply(variables, x, train=False)
            # y = [xywh, cls..., angle]
            rb = jnp.concatenate([y[..., :4], y[..., 4 + nc:5 + nc]], axis=-1)
            return non_max_suppression_rotated(
                rb, y[..., 4:4 + nc], conf_thres=conf, iou_thres=iou, max_det=max_det,
            )

        return run

    def __call__(self, model, dataloader, names=None):
        from ultralytics_pro_tpu.utils.metrics import OBBMetrics

        names = names or model.names
        metrics = OBBMetrics(names)
        run = self._build_jit(model)
        self._dota = [] if self.save_json else None
        for batch in TQDM(dataloader, total=len(dataloader), desc="val"):
            out = run(model.variables, batch["img"])
            out = {k: np.asarray(v) for k, v in out.items()}
            self.update_metrics_rotated(out, batch, metrics)
        metrics.process()
        self.print_results(metrics, names)
        if self._dota is not None:
            self.save_dota(self.args.get("save_dir", "."), names)
        return metrics

    def save_dota(self, save_dir, names):
        """DOTA submission format, merged by image (reference obb/val.py:291
        eval path): one Task1_<class>.txt per class with
        `image_id conf x1 y1 x2 y2 x3 y3 x4 y4` polygon rows."""
        from collections import defaultdict
        from pathlib import Path

        from ultralytics_pro_tpu.ops.boxes import xywhr2xyxyxyxy

        per_class = defaultdict(list)
        for (im_file, rb, conf, cls) in self._dota:
            if not len(rb):
                continue
            polys = np.asarray(xywhr2xyxyxyxy(rb)).reshape(len(rb), 8)
            stem = Path(im_file).stem if im_file else "image"
            for p8, cf, c in zip(polys, conf, cls):
                name = str(names.get(int(c), int(c))).replace(" ", "-")
                per_class[name].append(
                    f"{stem} {cf:.4f} " + " ".join(f"{v:.2f}" for v in p8))
        out = Path(save_dir) / "predictions_dota"
        out.mkdir(parents=True, exist_ok=True)
        for name, rows in per_class.items():
            (out / f"Task1_{name}.txt").write_text("\n".join(rows) + "\n")
        return out

    def update_metrics_rotated(self, out, batch, metrics):
        import jax.numpy as jnp

        from ultralytics_pro_tpu.ops.iou import batch_probiou

        b = out["rboxes"].shape[0] - int(batch.get("pad_count", 0))
        h, w = batch["img"].shape[1:3]
        for i in range(b):
            valid = out["valid"][i]
            n = int(valid.sum())
            pred_rb = out["rboxes"][i][:n]
            pred_conf = out["scores"][i][:n]
            pred_cls = out["cls"][i][:n].astype(np.float32)
            gmask = batch["mask_gt"][i]
            gt_rb = batch["bboxes"][i][gmask].copy()  # (m, 5) normalized xywh + rad
            gt_cls = batch["cls"][i][gmask]
            if len(gt_rb):
                gt_rb[:, 0] *= w
                gt_rb[:, 1] *= h
                gt_rb[:, 2] *= w
                gt_rb[:, 3] *= h
            iou = (np.asarray(batch_probiou(jnp.asarray(gt_rb), jnp.asarray(pred_rb)))
                   if n and len(gt_rb) else np.zeros((len(gt_rb), n)))
            tp = match_predictions(pred_cls, gt_cls, iou)
            metrics.update_stats(tp, pred_conf, pred_cls, gt_cls)
            if getattr(self, "_dota", None) is not None:
                im_files = batch.get("im_files") or [""] * (i + 1)
                ori_shapes = batch.get("ori_shapes") or [None] * (i + 1)
                rb = pred_rb.copy()
                ori = ori_shapes[i] if i < len(ori_shapes) else None
                if ori is not None and len(rb):
                    # undo the letterbox: centers unpad+unscale, sizes unscale
                    h0, w0 = ori
                    r = min(h / h0, w / w0)
                    dw, dh = (w - w0 * r) / 2, (h - h0 * r) / 2
                    rb[:, 0] = (rb[:, 0] - dw) / r
                    rb[:, 1] = (rb[:, 1] - dh) / r
                    rb[:, 2:4] /= r
                self._dota.append((im_files[i] if i < len(im_files) else "",
                                   rb, pred_conf, pred_cls))


class ClassificationValidator:
    """top1/top5 over a classification dataloader (reference
    models/yolo/classify/val.py:222)."""

    def __init__(self, args=None):
        self.args = dict(args or {})

    def __call__(self, model, dataloader, names=None):
        import jax
        import jax.numpy as jnp

        from ultralytics_pro_tpu.utils.metrics import ClassifyMetrics

        @jax.jit
        def run(variables, img_u8):
            x = (img_u8[..., ::-1] if img_u8.shape[-1] == 3 else img_u8).astype(jnp.float32) / 255.0
            return model.apply(variables, x, train=False)

        metrics = ClassifyMetrics()
        for batch in dataloader:
            probs = np.asarray(run(model.variables, batch["img"]))
            top5 = probs.argsort(-1)[:, ::-1][:, :5]
            metrics.update(batch["cls"], top5)
        metrics.process()
        LOGGER.info(f"top1 {metrics.top1:.3f}  top5 {metrics.top5:.3f}")
        return metrics
