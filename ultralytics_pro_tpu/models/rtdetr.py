"""RT-DETR task bindings: NMS-free trainer/validator/predictor + facade.

Behavioral parity with the reference RT-DETR package (ultralytics/models/rtdetr/:
model.py:63 facade, train.py:89 no-aug val transforms, val.py:211 RTDETRValidator
top-300 + conf filter with NO NMS, predict.py:89).
"""

from __future__ import annotations

import numpy as np

from ultralytics_pro_tpu.engine.model import Model
from ultralytics_pro_tpu.engine.predictor import BasePredictor
from ultralytics_pro_tpu.engine.results import Results
from ultralytics_pro_tpu.engine.trainer import BaseTrainer
from ultralytics_pro_tpu.engine.validator import DetectionValidator
from ultralytics_pro_tpu.utils import LOGGER, TQDM
from ultralytics_pro_tpu.utils.metrics import DetMetrics, box_iou_np, match_predictions


class RTDETRTrainer(BaseTrainer):
    """RT-DETR trainer: AdamW-friendly defaults, DETR loss (reference
    models/rtdetr/train.py:89)."""

    def criterion(self):
        from ultralytics_pro_tpu.utils.detr_loss import RTDETRDetectionLoss

        return RTDETRDetectionLoss(nc=self.model.nc)

    def host_preprocess_batch(self, batch):
        """Attach CDN denoising queries (reference RTDETRDetectionModel.loss
        builds them via get_cdn_group, tasks.py:1663). Host-side noise keeps
        the jitted step pure; shapes are static (G and group count fixed)."""
        from ultralytics_pro_tpu.utils.detr_loss import make_cdn_batch

        if not self.args.get("dn_train", True):
            return batch
        batch = dict(batch)
        batch["dn"] = make_cdn_batch(
            batch["cls"], batch["bboxes"], batch["mask_gt"], nc=self.model.nc,
            num_dn=int(self.args.get("num_dn", 100)),
        )
        return batch


class RTDETRValidator(DetectionValidator):
    """No-NMS validation: scores already query-sparse; top-300 + conf filter
    (reference models/rtdetr/val.py:211)."""

    def _build_jit(self, model):
        import jax
        import jax.numpy as jnp

        @jax.jit
        def run(variables, img_u8):
            x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
            y, aux = model.module.apply(variables, x, train=False)
            # y: (B, nq, 4+nc), boxes normalized cxcywh
            boxes, scores = y[..., :4], y[..., 4:]
            conf = scores.max(-1)
            cls = scores.argmax(-1).astype(jnp.int32)
            return {"boxes": boxes, "scores": conf, "cls": cls,
                    "valid": conf > 0.0}

        return run

    def update_metrics(self, out, batch, metrics, confusion):
        b = out["boxes"].shape[0]
        h, w = batch["img"].shape[1:3]
        for i in range(b):
            conf = out["scores"][i]
            keep = conf > self.conf
            n = int(keep.sum())
            bx = out["boxes"][i][keep]  # normalized cxcywh
            pred_boxes = np.stack([
                (bx[:, 0] - bx[:, 2] / 2) * w, (bx[:, 1] - bx[:, 3] / 2) * h,
                (bx[:, 0] + bx[:, 2] / 2) * w, (bx[:, 1] + bx[:, 3] / 2) * h,
            ], 1) if n else np.zeros((0, 4))
            pred_conf = conf[keep]
            pred_cls = out["cls"][i][keep].astype(np.float32)

            gmask = batch["mask_gt"][i]
            gt_n = batch["bboxes"][i][gmask]
            gt_cls = batch["cls"][i][gmask]
            cx, cy, bw, bh = gt_n[:, 0] * w, gt_n[:, 1] * h, gt_n[:, 2] * w, gt_n[:, 3] * h
            gt_boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1) if len(gt_n) else np.zeros((0, 4))

            iou = box_iou_np(gt_boxes, pred_boxes) if n and len(gt_boxes) else np.zeros((len(gt_boxes), n))
            tp = match_predictions(pred_cls, gt_cls, iou)
            metrics.update_stats(tp, pred_conf, pred_cls, gt_cls)


class RTDETRPredictor(BasePredictor):
    """NMS-free predictor (reference models/rtdetr/predict.py:89)."""

    def _build_jit(self):
        import jax
        import jax.numpy as jnp

        model = self.model

        @jax.jit
        def run(variables, img_u8):
            x = img_u8[..., ::-1].astype(jnp.float32) / 255.0
            y, aux = model.module.apply(variables, x, train=False)
            return y  # (B, nq, 4+nc)

        return run

    def stream_inference(self, source):
        if self._jitted is None:
            self._jitted = self._build_jit()
        for path, im0 in self.load_images(source):
            batch, _ = self.preprocess([im0])
            y = np.asarray(self._jitted(self.model.variables, batch))[0]
            boxes, scores = y[:, :4], y[:, 4:]
            conf = scores.max(-1)
            cls = scores.argmax(-1)
            keep = conf > self.conf
            bx = boxes[keep]
            h1, w1 = batch.shape[1:3]
            # normalized cxcywh on the letterboxed frame -> original pixels
            gain = min(h1 / im0.shape[0], w1 / im0.shape[1])
            pad_w = round((w1 - im0.shape[1] * gain) / 2 - 0.1)
            pad_h = round((h1 - im0.shape[0] * gain) / 2 - 0.1)
            x1 = ((bx[:, 0] - bx[:, 2] / 2) * w1 - pad_w) / gain
            y1 = ((bx[:, 1] - bx[:, 3] / 2) * h1 - pad_h) / gain
            x2 = ((bx[:, 0] + bx[:, 2] / 2) * w1 - pad_w) / gain
            y2 = ((bx[:, 1] + bx[:, 3] / 2) * h1 - pad_h) / gain
            data = np.stack([x1, y1, x2, y2, conf[keep], cls[keep].astype(np.float32)], 1)
            yield Results(im0, path, self.model.names, boxes=data)


class RTDETR(Model):
    """RT-DETR facade (reference models/rtdetr/model.py:63)."""

    def __init__(self, model="rtdetr-l.yaml", **kwargs):
        super().__init__(model, task="detect", **kwargs)
        # swap the task bindings to the RT-DETR quadruple
        self._bindings = {
            "trainer": RTDETRTrainer,
            "validator": RTDETRValidator,
            "predictor": RTDETRPredictor,
        }

    def predict(self, source=None, stream: bool = False, **kwargs):
        if self.model.variables is None:
            self.model.init_params(imgsz=int(kwargs.get("imgsz", 640)))
        args = self._merged_args(**kwargs)
        args["conf"] = args.get("conf") or 0.25
        if self.predictor is None:
            self.predictor = RTDETRPredictor(self.model, args)
        return self.predictor(source, stream=stream)

    def val(self, data=None, **kwargs):
        from ultralytics_pro_tpu.data.build import DataLoader
        from ultralytics_pro_tpu.data.dataset import YOLODataset
        from ultralytics_pro_tpu.data.utils import check_det_dataset

        args = self._merged_args(**kwargs)
        d = check_det_dataset(data or args.get("data"))
        imgsz = int(args.get("imgsz", 640))
        if self.model.variables is None:
            self.model.init_params(imgsz=imgsz)
        self.model.names = d["names"]
        dataset = YOLODataset(d[args.get("split", "val")], imgsz=imgsz, augment=False, data=d)
        loader = DataLoader(dataset, batch_size=int(args.get("batch", 16)), shuffle=False,
                            drop_last=False, max_gt=int(args.get("max_gt", 128)))
        validator = RTDETRValidator(args)
        return validator(self.model, loader, names=d["names"])

    def train(self, data=None, **kwargs):
        from ultralytics_pro_tpu.data.build import DataLoader
        from ultralytics_pro_tpu.data.dataset import YOLODataset
        from ultralytics_pro_tpu.data.utils import check_det_dataset
        from ultralytics_pro_tpu.nn.tasks import TASK2MODEL as T2M

        args = self._merged_args(**kwargs)
        d = check_det_dataset(data or args.get("data"))
        if d["nc"] != self.model.nc:
            self.model = T2M["detect"](self.model.yaml, nc=d["nc"])
        self.model.names = d["names"]
        imgsz = int(args.get("imgsz", 640))
        if self.model.variables is None:
            self.model.init_params(imgsz=imgsz)
        train_set = YOLODataset(d["train"], imgsz=imgsz, augment=bool(args.get("augment", True)),
                                hyp={k: args[k] for k in ("mosaic", "hsv_h", "hsv_s", "hsv_v",
                                                          "fliplr", "flipud", "degrees", "translate",
                                                          "scale", "shear", "perspective") if k in args},
                                data=d)
        loader = DataLoader(train_set, batch_size=int(args.get("batch", 16)), shuffle=True,
                            drop_last=True, max_gt=int(args.get("max_gt", 128)),
                            workers=int(args.get("workers", 8)))
        self.trainer = RTDETRTrainer(self.model, args)
        self.trainer.train(loader, val_fn=None)
        return None
