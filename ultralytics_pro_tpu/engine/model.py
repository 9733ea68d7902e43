"""Model facade — the user-facing entry point.

Behavioral parity with the reference Model facade (ultralytics/engine/model.py:29:
.train:716 .val:585 .predict:482 .track:542 .export:670 .benchmark:620) and the
YOLO task_map wiring (models/yolo/model.py:90). Holds a task model (flax module
+ variables) and lazily builds the right trainer/validator/predictor.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Union

import numpy as np

from ultralytics_pro_tpu.cfg import DEFAULT_CFG_DICT, TASK2DATA, get_cfg
from ultralytics_pro_tpu.nn.tasks import (
    TASK2MODEL as TASK2MODELCLS,
    model_class_for,
    BaseModel,
    guess_model_task,
    yaml_model_load,
)
from ultralytics_pro_tpu.utils import LOGGER, colorstr


class Model:
    """Unified YOLO-style model facade."""

    def __init__(self, model: Union[str, Path, dict] = "yolov8n.yaml", task: Optional[str] = None,
                 verbose: bool = False):
        self.overrides: Dict[str, Any] = {}
        self.predictor = None
        self.trainer = None
        self.ckpt = None
        self._embed_fn = None
        model_str = str(model)
        if model_str.endswith(".ckpt") or model_str.endswith(".pkl"):
            self._load(model_str, task)
        else:
            self._new(model, task, verbose)

    # -- constructors ---------------------------------------------------------
    def _new(self, cfg, task: Optional[str], verbose: bool = False):
        d = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        self.task = task or guess_model_task(d)
        cls = model_class_for(d, self.task)
        self.model: BaseModel = cls(d, verbose=verbose)
        self.cfg = cfg
        self.model_name = str(cfg)

    def _load(self, weights: str, task: Optional[str] = None):
        from ultralytics_pro_tpu.engine.trainer import load_pickle

        ckpt = load_pickle(weights)
        self.ckpt = ckpt
        d = ckpt.get("model_yaml")
        if d is None:
            raise ValueError(f"checkpoint {weights} carries no model yaml")
        self.task = task or guess_model_task(d)
        cls = model_class_for(d, self.task)
        self.model = cls(d)
        self.model.variables = {
            "params": ckpt.get("ema") or ckpt["params"],
            "batch_stats": ckpt["batch_stats"],
        }
        self.overrides = dict(ckpt.get("train_args") or {})
        self.overrides.pop("save_dir", None)
        self.model_name = weights

    # -- core modes -----------------------------------------------------------
    def _merged_args(self, **kwargs) -> Dict:
        args = {**DEFAULT_CFG_DICT, **self.overrides, **kwargs}
        args.pop("mode", None)
        return args

    def predict(self, source=None, stream: bool = False, **kwargs):
        from ultralytics_pro_tpu.models import task_map

        if self.model.variables is None:
            self.model.init_params(imgsz=int(kwargs.get("imgsz", 640)))
        args = self._merged_args(**kwargs)
        args["conf"] = args.get("conf") or 0.25
        predictor_cls = task_map[self.task]["predictor"]
        if self.predictor is None or self.predictor.args != args:
            self.predictor = predictor_cls(self.model, args)
        return self.predictor(source, stream=stream)

    def __call__(self, source=None, stream: bool = False, **kwargs):
        return self.predict(source, stream, **kwargs)

    def quantize_int8(self, calib_batches=None, **kwargs):
        """PTQ int8 serving (nn/quantize.py; TRT-INT8 analog on the v5e int8
        MXU). calib_batches: list of NHWC float [0,1] image arrays; defaults
        to a synthetic batch with a loud warning (real calibration data gives
        the tight mAP deltas measured in tests/test_int8_quant.py)."""
        import jax.numpy as jnp
        import numpy as np

        from ultralytics_pro_tpu.utils import LOGGER

        if self.model.variables is None:
            self.model.init_params()
        if calib_batches is None:
            LOGGER.warning(
                "quantize_int8: no calibration batches given - calibrating on "
                "synthetic noise; pass real images for production accuracy")
            rng = np.random.default_rng(0)
            calib_batches = [jnp.asarray(rng.uniform(0, 1, (4, 640, 640, 3)).astype(np.float32))]
        qt = self.model.quantize_int8(calib_batches, **kwargs)
        self.predictor = None  # next predict re-jits through the int8 apply
        return qt

    def embed(self, source=None, imgsz: int = 224, **kwargs):
        """Pooled, L2-normalized feature vectors from the last neck maps
        (reference Model.embed engine/model.py:452). source: image array,
        list of arrays, or path(s). Returns (N, D) numpy."""
        import cv2
        import jax
        import jax.numpy as jnp
        import numpy as np

        if self.model.variables is None:
            self.model.init_params(imgsz=imgsz)
        if self._embed_fn is None:
            self._embed_fn = jax.jit(
                lambda v, x: self.model.module.apply(v, x, train=False, embed=True))
        imgs = source if isinstance(source, (list, tuple)) else [source]
        batch = []
        for im in imgs:
            if not isinstance(im, np.ndarray):
                im = cv2.imread(str(im))
            im = cv2.resize(im, (imgsz, imgsz), interpolation=cv2.INTER_LINEAR)
            batch.append(im)
        x = jnp.asarray(np.stack(batch))[..., ::-1].astype(jnp.float32) / 255.0
        return np.asarray(self._embed_fn(self.model.variables, x))

    def val(self, data=None, **kwargs):
        from ultralytics_pro_tpu.data.build import DataLoader, collate_classify
        from ultralytics_pro_tpu.data.dataset import ClassificationDataset, YOLODataset
        from ultralytics_pro_tpu.data.utils import check_cls_dataset, check_det_dataset
        from ultralytics_pro_tpu.models import task_map

        args = self._merged_args(**kwargs)
        imgsz = int(args.get("imgsz", 640))
        if self.model.variables is None:
            self.model.init_params(imgsz=imgsz)
        if self.task == "classify":
            d = check_cls_dataset(data or args.get("data"))
            dataset = ClassificationDataset(d["val"], imgsz=imgsz, augment=False)
            loader = DataLoader(dataset, batch_size=int(args.get("batch", 16)), shuffle=False,
                                drop_last=False, collate_fn=collate_classify)
        else:
            d = check_det_dataset(data or args.get("data") or TASK2DATA[self.task])
            ch = int(d.get("channels", 3) or 3)
            ch = 3 if ch == 1 else ch
            if ch != getattr(self.model, "ch", 3):
                y = self.model.yaml if isinstance(self.model.yaml, dict) else {}
                self.model = model_class_for(y, self.task)(self.model.yaml, nc=d["nc"], ch=ch)
                self.model.init_params(imgsz=imgsz)
            self.model.names = d["names"]
            dataset = YOLODataset(d[args.get("split", "val")], imgsz=imgsz,
                                  augment=False, data=d, task=self.task,
                                  rect=bool(args.get("rect", False)),
                                  batch_size=int(args.get("batch", 16)))
            loader = DataLoader(dataset, batch_size=int(args.get("batch", 16)), shuffle=False,
                                drop_last=False, max_gt=int(args.get("max_gt", 128)))
        validator_cls = task_map[self.task]["validator"]
        validator = validator_cls(args)
        return validator(self.model, loader, names=d["names"])

    def train(self, data=None, **kwargs):
        from ultralytics_pro_tpu.data.build import DataLoader, collate_classify
        from ultralytics_pro_tpu.data.dataset import ClassificationDataset, YOLODataset
        from ultralytics_pro_tpu.data.utils import check_cls_dataset, check_det_dataset
        from ultralytics_pro_tpu.models import task_map

        args = self._merged_args(**kwargs)
        if self.task == "classify":
            return self._train_classify(data, args)
        d = check_det_dataset(data or args.get("data") or TASK2DATA[self.task])
        rebuild = d["nc"] != self.model.nc
        # multispectral: the dataset's channels key re-stems the model
        # (reference coco8-multispectral.yaml; model rebuilt with ch=channels)
        ch = int(d.get("channels", 3) or 3)
        ch = 3 if ch == 1 else ch  # grayscale replicates to the 3-ch pipeline
        if ch != getattr(self.model, "ch", 3):
            y = self.model.yaml if isinstance(self.model.yaml, dict) else {}
            self.model = model_class_for(y, self.task)(self.model.yaml, nc=d["nc"], ch=ch)
            rebuild = False
        if self.task == "pose" and d.get("kpt_shape"):
            import copy

            y = copy.deepcopy(self.model.yaml if isinstance(self.model.yaml, dict) else {})
            for row in y.get("head", []):
                if row[2] == "Pose" and list(row[3][1]) != list(d["kpt_shape"]):
                    row[3] = [row[3][0], list(d["kpt_shape"])]
                    rebuild = True
            if rebuild:
                self.model = model_class_for(y, self.task)(y, nc=d["nc"])
        elif rebuild:
            y = self.model.yaml if isinstance(self.model.yaml, dict) else {}
            self.model = model_class_for(y, self.task)(self.model.yaml, nc=d["nc"])
        self.model.names = d["names"]
        if hasattr(self.model, "set_classes"):
            # prompt models (World/YOLOE): the dataset class names ARE the
            # text vocabulary (reference yoloe/train.py, world/train.py)
            self.model.set_classes([str(v) for v in d["names"].values()])
        imgsz = int(args.get("imgsz", 640))
        if self.model.variables is None:
            self.model.init_params(imgsz=imgsz)

        hyp = {k: args[k] for k in ("mosaic", "mixup", "cutmix", "copy_paste", "degrees",
                                    "translate", "scale", "shear", "perspective", "hsv_h",
                                    "hsv_s", "hsv_v", "flipud", "fliplr") if k in args}
        train_set = YOLODataset(d["train"], imgsz=imgsz, augment=bool(args.get("augment", True)),
                                hyp=hyp, data=d, task=self.task,
                                cache=args.get("cache") or None)
        train_loader = DataLoader(train_set, batch_size=int(args.get("batch", 16)), shuffle=True,
                                  drop_last=True, max_gt=int(args.get("max_gt", 128)),
                                  workers=int(args.get("workers", 8)))

        trainer_cls = task_map[self.task]["trainer"]
        from ultralytics_pro_tpu.nn.tasks import YOLOEModel

        if isinstance(self.model, YOLOEModel):
            from ultralytics_pro_tpu.engine.trainer import YOLOETrainer, YOLOEVPTrainer

            trainer_cls = YOLOEVPTrainer if args.get("visual_prompt") else YOLOETrainer
        self.trainer = trainer_cls(self.model, args)

        val_fn = None
        if args.get("val", True) and d.get("val"):
            val_args = dict(args)

            def val_fn(model):
                try:
                    metrics = Model._quick_val(model, d, val_args, self.task)
                    return metrics.fitness
                except Exception as e:  # val must never kill training
                    LOGGER.info(f"val failed: {e}")
                    return None

        self.trainer.train(train_loader, val_fn=val_fn)
        return getattr(self.trainer, "metrics", None)

    def _train_classify(self, data, args):
        from ultralytics_pro_tpu.data.build import DataLoader, collate_classify
        from ultralytics_pro_tpu.data.dataset import ClassificationDataset
        from ultralytics_pro_tpu.data.utils import check_cls_dataset
        from ultralytics_pro_tpu.models import task_map

        d = check_cls_dataset(data or args.get("data"))
        if d["nc"] != self.model.nc:
            cls = TASK2MODELCLS[self.task]
            self.model = cls(self.model.yaml, nc=d["nc"])
        self.model.names = d["names"]
        imgsz = int(args.get("imgsz", 224))
        if self.model.variables is None:
            self.model.init_params(imgsz=imgsz)
        args["imgsz"] = imgsz
        train_set = ClassificationDataset(d["train"], imgsz=imgsz, augment=bool(args.get("augment", True)))
        loader = DataLoader(train_set, batch_size=int(args.get("batch", 16)), shuffle=True,
                            drop_last=True, collate_fn=collate_classify,
                            workers=int(args.get("workers", 8)))
        self.trainer = task_map["classify"]["trainer"](self.model, args)

        val_fn = None
        if args.get("val", True) and d.get("val"):
            val_set = ClassificationDataset(d["val"], imgsz=imgsz, augment=False)
            val_loader = DataLoader(val_set, batch_size=int(args.get("batch", 16)), shuffle=False,
                                    drop_last=False, collate_fn=collate_classify)

            def val_fn(model):
                try:
                    m = task_map["classify"]["validator"](args)(model, val_loader)
                    return m.fitness
                except Exception as e:
                    LOGGER.info(f"val failed: {e}")
                    return None

        self.trainer.train(loader, val_fn=val_fn)
        return getattr(self.trainer, "metrics", None)

    @staticmethod
    def _quick_val(model, d, args, task):
        from ultralytics_pro_tpu.data.build import DataLoader
        from ultralytics_pro_tpu.data.dataset import YOLODataset
        from ultralytics_pro_tpu.models import task_map

        dataset = YOLODataset(d["val"], imgsz=int(args.get("imgsz", 640)), augment=False,
                              data=d, task=task, rect=bool(args.get("rect", False)),
                              batch_size=int(args.get("batch", 16)))
        loader = DataLoader(dataset, batch_size=int(args.get("batch", 16)), shuffle=False,
                            drop_last=False, max_gt=int(args.get("max_gt", 128)))
        validator = task_map[task]["validator"](args)
        return validator(model, loader, names=d["names"])

    def track(self, source=None, stream: bool = False, persist: bool = False, **kwargs):
        from ultralytics_pro_tpu.trackers.track import register_tracker

        kwargs.setdefault("conf", 0.1)
        kwargs["mode"] = "track"
        kwargs.pop("mode")
        results = self.predict(source, stream=stream, **kwargs)
        return register_tracker(self, results, persist=persist, tracker_cfg=kwargs.get("tracker", "botsort.yaml"))

    def export(self, **kwargs):
        from ultralytics_pro_tpu.engine.exporter import Exporter

        args = self._merged_args(**kwargs)
        return Exporter(self.model, args)()

    def benchmark(self, **kwargs):
        from ultralytics_pro_tpu.utils.benchmarks import benchmark

        return benchmark(model=self, **kwargs)

    # -- introspection --------------------------------------------------------
    @property
    def names(self):
        return self.model.names

    def info(self, verbose: bool = True):
        return self.model.info(verbose=verbose)

    def save(self, path="model.ckpt"):
        from ultralytics_pro_tpu.engine.trainer import save_pickle

        v = self.model.variables or {}
        save_pickle(path, {
            "params": v.get("params"),
            "ema": None,
            "batch_stats": v.get("batch_stats"),
            "model_yaml": self.model.yaml,
            "train_args": self.overrides,
        })
        return path


class YOLO(Model):
    """YOLO entry point (reference models/yolo/model.py)."""


def _model_predict_files(self, paths, batch: int = 16, **kwargs):
    """Batched file prediction over the native C++ loader (predictor
    predict_files); same Results contract as predict()."""
    from ultralytics_pro_tpu.models import task_map

    if self.model.variables is None:
        self.model.init_params(imgsz=int(kwargs.get("imgsz", 640)))
    args = self._merged_args(**kwargs)
    args["conf"] = args.get("conf") or 0.25
    predictor_cls = task_map[self.task]["predictor"]
    if self.predictor is None or self.predictor.args != args:
        self.predictor = predictor_cls(self.model, args)
    return self.predictor.predict_files(paths, batch=batch)


Model.predict_files = _model_predict_files
