"""YOLO-NAS (reference ultralytics/models/nas/model.py:98).

The reference wraps super-gradients' torch checkpoints behind the Model API
(detect-only, NMS applied downstream). This stack expresses the YOLO-NAS
architecture natively — quantization-aware QARepVGG stages + PAN + DFL head,
cfg/models/nas/yolo_nas.yaml — so NAS("yolo_nas_s.yaml") trains, validates,
predicts and exports like any other family. Pretrained super-gradients .pt
files still require an offline conversion (tools/convert_pt.py mapping)."""

from __future__ import annotations

from pathlib import Path

from ultralytics_pro_tpu.engine.model import Model


class NAS(Model):
    """YOLO-NAS facade (detect task only, reference model.py:98)."""

    def __init__(self, model: str = "yolo_nas_s.yaml", task=None, verbose: bool = False):
        stem = Path(str(model)).stem.replace("-", "_")
        if str(model).endswith(".pt"):
            raise NotImplementedError(
                "super-gradients .pt checkpoints must be converted offline "
                "(state_dict -> tools/convert_pt.py mapping); pass the "
                "converted .ckpt or a yolo_nas_{s,m,l}.yaml instead")
        if stem.startswith("yolo_nas"):
            scale = stem.split("_")[-1]
            model = f"yolo_nas-{scale}.yaml" if scale in "sml" else "yolo_nas.yaml"
        super().__init__(model, task=task or "detect", verbose=verbose)

    @property
    def task_map(self):
        from ultralytics_pro_tpu.engine.predictor import DetectionPredictor
        from ultralytics_pro_tpu.engine.trainer import DetectionTrainer
        from ultralytics_pro_tpu.engine.validator import DetectionValidator

        return {"detect": {"trainer": DetectionTrainer, "validator": DetectionValidator,
                           "predictor": DetectionPredictor}}
