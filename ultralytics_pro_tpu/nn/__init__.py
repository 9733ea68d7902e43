"""Model assembly layer: module zoo + YAML compiler + task models."""

from ultralytics_pro_tpu.nn.tasks import (
    TASK2MODEL,
    BaseModel,
    ClassificationModel,
    DetectionModel,
    OBBModel,
    PoseModel,
    SegmentationModel,
    YOLOModule,
    guess_model_task,
    parse_model,
    yaml_model_load,
)

__all__ = [
    "TASK2MODEL", "BaseModel", "ClassificationModel", "DetectionModel", "OBBModel",
    "PoseModel", "SegmentationModel", "YOLOModule", "guess_model_task", "parse_model",
    "yaml_model_load",
]
