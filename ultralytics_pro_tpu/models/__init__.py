"""Task bindings: per-task {trainer, validator, predictor} (reference
ultralytics/models/yolo/model.py:90 task_map)."""

from ultralytics_pro_tpu.engine.predictor import (
    ClassificationPredictor,
    DetectionPredictor,
    OBBPredictor,
    PosePredictor,
    SegmentationPredictor,
)
from ultralytics_pro_tpu.engine.trainer import (
    ClassificationTrainer,
    DetectionTrainer,
    OBBTrainer,
    PoseTrainer,
    SegmentationTrainer,
)
from ultralytics_pro_tpu.engine.validator import (
    ClassificationValidator,
    DetectionValidator,
    OBBValidator,
    PoseValidator,
    SegmentationValidator,
)

task_map = {
    "detect": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "segment": {
        "trainer": SegmentationTrainer,
        "validator": SegmentationValidator,
        "predictor": SegmentationPredictor,
    },
    "classify": {
        "trainer": ClassificationTrainer,
        "validator": ClassificationValidator,
        "predictor": ClassificationPredictor,
    },
    "pose": {
        "trainer": PoseTrainer,
        "validator": PoseValidator,
        "predictor": PosePredictor,
    },
    "obb": {
        "trainer": OBBTrainer,
        "validator": OBBValidator,
        "predictor": OBBPredictor,
    },
}
