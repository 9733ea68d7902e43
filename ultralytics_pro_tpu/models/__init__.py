"""Task bindings: per-task {trainer, validator, predictor} (reference
ultralytics/models/yolo/model.py:90 task_map)."""

from ultralytics_pro_tpu.engine.predictor import DetectionPredictor, SegmentationPredictor
from ultralytics_pro_tpu.engine.trainer import DetectionTrainer, SegmentationTrainer
from ultralytics_pro_tpu.engine.validator import DetectionValidator, SegmentationValidator

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
    # classify/pose/obb bindings land with their train/val paths
    "classify": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "pose": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
    "obb": {
        "trainer": DetectionTrainer,
        "validator": DetectionValidator,
        "predictor": DetectionPredictor,
    },
}
