"""Video-analytics solutions (reference ultralytics/solutions/__init__.py:1-30)."""

from ultralytics_pro_tpu.solutions.apps import Inference, ParkingPtsSelection, SearchApp
from ultralytics_pro_tpu.solutions.config import SolutionConfig
from ultralytics_pro_tpu.solutions.solutions import (
    AIGym,
    Analytics,
    BaseSolution,
    DistanceCalculation,
    Heatmap,
    InstanceSegmentation,
    ObjectBlurrer,
    ObjectCounter,
    ObjectCropper,
    ParkingManagement,
    QueueManager,
    RegionCounter,
    SecurityAlarm,
    SimilaritySearch,
    SpeedEstimator,
    TrackZone,
    VisionEye,
)

__all__ = [
    "Inference", "SearchApp", "ParkingPtsSelection", "SolutionConfig",
    "AIGym", "Analytics", "BaseSolution", "DistanceCalculation", "Heatmap",
    "InstanceSegmentation", "ObjectBlurrer", "ObjectCounter", "ObjectCropper",
    "ParkingManagement", "QueueManager", "RegionCounter", "SecurityAlarm",
    "SimilaritySearch", "SpeedEstimator", "TrackZone", "VisionEye",
]
