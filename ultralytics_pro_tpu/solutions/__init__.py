"""Video-analytics solutions (reference ultralytics/solutions/__init__.py:1-30)."""

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
    "AIGym", "Analytics", "BaseSolution", "DistanceCalculation", "Heatmap",
    "InstanceSegmentation", "ObjectBlurrer", "ObjectCounter", "ObjectCropper",
    "ParkingManagement", "QueueManager", "RegionCounter", "SecurityAlarm",
    "SimilaritySearch", "SpeedEstimator", "TrackZone", "VisionEye",
]
