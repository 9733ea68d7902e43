"""SAM family: promptable segmentation (reference ultralytics/models/sam)."""

from ultralytics_pro_tpu.models.sam.build import (
    SAM_BUILDERS,
    SAMModel,
    build_sam,
    build_sam_vit_b,
    build_sam_vit_h,
    build_sam_vit_l,
)
from ultralytics_pro_tpu.models.sam.model import SAM
from ultralytics_pro_tpu.models.sam.predict import (
    SAM2Predictor,
    SAM2VideoPredictor,
    SAMPredictor,
)

__all__ = [
    "SAM", "SAMModel", "SAMPredictor", "SAM2Predictor", "build_sam",
    "build_sam_vit_b", "build_sam_vit_l", "build_sam_vit_h", "SAM_BUILDERS",
    "SAM2VideoPredictor",
]
