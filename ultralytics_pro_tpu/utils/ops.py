"""Drop-in import-compat shim: the reference exposes box math / NMS / profiling
under `ultralytics.utils.ops` (ops.py:18 Profile, :73-693 converters,
nms.py:13); users porting code can `from ultralytics_pro_tpu.utils import ops`
and keep their call sites."""

from ultralytics_pro_tpu.ops.boxes import (  # noqa: F401
    clip_boxes,
    ltwh2xywh,
    ltwh2xyxy,
    scale_boxes,
    xywh2ltwh,
    xywh2xyxy,
    xywhn2xyxy,
    xywhr2xyxyxyxy,
    xyxy2ltwh,
    xyxy2xywh,
    xyxy2xywhn,
)
from ultralytics_pro_tpu.ops.masks import (  # noqa: F401
    crop_mask,
    process_mask,
    process_mask_native,
    scale_masks,
)
from ultralytics_pro_tpu.ops.nms import (  # noqa: F401
    nms_indices,
    non_max_suppression,
    non_max_suppression_rotated,
)
from ultralytics_pro_tpu.utils import Profile  # noqa: F401
