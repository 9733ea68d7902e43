"""YOLO-NAS facade (reference ultralytics/models/nas/model.py:98).

The reference wraps super-gradients' pretrained YOLO-NAS .pt files. Those
checkpoints carry a torch architecture with no YAML, so they must be converted
offline: tools/convert_pt.py handles ultralytics-format checkpoints, and a
NAS-specific converter requires the super-gradients package (not present in
this hermetic environment)."""

from __future__ import annotations


class NAS:
    def __init__(self, model="yolo_nas_s.pt"):
        raise NotImplementedError(
            "YOLO-NAS checkpoints come from super-gradients and have no YAML "
            "architecture; convert offline (super-gradients -> state_dict -> "
            "tools/convert_pt.py style mapping) and load the resulting .ckpt "
            "with ultralytics_pro_tpu.Model instead."
        )
