"""Primitive math ops: box conversions, IoU family, anchors, NMS, masks."""

from ultralytics_pro_tpu.ops.anchors import bbox2dist, dist2bbox, dist2rbox, make_anchors
from ultralytics_pro_tpu.ops.boxes import (
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
from ultralytics_pro_tpu.ops.iou import (
    batch_probiou,
    bbox_iou,
    box_iou,
    kpt_iou,
    mask_iou,
    probiou,
)
from ultralytics_pro_tpu.ops.masks import crop_mask, process_mask, process_mask_native, scale_masks
from ultralytics_pro_tpu.ops.nms import nms_indices, non_max_suppression

__all__ = [
    "bbox2dist", "dist2bbox", "dist2rbox", "make_anchors",
    "clip_boxes", "ltwh2xywh", "ltwh2xyxy", "scale_boxes", "xywh2ltwh", "xywh2xyxy",
    "xywhn2xyxy", "xywhr2xyxyxyxy", "xyxy2ltwh", "xyxy2xywh", "xyxy2xywhn",
    "batch_probiou", "bbox_iou", "box_iou", "kpt_iou", "mask_iou", "probiou",
    "crop_mask", "process_mask", "process_mask_native", "scale_masks",
    "nms_indices", "non_max_suppression",
]
