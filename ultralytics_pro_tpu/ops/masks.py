"""Instance-mask ops: prototype combination, box cropping, rescaling.

Behavioral parity with the reference (ultralytics/utils/ops.py:489 crop_mask,
:516 process_mask, :569 process_mask_native, :607 scale_masks). Masks are NHW
(per-instance) and protos are (H, W, C) channel-last for TPU layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_mask(masks, boxes):
    """Zero mask pixels outside each instance's xyxy box.

    Args:
        masks: (N, H, W), boxes: (N, 4) xyxy in mask coordinates.
    Ref: ops.py:489.
    """
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (N,1,1)
    r = jnp.arange(w, dtype=boxes.dtype)[None, None, :]  # (1,1,W)
    c = jnp.arange(h, dtype=boxes.dtype)[None, :, None]  # (1,H,1)
    return masks * ((r >= x1) & (r < x2) & (c >= y1) & (c < y2))


def process_mask(protos, masks_in, bboxes, shape, upsample: bool = False):
    """Combine mask coefficients with prototypes and crop by (downscaled) boxes.

    Args:
        protos: (H, W, C) prototype masks (channel-last).
        masks_in: (N, C) coefficients for N instances post-NMS.
        bboxes: (N, 4) xyxy in network-input coordinates.
        shape: (h_in, w_in) network input size.

    Returns (N, H, W) sigmoid masks (upsampled to `shape` if requested).
    Ref: ops.py:516 — matmul, sigmoid, crop with boxes scaled to proto grid,
    optional bilinear upsample, final > 0.0 threshold left to caller.
    """
    mh, mw, c = protos.shape
    ih, iw = shape
    masks = jax.nn.sigmoid(masks_in @ protos.reshape(-1, c).T).reshape(-1, mh, mw)

    width_ratio = mw / iw
    height_ratio = mh / ih
    scale = jnp.array([width_ratio, height_ratio, width_ratio, height_ratio], dtype=bboxes.dtype)
    downsampled_bboxes = bboxes * scale
    # the reference's hot val path (crop_mask n<50 branch, ops.py:502-508)
    # crops with ROUNDED integer box edges; match it for mask-mAP parity
    masks = crop_mask(masks, jnp.round(downsampled_bboxes))
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], ih, iw), method="bilinear")
    return masks


def process_mask_native(protos, masks_in, bboxes, shape):
    """Combine protos then upsample to `shape` before cropping (higher quality).

    Ref: ops.py:569.
    """
    mh, mw, c = protos.shape
    masks = jax.nn.sigmoid(masks_in @ protos.reshape(-1, c).T).reshape(-1, mh, mw)
    masks = scale_masks(masks, shape)
    return crop_mask(masks, bboxes)


def scale_masks(masks, shape, padding: bool = True):
    """Rescale (N, H, W) masks to target (h, w), removing letterbox pad first.

    Ref: ops.py:607.
    """
    n, mh, mw = masks.shape
    h, w = shape
    gain = min(mh / h, mw / w)
    pad_w = mw - w * gain
    pad_h = mh - h * gain
    if padding:
        top = int(round(pad_h / 2 - 0.1))
        left = int(round(pad_w / 2 - 0.1))
        bottom = mh - int(round(pad_h / 2 + 0.1))
        right = mw - int(round(pad_w / 2 + 0.1))
        masks = masks[:, top:bottom, left:right]
    return jax.image.resize(masks, (n, h, w), method="bilinear")
