"""Box coordinate conversions and rescaling — pure jnp, static shapes.

Behavioral parity with the reference box math (ultralytics/utils/ops.py:73-693):
xyxy/xywh/ltwh/normalized converters, clip_boxes, scale_boxes. All functions
accept arrays shaped (..., 4) and are jit/vmap safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def xyxy2xywh(x):
    """(x1,y1,x2,y2) -> (cx,cy,w,h). Ref: ops.py:344."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(x):
    """(cx,cy,w,h) -> (x1,y1,x2,y2). Ref: ops.py:371."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xywhn2xyxy(x, w: float = 640.0, h: float = 640.0, padw: float = 0.0, padh: float = 0.0):
    """Normalized (cx,cy,w,h) -> pixel (x1,y1,x2,y2) with optional pad offset. Ref: ops.py:398."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w: float = 640.0, h: float = 640.0, clip: bool = False, eps: float = 0.0):
    """Pixel (x1,y1,x2,y2) -> normalized (cx,cy,w,h). Ref: ops.py:425."""
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [((x1 + x2) / 2) / w, ((y1 + y2) / 2) / h, (x2 - x1) / w, (y2 - y1) / h], axis=-1
    )


def xywh2ltwh(x):
    """(cx,cy,w,h) -> (l,t,w,h). Ref: ops.py:453."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, w, h], axis=-1)


def xyxy2ltwh(x):
    """(x1,y1,x2,y2) -> (l,t,w,h). Ref: ops.py:471."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def ltwh2xywh(x):
    """(l,t,w,h) -> (cx,cy,w,h). Ref: ops.py:489."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l + w / 2, t + h / 2, w, h], axis=-1)


def ltwh2xyxy(x):
    """(l,t,w,h) -> (x1,y1,x2,y2). Ref: ops.py:507."""
    l, t, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([l, t, l + w, t + h], axis=-1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w). Ref: ops.py:146."""
    h, w = shape[0], shape[1]
    x1 = jnp.clip(boxes[..., 0:1], 0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0, h)
    rest = boxes[..., 4:]
    return jnp.concatenate([x1, y1, x2, y2, rest], axis=-1)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding: bool = True, xywh: bool = False):
    """Rescale boxes from letterboxed `img1_shape` (h, w) back to original `img0_shape`.

    Ref: ops.py:102 — gain = min(h1/h0, w1/w0); pad computed with the same
    round(x/2 - 0.1) convention as the reference so pixel-level outputs match.
    """
    boxes = jnp.asarray(boxes)
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad_w = round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1)
        pad_h = round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1)
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]

    if padding:
        sub = jnp.array([pad_w, pad_h, 0 if xywh else pad_w, 0 if xywh else pad_h], dtype=boxes.dtype)
        boxes = boxes.at[..., :4].add(-sub)
    boxes = boxes.at[..., :4].multiply(1.0 / gain)
    if not xywh:
        boxes = clip_boxes(boxes, img0_shape)
    return boxes


def xywhr2xyxyxyxy(x):
    """Rotated (cx,cy,w,h,rad) -> 4 corner points (..., 4, 2). Ref: ops.py:544."""
    ctr = x[..., :2]
    w, h, angle = x[..., 2:3], x[..., 3:4], x[..., 4:5]
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    vec1 = jnp.concatenate([w / 2 * cos, w / 2 * sin], axis=-1)
    vec2 = jnp.concatenate([-h / 2 * sin, h / 2 * cos], axis=-1)
    pt1 = ctr + vec1 + vec2
    pt2 = ctr + vec1 - vec2
    pt3 = ctr - vec1 - vec2
    pt4 = ctr - vec1 + vec2
    return jnp.stack([pt1, pt2, pt3, pt4], axis=-2)


def empty_like(x):
    return jnp.empty_like(x)
