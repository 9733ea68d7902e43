"""Anchor-free geometry: grid anchor generation and distance<->box transforms.

Behavioral parity with the reference (ultralytics/utils/tal.py:352-385):
make_anchors, dist2bbox, bbox2dist, dist2rbox. Anchor generation takes static
(h, w, stride) tuples so everything stays shape-static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_anchors(feat_shapes, strides, grid_cell_offset: float = 0.5, dtype=jnp.float32):
    """Generate anchor centers from feature-map shapes.

    Args:
        feat_shapes: sequence of (h, w) ints per FPN level (static).
        strides: sequence of ints, one per level.

    Returns:
        anchor_points (A, 2) grid-unit centers, stride_tensor (A, 1).
    Ref: tal.py:352 — sx = arange(w) + offset, meshgrid ij, stacked (x, y).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        sy, sx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([sx, sy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), stride, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance, anchor_points, xywh: bool = True, axis: int = -1):
    """Decode (l, t, r, b) distances to boxes around anchor points. Ref: tal.py:367."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max: float):
    """Encode xyxy boxes as clamped (l, t, r, b) distances. Ref: tal.py:375."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(
        jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1),
        0,
        reg_max - 0.01,
    )


def dist2rbox(pred_dist, pred_angle, anchor_points, axis: int = -1):
    """Decode distances + angle to rotated boxes (cx, cy, w, h). Ref: tal.py:381.

    The (l, t, r, b) offset midpoint is rotated by pred_angle before being added
    to the anchor point.
    """
    lt, rb = jnp.split(pred_dist, 2, axis=axis)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=axis)
    x, y = xf * cos - yf * sin, xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=axis) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=axis)
