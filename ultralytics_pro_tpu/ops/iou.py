"""IoU family — pairwise and elementwise, axis-aligned and rotated.

Behavioral parity with the reference IoU math (ultralytics/utils/metrics.py:54-285):
box_iou, bbox_iou (IoU/GIoU/DIoU/CIoU), probiou/batch_probiou (OBB), kpt_iou (OKS),
mask_iou. Pure jnp, safe under jit/vmap/grad.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU of xyxy boxes: (N,4) x (M,4) -> (N,M). Ref: metrics.py:54."""
    a1 = box1[:, None, :2]  # (N,1,2)
    a2 = box1[:, None, 2:4]
    b1 = box2[None, :, :2]  # (1,M,2)
    b2 = box2[None, :, 2:4]
    inter = jnp.prod(jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None), axis=-1)
    area1 = jnp.prod(box1[:, 2:4] - box1[:, :2], axis=-1)[:, None]
    area2 = jnp.prod(box2[:, 2:4] - box2[:, :2], axis=-1)[None, :]
    return inter / (area1 + area2 - inter + eps)


def bbox_iou(box1, box2, xywh: bool = True, GIoU: bool = False, DIoU: bool = False,
             CIoU: bool = False, eps: float = 1e-7):
    """Elementwise (broadcasting) IoU of (...,4) boxes with GIoU/DIoU/CIoU variants.

    Ref: metrics.py:77 — identical formula structure incl. the CIoU alpha term
    computed without gradient flow through alpha (reference wraps in no_grad;
    we use stop_gradient for the same effect).
    """
    import jax

    if xywh:
        x1, y1, w1, h1 = jnp.split(box1, 4, axis=-1)
        x2, y2, w2, h2 = jnp.split(box2, 4, axis=-1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1_x1, b1_x2, b1_y1, b1_y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2_x1, b2_x2, b2_y1, b2_y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = jnp.split(box1, 4, axis=-1)
        b2_x1, b2_y1, b2_x2, b2_y2 = jnp.split(box2, 4, axis=-1)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps

    inter = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None) * jnp.clip(
        jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if CIoU or DIoU or GIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)  # convex width
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)  # convex height
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def _get_covariance_matrix(boxes):
    """Gaussian covariance components (a, b, c) of xywhr boxes. Ref: metrics.py:177."""
    gbbs = jnp.concatenate([boxes[..., 2:4] ** 2 / 12, boxes[..., 4:5]], axis=-1)
    a, b, angle = gbbs[..., 0], gbbs[..., 1], gbbs[..., 2]
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1, obb2, CIoU: bool = False, eps: float = 1e-7):
    """Elementwise probabilistic IoU of rotated boxes (...,5)=(cx,cy,w,h,rad). Ref: metrics.py:206."""
    x1, y1 = obb1[..., 0], obb1[..., 1]
    x2, y2 = obb2[..., 0], obb2[..., 1]
    a1, b1, c1 = _get_covariance_matrix(obb1)
    a2, b2, c2 = _get_covariance_matrix(obb2)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    t3 = jnp.log(
        ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
        / (4 * jnp.sqrt(jnp.clip(a1 * b1 - c1**2, 0, None) * jnp.clip(a2 * b2 - c2**2, 0, None)) + eps)
        + eps
    ) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:
        w1, h1 = obb1[..., 2], obb1[..., 3]
        w2, h2 = obb2[..., 2], obb2[..., 3]
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        import jax

        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def batch_probiou(obb1, obb2, eps: float = 1e-7):
    """Pairwise probiou: (N,5) x (M,5) -> (N,M). Ref: metrics.py:262."""
    return probiou(obb1[:, None, :], obb2[None, :, :], eps=eps)


def kpt_iou(kpt1, kpt2, area, sigma, eps: float = 1e-7):
    """Object Keypoint Similarity: gt (N,K,3), pred (M,K,2|3), area (N,) -> (N,M).

    Ref: metrics.py:164 — e = d / (2*sigma)^2 / (area + eps) / 2, masked mean of
    exp(-e) over visible gt keypoints.
    """
    d = (kpt1[:, None, :, 0] - kpt2[None, :, :, 0]) ** 2 + (kpt1[:, None, :, 1] - kpt2[None, :, :, 1]) ** 2
    sigma = jnp.asarray(sigma, dtype=kpt1.dtype)  # (K,)
    kpt_mask = kpt1[..., 2] != 0  # (N,K)
    e = d / ((2 * sigma) ** 2) / (area[:, None, None] + eps) / 2
    return jnp.sum(jnp.exp(-e) * kpt_mask[:, None, :], axis=-1) / (
        jnp.sum(kpt_mask, axis=-1)[:, None] + eps
    )


def mask_iou(mask1, mask2, eps: float = 1e-7):
    """Pairwise IoU of flattened binary masks: (N,HW) x (M,HW) -> (N,M). Ref: metrics.py:142."""
    inter = jnp.matmul(mask1, mask2.T)
    union = mask1.sum(-1)[:, None] + mask2.sum(-1)[None, :] - inter
    return inter / (union + eps)
