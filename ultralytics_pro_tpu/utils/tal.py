"""Task-Aligned Assigner — static shapes, pure jnp.

Behavioral parity with the reference TAL (ultralytics/utils/tal.py:12
TaskAlignedAssigner, :318 RotatedTaskAlignedAssigner): align metric
s^alpha * IoU^beta, candidates-in-GT, top-k=10 per GT, conflicts resolved by
max IoU, target scores normalized per GT. The reference is already dense and
batched over a padded (b, max_gt) axis; here everything is expressed with
fixed shapes and masks so it jits — the "hot, dynamic-shape-heavy part of the
loss" (SURVEY.md §2.7) becomes a handful of fused XLA ops with no host sync
and no CUDA-OOM CPU fallback.

All coordinates are in the same units for preds and GTs (the loss passes
pixels).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ultralytics_pro_tpu.ops.iou import bbox_iou, probiou


def _gather_gt_class_scores(pd_scores, gt_labels):
    """(b, A, nc), (b, G) -> (b, G, A): per-anchor score of each gt's class.

    One-hot matmul, NOT take_along_axis: XLA lowers the (b, G, A) gather to a
    pathological scalar path on TPU (124.6 ms/call at b32 — the single
    largest cost in the whole train step; tools/perf_tal_parts_probe.py) while
    the equivalent (G, nc) x (nc, A) einsum rides the MXU in ~1 ms."""
    oh = jax.nn.one_hot(gt_labels, pd_scores.shape[-1], dtype=pd_scores.dtype)  # (b, G, nc)
    return jnp.einsum("bgc,bac->bga", oh, pd_scores)


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray  # (b, A) int32
    target_bboxes: jnp.ndarray  # (b, A, 4)
    target_scores: jnp.ndarray  # (b, A, nc)
    fg_mask: jnp.ndarray  # (b, A) bool
    target_gt_idx: jnp.ndarray  # (b, A) int32


class TaskAlignedAssigner:
    """Assign GTs to anchors by the task-aligned metric (reference tal.py:26)."""

    def __init__(self, topk: int = 13, num_classes: int = 80, alpha: float = 1.0,
                 beta: float = 6.0, eps: float = 1e-9):
        self.topk = topk
        self.num_classes = num_classes
        self.alpha = alpha
        self.beta = beta
        self.eps = eps

    def iou_calculation(self, gt_bboxes, pd_bboxes):
        """(b, G, A, 4) x (b, G, A, 4) -> (b, G, A) CIoU clamped at 0."""
        return jnp.clip(bbox_iou(gt_bboxes, pd_bboxes, xywh=False, CIoU=True)[..., 0], 0, None)

    def select_candidates_in_gts(self, xy_centers, gt_bboxes):
        """(A, 2), (b, G, 4) -> (b, G, A) anchors strictly inside each gt."""
        lt = gt_bboxes[..., None, :2]  # (b, G, 1, 2)
        rb = gt_bboxes[..., None, 2:4]
        deltas = jnp.concatenate([xy_centers[None, None] - lt, rb - xy_centers[None, None]], axis=-1)
        return deltas.min(axis=-1) > self.eps

    def get_box_metrics(self, pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask):
        """align metric + overlaps, zeroed outside `mask` (b, G, A)."""
        # score of each anchor for its gt's class: (b, A, nc) gathered at (b, G)
        bbox_scores = _gather_gt_class_scores(pd_scores, gt_labels)  # (b, G, A)
        gt = gt_bboxes[:, :, None, :]  # (b, G, 1, 4)
        pd = pd_bboxes[:, None, :, :]  # (b, 1, A, 4)
        overlaps = self.iou_calculation(gt, pd)  # (b, G, A)
        bbox_scores = jnp.where(mask, bbox_scores, 0.0)
        overlaps = jnp.where(mask, overlaps, 0.0)
        align_metric = bbox_scores**self.alpha * overlaps**self.beta
        return align_metric, overlaps

    def select_topk_candidates(self, metrics, mask_gt):
        """(b, G, A) -> 0/1 mask of each gt's top-k anchors (zeroed for pad gts).

        Exact top-k as `topk` unrolled argmax+suppress passes instead of
        lax.top_k: on TPU the sort-based top_k over (b, G, 8400) rows
        dominated the whole training step (~140 ms of a 309 ms step at bs32;
        tools/perf_tal_probe.py) while 10 masked-argmax sweeps are ~2 ms of
        pure VPU reductions. Same selected set (ties resolved by first index,
        like the reference torch.topk ordering)."""
        a = metrics.shape[-1]
        m = metrics
        mask_topk = jnp.zeros_like(metrics)
        for _ in range(self.topk):
            idx = jnp.argmax(m, axis=-1)  # (b, G)
            oh = jax.nn.one_hot(idx, a, dtype=metrics.dtype)  # (b, G, A)
            mask_topk = mask_topk + oh
            m = jnp.where(oh > 0, -jnp.inf, m)
        return jnp.where(mask_gt, mask_topk, 0.0)

    def select_highest_overlaps(self, mask_pos, overlaps):
        """Resolve anchors claimed by multiple gts: keep the max-IoU gt."""
        fg_mask = mask_pos.sum(-2)  # (b, A)
        mask_multi = (fg_mask[:, None, :] > 1)  # (b, 1, A)
        max_overlaps_idx = overlaps.argmax(1)  # (b, A)
        is_max = jax.nn.one_hot(max_overlaps_idx, mask_pos.shape[1], dtype=mask_pos.dtype).transpose(0, 2, 1)
        mask_pos = jnp.where(mask_multi, is_max, mask_pos)
        fg_mask = mask_pos.sum(-2)
        target_gt_idx = mask_pos.argmax(-2).astype(jnp.int32)  # (b, A)
        return target_gt_idx, fg_mask, mask_pos

    def get_targets(self, gt_labels, gt_bboxes, target_gt_idx, fg_mask):
        """All three gathers expressed as one-hot matmuls (take_along_axis
        lowers to a ~20 ms scalar gather on TPU; the (b, A, G) one-hot matmul
        forms are MXU work — tools/perf_tal_parts_probe.py). Exact: the
        selector is 0/1 and label values (< nc) are exact in f32."""
        oh_gt = jax.nn.one_hot(target_gt_idx, gt_labels.shape[1], dtype=gt_bboxes.dtype)  # (b, A, G)
        target_bboxes = oh_gt @ gt_bboxes  # (b, A, 4)
        labels = jnp.clip(gt_labels, 0, None)
        target_labels = (oh_gt @ labels[..., None].astype(gt_bboxes.dtype))[..., 0].astype(jnp.int32)
        cls_oh = jax.nn.one_hot(labels, self.num_classes, dtype=gt_bboxes.dtype)  # (b, G, nc)
        target_scores = oh_gt @ cls_oh  # (b, A, nc)
        target_scores = jnp.where(fg_mask[..., None] > 0, target_scores, 0.0)
        return target_labels, target_bboxes, target_scores

    def __call__(self, pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes, mask_gt) -> AssignResult:
        """Args mirror the reference forward (tal.py:44):

        pd_scores (b, A, nc) post-sigmoid; pd_bboxes (b, A, 4) xyxy;
        anc_points (A, 2); gt_labels (b, G) int; gt_bboxes (b, G, 4) xyxy;
        mask_gt (b, G) bool — padded GT slots are False.
        """
        gt_labels = gt_labels.astype(jnp.int32)
        mask_gt_b = mask_gt.astype(bool)[:, :, None]  # (b, G, 1)

        mask_in_gts = self.select_candidates_in_gts(anc_points, gt_bboxes)  # (b, G, A)
        align_metric, overlaps = self.get_box_metrics(
            pd_scores, pd_bboxes, gt_labels, gt_bboxes, mask_in_gts & mask_gt_b
        )
        mask_topk = self.select_topk_candidates(align_metric, mask_gt_b)
        mask_pos = mask_topk * mask_in_gts.astype(align_metric.dtype) * mask_gt_b.astype(align_metric.dtype)

        target_gt_idx, fg_mask, mask_pos = self.select_highest_overlaps(mask_pos, overlaps)
        target_labels, target_bboxes, target_scores = self.get_targets(
            gt_labels, gt_bboxes, target_gt_idx, fg_mask
        )

        # Normalize target scores by per-gt best alignment (reference tal.py:117-122).
        align_metric = align_metric * mask_pos
        pos_align_metrics = align_metric.max(axis=-1, keepdims=True)  # (b, G, 1)
        pos_overlaps = (overlaps * mask_pos).max(axis=-1, keepdims=True)
        norm_align_metric = (align_metric * pos_overlaps / (pos_align_metrics + self.eps)).max(-2)[..., None]
        target_scores = target_scores * norm_align_metric

        return AssignResult(target_labels, target_bboxes, target_scores,
                            fg_mask.astype(bool), target_gt_idx)


class RotatedTaskAlignedAssigner(TaskAlignedAssigner):
    """Rotated-box variant (reference tal.py:318): probiou metric and
    point-in-rotated-rect candidate test."""

    def iou_calculation(self, gt_bboxes, pd_bboxes):
        return jnp.clip(probiou(gt_bboxes, pd_bboxes), 0, None)

    def select_candidates_in_gts(self, xy_centers, gt_bboxes):
        """gt_bboxes are (b, G, 5) xywhr -> corner test via cross products
        (reference tal.py:337-365)."""
        from ultralytics_pro_tpu.ops.boxes import xywhr2xyxyxyxy

        corners = xywhr2xyxyxyxy(gt_bboxes)  # (b, G, 4, 2)
        a, b_, _, d = (corners[..., i, :] for i in range(4))
        ab = b_ - a  # (b, G, 2)
        ad = d - a
        ap = xy_centers[None, None, :, :] - a[..., None, :]  # (b, G, A, 2)
        norm_ab = (ab * ab).sum(-1)[..., None]
        norm_ad = (ad * ad).sum(-1)[..., None]
        ap_dot_ab = (ap * ab[..., None, :]).sum(-1)
        ap_dot_ad = (ap * ad[..., None, :]).sum(-1)
        return (ap_dot_ab >= 0) & (ap_dot_ab <= norm_ab) & (ap_dot_ad >= 0) & (ap_dot_ad <= norm_ad)
