"""Training losses — v8 detect/segment/pose/obb/classify, pure jnp.

Behavioral parity with the reference losses (ultralytics/utils/loss.py:
v8DetectionLoss:415, BboxLoss:329, DFLoss:308, v8SegmentationLoss:531,
v8PoseLoss:712, v8OBBLoss:883, v8ClassificationLoss:873, VarifocalLoss:241,
FocalLoss:273). Batches carry dense padded GTs: cls (b, G), bboxes (b, G, 4)
normalized xywh, mask (b, G) — the preprocessing the reference does per batch
(loss.py:446 `preprocess`: group by batch_idx into padded rows) happens in the
data collate, keeping the loss fully static-shape.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ultralytics_pro_tpu.ops.anchors import bbox2dist, dist2bbox, dist2rbox, make_anchors
from ultralytics_pro_tpu.ops.boxes import xywh2xyxy
from ultralytics_pro_tpu.ops.iou import bbox_iou, probiou
from ultralytics_pro_tpu.ops.masks import crop_mask
from ultralytics_pro_tpu.utils.tal import RotatedTaskAlignedAssigner, TaskAlignedAssigner


def bce_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (no reduction)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def varifocal_loss(pred_logits, gt_score, label, gamma: float = 2.0, alpha: float = 0.75):
    """Varifocal loss (reference loss.py:241 VarifocalLoss, Zhang et al.):
    IoU-aware BCE where negatives are focally down-weighted and positives are
    weighted by their quality target. Returns mean-over-classes summed scalar."""
    p = jax.nn.sigmoid(pred_logits)
    weight = alpha * p**gamma * (1.0 - label) + gt_score * label
    return (bce_logits(pred_logits, gt_score) * weight).mean(1).sum()


def focal_loss(pred_logits, label, gamma: float = 1.5, alpha: float = 0.25):
    """Focal BCE (reference loss.py:273 FocalLoss, TF-addons formulation)."""
    loss = bce_logits(pred_logits, label)
    p = jax.nn.sigmoid(pred_logits)
    p_t = label * p + (1.0 - label) * (1.0 - p)
    loss = loss * (1.0 - p_t) ** gamma
    if alpha > 0:
        loss = loss * (label * alpha + (1.0 - label) * (1.0 - alpha))
    return loss.mean(1).sum()


def slide_loss(pred_logits, true, auto_iou: float = 0.5):
    """IoU-adaptive sample reweighting of elementwise BCE (fork-added
    reference loss.py:21 SlideLoss): weight 1 below the IoU knee, exp bump in
    the transition band, exp(-(t-1)) above. Returns elementwise loss."""
    auto_iou = jnp.maximum(auto_iou, 0.2)
    loss = bce_logits(pred_logits, true)
    w = jnp.where(
        true <= auto_iou - 0.1, 1.0,
        jnp.where(true < auto_iou, jnp.exp(1.0 - auto_iou), jnp.exp(-(true - 1.0))),
    )
    return loss * w


def vari_focal_loss(pred_logits, target, alpha: float = 0.75, gamma: float = 2.0,
                    iou_weighted: bool = True):
    """Fork-added Vari_focalLoss (reference loss.py:167): sum-reduced
    sigmoid varifocal with optional IoU weighting of positives."""
    p = jax.nn.sigmoid(pred_logits)
    pos = (target > 0.0).astype(p.dtype)
    pos_w = target if iou_weighted else 1.0
    focal_weight = pos_w * pos + alpha * jnp.abs(p - target) ** gamma * (1.0 - pos)
    return (bce_logits(pred_logits, target) * focal_weight).sum()


def df_loss(pred_dist, target, reg_max: int):
    """Distribution Focal Loss (reference loss.py:308): CE to the two adjacent
    integer bins, linearly weighted. pred_dist (N, 4, reg_max) logits,
    target (N, 4) continuous in [0, reg_max-1]."""
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    # one-hot select, NOT take_along_axis: the (N, 4, 1)-from-(N, 4, reg_max)
    # gather lowers to a 38 ms scalar path on TPU at b32 while the masked
    # reduction fuses into the softmax (tools/perf_tal_parts_probe.py)
    ce_l = -(logp * jax.nn.one_hot(tl, reg_max, dtype=logp.dtype)).sum(-1)
    ce_r = -(logp * jax.nn.one_hot(jnp.clip(tr, 0, reg_max - 1), reg_max,
                                   dtype=logp.dtype)).sum(-1)
    return (ce_l * wl + ce_r * wr).mean(-1, keepdims=True)


class v8DetectionLoss:
    """TAL + CIoU + DFL detection criterion (reference loss.py:415)."""

    def __init__(self, nc: int, reg_max: int, strides, hyp: Dict | None = None, tal_topk: int = 10):
        hyp = hyp or {}
        self.nc = nc
        self.reg_max = reg_max
        self.strides = tuple(strides)
        self.use_dfl = reg_max > 1
        self.box_gain = hyp.get("box", 7.5)
        self.cls_gain = hyp.get("cls", 0.5)
        self.dfl_gain = hyp.get("dfl", 1.5)
        self.assigner = TaskAlignedAssigner(topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0)

    # -- helpers --------------------------------------------------------------
    def flatten_preds(self, feats):
        """Per-level (b, h, w, no) -> (b, A, 4*reg_max), (b, A, nc)."""
        b = feats[0].shape[0]
        no = 4 * self.reg_max + self.nc
        flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)
        pred_distri, pred_scores = jnp.split(flat, [4 * self.reg_max], axis=-1)
        return pred_distri, pred_scores

    def bbox_decode(self, anchor_points, pred_dist):
        """(A, 2), (b, A, 4*reg_max) -> (b, A, 4) xyxy in grid units (loss.py:460)."""
        if self.use_dfl:
            b, a, _ = pred_dist.shape
            probs = jax.nn.softmax(pred_dist.reshape(b, a, 4, self.reg_max), axis=-1)
            pred_dist = probs @ jnp.arange(self.reg_max, dtype=probs.dtype)
        return dist2bbox(pred_dist, anchor_points, xywh=False)

    def gt_to_pixels(self, batch, imgsz_hw):
        """Normalized xywh GTs -> pixel xyxy (reference preprocess, loss.py:446)."""
        h, w = imgsz_hw
        scale = jnp.array([w, h, w, h], dtype=jnp.float32)
        gt_bboxes = xywh2xyxy(batch["bboxes"] * scale)
        return batch["cls"].astype(jnp.int32), gt_bboxes, batch["mask_gt"].astype(bool)

    # -- main -----------------------------------------------------------------
    def __call__(self, preds: Dict, batch: Dict, imgsz_hw: Tuple[int, int]):
        feats = preds["feats"]
        pred_distri, pred_scores = self.flatten_preds(feats)
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.strides, 0.5)

        gt_labels, gt_bboxes, mask_gt = self.gt_to_pixels(batch, imgsz_hw)
        # degenerate (all-pad) boxes also masked out
        mask_gt = mask_gt & (gt_bboxes.sum(-1) > 0)

        pred_bboxes = self.bbox_decode(anchor_points, pred_distri)  # grid units
        assign = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor),
            anchor_points * stride_tensor,
            gt_labels,
            gt_bboxes,
            mask_gt,
        )
        target_bboxes = assign.target_bboxes / stride_tensor
        target_scores = assign.target_scores
        fg_mask = assign.fg_mask
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        loss_cls = bce_logits(pred_scores, target_scores).sum() / target_scores_sum

        loss_box, loss_dfl = self.bbox_loss(
            pred_distri, pred_bboxes, anchor_points, target_bboxes, target_scores,
            target_scores_sum, fg_mask,
        )
        batch_size = pred_scores.shape[0]
        parts = {
            "box": loss_box * self.box_gain,
            "cls": loss_cls * self.cls_gain,
            "dfl": loss_dfl * self.dfl_gain,
        }
        total = sum(parts.values()) * batch_size
        return total, parts

    def bbox_loss(self, pred_dist, pred_bboxes, anchor_points, target_bboxes,
                  target_scores, target_scores_sum, fg_mask):
        """CIoU + DFL over foreground anchors (reference BboxLoss, loss.py:329),
        masked instead of boolean-indexed."""
        weight = target_scores.sum(-1) * fg_mask  # (b, A)
        iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True)[..., 0]
        loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

        if self.use_dfl:
            target_ltrb = bbox2dist(anchor_points, target_bboxes, self.reg_max)  # (b, A, 4)
            b, a, _ = target_ltrb.shape
            dfl = df_loss(pred_dist.reshape(b, a, 4, self.reg_max), target_ltrb, self.reg_max)[..., 0]
            loss_dfl = (dfl * weight).sum() / target_scores_sum
        else:
            loss_dfl = jnp.zeros(())
        return loss_iou, loss_dfl


class v8SegmentationLoss(v8DetectionLoss):
    """Detection loss + per-instance mask BCE (reference loss.py:531)."""

    def __init__(self, *args, overlap_mask: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.overlap = overlap_mask

    def __call__(self, preds: Dict, batch: Dict, imgsz_hw: Tuple[int, int]):
        feats, pred_masks, proto = preds["feats"], preds["mc"], preds["protos"]
        b, mh, mw, nm = proto.shape
        pred_distri, pred_scores = self.flatten_preds(feats)
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.strides, 0.5)

        gt_labels, gt_bboxes, mask_gt = self.gt_to_pixels(batch, imgsz_hw)
        mask_gt = mask_gt & (gt_bboxes.sum(-1) > 0)

        pred_bboxes = self.bbox_decode(anchor_points, pred_distri)
        assign = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor),
            anchor_points * stride_tensor,
            gt_labels, gt_bboxes, mask_gt,
        )
        target_scores = assign.target_scores
        fg_mask = assign.fg_mask
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        loss_cls = bce_logits(pred_scores, target_scores).sum() / target_scores_sum
        loss_box, loss_dfl = self.bbox_loss(
            pred_distri, pred_bboxes, anchor_points, assign.target_bboxes / stride_tensor,
            target_scores, target_scores_sum, fg_mask,
        )

        # Mask loss (reference calculate_segmentation_loss, loss.py:646):
        # for each fg anchor, BCE(proto @ coeffs, its gt instance mask), cropped
        # to the gt box, normalized by gt box area; all dense/masked here.
        h, w = imgsz_hw
        gt_masks = batch["masks"]  # (b, G, mh, mw) binary per-instance masks
        weight = target_scores.sum(-1) * fg_mask  # (b, A)
        # per-anchor predicted mask logits: (b, A, mh*mw)
        proto_flat = proto.reshape(b, mh * mw, nm)
        target_gt = assign.target_gt_idx  # (b, A)

        gt_flat = gt_masks.reshape(b, gt_masks.shape[1], -1)  # (b, G, mh*mw)
        # normalize each anchor's loss by its gt box area (in mask pixels)
        scale = jnp.array([mw / w, mh / h, mw / w, mh / h], dtype=jnp.float32)
        tb_mask = assign.target_bboxes * scale  # (b, A, 4) in mask coords
        area = jnp.maximum((tb_mask[..., 2] - tb_mask[..., 0]) * (tb_mask[..., 3] - tb_mask[..., 1]), 1.0)

        def per_image(pm, pf, gt_f, tg, tb, fg):
            # pm (A, nm), pf (mh*mw, nm), gt_f (G, mh*mw), tg (A,), tb (A, 4), fg (A,)
            pred = pm @ pf.T  # (A, mh*mw) logits
            # one-hot matmul select (TPU: integer row-gather lowers to a
            # scalar path; bf16 is EXACT here — 0/1 selector x binary masks)
            oh = jax.nn.one_hot(tg, gt_f.shape[0], dtype=jnp.bfloat16)  # (A, G)
            tmask = (oh @ gt_f.astype(jnp.bfloat16)).astype(pred.dtype)  # (A, mh*mw)
            l = bce_logits(pred, tmask).reshape(-1, mh, mw)
            l = crop_mask(l, tb)  # zero outside gt box
            return l.sum((1, 2)) * fg  # (A,)

        per_anchor = jax.vmap(per_image)(pred_masks, proto_flat, gt_flat, target_gt, tb_mask, fg_mask.astype(proto.dtype))
        loss_seg = (per_anchor / area).sum() / jnp.maximum(fg_mask.sum(), 1.0)

        batch_size = pred_scores.shape[0]
        parts = {
            "box": loss_box * self.box_gain,
            "seg": loss_seg * self.box_gain,
            "cls": loss_cls * self.cls_gain,
            "dfl": loss_dfl * self.dfl_gain,
        }
        total = sum(parts.values()) * batch_size
        return total, parts


OKS_SIGMA = (
    jnp.array([26, 25, 25, 35, 35, 79, 79, 72, 72, 62, 62, 107, 107, 87, 87, 89, 89]) / 1000.0
)


class v8PoseLoss(v8DetectionLoss):
    """Detection loss + OKS keypoint location loss + visibility BCE
    (reference loss.py:712, KeypointLoss:396). Dense/masked instead of
    boolean-indexed; batch carries padded keypoints (b, G, K, ndim)."""

    def __init__(self, *args, kpt_shape=(17, 3), **kwargs):
        super().__init__(*args, **kwargs)
        hyp = kwargs.get("hyp") or {}
        self.kpt_shape = tuple(kpt_shape)
        self.pose_gain = hyp.get("pose", 12.0)
        self.kobj_gain = hyp.get("kobj", 1.0)
        k = kpt_shape[0]
        self.sigmas = OKS_SIGMA if tuple(kpt_shape) == (17, 3) else jnp.ones(k) / k

    @staticmethod
    def kpts_decode(anchor_points, pred_kpts):
        """(A, 2), (b, A, K, ndim) -> grid-unit keypoints (loss-side decode,
        reference loss.py:793)."""
        xy = pred_kpts[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
        return jnp.concatenate([xy, pred_kpts[..., 2:]], axis=-1)

    def __call__(self, preds, batch, imgsz_hw):
        feats, pred_kpt_flat = preds["feats"], preds["kpt"]  # (b, A, nk)
        pred_distri, pred_scores = self.flatten_preds(feats)
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.strides, 0.5)

        gt_labels, gt_bboxes, mask_gt = self.gt_to_pixels(batch, imgsz_hw)
        mask_gt = mask_gt & (gt_bboxes.sum(-1) > 0)

        pred_bboxes = self.bbox_decode(anchor_points, pred_distri)
        b, a = pred_scores.shape[:2]
        pred_kpts = self.kpts_decode(
            anchor_points, pred_kpt_flat.reshape(b, a, *self.kpt_shape)
        )

        assign = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor),
            anchor_points * stride_tensor,
            gt_labels, gt_bboxes, mask_gt,
        )
        target_bboxes = assign.target_bboxes / stride_tensor
        target_scores = assign.target_scores
        fg_mask = assign.fg_mask
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)

        loss_cls = bce_logits(pred_scores, target_scores).sum() / target_scores_sum
        loss_box, loss_dfl = self.bbox_loss(
            pred_distri, pred_bboxes, anchor_points, target_bboxes, target_scores,
            target_scores_sum, fg_mask,
        )

        # keypoint losses (reference calculate_keypoints_loss, loss.py:806)
        h, w = imgsz_hw
        gt_kpts = batch["keypoints"]  # (b, G, K, ndim) normalized
        scale = jnp.array([w, h], jnp.float32)
        gt_kpts = jnp.concatenate([gt_kpts[..., :2] * scale, gt_kpts[..., 2:]], -1)
        k, nd = self.kpt_shape
        # one-hot matmul select over the gt axis (TPU gather pathology;
        # see tal.get_targets)
        oh = jax.nn.one_hot(assign.target_gt_idx, gt_kpts.shape[1], dtype=gt_kpts.dtype)
        sel = (oh @ gt_kpts.reshape(b, gt_kpts.shape[1], -1)).reshape(
            b, a, k, gt_kpts.shape[-1])  # (b, A, K, nd)
        sel = jnp.concatenate([sel[..., :2] / stride_tensor[None, :, None, :], sel[..., 2:]], -1)

        area = (
            (target_bboxes[..., 2] - target_bboxes[..., 0])
            * (target_bboxes[..., 3] - target_bboxes[..., 1])
        )[..., None]  # (b, A, 1) grid units
        d = (pred_kpts[..., 0] - sel[..., 0]) ** 2 + (pred_kpts[..., 1] - sel[..., 1]) ** 2
        kpt_mask = (sel[..., 2] != 0) if nd == 3 else jnp.ones_like(sel[..., 0], dtype=bool)
        kpt_loss_factor = k / (kpt_mask.sum(-1, keepdims=True) + 1e-9)  # (b, A, 1)
        e = d / ((2 * self.sigmas) ** 2) / (area + 1e-9) / 2
        per_elem = kpt_loss_factor * (1 - jnp.exp(-e)) * kpt_mask
        n_fg = jnp.maximum(fg_mask.sum(), 1.0)
        loss_pose = (per_elem * fg_mask[..., None]).sum() / (n_fg * k)

        if nd == 3:
            kobj = bce_logits(pred_kpts[..., 2], kpt_mask.astype(jnp.float32))
            loss_kobj = (kobj * fg_mask[..., None]).sum() / (n_fg * k)
        else:
            loss_kobj = jnp.zeros(())

        batch_size = b
        parts = {
            "box": loss_box * self.box_gain,
            "pose": loss_pose * self.pose_gain,
            "kobj": loss_kobj * self.kobj_gain,
            "cls": loss_cls * self.cls_gain,
            "dfl": loss_dfl * self.dfl_gain,
        }
        total = sum(parts.values()) * batch_size
        return total, parts


class v8ClassificationLoss:
    """Cross-entropy classify criterion (reference loss.py:873)."""

    def __call__(self, logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)
        return nll.mean(), {"cls": nll.mean()}


class v8OBBLoss(v8DetectionLoss):
    """Rotated-box criterion: probiou + rotated TAL (reference loss.py:883)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.assigner = RotatedTaskAlignedAssigner(topk=10, num_classes=self.nc, alpha=0.5, beta=6.0)

    def __call__(self, preds: Dict, batch: Dict, imgsz_hw: Tuple[int, int]):
        feats, pred_angle = preds["feats"], preds["angle"]  # angle (b, A, 1) already scaled
        pred_distri, pred_scores = self.flatten_preds(feats)
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchor_points, stride_tensor = make_anchors(feat_shapes, self.strides, 0.5)

        h, w = imgsz_hw
        scale = jnp.array([w, h, w, h, 1.0], dtype=jnp.float32)
        gt_rboxes = batch["bboxes"] * scale  # (b, G, 5) xywhr pixels
        gt_labels = batch["cls"].astype(jnp.int32)
        # reference v8OBBLoss filters degenerate rotated GTs with w or h < 2 px
        # before assignment (loss.py:915) — not just zero-area ones
        mask_gt = (
            batch["mask_gt"].astype(bool)
            & (gt_rboxes[..., 2] >= 2.0)
            & (gt_rboxes[..., 3] >= 2.0)
        )

        # decode rotated boxes in grid units
        b, a, _ = pred_distri.shape
        probs = jax.nn.softmax(pred_distri.reshape(b, a, 4, self.reg_max), axis=-1)
        dist = probs @ jnp.arange(self.reg_max, dtype=probs.dtype)
        pred_rboxes = jnp.concatenate(
            [dist2rbox(dist, pred_angle, anchor_points[None]), pred_angle], axis=-1
        )  # (b, A, 5) xywhr grid units

        pd_pixel = jnp.concatenate(
            [pred_rboxes[..., :4] * stride_tensor, pred_rboxes[..., 4:5]], axis=-1
        )
        assign = self.assigner(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
            jax.lax.stop_gradient(pd_pixel),
            anchor_points * stride_tensor,
            gt_labels, gt_rboxes, mask_gt,
        )
        target_scores = assign.target_scores
        fg_mask = assign.fg_mask
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)
        loss_cls = bce_logits(pred_scores, target_scores).sum() / target_scores_sum

        tb = assign.target_bboxes
        tb = jnp.concatenate([tb[..., :4] / stride_tensor, tb[..., 4:5]], axis=-1)
        weight = target_scores.sum(-1) * fg_mask
        iou = jnp.clip(probiou(pred_rboxes, tb), 0, None)
        loss_iou = ((1.0 - iou) * weight).sum() / target_scores_sum

        # DFL against the axis-aligned distance of the derotated target box
        from ultralytics_pro_tpu.ops.anchors import bbox2dist

        target_ltrb = bbox2dist(
            anchor_points, xywh2xyxy(tb[..., :4]), self.reg_max
        )
        dfl = df_loss(pred_distri.reshape(b, a, 4, self.reg_max), target_ltrb, self.reg_max)[..., 0]
        loss_dfl = (dfl * weight).sum() / target_scores_sum

        batch_size = pred_scores.shape[0]
        parts = {
            "box": loss_iou * self.box_gain,
            "cls": loss_cls * self.cls_gain,
            "dfl": loss_dfl * self.dfl_gain,
        }
        total = sum(parts.values()) * batch_size
        return total, parts


class E2EDetectLoss:
    """YOLOv10 dual-assignment loss: one2many (topk=10) + one2one (topk=1)
    (reference loss.py:1000)."""

    def __init__(self, nc: int, reg_max: int, strides, hyp=None):
        self.one2many = v8DetectionLoss(nc=nc, reg_max=reg_max, strides=strides,
                                        hyp=hyp, tal_topk=10)
        self.one2one = v8DetectionLoss(nc=nc, reg_max=reg_max, strides=strides,
                                       hyp=hyp, tal_topk=1)

    def __call__(self, preds, batch, imgsz_hw):
        t1, p1 = self.one2many({"feats": preds["feats"]}, batch, imgsz_hw)
        t2, p2 = self.one2one({"feats": preds["one2one"]}, batch, imgsz_hw)
        parts = {f"o2m_{k}": v for k, v in p1.items()} | {f"o2o_{k}": v for k, v in p2.items()}
        return t1 + t2, parts


class TVPDetectLoss:
    """Text-Visual Prompt detect criterion (reference loss.py:1018
    TVPDetectLoss): during visual-prompt training the YOLOE head emits
    channels [4*reg_max | nc_text | vnc]; only the visual-prompt class slice
    trains (the text vocabulary stays frozen), via a v8DetectionLoss built at
    nc=vnc. Static-shape version: nc_text/vnc are fixed per trainer config
    instead of sniffed from the tensor."""

    def __init__(self, nc_text: int, vnc: int, reg_max: int, strides, hyp=None):
        self.reg4 = reg_max * 4
        self.nc_text = nc_text
        self.inner = v8DetectionLoss(nc=vnc, reg_max=reg_max, strides=strides, hyp=hyp)

    def _vp_feats(self, feats):
        return [
            jnp.concatenate([f[..., : self.reg4], f[..., self.reg4 + self.nc_text:]], axis=-1)
            for f in feats
        ]

    def __call__(self, preds, batch, imgsz_hw):
        return self.inner({"feats": self._vp_feats(preds["feats"])}, batch, imgsz_hw)


class TVPSegmentLoss(TVPDetectLoss):
    """Text-Visual Prompt segment criterion (reference loss.py:1057)."""

    def __init__(self, nc_text: int, vnc: int, reg_max: int, strides, hyp=None,
                 overlap_mask: bool = True):
        super().__init__(nc_text, vnc, reg_max, strides, hyp)
        self.inner = v8SegmentationLoss(nc=vnc, reg_max=reg_max, strides=strides,
                                        hyp=hyp, overlap_mask=overlap_mask)

    def __call__(self, preds, batch, imgsz_hw):
        vp = {"feats": self._vp_feats(preds["feats"]),
              "mc": preds["mc"], "protos": preds["protos"]}
        return self.inner(vp, batch, imgsz_hw)


class v5AnchorLoss:
    """Anchor-based YOLOv5/v7 loss (reference v5 ComputeLoss / the fork's
    anchor lineage): per-level anchor-ratio matching (r < 4), 3-cell
    cross-grid assignment, CIoU box loss, objectness BCE with per-level
    balance, class BCE — all with STATIC shapes: every (gt, anchor, offset)
    candidate is scored and masked rather than gathered dynamically.

    Consumes AnchorDetect's raw maps (B, H, W, na*(5+nc)).
    """

    BALANCE = (4.0, 1.0, 0.4)

    def __init__(self, nc, anchors, strides, hyp=None, anchor_t: float = 4.0):
        self.nc = int(nc)
        self.anchors = [np.asarray(a, np.float32) for a in anchors]
        self.strides = tuple(strides)
        self.na = len(self.anchors[0])
        h = hyp or {}
        self.box_gain = h.get("box", 0.05)
        self.cls_gain = h.get("cls", 0.5)
        self.obj_gain = h.get("obj", 1.0)
        self.anchor_t = anchor_t

    def __call__(self, preds, batch, imgsz):
        feats = preds["anchor_feats"] if isinstance(preds, dict) else preds
        bboxes = batch["bboxes"].astype(jnp.float32)   # (B, G, 4) xywh normalized
        cls = batch["cls"].astype(jnp.int32).reshape(bboxes.shape[0], -1)
        gt_mask = batch["mask_gt"].astype(jnp.float32)  # (B, G)
        bsz, G = gt_mask.shape

        lbox = lcls = lobj = 0.0
        for li, y in enumerate(feats):
            b, hgt, wid, _ = y.shape
            t = y.reshape(b, hgt, wid, self.na, 5 + self.nc).astype(jnp.float32)
            s = self.strides[li]
            anc = jnp.asarray(self.anchors[li] / s, jnp.float32)  # grid units

            # GT in grid units of this level
            gxy = bboxes[..., :2] * jnp.asarray([wid, hgt], jnp.float32)   # (B,G,2)
            gwh = bboxes[..., 2:] * jnp.asarray([wid, hgt], jnp.float32)

            # anchor-ratio filter (v5 build_targets): (B,G,na)
            r = gwh[:, :, None, :] / (anc[None, None] + 1e-9)
            ratio_ok = jnp.maximum(r, 1.0 / (r + 1e-9)).max(-1) < self.anchor_t

            # 3-cell offsets (center + the 2 nearest neighbors), g=0.5:
            # candidate mask per offset (B,G,5)
            gx, gy = gxy[..., 0], gxy[..., 1]
            fx, fy = gx % 1.0, gy % 1.0
            off_ok = jnp.stack([
                jnp.ones_like(gx, bool),
                (fx < 0.5) & (gx > 1.0),          # left neighbor (offset -1 in x? v5: j)
                (fx >= 0.5) & (gx < wid - 1.0),   # right
                (fy < 0.5) & (gy > 1.0),          # up
                (fy >= 0.5) & (gy < hgt - 1.0),   # down
            ], -1)
            # offsets applied to the CELL index: v5 computes floor(gxy - off*g),
            # so the LEFT neighbor (fx < 0.5) needs off = +0.5 -> floor(gx-0.5)
            # = cell-1, and the RIGHT neighbor (fx >= 0.5) off = -0.5
            off = jnp.asarray([[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1]], jnp.float32) * 0.5
            cell = jnp.floor(gxy[:, :, None, :] - off[None, None])  # (B,G,5,2)
            cx = jnp.clip(cell[..., 0], 0, wid - 1).astype(jnp.int32)
            cy = jnp.clip(cell[..., 1], 0, hgt - 1).astype(jnp.int32)

            # full candidate mask (B,G,na,5)
            m = (gt_mask[:, :, None, None] > 0) & ratio_ok[..., None] & off_ok[:, :, None, :]

            # gather predictions at candidate cells: flatten grid per (b)
            flat = t.reshape(b, hgt * wid, self.na, 5 + self.nc)
            idx = (cy * wid + cx)  # (B,G,5)
            bi = jnp.arange(b)[:, None, None]
            pred = flat[bi, idx].transpose(0, 1, 3, 2, 4)  # (B,G,na,5,no)

            sig = jax.nn.sigmoid(pred)
            pxy = sig[..., :2] * 2.0 - 0.5 + jnp.stack([cx, cy], -1)[:, :, None, :, :]
            pwh = (sig[..., 2:4] * 2.0) ** 2 * anc[None, None, :, None, :]
            pbox = jnp.concatenate([pxy, pwh], -1)           # (B,G,na,5,4) grid xywh
            tbox = jnp.concatenate([gxy, gwh], -1)[:, :, None, None, :]
            iou = bbox_iou(pbox, jnp.broadcast_to(tbox, pbox.shape), xywh=True, CIoU=True)
            iou = iou.squeeze(-1) if iou.shape[-1] == 1 else iou
            mf = m.astype(jnp.float32)
            npos = mf.sum() + 1e-6
            lbox = lbox + (((1.0 - iou) * mf).sum() / npos)

            # objectness target: scatter-max detached IoU into the obj map
            tobj = jnp.zeros((b, hgt * wid, self.na), jnp.float32)
            flat_idx = idx[:, :, None, :].repeat(self.na, 2)          # (B,G,na,5)
            iou_pos = jnp.clip(jax.lax.stop_gradient(iou), 0.0) * mf
            bidx = jnp.broadcast_to(jnp.arange(b)[:, None, None, None], flat_idx.shape)
            aidx = jnp.broadcast_to(jnp.arange(self.na)[None, None, :, None], flat_idx.shape)
            tobj = tobj.at[bidx.reshape(-1), flat_idx.reshape(-1), aidx.reshape(-1)].max(
                iou_pos.reshape(-1))
            obj_logit = t[..., 4].reshape(b, hgt * wid, self.na)
            lobj_l = bce_logits(obj_logit, tobj).mean()
            bal = self.BALANCE[li] if li < len(self.BALANCE) else 0.4
            lobj = lobj + bal * lobj_l

            if self.nc > 1:
                tcls = jax.nn.one_hot(cls[:, :, None, None].repeat(self.na, 2)
                                      .repeat(5, 3), self.nc)
                lcls = lcls + ((bce_logits(pred[..., 5:], tcls) * mf[..., None]).sum()
                               / (npos * self.nc))

        nl = len(feats)
        total = (self.box_gain * lbox + self.obj_gain * lobj +
                 self.cls_gain * lcls) * bsz
        return total, {"box": self.box_gain * lbox, "obj": self.obj_gain * lobj,
                       "cls": self.cls_gain * lcls}
