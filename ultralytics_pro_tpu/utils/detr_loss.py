"""DETR-family losses: Hungarian matching + VFL/L1/GIoU with per-layer aux.

Behavioral parity with the reference DETR losses (ultralytics/models/utils/
loss.py:17 DETRLoss, :393 RTDETRDetectionLoss; models/utils/ops.py:16
HungarianMatcher). TPU-native: the assignment runs INSIDE the jitted loss via
optax.assignment.hungarian_algorithm (batched with vmap, fixed shapes with
padded GTs) instead of host-side scipy, so the whole train step stays one
compiled program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from optax import assignment

from ultralytics_pro_tpu.ops.boxes import xywh2xyxy
from ultralytics_pro_tpu.ops.iou import bbox_iou
from ultralytics_pro_tpu.utils.loss import bce_logits

BIG = 1e6


class HungarianMatcher:
    """Optimal query<->gt assignment over class/bbox/giou costs (reference
    models/utils/ops.py:16). Pure-jax, vmapped over the batch."""

    def __init__(self, cost_gain=None, alpha: float = 0.25, gamma: float = 2.0):
        self.cost_gain = cost_gain or {"class": 2, "bbox": 5, "giou": 2}
        self.alpha = alpha
        self.gamma = gamma

    def __call__(self, pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt):
        """pred_bboxes (b, Q, 4) cxcywh [0,1]; pred_scores (b, Q, nc) logits;
        gt_bboxes (b, G, 4) cxcywh [0,1]; gt_cls (b, G) int; mask_gt (b, G).

        Returns (row_idx (b, G), valid (b, G)): for each gt, the matched query.
        """

        def single(pb, ps, gb, gc, mg):
            scores = jax.nn.sigmoid(ps)  # (Q, nc)
            sc = scores[:, gc]  # (Q, G) score of each gt's class
            neg_cost = (1 - self.alpha) * sc**self.gamma * (-jnp.log(1 - sc + 1e-8))
            pos_cost = self.alpha * (1 - sc) ** self.gamma * (-jnp.log(sc + 1e-8))
            cost_class = pos_cost - neg_cost

            cost_bbox = jnp.abs(pb[:, None, :] - gb[None, :, :]).sum(-1)  # (Q, G)
            giou = bbox_iou(xywh2xyxy(pb)[:, None, :], xywh2xyxy(gb)[None, :, :],
                            xywh=False, GIoU=True)[..., 0]
            cost = (self.cost_gain["class"] * cost_class
                    + self.cost_gain["bbox"] * cost_bbox
                    + self.cost_gain["giou"] * (1 - giou))
            cost = jnp.where(mg[None, :], cost, BIG)  # padded gts effectively free-floating
            cost = jnp.nan_to_num(cost, nan=BIG, posinf=BIG, neginf=-BIG)
            # rectangular assignment: every gt column gets one query row
            i, j = assignment.hungarian_algorithm(cost.T)  # rows = gts
            # i = gt indices, j = matched query indices; reorder to gt order
            order = jnp.argsort(i)
            return j[order]

        rows = jax.vmap(single)(pred_bboxes, pred_scores, gt_bboxes,
                                gt_cls.astype(jnp.int32), mask_gt)
        return rows  # (b, G)


class DETRLoss:
    """VFL class + L1 + GIoU box losses with aux per decoder layer (reference
    models/utils/loss.py:17)."""

    def __init__(self, nc: int = 80, loss_gain=None, alpha: float = 0.25, gamma: float = 2.0):
        self.nc = nc
        self.loss_gain = loss_gain or {"class": 1, "bbox": 5, "giou": 2}
        self.matcher = HungarianMatcher(alpha=alpha, gamma=gamma)
        self.alpha = alpha
        self.gamma = gamma

    def _single_layer(self, pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt, match_rows):
        """Losses for one decoder layer given the matching (b, G) -> query idx."""
        b, q, nc = pred_scores.shape
        g = gt_bboxes.shape[1]
        # gather matched predictions per gt — one-hot matmul, not
        # take_along_axis (TPU gather pathology; see utils/tal.py)
        oh_match = jax.nn.one_hot(match_rows, q, dtype=pred_bboxes.dtype)  # (b, G, Q)
        pb = oh_match @ pred_bboxes  # (b, G, 4)
        iou = jnp.clip(
            bbox_iou(xywh2xyxy(pb), xywh2xyxy(gt_bboxes), xywh=False)[..., 0], 0, None
        )  # (b, G)

        # VarifocalLoss-style class target: one-hot scaled by IoU at matched
        # slots; the scatter-add is the transposed one-hot matmul (exact)
        one_hot = jax.nn.one_hot(gt_cls.astype(jnp.int32), nc) * (iou * mask_gt)[..., None]
        tgt = jnp.einsum("bgq,bgc->bqc", oh_match, one_hot)
        tgt = jnp.clip(tgt, 0.0, 1.0)

        pred_sig = jax.nn.sigmoid(pred_scores)
        weight = (self.alpha * pred_sig**self.gamma * (1 - (tgt > 0)) + tgt)
        loss_cls = (bce_logits(pred_scores, tgt) * weight).mean(1).sum() * q
        n_gts = jnp.maximum(mask_gt.sum(), 1.0)
        loss_cls = loss_cls / n_gts / b

        l1 = (jnp.abs(pb - gt_bboxes).sum(-1) * mask_gt).sum() / n_gts
        giou = bbox_iou(xywh2xyxy(pb), xywh2xyxy(gt_bboxes), xywh=False, GIoU=True)[..., 0]
        loss_giou = ((1 - giou) * mask_gt).sum() / n_gts

        return {
            "cls": loss_cls * self.loss_gain["class"],
            "bbox": l1 * self.loss_gain["bbox"],
            "giou": loss_giou * self.loss_gain["giou"],
        }

    def __call__(self, dec_bboxes, dec_scores, gt_bboxes, gt_cls, mask_gt,
                 enc_bboxes=None, enc_scores=None):
        """dec_bboxes (L, b, Q, 4) cxcywh [0,1]; dec_scores (L, b, Q, nc) logits."""
        total = {"cls": 0.0, "bbox": 0.0, "giou": 0.0}
        layers = dec_bboxes.shape[0]
        for li in range(layers):
            rows = self.matcher(dec_bboxes[li], dec_scores[li], gt_bboxes, gt_cls, mask_gt)
            parts = self._single_layer(dec_bboxes[li], dec_scores[li], gt_bboxes,
                                       gt_cls, mask_gt, rows)
            for k, v in parts.items():
                total[k] = total[k] + v
        if enc_bboxes is not None:
            rows = self.matcher(enc_bboxes, enc_scores, gt_bboxes, gt_cls, mask_gt)
            parts = self._single_layer(enc_bboxes, enc_scores, gt_bboxes, gt_cls, mask_gt, rows)
            for k, v in parts.items():
                total[k] = total[k] + v
        return total


class RTDETRDetectionLoss:
    """RT-DETR criterion over padded batches, uniform (preds, batch, imgsz)
    interface (reference models/utils/loss.py:393), including the CDN
    denoising branch when the decoder emitted dn splits."""

    def __init__(self, nc: int = 80):
        self.nc = nc
        self.detr = DETRLoss(nc=nc)

    def __call__(self, preds: Dict, batch: Dict, imgsz_hw: Tuple[int, int]):
        gt_bboxes = batch["bboxes"]  # (b, G, 4) normalized cxcywh (already [0,1])
        gt_cls = batch["cls"]
        mask_gt = batch["mask_gt"].astype(jnp.float32) * (gt_bboxes[..., 2:4].prod(-1) > 0)

        parts = self.detr(
            preds["dec_bboxes"], preds["dec_scores"], gt_bboxes, gt_cls, mask_gt,
            enc_bboxes=preds.get("enc_bboxes"), enc_scores=preds.get("enc_scores"),
        )
        if "dn_bboxes" in preds:
            dn_parts = self._denoising_loss(preds, gt_bboxes, gt_cls, mask_gt)
            for k, v in dn_parts.items():
                parts[f"dn_{k}"] = v
        batch_size = gt_bboxes.shape[0]
        total = sum(parts.values()) * batch_size
        return total, parts

    def _denoising_loss(self, preds, gt_bboxes, gt_cls, mask_gt):
        """CDN loss with KNOWN matching (reference get_dn_match_indices,
        models/utils/loss.py:441): group g's positive slot j <-> gt j, so the
        Hungarian matcher is skipped. Negative halves receive background
        through the zero class targets. Layout from make_cdn_batch:
        per group [pos G | neg G]."""
        b, G = gt_cls.shape
        t_dn = preds["dn_bboxes"].shape[2]
        n_group = t_dn // (2 * G)
        # tile gts once per group; gt (g, j) matches dn slot g*2G + j
        gt_b = jnp.tile(gt_bboxes, (1, n_group, 1))
        gt_c = jnp.tile(gt_cls, (1, n_group))
        m = jnp.tile(mask_gt, (1, n_group))
        rows = (jnp.arange(n_group)[:, None] * 2 * G + jnp.arange(G)[None, :]).reshape(-1)
        rows = jnp.broadcast_to(rows[None], (b, n_group * G))
        total = {"cls": 0.0, "bbox": 0.0, "giou": 0.0}
        for li in range(preds["dn_bboxes"].shape[0]):
            parts = self._single_layer_dn(preds["dn_bboxes"][li], preds["dn_scores"][li],
                                          gt_b, gt_c, m, rows)
            for k, v in parts.items():
                total[k] = total[k] + v
        return total

    def _single_layer_dn(self, *args):
        return self.detr._single_layer(*args)


def make_cdn_batch(cls_np, bboxes_np, mask_np, nc: int, num_dn: int = 100,
                   cls_noise_ratio: float = 0.5, box_noise_scale: float = 1.0,
                   rng=None):
    """Contrastive-denoising query construction (reference models/utils/ops.py
    get_cdn_group), HOST-side on the padded batch so the jitted step stays
    pure. Layout: (b, n_group, 2*G) — pos half then neg half per group; class
    nc = the no-object embedding row (used for padding slots too).

    Returns {"cls": (b, n_group, 2G) int32, "bbox_logit": (b, n_group, 2G, 4)}.
    """
    rng = rng or np.random.default_rng()
    b, G = cls_np.shape
    n_group = max(1, num_dn // max(G, 1))
    cls = np.tile(cls_np[:, None, :], (1, n_group, 2)).astype(np.int64)  # (b, ng, 2G)
    box = np.tile(bboxes_np[:, None, :, :], (1, n_group, 2, 1)).astype(np.float32)
    mask = np.tile(mask_np[:, None, :].astype(bool), (1, n_group, 2))

    # class noise: flip half*ratio of real slots to a random class
    flip = (rng.random(cls.shape) < cls_noise_ratio * 0.5) & mask
    cls = np.where(flip, rng.integers(0, nc, cls.shape), cls)
    cls = np.where(mask, cls, nc)  # padding slots -> no-object row

    # box noise: pos half inside the box, neg half pushed outside (scale 2)
    known = np.concatenate([box[..., :2] - box[..., 2:] / 2,
                            box[..., :2] + box[..., 2:] / 2], -1)  # xyxy
    diff = np.tile(box[..., 2:] / 2, (1, 1, 1, 2)) * box_noise_scale
    sign = rng.integers(0, 2, known.shape) * 2 - 1
    part = rng.random(known.shape)
    neg = np.zeros_like(part, bool)
    neg[:, :, G:] = True  # second half of each group = negatives
    part = np.where(neg, part + 1.0, part)
    known = np.clip(known + sign * part * diff, 0.0, 1.0)
    cxcy = (known[..., :2] + known[..., 2:]) / 2
    wh = np.maximum(known[..., 2:] - known[..., :2], 1e-4)
    noised = np.concatenate([cxcy, wh], -1)
    logit = np.log(noised / (1 - noised + 1e-6) + 1e-6)
    logit = np.where(mask[..., None], logit, 0.0)
    return {"cls": cls.astype(np.int32), "bbox_logit": logit.astype(np.float32)}
