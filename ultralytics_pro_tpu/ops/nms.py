"""Static-shape batched class-aware NMS for TPU.

Behavioral parity with the reference NMS (ultralytics/utils/nms.py:13
`non_max_suppression` and :169 `TorchNMS`): same candidate selection
(conf threshold, multi-label expansion, class filter, max_nms cap, class-offset
trick with max_wh) and exact greedy suppression semantics (a box suppressed by
an already-suppressed box survives — matching torchvision.ops.nms), but
reformulated with fixed shapes so the whole postprocess jits:

- candidates are selected by top-K on masked scores instead of boolean indexing;
- greedy NMS runs as a fori_loop of `max_det` argmax+suppress steps, O(max_det*K)
  work with no dynamic shapes, instead of a data-dependent while loop;
- outputs are fixed (B, max_det, ...) arrays plus a validity mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ultralytics_pro_tpu.ops.boxes import xywh2xyxy


def _greedy_nms_scores(boxes, scores, iou_thres: float, max_det: int):
    """Exact greedy NMS on (K,4) xyxy boxes with (K,) scores (invalid rows < 0).

    Returns (keep_idx (max_det,), keep_valid (max_det,) bool).
    """
    k = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)

    def body(i, carry):
        s, keep_idx, keep_valid = carry
        j = jnp.argmax(s)
        sj = s[j]
        # IoU of box j against all boxes.
        xx1 = jnp.maximum(x1[j], x1)
        yy1 = jnp.maximum(y1[j], y1)
        xx2 = jnp.minimum(x2[j], x2)
        yy2 = jnp.minimum(y2[j], y2)
        inter = jnp.clip(xx2 - xx1, 0, None) * jnp.clip(yy2 - yy1, 0, None)
        iou = inter / (areas[j] + areas - inter + 1e-7)
        suppress = iou > iou_thres  # includes j itself (iou == 1)
        s = jnp.where(suppress, -1.0, s)
        keep_idx = keep_idx.at[i].set(j)
        keep_valid = keep_valid.at[i].set(sj > 0)
        return s, keep_idx, keep_valid

    init = (jnp.int32(0), scores, jnp.zeros((max_det,), jnp.int32),
            jnp.zeros((max_det,), bool))

    def cond(carry):
        # Early exit when no positive candidate remains — exact (the skipped
        # slots keep idx 0 / valid False), and matches the Pallas kernel's
        # termination so keep agreement stays bit-identical.
        i, s, _, _ = carry
        return jnp.logical_and(i < max_det, jnp.max(s) > 0)

    def step(carry):
        i, s, keep_idx, keep_valid = carry
        s, keep_idx, keep_valid = body(i, (s, keep_idx, keep_valid))
        return i + 1, s, keep_idx, keep_valid

    _, _, keep_idx, keep_valid = jax.lax.while_loop(cond, step, init)
    return keep_idx, keep_valid


def _topk(masked, k: int, approx):
    """Candidate top-k: exact lax.top_k, or the TPU-accelerated partial
    reduction lax.approx_max_k when `approx` is a recall target (float).
    approx only reorders/misses tail candidates far below max_det rank; see
    tools/perf_topk_probe.py for the measured speed/recall trade."""
    if approx is None:
        return jax.lax.top_k(masked, k)
    vals, idx = jax.lax.approx_max_k(masked, k, recall_target=float(approx))
    return vals, idx


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "max_det", "max_nms", "max_wh", "agnostic", "multi_label",
        "use_pallas", "approx_topk",
    ),
)
def non_max_suppression(
    boxes,
    scores,
    extra=None,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 30000,
    max_wh: float = 7680.0,
    agnostic: bool = False,
    multi_label: bool = False,
    classes=None,
    use_pallas: bool = None,
    approx_topk=None,
):
    """Batched class-aware NMS with fixed output shapes.

    Args:
        boxes: (B, A, 4) xywh pixel boxes (head decode output).
        scores: (B, A, nc) per-class scores (post-sigmoid).
        extra: optional (B, A, E) per-anchor payload (e.g. mask coefficients).
        classes: optional (nc,) bool mask of allowed classes.

    Returns:
        dict with 'boxes' (B, max_det, 4) xyxy, 'scores' (B, max_det),
        'cls' (B, max_det) int32, 'valid' (B, max_det) bool,
        and 'extra' (B, max_det, E) if extra was given.
    """
    nc = scores.shape[-1]
    a = scores.shape[1]
    if classes is not None and multi_label and nc > 1:
        # multi-label: zeroing disallowed classes == the reference's row filter
        # (every (anchor, class) pair is its own row)
        scores = jnp.where(jnp.asarray(classes)[None, None, :], scores, 0.0)

    def select(boxes_i, scores_i):
        """Per-image candidate selection (vmapped)."""
        if multi_label and nc > 1:
            # Every (anchor, class) pair is a candidate.
            flat = scores_i.reshape(-1)  # (A*nc,)
            masked = jnp.where(flat > conf_thres, flat, -1.0)
            k = min(max_nms, flat.shape[0])
            top_scores, top_flat = _topk(masked, k, approx_topk)
            anchor_idx = top_flat // nc
            cls_idx = (top_flat % nc).astype(jnp.int32)
        else:
            conf = scores_i.max(axis=-1)  # (A,)
            cls_all = scores_i.argmax(axis=-1).astype(jnp.int32)
            if classes is not None:
                # reference single-label semantics (utils/nms.py:118): the row
                # keeps its argmax-over-ALL class and is dropped if not allowed
                conf = jnp.where(jnp.asarray(classes)[cls_all], conf, 0.0)
            masked = jnp.where(conf > conf_thres, conf, -1.0)
            k = min(max_nms, a)
            top_scores, anchor_idx = _topk(masked, k, approx_topk)
            cls_idx = cls_all[anchor_idx]
        cand_boxes = xywh2xyxy(boxes_i[anchor_idx])  # (K, 4)
        return cand_boxes, top_scores, cls_idx, anchor_idx

    cand_boxes, top_scores, cls_idx, anchor_idx = jax.vmap(select)(boxes, scores)
    offset = jnp.where(agnostic, 0.0, 1.0) * cls_idx.astype(cand_boxes.dtype)[..., None] * max_wh

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from ultralytics_pro_tpu.kernels.nms_pallas import pallas_greedy_nms

        keep_idx, keep_valid = pallas_greedy_nms(
            cand_boxes + offset, top_scores, max_det=max_det, iou_thres=iou_thres
        )
    else:
        keep_idx, keep_valid = jax.vmap(
            lambda b, s: _greedy_nms_scores(b, s, iou_thres, max_det)
        )(cand_boxes + offset, top_scores)

    def gather(cand_boxes_i, top_scores_i, cls_i, anchor_i, keep_i, valid_i, extra_i):
        out = {
            "boxes": cand_boxes_i[keep_i],
            "scores": jnp.where(valid_i, top_scores_i[keep_i], 0.0),
            "cls": jnp.where(valid_i, cls_i[keep_i], 0),
            "valid": valid_i,
        }
        if extra_i is not None:
            out["extra"] = extra_i[anchor_i][keep_i]
        return out

    if extra is None:
        return jax.vmap(lambda *a: gather(*a, None))(
            cand_boxes, top_scores, cls_idx, anchor_idx, keep_idx, keep_valid
        )
    return jax.vmap(gather)(cand_boxes, top_scores, cls_idx, anchor_idx, keep_idx, keep_valid, extra)


@partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "max_wh",
                     "agnostic", "use_pallas", "approx_topk"),
)
def non_max_suppression_fused(
    boxes,
    conf,
    cls,
    extra=None,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 30000,
    max_wh: float = 7680.0,
    agnostic: bool = False,
    classes=None,
    use_pallas: bool = None,
    approx_topk=None,
):
    """Single-label NMS on precomputed per-anchor (conf, cls) — the companion
    of head.decode_single_label. Identical suppression/gather semantics to
    non_max_suppression's single-label path, but skips the per-class max pass
    (already fused into the head epilogue upstream).

    classes follows the reference single-label semantics
    (ultralytics/utils/nms.py:118): rows whose argmax class is not allowed are
    DROPPED (not re-scored to their best allowed class).

    Args:
        boxes: (B, A, 4) xywh pixel boxes.
        conf: (B, A) best-class score (post-sigmoid).
        cls: (B, A) int32 best-class index.
    """
    if classes is not None:
        allowed = jnp.asarray(classes)
        conf = jnp.where(allowed[cls], conf, 0.0)

    a = conf.shape[1]
    k = min(max_nms, a)

    def select(boxes_i, conf_i, cls_i):
        masked = jnp.where(conf_i > conf_thres, conf_i, -1.0)
        top_scores, anchor_idx = _topk(masked, k, approx_topk)
        cand_boxes = xywh2xyxy(boxes_i[anchor_idx])
        return cand_boxes, top_scores, cls_i[anchor_idx], anchor_idx

    cand_boxes, top_scores, cls_idx, anchor_idx = jax.vmap(select)(boxes, conf, cls)
    offset = jnp.where(agnostic, 0.0, 1.0) * cls_idx.astype(cand_boxes.dtype)[..., None] * max_wh

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from ultralytics_pro_tpu.kernels.nms_pallas import pallas_greedy_nms

        keep_idx, keep_valid = pallas_greedy_nms(
            cand_boxes + offset, top_scores, max_det=max_det, iou_thres=iou_thres
        )
    else:
        keep_idx, keep_valid = jax.vmap(
            lambda b, s: _greedy_nms_scores(b, s, iou_thres, max_det)
        )(cand_boxes + offset, top_scores)

    def gather(cand_boxes_i, top_scores_i, cls_i, anchor_i, keep_i, valid_i, extra_i):
        out = {
            "boxes": cand_boxes_i[keep_i],
            "scores": jnp.where(valid_i, top_scores_i[keep_i], 0.0),
            "cls": jnp.where(valid_i, cls_i[keep_i], 0),
            "valid": valid_i,
        }
        if extra_i is not None:
            out["extra"] = extra_i[anchor_i][keep_i]
        return out

    if extra is None:
        return jax.vmap(lambda *a: gather(*a, None))(
            cand_boxes, top_scores, cls_idx, anchor_idx, keep_idx, keep_valid
        )
    return jax.vmap(gather)(cand_boxes, top_scores, cls_idx, anchor_idx, keep_idx, keep_valid, extra)


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms", "max_wh", "agnostic"))
def non_max_suppression_rotated(
    rboxes,
    scores,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 4096,
    max_wh: float = 7680.0,
    agnostic: bool = False,
):
    """Batched rotated NMS: probiou-greedy suppression over (B, A, 5) xywhr
    boxes (reference utils/nms.py rotated branch + TorchNMS semantics on
    batch_probiou). Per-class like the reference: rotated box *centers* are
    offset by class_index * max_wh before suppression (nms.py rotated path
    `x[:, :2] + c`), so overlapping boxes of different classes never suppress
    each other unless agnostic=True."""
    from ultralytics_pro_tpu.ops.iou import probiou

    def single(rb, sc):
        conf = sc.max(axis=-1)
        cls_all = sc.argmax(axis=-1).astype(jnp.int32)
        masked = jnp.where(conf > conf_thres, conf, -1.0)
        k = min(max_nms, rb.shape[0])
        top_scores, anchor_idx = jax.lax.top_k(masked, k)
        cand = rb[anchor_idx]  # (K, 5)
        cls_idx = cls_all[anchor_idx]
        if not agnostic:
            off = cls_idx.astype(cand.dtype)[:, None] * max_wh
            cand_sup = jnp.concatenate([cand[:, :2] + off, cand[:, 2:]], axis=-1)
        else:
            cand_sup = cand

        def body(i, carry):
            s, keep_idx, keep_valid = carry
            j = jnp.argmax(s)
            sj = s[j]
            iou = probiou(cand_sup[j][None, :], cand_sup)  # (K,)
            s = jnp.where(iou > iou_thres, -1.0, s)
            keep_idx = keep_idx.at[i].set(j)
            keep_valid = keep_valid.at[i].set(sj > 0)
            return s, keep_idx, keep_valid

        init = (top_scores, jnp.zeros((max_det,), jnp.int32), jnp.zeros((max_det,), bool))
        _, keep_idx, keep_valid = jax.lax.fori_loop(0, max_det, body, init)
        return {
            "rboxes": cand[keep_idx],
            "scores": jnp.where(keep_valid, top_scores[keep_idx], 0.0),
            "cls": jnp.where(keep_valid, cls_idx[keep_idx], 0),
            "valid": keep_valid,
        }

    return jax.vmap(single)(rboxes, scores)


def nms_indices(boxes, scores, iou_thres: float = 0.45, max_det: int = 300):
    """Plain single-class NMS on (K,4) xyxy + (K,) scores -> (keep_idx, valid).

    TPU-friendly replacement for torchvision.ops.nms (used by SAM AMG and the
    exporter NMS graph in the reference).
    """
    masked = jnp.where(scores > 0, scores, -1.0)
    return _greedy_nms_scores(boxes, masked, iou_thres, max_det)
