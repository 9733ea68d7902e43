"""Promptable SAM inference (reference ultralytics/models/sam/predict.py:40
Predictor: set_image:552, prompt_inference:205, generate:327,
remove_small_regions:602).

TPU-native flow: the image is embedded ONCE by a jitted encoder; every prompt
round reuses that embedding through a jitted decoder whose point count is
padded to a small set of static buckets (one compile per bucket, any number of
clicks/boxes at runtime). Auto-mask `generate` pushes a point grid through the
decoder in fixed-size chunks and filters with predicted IoU + stability score
+ greedy box NMS — all fixed shapes.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

from ultralytics_pro_tpu.engine.results import Results
from ultralytics_pro_tpu.models.sam.build import IMG_SIZE, build_sam

_POINT_BUCKETS = (8, 64, 512)


def _bucket(n: int) -> int:
    for b in _POINT_BUCKETS:
        if n <= b:
            return b
    return int(np.ceil(n / _POINT_BUCKETS[-1]) * _POINT_BUCKETS[-1])


class SAMPredictor:
    """Prompt-driven segmentation over a cached image embedding."""

    def __init__(self, model=None, variant: str = "sam_b", args: Optional[dict] = None):
        import jax

        self.args = dict(args or {})
        self.model = model or build_sam(variant)
        self.img_size = self.model.img_size
        self.variables = None
        self._embed = None  # cached image embedding
        self._orig_shape = None
        self._scale = None
        self.prompts = {}
        self._jax = jax
        self._jit_embed = jax.jit(
            lambda v, x: self.model.apply(v, x, method=self.model.embed_image))
        self._jit_decode = jax.jit(
            lambda v, e, p, l, mm: self.model.apply(
                v, e, p, l, None, mm, method=self.model.decode),
            static_argnums=(4,))

    # -- weights ---------------------------------------------------------------
    def init_params(self, seed: int = 0):
        import jax
        import jax.numpy as jnp

        if self.variables is None:
            x = jnp.zeros((1, self.img_size, self.img_size, 3), jnp.float32)
            pts = jnp.zeros((1, 2, 2), jnp.float32)
            lab = jnp.zeros((1, 2), jnp.int32)
            self.variables = jax.jit(self.model.init)(jax.random.key(seed), x, pts, lab)
        return self.variables

    def load(self, variables):
        self.variables = variables

    # -- image -----------------------------------------------------------------
    def set_image(self, image: np.ndarray):
        """BGR HWC uint8 -> cached (1, g, g, 256) embedding."""
        import cv2
        import jax.numpy as jnp

        self.init_params()
        h, w = image.shape[:2]
        scale = self.img_size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        im = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)[..., ::-1]
        pad = np.zeros((self.img_size, self.img_size, 3), im.dtype)
        pad[:nh, :nw] = im
        self._embed = self._jit_embed(self.variables, jnp.asarray(pad[None]))
        self._orig_shape = (h, w)
        self._scale = scale
        return self._embed

    def reset_image(self):
        self._embed = None
        self._orig_shape = None

    def set_prompts(self, prompts: dict):
        self.prompts = dict(prompts or {})

    # -- prompts -----------------------------------------------------------------
    def _prepare_prompts(self, bboxes=None, points=None, labels=None):
        """Original-frame prompts -> one padded (N, 2)/(N,) point list in
        model coords (boxes become corner points labeled 2/3, reference
        predict.py:276)."""
        pts: List[Tuple[float, float]] = []
        labs: List[int] = []
        if points is not None:
            points = np.atleast_2d(np.asarray(points, np.float32))
            if labels is None:
                labels = np.ones(len(points), np.int32)
            labels = np.atleast_1d(np.asarray(labels)).astype(np.int32)
            for p, l in zip(points, labels):
                pts.append((p[0], p[1]))
                labs.append(int(l))
        if bboxes is not None:
            bboxes = np.atleast_2d(np.asarray(bboxes, np.float32))
            for b in bboxes:
                pts.append((b[0], b[1]))
                labs.append(2)
                pts.append((b[2], b[3]))
                labs.append(3)
        if not pts:
            raise ValueError("SAM needs at least one point or box prompt (or use generate())")
        n = _bucket(len(pts))
        arr = np.zeros((1, n, 2), np.float32)
        lab = np.full((1, n), -1, np.int32)
        arr[0, : len(pts)] = np.asarray(pts, np.float32) * self._scale
        lab[0, : len(labs)] = labs
        return arr, lab

    # -- inference ----------------------------------------------------------------
    def prompt_inference(self, bboxes=None, points=None, labels=None,
                         multimask_output: bool = False):
        """Returns (masks (M, H0, W0) bool, scores (M,)) in the ORIGINAL frame."""
        import jax
        import jax.numpy as jnp

        assert self._embed is not None, "call set_image() first"
        if bboxes is not None and np.atleast_2d(np.asarray(bboxes)).shape[0] > 1:
            # one decoder call per box (batched over the box axis)
            bx = np.atleast_2d(np.asarray(bboxes, np.float32))
            n = _bucket(2)
            arr = np.zeros((len(bx), n, 2), np.float32)
            lab = np.full((len(bx), n), -1, np.int32)
            arr[:, 0] = bx[:, :2] * self._scale
            arr[:, 1] = bx[:, 2:4] * self._scale
            lab[:, 0] = 2
            lab[:, 1] = 3
            emb = jnp.broadcast_to(self._embed, (len(bx),) + self._embed.shape[1:])
            masks, iou = self._jit_decode(self.variables, emb, jnp.asarray(arr),
                                          jnp.asarray(lab), False)
            masks = np.asarray(masks)[:, 0]  # (M, 4g, 4g)
            scores = np.asarray(iou)[:, 0]
        else:
            arr, lab = self._prepare_prompts(bboxes, points, labels)
            masks, iou = self._jit_decode(self.variables, self._embed,
                                          jnp.asarray(arr), jnp.asarray(lab),
                                          bool(multimask_output))
            masks = np.asarray(masks)[0]  # (M, 4g, 4g)
            scores = np.asarray(iou)[0]
        return self._masks_to_original(masks), scores

    def _masks_to_original(self, masks: np.ndarray) -> np.ndarray:
        """(M, 4g, 4g) logits -> (M, H0, W0) bool via upsample + unpad."""
        import cv2

        h, w = self._orig_shape
        nh, nw = round(h * self._scale), round(w * self._scale)
        g4 = masks.shape[-1]
        out = np.zeros((len(masks), h, w), bool)
        frac_h, frac_w = int(round(nh / self.img_size * g4)), int(round(nw / self.img_size * g4))
        for i, m in enumerate(masks):
            m = m[:frac_h, :frac_w]
            out[i] = cv2.resize(m.astype(np.float32), (w, h),
                                interpolation=cv2.INTER_LINEAR) > 0.0
        return out

    def inference(self, im, bboxes=None, points=None, labels=None,
                  multimask_output: bool = False):
        """set_image + prompt_inference in one call (reference predict.py:167).
        Falls back to generate() when no prompts are given."""
        self.set_image(im)
        bboxes = self.prompts.pop("bboxes", bboxes)
        points = self.prompts.pop("points", points)
        labels = self.prompts.pop("labels", labels)
        if bboxes is None and points is None:
            return self.generate(im)
        return self.prompt_inference(bboxes, points, labels, multimask_output)

    def __call__(self, source, bboxes=None, points=None, labels=None,
                 multimask_output: bool = False, **kw) -> List[Results]:
        """Full predictor surface returning Results (masks + mask boxes)."""
        im = source if isinstance(source, np.ndarray) else _imread(source)
        masks, scores = self.inference(im, bboxes, points, labels, multimask_output)
        boxes = _masks_to_boxes(masks)
        data = np.concatenate(
            [boxes, scores[:, None], np.zeros((len(masks), 1), np.float32)], 1)
        names = {0: "object"}
        path = source if isinstance(source, str) else ""
        return [Results(im, path, names, boxes=data, masks=masks)]

    # -- automatic mask generation ---------------------------------------------
    def generate(self, im=None, points_per_side: int = 16, points_batch_size: int = 64,
                 conf_thres: float = 0.8, stability_score_thresh: float = 0.92,
                 stability_score_offset: float = 1.0, nms_thresh: float = 0.7):
        """Segment everything: grid prompts -> IoU/stability filter -> NMS
        (reference generate:327, simplified to single-crop)."""
        import jax.numpy as jnp

        if self._embed is None:
            assert im is not None, "need an image"
            self.set_image(im)
        h, w = self._orig_shape
        xs = (np.arange(points_per_side) + 0.5) / points_per_side * w
        ys = (np.arange(points_per_side) + 0.5) / points_per_side * h
        grid = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)
        all_masks, all_scores = [], []
        n = _bucket(1)
        for i in range(0, len(grid), points_batch_size):
            chunk = grid[i:i + points_batch_size] * self._scale
            m = len(chunk)
            pts = np.zeros((points_batch_size, n, 2), np.float32)
            lab = np.full((points_batch_size, n), -1, np.int32)
            pts[:m, 0] = chunk
            lab[:m, 0] = 1
            emb = jnp.broadcast_to(self._embed, (points_batch_size,) + self._embed.shape[1:])
            masks, iou = self._jit_decode(self.variables, emb, jnp.asarray(pts),
                                          jnp.asarray(lab), True)
            masks, iou = np.asarray(masks)[:m], np.asarray(iou)[:m]
            best = iou.argmax(1)
            sel = masks[np.arange(m), best]  # (m, 4g, 4g) logits
            score = iou[np.arange(m), best]
            stab = _stability_score(sel, 0.0, stability_score_offset)
            keep = (score > conf_thres) & (stab > stability_score_thresh)
            if keep.any():
                all_masks.append(sel[keep])
                all_scores.append(score[keep])
        if not all_masks:
            return np.zeros((0, h, w), bool), np.zeros((0,), np.float32)
        logits = np.concatenate(all_masks)
        scores = np.concatenate(all_scores)
        masks = self._masks_to_original(logits)
        boxes = _masks_to_boxes(masks)
        keep = _nms_np(boxes, scores, nms_thresh)
        return masks[keep], scores[keep]

    @staticmethod
    def remove_small_regions(masks: np.ndarray, min_area: int = 0, nms_thresh: float = 0.7):
        """Drop small islands/holes via connected components (reference
        predict.py:602)."""
        import cv2

        if min_area <= 0 or len(masks) == 0:
            return masks, list(range(len(masks)))
        out = []
        for m in masks:
            m = m.astype(np.uint8)
            for hole in (False, True):
                work = (1 - m) if hole else m
                nlab, lab, stats, _ = cv2.connectedComponentsWithStats(work, 8)
                small = [i for i in range(1, nlab) if stats[i, cv2.CC_STAT_AREA] < min_area]
                fill = 1 if hole else 0
                for i in small:
                    m[lab == i] = fill
            out.append(m.astype(bool))
        masks = np.stack(out)
        boxes = _masks_to_boxes(masks)
        scores = masks.reshape(len(masks), -1).sum(1).astype(np.float32)
        keep = _nms_np(boxes, scores, nms_thresh)
        return masks[keep], keep.tolist()


class SAM2Predictor(SAMPredictor):
    """SAM2 image inference (reference predict.py:701 SAM2Predictor): same
    promptable API over the Hiera+FPN encoder. The memory subsystem only
    engages in the video predictor below."""

    def __init__(self, model=None, variant: str = "sam2_t", args: Optional[dict] = None):
        from ultralytics_pro_tpu.models.sam.sam2 import build_sam2

        img_size = int((args or {}).get("imgsz", 1024))
        super().__init__(model=model or build_sam2(variant, img_size=img_size), args=args)


class SAM2VideoPredictor(SAM2Predictor):
    """Streaming video segmentation (reference predict.py:875
    SAM2VideoPredictor): prompt the first frame, then propagate masks through
    a FIXED-size memory bank — each subsequent frame is embedded, conditioned
    on the bank via memory attention, decoded promptless, and its memory
    pushed FIFO (slot 0 = the prompted conditioning frame, always kept).
    The whole per-frame step is jitted with static shapes."""

    def __init__(self, model=None, variant: str = "sam2_t", args: Optional[dict] = None):
        import jax

        super().__init__(model=model, variant=variant, args=args)
        m = self.model
        self.num_maskmem = m.num_maskmem

        def decode_mem(v, embed, bank, valid, pts, labs):
            def fn(mdl):
                cond = mdl.condition_on_memory(embed, bank, valid)
                return mdl.decode(cond, pts, labs, None, False)
            return m.apply(v, method=fn)

        def enc_mem(v, embed, mask_logits):
            return m.apply(v, embed, mask_logits, method=m.encode_memory)

        self._jit_decode_mem = jax.jit(decode_mem)
        self._jit_enc_mem = jax.jit(enc_mem)

    def _frame_to_model(self, image: np.ndarray):
        import cv2

        h, w = image.shape[:2]
        scale = self.img_size / max(h, w)
        nh, nw = round(h * scale), round(w * scale)
        im = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)[..., ::-1]
        pad = np.zeros((self.img_size, self.img_size, 3), im.dtype)
        pad[:nh, :nw] = im
        self._orig_shape = (h, w)
        self._scale = scale
        return pad[None]

    def propagate(self, frames, bboxes=None, points=None, labels=None):
        """frames: iterable of BGR HWC uint8 arrays. Prompts apply to the
        FIRST frame. Yields (masks (1, H0, W0) bool, score) per frame."""
        import jax
        import jax.numpy as jnp

        self.init_params()
        g = self.img_size // 16
        n_tok = g * g
        bank = jnp.zeros((1, self.num_maskmem, n_tok, self.model.mem_dim), jnp.float32)
        valid = np.zeros((1, self.num_maskmem), bool)
        next_slot = 1  # slot 0 reserved for the conditioning frame

        for t, frame in enumerate(frames):
            x = jnp.asarray(self._frame_to_model(frame))
            embed = self._jit_embed(self.variables, x)
            if t == 0:
                pts, labs = self._prepare_prompts(bboxes, points, labels)
                masks, iou = self._jit_decode(self.variables, embed,
                                              jnp.asarray(pts), jnp.asarray(labs), False)
            else:
                n = 8  # promptless decode: all-pad labels
                pts = jnp.zeros((1, n, 2), jnp.float32)
                labs = jnp.full((1, n), -1, jnp.int32)
                masks, iou = self._jit_decode_mem(self.variables, embed, bank,
                                                  jnp.asarray(valid), pts, labs)
            logits = masks[:, 0]  # (1, 4g, 4g)
            full = jax.image.resize(logits[..., None],
                                    (1, self.img_size, self.img_size, 1), "bilinear")
            mem = self._jit_enc_mem(self.variables, embed, full)  # (1, g, g, mem)
            mem_tok = mem.reshape(1, 1, n_tok, self.model.mem_dim)
            slot = 0 if t == 0 else next_slot
            bank = bank.at[:, slot].set(mem_tok[:, 0])
            valid[:, slot] = True
            if t > 0:
                next_slot = 1 + (next_slot % (self.num_maskmem - 1))
            out = self._masks_to_original(np.asarray(logits))
            yield out, float(np.asarray(iou)[0, 0])


def _imread(path):
    import cv2

    im = cv2.imread(str(path))
    assert im is not None, f"could not read {path}"
    return im


def _stability_score(logits: np.ndarray, thresh: float, offset: float) -> np.ndarray:
    hi = (logits > thresh + offset).reshape(len(logits), -1).sum(1)
    lo = (logits > thresh - offset).reshape(len(logits), -1).sum(1)
    return hi / np.maximum(lo, 1)


def _masks_to_boxes(masks: np.ndarray) -> np.ndarray:
    boxes = np.zeros((len(masks), 4), np.float32)
    for i, m in enumerate(masks):
        ys, xs = np.nonzero(m)
        if len(xs):
            boxes[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
    return boxes


def _nms_np(boxes: np.ndarray, scores: np.ndarray, thresh: float) -> np.ndarray:
    from ultralytics_pro_tpu.utils.metrics import box_iou_np

    order = scores.argsort()[::-1]
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        iou = box_iou_np(boxes[i:i + 1], boxes).ravel()
        sup |= iou > thresh
    return np.array(keep, int)
