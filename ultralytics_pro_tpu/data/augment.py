"""Host-side augmentations — numpy/cv2, matching reference math.

Behavioral parity with the reference augment pipeline (ultralytics/data/augment.py:
Mosaic:471, MixUp:838, CutMix:901, RandomPerspective:1015, RandomHSV:1373,
RandomFlip:1453, LetterBox:1544, CopyPaste:1724, Format:2017, v8_transforms:2462).

Design: augmentation stays on host (cv2 SIMD is fine for IO-bound work and the
math must match the reference bit-for-bit where it affects mAP — e.g. letterbox
rounding); the device gets fixed-shape uint8 batches and does normalize /255
on-chip fused with the first conv (SURVEY.md §2.9 'north star').

Internal label format: dict with
    img: HWC uint8 BGR, cls: (n,) float, bboxes: (n, 4) pixel xyxy,
    segments/keypoints optional.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Tuple

import cv2
import numpy as np


class LetterBox:
    """Aspect-preserving resize + pad (reference augment.py:1544). Exact
    rounding: round(dw - 0.1) with center=True so box rescale matches."""

    def __init__(self, new_shape=(640, 640), auto=False, scale_fill=False, scaleup=True,
                 center=True, stride=32, padding_value=114):
        self.new_shape = new_shape
        self.auto = auto
        self.scale_fill = scale_fill
        self.scaleup = scaleup
        self.center = center
        self.stride = stride
        self.padding_value = padding_value

    def __call__(self, labels: Dict | None = None, image: np.ndarray | None = None):
        labels = labels or {}
        img = labels.get("img") if image is None else image
        shape = img.shape[:2]  # h, w
        new_shape = labels.pop("rect_shape", self.new_shape)
        if isinstance(new_shape, int):
            new_shape = (new_shape, new_shape)

        r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
        if not self.scaleup:
            r = min(r, 1.0)

        ratio = (r, r)
        new_unpad = (round(shape[1] * r), round(shape[0] * r))  # (w, h)
        dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
        if self.auto:
            dw, dh = dw % self.stride, dh % self.stride
        elif self.scale_fill:
            dw, dh = 0, 0
            new_unpad = (new_shape[1], new_shape[0])
            ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])

        if self.center:
            dw /= 2
            dh /= 2

        if shape[::-1] != new_unpad:
            img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
        top, bottom = int(round(dh - 0.1)) if self.center else 0, int(round(dh + 0.1))
        left, right = int(round(dw - 0.1)) if self.center else 0, int(round(dw + 0.1))
        if img.ndim == 3 and img.shape[2] not in (1, 3, 4):
            # multispectral: cv2.copyMakeBorder caps at 4 channels
            # (reference augment.py:1674 pads manually for c != 3)
            hh, ww, cc = img.shape
            pad_img = np.full((hh + top + bottom, ww + left + right, cc),
                              self.padding_value, dtype=img.dtype)
            pad_img[top:top + hh, left:left + ww] = img
            img = pad_img
        else:
            img = cv2.copyMakeBorder(
                img, top, bottom, left, right, cv2.BORDER_CONSTANT,
                value=(self.padding_value,) * 3,
            )
        if image is not None:
            return img
        labels["img"] = img
        # evaluation ratio_pad carries the FULL original->input gain: the
        # dataset pre-resizes the long side to imgsz and records resized/ori
        # (reference base.py:388); letterbox only pads at val (r==1), so the
        # recorded gain stays correct for scale_boxes (ops.py:102)
        pre = labels.get("ratio_pad")
        if isinstance(pre, tuple) and len(pre) == 2 and not isinstance(pre[0], tuple):
            labels["ratio_pad"] = ((pre[0] * ratio[0], pre[1] * ratio[1]), (left, top))
        else:
            labels["ratio_pad"] = (ratio, (left, top))
        if "bboxes" in labels and len(labels["bboxes"]):
            b = labels["bboxes"].copy()
            if b.shape[1] == 5:  # rotated xywhr: scale dims, shift center only
                b[:, :4] *= ratio[0]
                b[:, 0] += left
                b[:, 1] += top
            else:
                b = b * ratio[0]
                b[:, [0, 2]] += left
                b[:, [1, 3]] += top
            labels["bboxes"] = b
        if labels.get("keypoints") is not None and len(labels["keypoints"]):
            k = labels["keypoints"].copy()
            vis = k[..., 2:3] if k.shape[-1] == 3 else None
            k[..., 0] = k[..., 0] * ratio[0] + left
            k[..., 1] = k[..., 1] * ratio[1] + top
            if vis is not None:  # invisible points stay at 0
                k[..., :2] = np.where(vis > 0, k[..., :2], 0.0)
            labels["keypoints"] = k
        if labels.get("segments") is not None:
            labels["segments"] = [s * ratio[0] + np.array([left, top], np.float32)
                                  for s in labels["segments"]]
        labels["resized_shape"] = img.shape[:2]
        return labels


class RandomHSV:
    """HSV jitter via uint8 LUTs (reference augment.py:1373)."""

    def __init__(self, hgain=0.5, sgain=0.5, vgain=0.5):
        self.hgain = hgain
        self.sgain = sgain
        self.vgain = vgain

    def __call__(self, labels):
        img = labels["img"]
        if img.ndim == 3 and img.shape[2] != 3:
            return labels  # HSV is RGB-only (reference gates multispectral)
        if self.hgain or self.sgain or self.vgain:
            r = np.random.uniform(-1, 1, 3) * [self.hgain, self.sgain, self.vgain] + 1
            hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
            x = np.arange(0, 256, dtype=r.dtype)
            lut_hue = ((x * r[0]) % 180).astype(img.dtype)
            lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
            lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
            im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
            labels["img"] = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
        return labels


class RandomFlip:
    """Horizontal/vertical flip with box (and keypoint) updates (reference
    augment.py:1453)."""

    def __init__(self, p=0.5, direction="horizontal", flip_idx=None):
        self.p = p
        self.direction = direction
        self.flip_idx = flip_idx

    def __call__(self, labels):
        if random.random() >= self.p:
            return labels
        img = labels["img"]
        h, w = img.shape[:2]
        boxes = labels.get("bboxes")
        rotated = boxes is not None and len(boxes) and boxes.shape[1] == 5
        if self.direction == "horizontal":
            labels["img"] = np.fliplr(img)
            if boxes is not None and len(boxes):
                if rotated:
                    boxes[:, 0] = w - boxes[:, 0]
                    boxes[:, 4] = -boxes[:, 4]
                else:
                    x1 = boxes[:, 0].copy()
                    boxes[:, 0] = w - boxes[:, 2]
                    boxes[:, 2] = w - x1
            if labels.get("keypoints") is not None and len(labels["keypoints"]):
                k = labels["keypoints"]
                vis = k[..., 2:3] if k.shape[-1] == 3 else None
                k[..., 0] = w - k[..., 0]
                if vis is not None:
                    k[..., :2] = np.where(vis > 0, k[..., :2], 0.0)
                if self.flip_idx is not None:
                    k = k[:, self.flip_idx]
                labels["keypoints"] = k
            if labels.get("segments") is not None:
                labels["segments"] = [np.stack([w - s[:, 0], s[:, 1]], 1) for s in labels["segments"]]
        else:
            labels["img"] = np.flipud(img)
            if boxes is not None and len(boxes):
                if rotated:
                    boxes[:, 1] = h - boxes[:, 1]
                    boxes[:, 4] = -boxes[:, 4]
                else:
                    y1 = boxes[:, 1].copy()
                    boxes[:, 1] = h - boxes[:, 3]
                    boxes[:, 3] = h - y1
            if labels.get("segments") is not None:
                labels["segments"] = [np.stack([s[:, 0], h - s[:, 1]], 1) for s in labels["segments"]]
        return labels


class RandomPerspective:
    """Affine/perspective warp with box transform + candidate filtering
    (reference augment.py:1015)."""

    def __init__(self, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
                 perspective=0.0, border=(0, 0)):
        self.degrees = degrees
        self.translate = translate
        self.scale = scale
        self.shear = shear
        self.perspective = perspective
        self.border = border

    def affine_transform(self, img, border):
        h, w = img.shape[:2]
        C = np.eye(3)
        C[0, 2] = -w / 2
        C[1, 2] = -h / 2
        P = np.eye(3)
        P[2, 0] = random.uniform(-self.perspective, self.perspective)
        P[2, 1] = random.uniform(-self.perspective, self.perspective)
        R = np.eye(3)
        a = random.uniform(-self.degrees, self.degrees)
        s = random.uniform(1 - self.scale, 1 + self.scale)
        R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
        S = np.eye(3)
        S[0, 1] = math.tan(random.uniform(-self.shear, self.shear) * math.pi / 180)
        S[1, 0] = math.tan(random.uniform(-self.shear, self.shear) * math.pi / 180)
        T = np.eye(3)
        size = (w + border[1] * 2, h + border[0] * 2)
        T[0, 2] = random.uniform(0.5 - self.translate, 0.5 + self.translate) * size[0]
        T[1, 2] = random.uniform(0.5 - self.translate, 0.5 + self.translate) * size[1]
        M = T @ S @ R @ P @ C
        if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
            warp = ((lambda im: cv2.warpPerspective(im, M, dsize=size, borderValue=(114,) * 4))
                    if self.perspective else
                    (lambda im: cv2.warpAffine(im, M[:2], dsize=size, borderValue=(114,) * 4)))
            if img.ndim == 3 and img.shape[2] > 4:
                # cv2 warps cap at 4 channels; multispectral warps per chunk
                chunks = [warp(np.ascontiguousarray(img[:, :, i:i + 4]))
                          for i in range(0, img.shape[2], 4)]
                chunks = [c if c.ndim == 3 else c[..., None] for c in chunks]
                img = np.concatenate(chunks, axis=2)
            else:
                img = warp(img)
        return img, M, s

    def apply_bboxes(self, bboxes, M):
        n = len(bboxes)
        if n == 0:
            return bboxes
        xy = np.ones((n * 4, 3))
        xy[:, :2] = bboxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if self.perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        return np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)

    @staticmethod
    def box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
        """Filter degenerate post-warp boxes (reference augment.py:1331)."""
        w1, h1 = box1[:, 2] - box1[:, 0], box1[:, 3] - box1[:, 1]
        w2, h2 = box2[:, 2] - box2[:, 0], box2[:, 3] - box2[:, 1]
        ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
        return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)

    def __call__(self, labels):
        img = labels["img"]
        border = labels.pop("mosaic_border", self.border)
        img, M, scale = self.affine_transform(img, border)
        h, w = img.shape[:2]
        bboxes = labels.get("bboxes", np.zeros((0, 4)))
        new_boxes = self.apply_bboxes(bboxes, M)
        if len(bboxes):
            clipped = new_boxes.copy()
            clipped[:, [0, 2]] = clipped[:, [0, 2]].clip(0, w)
            clipped[:, [1, 3]] = clipped[:, [1, 3]].clip(0, h)
            keep = self.box_candidates(bboxes * scale, clipped, area_thr=0.1)
            labels["bboxes"] = clipped[keep]
            labels["cls"] = labels["cls"][keep]
        labels["img"] = img
        return labels


class Mosaic:
    """4-image mosaic (reference augment.py:471). `dataset` must expose
    get_image_and_label(i) and a buffer to sample from."""

    def __init__(self, dataset, imgsz=640, p=1.0, n=4):
        self.dataset = dataset
        self.imgsz = imgsz
        self.p = p
        self.n = n
        self.border = (-imgsz // 2, -imgsz // 2)

    def __call__(self, labels):
        if random.random() >= self.p:
            return labels
        indices = [random.randint(0, len(self.dataset) - 1) for _ in range(self.n - 1)]
        mix = [labels] + [self.dataset.get_image_and_label(i) for i in indices]
        return self._mosaic4(mix)

    def _mosaic4(self, mix: List[Dict]):
        s = self.imgsz
        yc, xc = (int(random.uniform(-x, 2 * s + x)) for x in self.border)
        c0 = mix[0]["img"].shape[2] if mix[0]["img"].ndim == 3 else 3
        img4 = np.full((s * 2, s * 2, c0), 114, dtype=np.uint8)
        cls4, boxes4 = [], []
        for i, labels in enumerate(mix):
            img = labels["img"]
            h, w = img.shape[:2]
            if i == 0:  # top left
                x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
                x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
            elif i == 1:  # top right
                x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
                x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
            elif i == 2:  # bottom left
                x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
            else:  # bottom right
                x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
                x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
            img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            padw, padh = x1a - x1b, y1a - y1b
            if len(labels.get("bboxes", [])):
                b = labels["bboxes"].copy()
                b[:, [0, 2]] += padw
                b[:, [1, 3]] += padh
                boxes4.append(b)
                cls4.append(labels["cls"])
        out = {
            "img": img4,
            "cls": np.concatenate(cls4) if cls4 else np.zeros((0,)),
            "bboxes": np.concatenate(boxes4) if boxes4 else np.zeros((0, 4)),
            "mosaic_border": self.border,
        }
        if len(out["bboxes"]):
            out["bboxes"][:, [0, 2]] = out["bboxes"][:, [0, 2]].clip(0, 2 * s)
            out["bboxes"][:, [1, 3]] = out["bboxes"][:, [1, 3]].clip(0, 2 * s)
        return out


class MixUp:
    """Blend two samples with a beta-distributed ratio (reference augment.py:838)."""

    def __init__(self, dataset, p=0.0):
        self.dataset = dataset
        self.p = p

    def __call__(self, labels):
        if random.random() >= self.p:
            return labels
        other = self.dataset.get_image_and_label(random.randint(0, len(self.dataset) - 1))
        r = np.random.beta(32.0, 32.0)
        img = (labels["img"] * r + other["img"] * (1 - r)).astype(np.uint8)
        labels["img"] = img
        labels["cls"] = np.concatenate([labels["cls"], other["cls"]], 0)
        labels["bboxes"] = np.concatenate([labels["bboxes"], other["bboxes"]], 0)
        return labels


class CutMix:
    """Paste a random crop from another image (reference augment.py:901)."""

    def __init__(self, dataset, p=0.0, beta=1.0, num_areas=3):
        self.dataset = dataset
        self.p = p
        self.beta = beta
        self.num_areas = num_areas

    def __call__(self, labels):
        if random.random() >= self.p:
            return labels
        other = self.dataset.get_image_and_label(random.randint(0, len(self.dataset) - 1))
        h, w = labels["img"].shape[:2]
        lam = np.random.beta(self.beta, self.beta)
        cut_ratio = np.sqrt(1 - lam)
        cut_w, cut_h = int(w * cut_ratio), int(h * cut_ratio)
        cx, cy = random.randint(0, w - 1), random.randint(0, h - 1)
        x1, y1 = max(cx - cut_w // 2, 0), max(cy - cut_h // 2, 0)
        x2, y2 = min(cx + cut_w // 2, w), min(cy + cut_h // 2, h)
        oh, ow = other["img"].shape[:2]
        if x2 > x1 and y2 > y1 and (y2 - y1) <= oh and (x2 - x1) <= ow:
            labels["img"][y1:y2, x1:x2] = other["img"][y1:y2, x1:x2]
        return labels


class CopyPaste:
    """Instance copy-paste; without segments falls back to box-level flip-paste
    (reference augment.py:1724)."""

    def __init__(self, dataset=None, p=0.0):
        self.dataset = dataset
        self.p = p

    def __call__(self, labels):
        if random.random() >= self.p or not len(labels.get("bboxes", [])):
            return labels
        # Box-level horizontal-flip paste (segments-based variant lands with
        # the segment pipeline).
        img = labels["img"]
        h, w = img.shape[:2]
        boxes = labels["bboxes"]
        flipped = boxes.copy()
        flipped[:, [0, 2]] = w - boxes[:, [2, 0]]
        from ultralytics_pro_tpu.utils.metrics import box_iou_np

        ioa = box_iou_np(flipped, boxes)
        ok = (ioa < 0.30).all(1)
        idx = np.nonzero(ok)[0]
        sel = idx[: max(1, len(idx) // 2)] if len(idx) else idx
        for j in sel:
            x1, y1, x2, y2 = boxes[j].astype(int)
            fx1, fy1, fx2, fy2 = flipped[j].astype(int)
            ph, pw = min(y2 - y1, fy2 - fy1), min(x2 - x1, fx2 - fx1)
            if ph > 0 and pw > 0:
                img[fy1:fy1 + ph, fx1:fx1 + pw] = img[y1:y1 + ph, x1:x1 + pw]
        if len(sel):
            labels["cls"] = np.concatenate([labels["cls"], labels["cls"][sel]], 0)
            labels["bboxes"] = np.concatenate([boxes, flipped[sel]], 0)
        labels["img"] = img
        return labels


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, labels):
        for t in self.transforms:
            labels = t(labels)
        return labels

    def __repr__(self):
        return f"Compose({[t.__class__.__name__ for t in self.transforms]})"


def v8_transforms(dataset, imgsz: int, hyp: Dict, stretch: bool = False):
    """The standard train-time pipeline (reference augment.py:2462)."""
    mosaic = Mosaic(dataset, imgsz=imgsz, p=hyp.get("mosaic", 1.0))
    affine = RandomPerspective(
        degrees=hyp.get("degrees", 0.0),
        translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5),
        shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
    )
    flip_idx = getattr(dataset, "flip_idx", None)
    return Compose([
        mosaic,
        CopyPaste(dataset, p=hyp.get("copy_paste", 0.0)),
        affine,
        MixUp(dataset, p=hyp.get("mixup", 0.0)),
        CutMix(dataset, p=hyp.get("cutmix", 0.0)),
        RandomHSV(hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4)),
        RandomFlip(p=hyp.get("flipud", 0.0), direction="vertical"),
        RandomFlip(p=hyp.get("fliplr", 0.5), direction="horizontal", flip_idx=flip_idx),
    ])


# ---------------------------------------------------------------------------
# Classification augmentations (reference augment.py:2531 classify_transforms,
# :2581 classify_augmentations — torchvision RandAugment/RandomErasing there;
# lean cv2/numpy equivalents here, same knob names).
# ---------------------------------------------------------------------------

def _ra_autocontrast(im, _):
    lo, hi = im.min(axis=(0, 1), keepdims=True), im.max(axis=(0, 1), keepdims=True)
    span = np.maximum(hi - lo, 1)
    return ((im.astype(np.float32) - lo) * (255.0 / span)).clip(0, 255).astype(np.uint8)


def _ra_equalize(im, _):
    ycc = cv2.cvtColor(im, cv2.COLOR_BGR2YCrCb)
    ycc[..., 0] = cv2.equalizeHist(ycc[..., 0])
    return cv2.cvtColor(ycc, cv2.COLOR_YCrCb2BGR)


def _ra_rotate(im, mag):
    h, w = im.shape[:2]
    deg = (mag / 10.0) * 30.0 * random.choice((-1, 1))
    mat = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    return cv2.warpAffine(im, mat, (w, h), borderValue=(128, 128, 128))


def _ra_posterize(im, mag):
    bits = max(8 - int(mag / 10.0 * 4), 4)
    return (im >> (8 - bits)) << (8 - bits)


def _ra_solarize(im, mag):
    thr = 255 - int(mag / 10.0 * 110)
    return np.where(im < thr, im, 255 - im).astype(np.uint8)


def _ra_contrast(im, mag):
    f = 1.0 + (mag / 10.0) * 0.9 * random.choice((-1, 1))
    mean = im.mean()
    return (mean + (im.astype(np.float32) - mean) * f).clip(0, 255).astype(np.uint8)


def _ra_brightness(im, mag):
    f = 1.0 + (mag / 10.0) * 0.9 * random.choice((-1, 1))
    return (im.astype(np.float32) * f).clip(0, 255).astype(np.uint8)


def _ra_sharpness(im, mag):
    f = (mag / 10.0) * 0.9 * random.choice((-1, 1))
    blur = cv2.GaussianBlur(im, (3, 3), 0)
    return (im.astype(np.float32) * (1 + f) - blur.astype(np.float32) * f).clip(0, 255).astype(np.uint8)


_RANDAUG_OPS = (_ra_autocontrast, _ra_equalize, _ra_rotate, _ra_posterize,
                _ra_solarize, _ra_contrast, _ra_brightness, _ra_sharpness)


class RandAugment:
    """N random ops at shared magnitude (reference uses torchvision's; same
    policy shape: num_ops=2, magnitude=9)."""

    def __init__(self, num_ops: int = 2, magnitude: int = 9):
        self.num_ops = num_ops
        self.magnitude = magnitude

    def __call__(self, im):
        for op in random.choices(_RANDAUG_OPS, k=self.num_ops):
            im = op(im, self.magnitude)
        return im


class RandomErasing:
    """Erase a random rectangle with noise (reference torchvision
    RandomErasing, p=erasing)."""

    def __init__(self, p: float = 0.4, scale=(0.02, 0.33), ratio=(0.3, 3.3)):
        self.p, self.scale, self.ratio = p, scale, ratio

    def __call__(self, im):
        if random.random() >= self.p:
            return im
        h, w = im.shape[:2]
        for _ in range(10):
            area = random.uniform(*self.scale) * h * w
            ar = math.exp(random.uniform(math.log(self.ratio[0]), math.log(self.ratio[1])))
            eh, ew = int(round(math.sqrt(area * ar))), int(round(math.sqrt(area / ar)))
            if eh < h and ew < w:
                y0, x0 = random.randint(0, h - eh), random.randint(0, w - ew)
                im = im.copy()
                im[y0:y0 + eh, x0:x0 + ew] = np.random.randint(
                    0, 256, (eh, ew, im.shape[2]), np.uint8)
                return im
        return im


def classify_transforms(size: int = 224):
    """Val/center-crop pipeline (reference augment.py:2531): resize short side
    then center crop."""

    def tf(im):
        h, w = im.shape[:2]
        r = size / min(h, w)
        im = cv2.resize(im, (round(w * r), round(h * r)), interpolation=cv2.INTER_LINEAR)
        h, w = im.shape[:2]
        y0, x0 = (h - size) // 2, (w - size) // 2
        return im[y0:y0 + size, x0:x0 + size]

    return tf


def classify_augmentations(size: int = 224, scale=(0.08, 1.0), hflip: float = 0.5,
                           auto_augment: str = "randaugment", erasing: float = 0.0):
    """Train pipeline (reference augment.py:2581): RandomResizedCrop + flip +
    optional RandAugment + RandomErasing."""
    ra = RandAugment() if auto_augment == "randaugment" else None
    re_ = RandomErasing(erasing) if erasing > 0 else None

    def tf(im):
        h, w = im.shape[:2]
        for _ in range(10):
            area = random.uniform(*scale) * h * w
            ar = math.exp(random.uniform(math.log(3 / 4), math.log(4 / 3)))
            ch, cw = int(round(math.sqrt(area / ar))), int(round(math.sqrt(area * ar)))
            if ch <= h and cw <= w:
                y0, x0 = random.randint(0, h - ch), random.randint(0, w - cw)
                im2 = im[y0:y0 + ch, x0:x0 + cw]
                break
        else:
            im2 = im
        im2 = cv2.resize(im2, (size, size), interpolation=cv2.INTER_LINEAR)
        if random.random() < hflip:
            im2 = np.fliplr(im2).copy()
        if ra is not None:
            im2 = ra(im2)
        if re_ is not None:
            im2 = re_(im2)
        return im2

    return tf


class RandomLoadText:
    """Per-sample text (vocabulary) sampling for open-vocabulary training
    (reference augment.py:2231 LoadVisualPrompt sibling, :2326 RandomLoadText):
    keep the image's positive class names, fill with random negatives up to a
    FIXED budget (static shapes for jit), remap `cls` into the sampled list.

    Operates on a label dict carrying "cls" (N, 1) and "texts" (full
    per-dataset class-name list, one entry per class id).
    """

    def __init__(self, max_samples: int = 80, padding_value: str = " "):
        self.max_samples = max_samples
        self.padding_value = padding_value

    def __call__(self, labels: dict) -> dict:
        import numpy as np

        texts = labels.get("texts") or []
        cls = np.asarray(labels.get("cls", np.zeros((0, 1))), np.float32).reshape(-1)
        pos = sorted({int(c) for c in cls})[: self.max_samples]  # budget-capped
        neg_pool = [i for i in range(len(texts)) if i not in pos]
        n_neg = max(self.max_samples - len(pos), 0)
        rng = np.random.default_rng(labels.get("seed"))
        neg = list(rng.permutation(neg_pool)[:n_neg]) if neg_pool else []
        chosen = pos + [int(i) for i in neg]
        remap = {old: new for new, old in enumerate(chosen)}
        # labels whose class fell past the budget are DROPPED with their rows
        keep = np.asarray([int(c) in remap for c in cls], bool)
        cls = cls[keep]
        for key in ("bboxes", "bboxes_n"):
            if key in labels and len(np.asarray(labels[key])) == len(keep):
                labels = {**labels, key: np.asarray(labels[key])[keep]}
        new_cls = np.asarray([remap[int(c)] for c in cls], np.float32).reshape(-1, 1)
        out_texts = [texts[i] if i < len(texts) else self.padding_value for i in chosen]
        # pad to the fixed budget (static shape across the batch)
        while len(out_texts) < self.max_samples:
            out_texts.append(self.padding_value)
        labels = dict(labels)
        labels["cls"] = new_cls
        labels["texts"] = out_texts[: self.max_samples]
        return labels


class Albumentations:
    """Optional Albumentations wrapper (reference augment.py:1823): applies an
    A.Compose pipeline with bbox-aware transforms when the package is
    installed; a clean no-op otherwise (the reference logs and disables the
    same way)."""

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as A

            self.transform = A.Compose(
                [
                    A.Blur(p=0.01),
                    A.MedianBlur(p=0.01),
                    A.ToGray(p=0.01),
                    A.CLAHE(p=0.01),
                    A.RandomBrightnessContrast(p=0.0),
                    A.RandomGamma(p=0.0),
                    A.ImageCompression(quality_lower=75, p=0.0),
                ],
                bbox_params=A.BboxParams(format="yolo", label_fields=["class_labels"]),
            )
        except ImportError:
            pass
        except Exception as e:  # pragma: no cover
            from ultralytics_pro_tpu.utils import LOGGER

            LOGGER.info(f"Albumentations disabled: {e}")

    def __call__(self, labels: dict) -> dict:
        import numpy as np

        if self.transform is None or np.random.random() > self.p:
            return labels
        bboxes = np.asarray(labels.get("bboxes_n", np.zeros((0, 4))))
        cls = np.asarray(labels.get("cls", np.zeros((0,)))).reshape(-1)
        new = self.transform(image=labels["img"], bboxes=bboxes.tolist(),
                             class_labels=cls.tolist())
        labels = dict(labels)
        labels["img"] = new["image"]
        labels["bboxes_n"] = np.asarray(new["bboxes"], np.float32).reshape(-1, 4)
        labels["cls"] = np.asarray(new["class_labels"], np.float32)
        return labels
