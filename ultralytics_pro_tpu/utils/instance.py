"""Bboxes/Instances containers (reference ultralytics/utils/instance.py:35,181):
format-aware box arrays with joint box/segment/keypoint geometry updates. The
internal data pipeline passes plain dicts; these classes provide the public
API surface for users porting code from the reference."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


class Bboxes:
    """Format-aware box container (reference instance.py:35)."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        bboxes = bboxes[None, :] if bboxes.ndim == 1 else bboxes
        assert bboxes.ndim == 2 and bboxes.shape[1] == 4
        self.bboxes = bboxes.astype(np.float32)
        self.format = format

    def convert(self, format: str):
        if format == self.format:
            return
        from ultralytics_pro_tpu.ops import boxes as B

        fn = {
            ("xyxy", "xywh"): B.xyxy2xywh, ("xywh", "xyxy"): B.xywh2xyxy,
            ("xyxy", "ltwh"): B.xyxy2ltwh, ("ltwh", "xyxy"): B.ltwh2xyxy,
            ("xywh", "ltwh"): B.xywh2ltwh, ("ltwh", "xywh"): B.ltwh2xywh,
        }[(self.format, format)]
        # np.array (copy) not np.asarray: jax outputs view as read-only numpy,
        # and flipud/fliplr/clip mutate this buffer in place.
        self.bboxes = np.array(fn(self.bboxes), dtype=np.float32)
        self.format = format

    def areas(self) -> np.ndarray:
        self.convert("xyxy")
        b = self.bboxes
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def mul(self, scale):
        s = scale if hasattr(scale, "__len__") else (scale,) * 4
        self.bboxes = self.bboxes * np.asarray(s, np.float32)

    def add(self, offset):
        o = offset if hasattr(offset, "__len__") else (offset,) * 4
        self.bboxes = self.bboxes + np.asarray(o, np.float32)

    def __len__(self):
        return len(self.bboxes)

    def __getitem__(self, index):
        return Bboxes(self.bboxes[index].reshape(-1, 4), self.format)


class Instances:
    """Boxes + segments + keypoints moving together through geometry ops
    (reference instance.py:181)."""

    def __init__(self, bboxes, segments: Optional[List] = None, keypoints=None,
                 bbox_format: str = "xywh", normalized: bool = True):
        self._bboxes = Bboxes(np.asarray(bboxes, np.float32), bbox_format)
        self.segments = segments if segments is not None else []
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    @property
    def bbox_areas(self):
        return self._bboxes.areas()

    def convert_bbox(self, format):
        self._bboxes.convert(format)

    def scale(self, scale_w, scale_h, bbox_only: bool = False):
        self._bboxes.mul((scale_w, scale_h, scale_w, scale_h))
        if not bbox_only:
            self.segments = [s * np.array([scale_w, scale_h], np.float32) for s in self.segments]
            if self.keypoints is not None:
                self.keypoints[..., 0] *= scale_w
                self.keypoints[..., 1] *= scale_h

    def denormalize(self, w, h):
        if not self.normalized:
            return
        self.scale(w, h)
        self.normalized = False

    def normalize(self, w, h):
        if self.normalized:
            return
        self.scale(1 / w, 1 / h)
        self.normalized = True

    def add_padding(self, padw, padh):
        assert not self.normalized, "add_padding expects absolute coordinates"
        self._bboxes.add((padw, padh, padw, padh))
        self.segments = [s + np.array([padw, padh], np.float32) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh

    def flipud(self, h):
        self._bboxes.convert("xyxy")
        y1 = self.bboxes[:, 1].copy()
        self._bboxes.bboxes[:, 1] = h - self.bboxes[:, 3]
        self._bboxes.bboxes[:, 3] = h - y1
        self.segments = [np.stack([s[:, 0], h - s[:, 1]], 1) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 1] = h - self.keypoints[..., 1]

    def fliplr(self, w):
        self._bboxes.convert("xyxy")
        x1 = self.bboxes[:, 0].copy()
        self._bboxes.bboxes[:, 0] = w - self.bboxes[:, 2]
        self._bboxes.bboxes[:, 2] = w - x1
        self.segments = [np.stack([w - s[:, 0], s[:, 1]], 1) for s in self.segments]
        if self.keypoints is not None:
            self.keypoints[..., 0] = w - self.keypoints[..., 0]

    def clip(self, w, h):
        fmt = self._bboxes.format
        self._bboxes.convert("xyxy")
        self._bboxes.bboxes[:, [0, 2]] = self.bboxes[:, [0, 2]].clip(0, w)
        self._bboxes.bboxes[:, [1, 3]] = self.bboxes[:, [1, 3]].clip(0, h)
        if fmt != "xyxy":
            self._bboxes.convert(fmt)
        self.segments = [np.stack([s[:, 0].clip(0, w), s[:, 1].clip(0, h)], 1) for s in self.segments]

    def remove_zero_area_boxes(self):
        good = self.bbox_areas > 0
        if not good.all():
            self._bboxes.bboxes = self.bboxes[good]
            self.segments = [s for s, g in zip(self.segments, good) if g]
            if self.keypoints is not None:
                self.keypoints = self.keypoints[good]
        return good

    def __len__(self):
        return len(self._bboxes)

    def __getitem__(self, index):
        return Instances(
            self.bboxes[index], [self.segments[i] for i in np.atleast_1d(index)]
            if self.segments else [],
            self.keypoints[index] if self.keypoints is not None else None,
            self._bboxes.format, self.normalized,
        )
