"""Prediction result containers — numpy-backed, device-agnostic.

Behavioral parity with the reference results (ultralytics/engine/results.py:
Results:183, Boxes:828, Masks:1036, Keypoints:1129, Probs:1243, OBB:1243):
same accessors (.xyxy/.xywh/.xyxyn/.conf/.cls), plot/save/save_txt/to_json.
Device arrays are converted once at construction — everything downstream is
host-side python.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER, SimpleClass


class BaseTensor(SimpleClass):
    """Numpy-array wrapper with the reference's .cpu()/.numpy() surface
    (reference results.py:23)."""

    def __init__(self, data, orig_shape):
        self.data = np.asarray(data)
        self.orig_shape = orig_shape

    def cpu(self):
        return self

    def numpy(self):
        return self.data

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return self.__class__(self.data[idx], self.orig_shape)


class Boxes(BaseTensor):
    """Detection boxes: data (n, 6) = xyxy, conf, cls (+track id at col 6 when
    present). Reference results.py:828."""

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, -3] if self.data.shape[1] == 7 else None

    @property
    def is_track(self):
        return self.data.shape[1] == 7

    @property
    def xywh(self):
        x = self.xyxy
        return np.stack([(x[:, 0] + x[:, 2]) / 2, (x[:, 1] + x[:, 3]) / 2,
                         x[:, 2] - x[:, 0], x[:, 3] - x[:, 1]], 1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h])

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h])


class Masks(BaseTensor):
    """Instance masks (n, H, W) binary (reference results.py:1036)."""

    @property
    def xy(self):
        """Polygon contours per mask in pixel coords."""
        import cv2

        out = []
        for m in self.data.astype(np.uint8):
            contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
            out.append(max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
                       if contours else np.zeros((0, 2), np.float32))
        return out

    @property
    def xyn(self):
        h, w = self.orig_shape
        return [p / np.array([w, h], np.float32) for p in self.xy]


class Keypoints(BaseTensor):
    """Keypoints (n, K, 2|3) (reference results.py:1129)."""

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.xy / np.array([w, h])

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class Probs(BaseTensor):
    """Classification probabilities (reference results.py:1243)."""

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return self.data.argsort()[::-1][:5].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())

    @property
    def top5conf(self):
        return self.data[self.top5]


class OBB(BaseTensor):
    """Oriented boxes: data (n, 7) = cx, cy, w, h, rad, conf, cls."""

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def xyxyxyxy(self):
        from ultralytics_pro_tpu.ops.boxes import xywhr2xyxyxyxy

        return np.asarray(xywhr2xyxyxyxy(self.xywhr))

    @property
    def xyxy(self):
        pts = self.xyxyxyxy
        return np.concatenate([pts.min(1), pts.max(1)], axis=-1)


class Results(SimpleClass):
    """One image's predictions + render/save helpers (reference results.py:183)."""

    def __init__(self, orig_img, path, names, boxes=None, masks=None, probs=None,
                 keypoints=None, obb=None, speed=None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.probs = Probs(probs, self.orig_shape) if probs is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) if keypoints is not None else None
        self.obb = OBB(obb, self.orig_shape) if obb is not None else None
        self.speed = speed or {"preprocess": None, "inference": None, "postprocess": None}
        self.save_dir = None

    def __len__(self):
        for k in ("boxes", "masks", "probs", "keypoints", "obb"):
            v = getattr(self, k)
            if v is not None:
                return len(v)
        return 0

    def new(self):
        return Results(self.orig_img, self.path, self.names)

    def plot(self, line_width=None, font_scale=0.5, conf=True, labels=True, boxes=True, masks=True):
        """Draw detections on a copy of the original image (reference
        Annotator path, plotting.py:169)."""
        import cv2

        im = self.orig_img.copy()
        lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)
        palette = _color_palette()
        if self.masks is not None and masks:
            overlay = im.copy()
            for i, m in enumerate(self.masks.data):
                color = palette[int(self.boxes.cls[i]) % len(palette)] if self.boxes is not None else palette[i % len(palette)]
                overlay[m.astype(bool)] = color
            im = cv2.addWeighted(im, 0.6, overlay, 0.4, 0)
        if self.boxes is not None and boxes:
            for row in self.boxes.data:
                x1, y1, x2, y2, cf, c = row[:6]
                color = palette[int(c) % len(palette)]
                cv2.rectangle(im, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
                if labels:
                    name = self.names.get(int(c), str(int(c)))
                    text = f"{name} {cf:.2f}" if conf else name
                    cv2.putText(im, text, (int(x1), max(int(y1) - 3, 10)),
                                cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, max(lw - 1, 1))
        if self.keypoints is not None:
            for inst in self.keypoints.xy:
                for x, y in inst:
                    if x > 0 and y > 0:
                        cv2.circle(im, (int(x), int(y)), lw, (0, 255, 0), -1)
        if self.probs is not None:
            name = self.names.get(self.probs.top1, str(self.probs.top1))
            cv2.putText(im, f"{name} {self.probs.top1conf:.2f}", (10, 30),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        return im

    def save(self, filename=None):
        import cv2

        filename = filename or f"results_{Path(self.path).name if self.path else 'image.jpg'}"
        cv2.imwrite(str(filename), self.plot())
        return filename

    def save_txt(self, txt_file, save_conf=False):
        """YOLO-format txt export (reference results.py:save_txt)."""
        lines = []
        if self.probs is not None:
            lines += [f"{self.probs.data[i]:.2f} {self.names.get(i, i)}" for i in self.probs.top5]
        elif self.boxes is not None:
            for row, xywhn in zip(self.boxes.data, self.boxes.xywhn):
                c, cf = int(row[-1]), row[-2]
                parts = [str(c), *(f"{x:.6f}" for x in xywhn)]
                if save_conf:
                    parts.append(f"{cf:.6f}")
                lines.append(" ".join(parts))
        p = Path(txt_file)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "a", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n" if lines else "")
        return p

    def summary(self, normalize=False, decimals=5) -> List[Dict]:
        """List-of-dicts summary (reference results.py:summary)."""
        out = []
        if self.probs is not None:
            return [{"name": self.names.get(self.probs.top1, ""), "class": self.probs.top1,
                     "confidence": round(self.probs.top1conf, decimals)}]
        if self.boxes is not None:
            h, w = self.orig_shape
            for i, row in enumerate(self.boxes.data):
                x1, y1, x2, y2, cf, c = row[:6]
                if normalize:
                    x1, x2, y1, y2 = x1 / w, x2 / w, y1 / h, y2 / h
                d = {
                    "name": self.names.get(int(c), str(int(c))),
                    "class": int(c),
                    "confidence": round(float(cf), decimals),
                    "box": {"x1": round(float(x1), decimals), "y1": round(float(y1), decimals),
                            "x2": round(float(x2), decimals), "y2": round(float(y2), decimals)},
                }
                out.append(d)
        return out

    def to_json(self, normalize=False, decimals=5):
        import json

        return json.dumps(self.summary(normalize=normalize, decimals=decimals), indent=2)

    def to_df(self):
        try:
            import pandas as pd

            return pd.DataFrame(self.summary())
        except ImportError:
            return self.summary()


def _color_palette():
    """Deterministic bright BGR palette."""
    rng = np.random.default_rng(5)
    return [tuple(int(c) for c in rng.integers(64, 255, 3)) for _ in range(80)]


def _results_to_df(self, normalize: bool = False):
    """Detections as a pandas DataFrame (reference results.py to_df)."""
    import pandas as pd

    return pd.DataFrame(self.summary(normalize=normalize))


def _results_to_csv(self, normalize: bool = False, **kwargs) -> str:
    """Detections as CSV text (reference results.py to_csv)."""
    return _results_to_df(self, normalize).to_csv(index=False, **kwargs)


Results.to_df = _results_to_df
Results.to_csv = _results_to_csv
