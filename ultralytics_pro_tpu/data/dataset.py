"""Datasets: YOLO-format detection datasets + classification folders.

Behavioral parity with the reference data layer (ultralytics/data/base.py:23
BaseDataset, dataset.py:49 YOLODataset): image scan, YOLO txt label parse,
long-side resize on load, mosaic buffer, close_mosaic, label caching. The
output of __getitem__ is the host-side label dict consumed by the collate in
build.py, which produces fixed-shape padded device batches (the TPU-native
replacement for the reference's ragged per-image tensors).
"""

from __future__ import annotations

import glob
import os
import random
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from ultralytics_pro_tpu.data.augment import Compose, LetterBox, v8_transforms
from ultralytics_pro_tpu.utils import LOGGER

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def img2label_paths(img_paths: List[str]) -> List[str]:
    """images/xxx.jpg -> labels/xxx.txt (reference data/utils.py)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


class YOLODataset:
    """Detection dataset over YOLO-format labels (reference dataset.py:49)."""

    def __init__(self, img_path, imgsz: int = 640, augment: bool = False,
                 hyp: Optional[Dict] = None, rect: bool = False, batch_size: int = 16,
                 stride: int = 32, pad: float = 0.5, single_cls: bool = False,
                 classes=None, fraction: float = 1.0, data: Optional[Dict] = None,
                 task: str = "detect", cache=None):
        self.img_path = img_path
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = dict(hyp or {})
        self.single_cls = single_cls
        self.task = task
        self.data = data or {}
        self.im_files = self.get_img_files(img_path, fraction)
        self.labels = self.get_labels()
        if classes is not None:
            self.update_labels(classes)
        self.ni = len(self.labels)
        # image cache (reference base.py:261 cache_images / :318 check_cache_ram):
        # "ram" keeps resized images resident; "disk" persists resized .npy files
        self.cache = str(cache).lower() if cache not in (None, False) else None
        self.ims = [None] * self.ni
        if self.cache == "ram" and not self._check_cache_ram():
            self.cache = None
        if self.cache:
            self._cache_images()
        # rect batching (reference base.py set_rectangle): sort by aspect
        # ratio, one stride-multiple shape per batch. On TPU each distinct
        # shape is its own jit specialization — a small bucket set, compiled
        # once each, in exchange for far less padding compute.
        self.rect = bool(rect)
        self.batch_size = batch_size
        self.stride = stride
        self.pad = pad
        if self.rect:
            self.set_rectangle()
        self.transforms = self.build_transforms()

    def set_rectangle(self):
        from PIL import Image

        shapes = []
        for f in self.im_files:
            try:
                with Image.open(f) as im:
                    w, h = im.size
            except Exception:
                h = w = self.imgsz
            shapes.append((h, w))
        ar = np.array([h / w for h, w in shapes], np.float64)
        order = np.argsort(ar).tolist()
        self.im_files = [self.im_files[i] for i in order]
        self.labels = [self.labels[i] for i in order]
        self.ims = [self.ims[i] for i in order]
        ar = ar[order]
        nb = int(np.ceil(self.ni / self.batch_size))
        self.batch_index = (np.arange(self.ni) // self.batch_size).astype(int)
        out = np.ones((nb, 2), np.float64)
        for b in range(nb):
            ari = ar[self.batch_index == b]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                out[b] = [maxi, 1]
            elif mini > 1:
                out[b] = [1, 1 / mini]
        self.batch_shapes = (
            np.ceil(out * self.imgsz / self.stride + self.pad).astype(int) * self.stride
        )

    # -- caching ----------------------------------------------------------------
    def _npy_path(self, i: int) -> Path:
        return Path(self.im_files[i]).with_suffix(".npz")

    def _check_cache_ram(self, safety_margin: float = 0.5) -> bool:
        """Sample a few images, extrapolate, require headroom (base.py:318)."""
        import psutil

        n = min(self.ni, 30)
        b = 0
        for i in random.sample(range(self.ni), n):
            im = cv2.imread(self.im_files[i])
            if im is None:
                continue
            r = self.imgsz / max(im.shape[:2])
            b += im.nbytes * min(r, 1) ** 2
        need = b * self.ni / max(n, 1) * (1 + safety_margin)
        ok = need < psutil.virtual_memory().available
        if not ok:
            LOGGER.warning(
                f"cache=ram needs ~{need / 1e9:.1f}GB but only "
                f"{psutil.virtual_memory().available / 1e9:.1f}GB free; caching disabled")
        return ok

    def _cache_images(self):
        for i in range(self.ni):
            if self.cache == "disk":
                p = self._npy_path(i)
                if not p.exists():
                    im, (h0, w0), _ = self._read_resized(i)
                    np.savez(str(p), im=im, shape=np.array((h0, w0)))
            else:
                self.ims[i] = self._read_resized(i)

    # -- files / labels -------------------------------------------------------
    def get_img_files(self, img_path, fraction: float = 1.0) -> List[str]:
        files = []
        for p in img_path if isinstance(img_path, list) else [img_path]:
            p = Path(p)
            if p.is_dir():
                files += glob.glob(str(p / "**" / "*.*"), recursive=True)
            elif p.is_file():  # txt file listing images
                with open(p) as f:
                    parent = str(p.parent) + os.sep
                    files += [x.replace("./", parent) if x.startswith("./") else x
                              for x in f.read().strip().splitlines()]
            else:
                raise FileNotFoundError(f"{p} does not exist")
        files = sorted(x for x in files if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS)
        if not files:
            raise FileNotFoundError(f"No images found in {img_path}")
        if fraction < 1.0:
            files = files[: max(1, round(len(files) * fraction))]
        return files

    CACHE_VERSION = "1.0"

    @staticmethod
    def _label_hash(paths: List[str]) -> str:
        """Size+mtime hash over the label files (reference get_hash,
        data/utils.py: cache invalidates when any label changes)."""
        import hashlib

        h = hashlib.sha256()
        for p in paths:
            try:
                st = os.stat(p)
                h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
            except OSError:
                h.update(f"{p}:missing".encode())
        return h.hexdigest()

    def get_labels(self) -> List[Dict]:
        """Parsed labels with a persistent `.cache` next to the labels dir
        (reference cache_labels dataset.py:90: pickle + hash invalidation)."""
        import pickle

        label_files = img2label_paths(self.im_files)
        cache_path = None
        if label_files:
            cache_path = Path(label_files[0]).parent.with_suffix(".cache")
        h = self._label_hash(label_files) if label_files else ""
        if cache_path is not None and cache_path.exists():
            try:
                with open(cache_path, "rb") as f:
                    cache = pickle.load(f)
                if (cache.get("version") == self.CACHE_VERSION
                        and cache.get("hash") == h
                        and cache.get("task") == self.task):
                    return self._apply_single_cls(cache["labels"])
            except Exception:
                pass  # unreadable/stale cache -> re-parse
        labels = self._parse_labels(label_files)
        if cache_path is not None:
            try:
                with open(cache_path, "wb") as f:
                    pickle.dump({"version": self.CACHE_VERSION, "hash": h,
                                 "task": self.task, "labels": labels}, f)
            except OSError:
                pass  # read-only dataset dir: cache is best-effort
        return self._apply_single_cls(labels)

    def _parse_labels(self, label_files: List[str]) -> List[Dict]:
        """Parse YOLO-format txt labels by task (reference data/utils.py
        verify_image_label):
        detect: cls cx cy w h | segment: cls x1 y1 ... (polygon) |
        pose: cls cx cy w h kpts... | obb: cls x1 y1 x2 y2 x3 y3 x4 y4."""
        kpt_shape = tuple(self.data.get("kpt_shape", (17, 3)))
        labels = []
        for im_file, lb_file in zip(self.im_files, label_files):
            rows = []
            if os.path.isfile(lb_file):
                with open(lb_file) as f:
                    rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
            entry = {"im_file": im_file}
            if self.task == "segment":
                cls, boxes, segments = [], [], []
                for r in rows:
                    pts = np.array(r[1:], np.float32).reshape(-1, 2)
                    cls.append(float(r[0]))
                    boxes.append(self._poly2xywh(pts))
                    segments.append(pts)
                entry["cls"] = np.array(cls, np.float32)
                entry["bboxes_n"] = np.array(boxes, np.float32).reshape(-1, 4)
                entry["segments_n"] = segments
            elif self.task == "pose":
                k, nd = kpt_shape
                cls, boxes, kpts = [], [], []
                for r in rows:
                    v = np.array(r, np.float32)
                    cls.append(v[0])
                    boxes.append(v[1:5])
                    kp = v[5:5 + k * nd].reshape(k, nd)
                    if nd == 2:
                        kp = np.concatenate([kp, 2 * np.ones((k, 1), np.float32)], 1)
                    kpts.append(kp)
                entry["cls"] = np.array(cls, np.float32)
                entry["bboxes_n"] = np.array(boxes, np.float32).reshape(-1, 4)
                entry["keypoints_n"] = (np.stack(kpts) if kpts
                                        else np.zeros((0, k, 3), np.float32))
            elif self.task == "obb":
                cls, corners = [], []
                for r in rows:
                    pts = np.array(r[1:9], np.float32).reshape(4, 2)
                    cls.append(float(r[0]))
                    corners.append(pts)
                entry["cls"] = np.array(cls, np.float32)
                entry["corners_n"] = (np.stack(corners) if corners
                                      else np.zeros((0, 4, 2), np.float32))
                entry["bboxes_n"] = np.zeros((len(cls), 4), np.float32)  # unused for obb
            else:
                lb = np.array(rows, np.float32) if rows else np.zeros((0, 5), np.float32)
                entry["cls"] = lb[:, 0]
                entry["bboxes_n"] = lb[:, 1:5]
            labels.append(entry)
        return labels

    def _apply_single_cls(self, labels: List[Dict]) -> List[Dict]:
        if self.single_cls:
            for entry in labels:
                if len(entry["cls"]):
                    entry["cls"][:] = 0
        return labels

    @staticmethod
    def _poly2xywh(pts):
        x1, y1 = pts[:, 0].min(), pts[:, 1].min()
        x2, y2 = pts[:, 0].max(), pts[:, 1].max()
        return np.array([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], np.float32)

    @staticmethod
    def _poly2xywhr(pts):
        """4 normalized corners -> (cx, cy, w, h, rad) via minAreaRect
        (reference data converter xyxyxyxy2xywhr semantics)."""
        (cx, cy), (w, h), angle = cv2.minAreaRect(pts.astype(np.float32))
        rad = np.deg2rad(angle)
        if w < h:  # canonicalize: long side = w, angle in [-pi/4, 3pi/4)
            w, h = h, w
            rad += np.pi / 2
        return np.array([cx, cy, w, h, rad], np.float32)

    def update_labels(self, include_classes):
        """Keep only the requested classes (reference base.py:185)."""
        inc = np.array(include_classes).reshape(1, -1)
        for lb in self.labels:
            j = (lb["cls"].reshape(-1, 1) == inc).any(1)
            lb["cls"] = lb["cls"][j]
            lb["bboxes_n"] = lb["bboxes_n"][j]

    # -- loading --------------------------------------------------------------
    def _read_resized(self, i: int):
        """Read + long-side resize to imgsz (reference base.py:208). The
        dataset yaml's `channels:` key converts at load: 1 = grayscale
        replicated to 3 (reference coco8-grayscale), >3 = the first 3 bands
        of a multichannel stack (coco8-multispectral stand-in)."""
        ch = int(self.data.get("channels", 3) or 3)
        if ch > 3:
            # multispectral (reference coco8-multispectral.yaml): a sibling
            # .npy band stack (H, W, channels) replaces the jpg
            from pathlib import Path as _P

            npy = _P(self.im_files[i]).with_suffix(".npy")
            if npy.exists():
                im = np.load(str(npy))
            else:
                # derive extra bands deterministically from the RGB so any
                # 3-channel dataset can exercise the multispectral path
                rgb = cv2.imread(self.im_files[i])
                if rgb is None:
                    raise FileNotFoundError(f"Image not found {self.im_files[i]}")
                reps = (ch + 2) // 3
                im = np.tile(rgb, (1, 1, reps))[:, :, :ch]
        else:
            im = cv2.imread(self.im_files[i])
            if im is None:
                raise FileNotFoundError(f"Image not found {self.im_files[i]}")
        if ch == 1:
            g = cv2.cvtColor(im, cv2.COLOR_BGR2GRAY)
            im = cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)
        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (min(round(w0 * r), self.imgsz), min(round(h0 * r), self.imgsz)),
                            interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    def load_image(self, i: int):
        """Cached read: RAM list, disk .npz (image + original dims), or file."""
        if self.ims[i] is not None:  # ram
            return self.ims[i]
        if self.cache == "disk":
            p = self._npy_path(i)
            if p.exists():
                z = np.load(str(p))
                im = z["im"]
                return im, tuple(z["shape"]), im.shape[:2]
        return self._read_resized(i)

    def get_image_and_label(self, i: int) -> Dict:
        """Label dict with pixel-space annotations for the (resized) image."""
        im, ori_shape, resized = self.load_image(i)
        lb = self.labels[i]
        h, w = resized
        n = lb["bboxes_n"]
        out = {
            "img": im,
            "cls": lb["cls"].copy(),
            "im_file": lb["im_file"],
            "ori_shape": ori_shape,
            "resized_shape": resized,
            # full pre-resize gain for evaluation (reference base.py:388);
            # LetterBox composes its own ratio + pads on top
            "ratio_pad": (resized[0] / ori_shape[0], resized[1] / ori_shape[1]),
        }
        if self.task == "obb":
            # corners are stored normalized; convert to pixel space of the
            # RESIZED image before minAreaRect so angles are undistorted
            corners = lb["corners_n"]
            rb = np.zeros((len(corners), 5), np.float32)
            for j, pts in enumerate(corners):
                rb[j] = self._poly2xywhr(pts * np.array([w, h], np.float32))
            out["bboxes"] = rb
            return out
        if len(n):
            cx, cy, bw, bh = n[:, 0] * w, n[:, 1] * h, n[:, 2] * w, n[:, 3] * h
            boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
        else:
            boxes = np.zeros((0, 4), np.float32)
        out["bboxes"] = boxes.astype(np.float32)
        if "keypoints_n" in lb:
            k = lb["keypoints_n"].copy()
            if len(k):
                k[..., 0] *= w
                k[..., 1] *= h
            out["keypoints"] = k
        if "segments_n" in lb:
            out["segments"] = [s * np.array([w, h], np.float32) for s in lb["segments_n"]]
        return out

    # -- pipeline -------------------------------------------------------------
    def build_transforms(self) -> Compose:
        if self.augment:
            if self.task in ("obb", "pose", "segment"):
                # geometric zoo for these tasks lands with full instance-aware
                # warps; train-time letterbox + flips keeps labels consistent
                from ultralytics_pro_tpu.data.augment import RandomFlip, RandomHSV

                return Compose([
                    LetterBox((self.imgsz, self.imgsz), scaleup=True),
                    RandomHSV(self.hyp.get("hsv_h", 0.015), self.hyp.get("hsv_s", 0.7),
                              self.hyp.get("hsv_v", 0.4)),
                    RandomFlip(p=self.hyp.get("fliplr", 0.5), direction="horizontal",
                               flip_idx=self.data.get("flip_idx")),
                ])
            pipeline = v8_transforms(self, self.imgsz, self.hyp)
            return Compose(pipeline.transforms + [LetterBox((self.imgsz, self.imgsz), scaleup=True)])
        return Compose([LetterBox((self.imgsz, self.imgsz), scaleup=False)])

    def close_mosaic(self):
        """Disable mosaic/mixup/cutmix for the final epochs (reference
        dataset.py close_mosaic)."""
        for t in self.transforms.transforms:
            if hasattr(t, "p") and t.__class__.__name__ in {"Mosaic", "MixUp", "CutMix", "CopyPaste"}:
                t.p = 0.0

    def __len__(self):
        return self.ni

    def __getitem__(self, i: int) -> Dict:
        labels = self.get_image_and_label(i)
        if self.rect:
            labels["rect_shape"] = tuple(self.batch_shapes[self.batch_index[i]])
        labels = self.transforms(labels)
        return labels


class ClassificationDataset:
    """Folder-per-class classification dataset (reference dataset.py:690)."""

    def __init__(self, root, imgsz: int = 224, augment: bool = False,
                 auto_augment: str = "randaugment", erasing: float = 0.4,
                 hflip: float = 0.5, scale=(0.08, 1.0)):
        from ultralytics_pro_tpu.data.augment import classify_augmentations, classify_transforms

        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.tf = (
            classify_augmentations(imgsz, scale=scale, hflip=hflip,
                                   auto_augment=auto_augment, erasing=erasing)
            if augment else classify_transforms(imgsz)
        )
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples = [
            (str(f), self.class_to_idx[c])
            for c in classes
            for f in sorted((self.root / c).rglob("*.*"))
            if f.suffix[1:].lower() in IMG_FORMATS
        ]
        if not self.samples:
            raise FileNotFoundError(f"No images found under {root}")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        path, cls = self.samples[i]
        im = cv2.imread(path)
        im = self.tf(im)
        return {"img": np.ascontiguousarray(im), "cls": cls}
