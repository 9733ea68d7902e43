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
                 task: str = "detect"):
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
        self.transforms = self.build_transforms()

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

    def get_labels(self) -> List[Dict]:
        label_files = img2label_paths(self.im_files)
        labels = []
        for im_file, lb_file in zip(self.im_files, label_files):
            if os.path.isfile(lb_file):
                with open(lb_file) as f:
                    lb = np.array(
                        [x.split() for x in f.read().strip().splitlines() if len(x)],
                        dtype=np.float32,
                    )
                if lb.size == 0:
                    lb = np.zeros((0, 5), dtype=np.float32)
            else:
                lb = np.zeros((0, 5), dtype=np.float32)
            if self.single_cls:
                lb[:, 0] = 0
            labels.append({
                "im_file": im_file,
                "cls": lb[:, 0],
                "bboxes_n": lb[:, 1:5],  # normalized xywh as stored on disk
            })
        return labels

    def update_labels(self, include_classes):
        """Keep only the requested classes (reference base.py:185)."""
        inc = np.array(include_classes).reshape(1, -1)
        for lb in self.labels:
            j = (lb["cls"].reshape(-1, 1) == inc).any(1)
            lb["cls"] = lb["cls"][j]
            lb["bboxes_n"] = lb["bboxes_n"][j]

    # -- loading --------------------------------------------------------------
    def load_image(self, i: int):
        """Read + long-side resize to imgsz (reference base.py:208)."""
        im = cv2.imread(self.im_files[i])
        if im is None:
            raise FileNotFoundError(f"Image not found {self.im_files[i]}")
        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (min(round(w0 * r), self.imgsz), min(round(h0 * r), self.imgsz)),
                            interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    def get_image_and_label(self, i: int) -> Dict:
        """Label dict with pixel-xyxy boxes for the (resized) image."""
        im, ori_shape, resized = self.load_image(i)
        lb = self.labels[i]
        h, w = resized
        n = lb["bboxes_n"]
        if len(n):
            cx, cy, bw, bh = n[:, 0] * w, n[:, 1] * h, n[:, 2] * w, n[:, 3] * h
            boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
        else:
            boxes = np.zeros((0, 4), np.float32)
        return {
            "img": im,
            "cls": lb["cls"].copy(),
            "bboxes": boxes.astype(np.float32),
            "im_file": lb["im_file"],
            "ori_shape": ori_shape,
            "resized_shape": resized,
        }

    # -- pipeline -------------------------------------------------------------
    def build_transforms(self) -> Compose:
        if self.augment:
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
        labels = self.transforms(labels)
        return labels


class ClassificationDataset:
    """Folder-per-class classification dataset (reference dataset.py:690)."""

    def __init__(self, root, imgsz: int = 224, augment: bool = False):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
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
        if self.augment:
            # RandomResizedCrop-style: random scale crop then resize
            h, w = im.shape[:2]
            scale = random.uniform(0.5, 1.0)
            ch, cw = int(h * scale), int(w * scale)
            y0 = random.randint(0, h - ch)
            x0 = random.randint(0, w - cw)
            im = im[y0:y0 + ch, x0:x0 + cw]
            if random.random() < 0.5:
                im = np.fliplr(im)
        im = cv2.resize(im, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        return {"img": np.ascontiguousarray(im), "cls": cls}
