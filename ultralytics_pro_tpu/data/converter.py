"""Dataset converters (reference ultralytics/data/converter.py:855
convert_coco, yolo_bbox2segment; split.py autosplit; split_dota.py tiling)."""

from __future__ import annotations

import json
import random
from collections import defaultdict
from pathlib import Path
from typing import Optional

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER


def coco91_to_coco80_class():
    """COCO 91-index to contiguous 80-index map (reference converter.py)."""
    x = [None] * 91
    idx80 = 0
    missing = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}
    for i in range(91):
        if i + 1 in missing:
            continue
        if idx80 < 80:
            x[i] = idx80
            idx80 += 1
    return x


def convert_coco(labels_dir, save_dir="coco_converted", use_segments: bool = False,
                 cls91to80: bool = True):
    """COCO instances json -> YOLO txt labels (reference convert_coco)."""
    save_dir = Path(save_dir)
    c91to80 = coco91_to_coco80_class()
    for json_file in sorted(Path(labels_dir).glob("instances_*.json")):
        split = json_file.stem.replace("instances_", "")
        out = save_dir / "labels" / split
        out.mkdir(parents=True, exist_ok=True)
        data = json.loads(json_file.read_text())
        images = {img["id"]: img for img in data["images"]}
        anns = defaultdict(list)
        for a in data["annotations"]:
            anns[a["image_id"]].append(a)
        for img_id, img in images.items():
            h, w = img["height"], img["width"]
            lines = []
            for a in anns.get(img_id, []):
                if a.get("iscrowd"):
                    continue
                cid = a["category_id"] - 1
                if cls91to80:
                    cid = c91to80[cid]
                    if cid is None:
                        continue
                x, y, bw, bh = a["bbox"]
                cx, cy = (x + bw / 2) / w, (y + bh / 2) / h
                if use_segments and a.get("segmentation"):
                    seg = np.array(a["segmentation"][0], np.float32).reshape(-1, 2)
                    seg[:, 0] /= w
                    seg[:, 1] /= h
                    lines.append(f"{cid} " + " ".join(f"{v:.6f}" for v in seg.reshape(-1)))
                else:
                    lines.append(f"{cid} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
            name = Path(img["file_name"]).stem
            (out / f"{name}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
        LOGGER.info(f"converted {split}: {len(images)} images -> {out}")
    return save_dir


def yolo_bbox2segment(im_dir, save_dir: Optional[str] = None):
    """Boxes -> 4-corner polygon segments (reference yolo_bbox2segment; the
    SAM-refinement path needs SAM, which lands with that model family)."""
    from ultralytics_pro_tpu.data.dataset import img2label_paths

    im_dir = Path(im_dir)
    files = sorted(str(f) for f in im_dir.rglob("*.jpg"))
    out_dir = Path(save_dir or (im_dir.parent / f"{im_dir.name}-seg"))
    for im_file, lb_file in zip(files, img2label_paths(files)):
        lb_path = Path(lb_file)
        if not lb_path.exists():
            continue
        lines = []
        for row in lb_path.read_text().strip().splitlines():
            v = row.split()
            c, cx, cy, w, h = v[0], *map(float, v[1:5])
            pts = [(cx - w / 2, cy - h / 2), (cx + w / 2, cy - h / 2),
                   (cx + w / 2, cy + h / 2), (cx - w / 2, cy + h / 2)]
            lines.append(f"{c} " + " ".join(f"{a:.6f} {b:.6f}" for a, b in pts))
        dst = out_dir / lb_path.relative_to(lb_path.parents[1])
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_text("\n".join(lines) + "\n")
    return out_dir


def autosplit(path, weights=(0.9, 0.1, 0.0), annotated_only: bool = False, seed: int = 0):
    """Write autosplit_{train,val,test}.txt lists (reference split.py)."""
    from ultralytics_pro_tpu.data.dataset import IMG_FORMATS, img2label_paths

    path = Path(path)
    files = sorted(f for f in path.rglob("*.*") if f.suffix[1:].lower() in IMG_FORMATS)
    if annotated_only:
        labels = img2label_paths([str(f) for f in files])
        files = [f for f, lb in zip(files, labels) if Path(lb).exists()]
    rng = random.Random(seed)
    idx = [0 if (r := rng.random()) < weights[0] else 1 if r < weights[0] + weights[1] else 2
           for _ in files]
    names = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for n in names:
        (path.parent / n).unlink(missing_ok=True)
    for f, i in zip(files, idx):
        with open(path.parent / names[i], "a") as fh:
            fh.write(f"./{f.relative_to(path.parent)}\n")
    return [path.parent / n for n in names]


def split_dota_window(image_shape, crop_size: int = 1024, gap: int = 200):
    """Sliding-window origins for DOTA tiling (reference split_dota.py)."""
    h, w = image_shape
    step = crop_size - gap
    xs = list(range(0, max(w - crop_size, 0) + 1, step)) or [0]
    ys = list(range(0, max(h - crop_size, 0) + 1, step)) or [0]
    if xs[-1] + crop_size < w:
        xs.append(w - crop_size)
    if ys[-1] + crop_size < h:
        ys.append(h - crop_size)
    return [(x, y) for y in ys for x in xs]
