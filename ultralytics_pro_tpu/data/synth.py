"""Synthetic tiny-dataset generator (coco8-style stand-ins).

The reference bundles 8-image datasets with download hooks
(cfg/datasets/coco8.yaml etc., SURVEY.md §4); this environment has zero
egress, so the bundled dataset YAMLs carry a `synth:` key and the data is
GENERATED deterministically at first use — geometric shapes with exactly
known boxes/polygons/keypoints. CLI defaults (`yolo detect train`) work
out of the box.
"""


from pathlib import Path

import cv2
import numpy as np
import yaml


def make_synth_dataset(root, n_images=8, imgsz=160, nc=3, seed=0, max_objects=4,
                       task="detect", size_jitter=False, channels=3):
    """images/{train,val} + labels/{train,val} + data.yaml under `root`.

    task controls the label format written: detect (cls xywh), segment
    (cls polygon), pose (cls xywh + 5 corner/center keypoints), obb
    (cls 4 rotated corners). size_jitter varies per-image shapes (deterministic)
    so letterbox/scale_boxes original-frame paths are exercised.
    """
    root = Path(root)
    rng = np.random.default_rng(seed)
    colors = [(255, 64, 64), (64, 255, 64), (64, 64, 255), (255, 255, 64), (64, 255, 255)]
    shapes = [(imgsz, imgsz), (imgsz, imgsz * 3 // 4), (imgsz * 3 // 4, imgsz),
              (imgsz * 5 // 4, imgsz)]
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True, exist_ok=True)
        (root / "labels" / split).mkdir(parents=True, exist_ok=True)
        for i in range(n_images):
            ih, iw = shapes[i % len(shapes)] if size_jitter else (imgsz, imgsz)
            im = np.full((ih, iw, 3), 30, np.uint8)
            lines = []
            for _ in range(int(rng.integers(1, max_objects + 1))):
                c = int(rng.integers(0, nc))
                w = int(rng.integers(imgsz // 8, imgsz // 3))
                h = int(rng.integers(imgsz // 8, imgsz // 3))
                x = int(rng.integers(0, iw - w))
                y = int(rng.integers(0, ih - h))
                color = colors[c % len(colors)]
                if task == "obb":
                    ang = float(rng.uniform(-60, 60))
                    rect = ((x + w / 2, y + h / 2), (w, h), ang)
                    pts = cv2.boxPoints(rect)
                    pts = np.clip(pts, 2, min(ih, iw) - 2)
                    cv2.fillPoly(im, [pts.astype(np.int32)], color)
                    flat = (pts / np.array([iw, ih], np.float32)).reshape(-1)
                    lines.append(f"{c} " + " ".join(f"{v:.6f}" for v in flat))
                    continue
                if c % 3 == 0 or task == "segment":
                    cv2.rectangle(im, (x, y), (x + w, y + h), color, -1)
                    poly = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]], np.float32)
                elif c % 3 == 1:
                    cv2.ellipse(im, (x + w // 2, y + h // 2), (w // 2, h // 2), 0, 0, 360, color, -1)
                    poly = None
                else:
                    pts = np.array([[x + w // 2, y], [x, y + h], [x + w, y + h]])
                    cv2.fillPoly(im, [pts], color)
                    poly = pts.astype(np.float32)
                cx, cy = (x + w / 2) / iw, (y + h / 2) / ih
                if task == "segment":
                    flat = (poly / np.array([iw, ih], np.float32)).reshape(-1)
                    lines.append(f"{c} " + " ".join(f"{v:.6f}" for v in flat))
                elif task == "pose":
                    kpts = np.array([
                        [x, y, 2], [x + w, y, 2], [x + w, y + h, 2], [x, y + h, 2],
                        [x + w / 2, y + h / 2, 2],
                    ], np.float32)
                    kpts[:, 0] /= iw
                    kpts[:, 1] /= ih
                    ks = " ".join(f"{a:.6f} {b:.6f} {int(v)}" for a, b, v in kpts)
                    lines.append(f"{c} {cx:.6f} {cy:.6f} {w / iw:.6f} {h / ih:.6f} {ks}")
                else:
                    lines.append(f"{c} {cx:.6f} {cy:.6f} {w / iw:.6f} {h / ih:.6f}")
            cv2.imwrite(str(root / "images" / split / f"{split}{i}.jpg"), im)
            if channels > 3:
                # deterministic band stack: RGB + derived bands (gradients,
                # channel mixes) exercising the multispectral loader path
                bands = [im[:, :, k % 3] for k in range(3)]
                for k in range(3, channels):
                    gy = np.linspace(0, 255, im.shape[0], dtype=np.float32)[:, None]
                    band = (im[:, :, k % 3].astype(np.float32) * (0.5 + 0.1 * k)
                            + gy * (k % 2)) % 256
                    bands.append(band.astype(np.uint8))
                np.save(str(root / "images" / split / f"{split}{i}.npy"),
                        np.stack(bands, -1))
            (root / "labels" / split / f"{split}{i}.txt").write_text("\n".join(lines) + "\n")

    data = {
        "path": str(root),
        "train": "images/train",
        "val": "images/val",
        "names": {i: f"shape{i}" for i in range(nc)},
    }
    if task == "pose":
        data["kpt_shape"] = [5, 3]
    if channels != 3:
        data["channels"] = channels
    with open(root / "data.yaml", "w") as f:
        yaml.safe_dump(data, f)
    return root / "data.yaml"


if __name__ == "__main__":
    import sys

    print(make_synth_dataset(sys.argv[1] if len(sys.argv) > 1 else "/tmp/synth8"))
