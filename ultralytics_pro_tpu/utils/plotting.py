"""Plotting: annotation, train-batch mosaics, results curves.

Behavioral parity with the reference plotting layer (ultralytics/utils/
plotting.py: Annotator:169, plot_images:679, plot_results:859,
plot_labels:563). cv2-based drawing (no PIL dependency on the hot path);
matplotlib only for the curve plots and only if importable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from ultralytics_pro_tpu.utils import LOGGER


class Colors:
    """Ultralytics-style color palette (reference plotting.py:25)."""

    def __init__(self):
        hexs = (
            "042AFF", "0BDBEB", "F3F3F3", "00DFB7", "111F68", "FF6FDD", "FF444F",
            "CCED00", "00F344", "BD00FF", "00B4FF", "DD00BA", "00FFFF", "26C000",
            "01FFB3", "7D24FF", "7B0068", "FF1B6C", "FC6D2F", "A2FF0B",
        )
        self.palette = [self.hex2bgr(f"#{c}") for c in hexs]
        self.n = len(self.palette)

    @staticmethod
    def hex2bgr(h):
        rgb = tuple(int(h[1 + i:1 + i + 2], 16) for i in (0, 2, 4))
        return (rgb[2], rgb[1], rgb[0])

    def __call__(self, i, bgr: bool = True):
        c = self.palette[int(i) % self.n]
        return c if bgr else (c[2], c[1], c[0])


colors = Colors()


class Annotator:
    """Box/mask/keypoint/label drawing (reference plotting.py:169)."""

    def __init__(self, im, line_width: Optional[int] = None, font_size=None):
        self.im = im if im.flags.writeable else im.copy()
        self.lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)

    def box_label(self, box, label: str = "", color=(128, 128, 128), txt_color=(255, 255, 255)):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, self.lw, lineType=cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, self.lw / 3, tf)[0]
            outside = p1[1] - h >= 3
            p2 = p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3
            cv2.rectangle(self.im, p1, p2, color, -1, cv2.LINE_AA)
            cv2.putText(self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                        0, self.lw / 3, txt_color, tf, cv2.LINE_AA)

    def masks(self, masks, color_ids=None, alpha: float = 0.4):
        overlay = self.im.copy()
        for i, m in enumerate(masks):
            c = colors(color_ids[i] if color_ids is not None else i)
            overlay[m.astype(bool)] = c
        self.im = cv2.addWeighted(self.im, 1 - alpha, overlay, alpha, 0)
        return self.im

    def kpts(self, kpts, radius: int = 3, conf_thres: float = 0.25):
        for x, y, *c in kpts:
            if (not c or c[0] > conf_thres) and x > 0 and y > 0:
                cv2.circle(self.im, (int(x), int(y)), radius, (0, 255, 0), -1, cv2.LINE_AA)
        return self.im

    def text(self, xy, text: str, txt_color=(255, 255, 255)):
        cv2.putText(self.im, text, (int(xy[0]), int(xy[1])), 0, self.lw / 3, txt_color,
                    max(self.lw - 1, 1), cv2.LINE_AA)

    def result(self):
        return self.im


def plot_images(batch: Dict, fname="train_batch.jpg", max_images: int = 16,
                names: Optional[Dict] = None):
    """Mosaic of a training batch with gt boxes (reference plot_images:679)."""
    imgs = batch["img"][:max_images]
    n = len(imgs)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = imgs.shape[1:3]
    grid = np.full((rows * h, cols * w, 3), 114, np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        tile = im.copy()
        ann = Annotator(tile)
        if "bboxes" in batch:
            mask = batch["mask_gt"][i]
            for cls_id, bb in zip(batch["cls"][i][mask], batch["bboxes"][i][mask]):
                if bb.shape[-1] == 4:
                    cx, cy, bw, bh = bb * [w, h, w, h]
                    label = names.get(int(cls_id), str(int(cls_id))) if names else str(int(cls_id))
                    ann.box_label([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                                  label, colors(int(cls_id)))
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = ann.result()
    Path(fname).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(fname), grid)
    return fname


def plot_results(csv_file="results.csv", save_dir=None):
    """Loss/metric curves from results.csv (reference plot_results:859)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        LOGGER.info("matplotlib unavailable; skipping results plot")
        return None
    import csv as _csv

    csv_file = Path(csv_file)
    with open(csv_file) as f:
        rows = list(_csv.DictReader(f))
    if not rows:
        return None
    keys = [k for k in rows[0] if k != "epoch"]
    epochs = [float(r["epoch"]) for r in rows]
    ncols = min(len(keys), 4)
    nrows = int(np.ceil(len(keys) / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // ncols][i % ncols]
        vals = [float(r[k]) if r[k] not in ("", "None") else np.nan for r in rows]
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
    fig.tight_layout()
    out = Path(save_dir or csv_file.parent) / "results.png"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_confusion_matrix(matrix: np.ndarray, names: Dict, save_dir="."):
    """Confusion-matrix heatmap (reference ConfusionMatrix.plot)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(matrix / max(matrix.sum(), 1), cmap="Blues")
    labels = [names.get(i, str(i)) for i in range(len(matrix) - 1)] + ["background"]
    ax.set_xticks(range(len(labels)))
    ax.set_yticks(range(len(labels)))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ax.set_yticklabels(labels, fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    out = Path(save_dir) / "confusion_matrix.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out


def plot_pr_curve(px, py, ap, names=(), save_dir=".", fname="PR_curve.png"):
    """Per-class PR curves + mAP@0.5 mean (reference plotting.py plot_pr_curve,
    metrics.py:621). px: recall grid; py: list of per-class precision arrays."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py, axis=1) if len(py) else np.zeros((len(px), 0))
    if 0 < py.shape[1] < 21:
        for i in range(py.shape[1]):
            label = f"{names[i]} {ap[i, 0]:.3f}" if len(names) > i else str(i)
            ax.plot(px, py[:, i], linewidth=1, label=label)
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    if py.shape[1]:
        ax.plot(px, py.mean(1), linewidth=3, color="blue",
                label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize="small")
    out = Path(save_dir) / fname
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return str(out)


def plot_mc_curve(px, py, save_dir=".", fname="F1_curve.png", names=(),
                  xlabel="Confidence", ylabel="Metric"):
    """Metric-vs-confidence curves (F1/P/R; reference plotting.py
    plot_mc_curve, metrics.py:707)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.asarray(py)
    if 0 < len(py) < 21:
        for i, y in enumerate(py):
            ax.plot(px, y, linewidth=1,
                    label=names[i] if len(names) > i else str(i))
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = py.mean(0) if len(py) else np.zeros_like(px)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left", fontsize="small")
    out = Path(save_dir) / fname
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return str(out)


def plot_labels(cls, boxes_xywhn, names=(), save_dir="."):
    """Label correlogram (reference plotting.py:563): class histogram + box
    center/size scatter matrix."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cls = np.asarray(cls).astype(int)
    b = np.asarray(boxes_xywhn, np.float32).reshape(-1, 4)
    fig, axes = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    nmax = int(cls.max()) + 1 if len(cls) else 1
    axes[0, 0].hist(cls, bins=np.arange(nmax + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_xlabel("classes")
    if len(names):
        axes[0, 0].set_xticks(range(len(names)))
        axes[0, 0].set_xticklabels(list(names)[:nmax], rotation=90, fontsize=8)
    axes[0, 1].hist2d(b[:, 0], b[:, 1], bins=50, cmap="Blues") if len(b) else None
    axes[0, 1].set_xlabel("x")
    axes[0, 1].set_ylabel("y")
    axes[1, 0].hist2d(b[:, 2], b[:, 3], bins=50, cmap="Blues") if len(b) else None
    axes[1, 0].set_xlabel("width")
    axes[1, 0].set_ylabel("height")
    if len(b):
        # box outlines sample (reference draws up to 500 boxes on a canvas)
        for row in b[:500]:
            x, y, w, h = row
            axes[1, 1].add_patch(plt.Rectangle((x - w / 2, y - h / 2), w, h,
                                               fill=False, linewidth=0.4))
    axes[1, 1].set_xlim(0, 1)
    axes[1, 1].set_ylim(1, 0)
    axes[1, 1].set_xlabel("boxes")
    out = Path(save_dir) / "labels.jpg"
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return str(out)


def feature_visualization(x, module_type: str, stage: int, n: int = 32,
                          save_dir="."):
    """Save the first n channels of an intermediate (B, H, W, C) feature map
    as a grid (reference plotting.py:1015 feature_visualization; NHWC here)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x, np.float32)
    if x.ndim != 4 or min(x.shape[1], x.shape[2]) < 2:
        return None
    maps = x[0]  # (H, W, C)
    n = min(n, maps.shape[-1])
    cols = 8
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.4, rows * 1.4),
                             tight_layout=True)
    axes = np.atleast_1d(axes).ravel()
    for i in range(rows * cols):
        axes[i].axis("off")
        if i < n:
            axes[i].imshow(maps[..., i], cmap="viridis")
    safe = module_type.replace(".", "_")
    out = Path(save_dir) / f"stage{stage}_{safe}_features.png"
    fig.savefig(out, dpi=150)
    plt.close(fig)
    return str(out)
