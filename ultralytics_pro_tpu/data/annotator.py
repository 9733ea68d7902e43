"""Auto-annotation: detector boxes -> SAM masks -> YOLO segment labels
(reference ultralytics/data/annotator.py:auto_annotate)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ultralytics_pro_tpu.utils import LOGGER


def auto_annotate(data, det_model="yolov8n.yaml", sam_model: str = "sam_b",
                  conf: float = 0.25, iou: float = 0.45, imgsz: int = 640,
                  max_det: int = 300, classes=None, output_dir=None):
    """Detect objects, prompt SAM with their boxes, write polygon labels.

    Args:
        data: image file or directory.
        det_model: detection model (yaml/ckpt path or a ready Model).
        sam_model: SAM variant name or a ready SAMPredictor.
        output_dir: label dir (default <data>/../<data.stem>_auto_annotate_labels).

    Writes one `<stem>.txt` per image: `cls x1 y1 x2 y2 ...` normalized
    polygon rows (reference annotator.py:54).
    """
    import cv2

    from ultralytics_pro_tpu.engine.model import Model
    from ultralytics_pro_tpu.models.sam.predict import SAMPredictor

    det = det_model if isinstance(det_model, Model) else Model(det_model, task="detect")
    sam = sam_model if isinstance(sam_model, SAMPredictor) else SAMPredictor(variant=str(sam_model))
    if getattr(sam, "variables", None) is None:
        sam.init_params()

    data = Path(data)
    paths = sorted(p for p in ([data] if data.is_file() else data.glob("*"))
                   if p.suffix.lower() in {".jpg", ".jpeg", ".png", ".bmp"})
    out = Path(output_dir) if output_dir else data.parent / f"{data.stem}_auto_annotate_labels"
    out.mkdir(parents=True, exist_ok=True)

    for p in paths:
        results = det.predict(source=str(p), conf=conf, iou=iou, imgsz=imgsz,
                              max_det=max_det, classes=classes, verbose=False)
        r = results[0]
        boxes = np.asarray(r.boxes.xyxy) if r.boxes is not None else np.zeros((0, 4))
        clss = np.asarray(r.boxes.cls).astype(int) if r.boxes is not None else np.zeros((0,), int)
        if not len(boxes):
            (out / f"{p.stem}.txt").write_text("")
            continue
        im = cv2.imread(str(p))
        h, w = im.shape[:2]
        masks, _scores = sam.inference(im, bboxes=boxes)  # (N, H, W) masks
        lines = []
        for c, m in zip(clss, np.asarray(masks)):
            cnts, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
            if not cnts:
                continue
            cnt = max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            if len(cnt) < 3:
                continue
            poly = (cnt / [w, h]).reshape(-1)
            lines.append(f"{int(c)} " + " ".join(f"{v:.6f}" for v in poly))
        (out / f"{p.stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))
        LOGGER.info(f"auto-annotated {p.name}: {len(lines)} instances")
    return out
