"""Vendored numpy COCO eval tests (VERDICT r2 Next #9).

Exactness cases with hand-computable APs, then an end-to-end check: run our
validator with save_json on the shared parity dataset + reference-trained
weights, evaluate predictions.json with COCOEvalNp against a COCO-format GT
built from the labels, and require agreement with DetMetrics mAP within the
known interpolation delta (COCO's 101-pt interp over score-ordered global
ranking vs our per-class ap_per_class — documented ~0.02 on small sets).
"""

import json
import os

import numpy as np
import pytest

from ultralytics_pro_tpu.utils.cocoeval import COCOEvalNp

from tests.conftest import FIXTURES
from tests.make_synth_dataset import make_synth_dataset


def _gt(images, anns, cats=(0, 1)):
    return {
        "images": [{"id": i, "width": 100, "height": 100} for i in images],
        "annotations": [
            {"id": k, "image_id": a[0], "category_id": a[1], "bbox": list(a[2]),
             "area": a[2][2] * a[2][3], "iscrowd": 0}
            for k, a in enumerate(anns)
        ],
        "categories": [{"id": c} for c in cats],
    }


def test_perfect_predictions():
    gt = _gt([0, 1], [(0, 0, (10, 10, 20, 20)), (1, 1, (30, 30, 10, 10))])
    pred = [
        {"image_id": 0, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [30, 30, 10, 10], "score": 0.8},
    ]
    stats = COCOEvalNp(gt, pred).run()
    assert stats["map50-95"] == pytest.approx(1.0)
    assert stats["map50"] == pytest.approx(1.0)


def test_false_positive_halves_precision():
    """1 GT, 2 dets (TP at higher score + FP): AP = 1.0 at every IoU thr
    because the TP ranks first (precision 1.0 up to recall 1.0)."""
    gt = _gt([0], [(0, 0, (10, 10, 20, 20))], cats=(0,))
    pred = [
        {"image_id": 0, "category_id": 0, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 0, "category_id": 0, "bbox": [60, 60, 10, 10], "score": 0.5},
    ]
    assert COCOEvalNp(gt, pred).run()["map50-95"] == pytest.approx(1.0)
    # FP ranked ABOVE the TP: precision at recall 1.0 is 0.5
    pred[0]["score"], pred[1]["score"] = 0.5, 0.9
    stats = COCOEvalNp(gt, pred).run()
    assert stats["map50-95"] == pytest.approx(0.5, abs=1e-6)


def test_iou_threshold_cut():
    """A det at IoU ~0.6 counts for thr<=0.6 only -> mAP50-95 = 3/10."""
    gt = _gt([0], [(0, 0, (0, 0, 10, 10))], cats=(0,))
    # shifted box: inter = 7*10=70, union = 130 -> IoU ~0.538... choose shift 2:
    # inter 8*10=80, union 120 -> 0.667 -> passes thr 0.5,0.55,0.6,0.65
    pred = [{"image_id": 0, "category_id": 0, "bbox": [2, 0, 10, 10], "score": 0.9}]
    stats = COCOEvalNp(gt, pred).run()
    assert stats["map50-95"] == pytest.approx(0.4, abs=1e-6)
    assert stats["map50"] == pytest.approx(1.0)


def test_crowd_gt_not_double_matched():
    gt = _gt([0], [(0, 0, (0, 0, 20, 20))], cats=(0,))
    gt["annotations"][0]["iscrowd"] = 1
    # crowd GT is ignore-only: matching det is ignored, not a TP; no real GT
    pred = [{"image_id": 0, "category_id": 0, "bbox": [0, 0, 20, 20], "score": 0.9}]
    stats = COCOEvalNp(gt, pred).run()
    assert stats["map50-95"] == 0.0  # no non-ignored GT -> precision undefined -> -1 -> 0


@pytest.mark.skipif(not os.path.exists(os.path.join(FIXTURES, "val_parity_ref.json")),
                    reason="parity baseline not generated")
@pytest.mark.slow
def test_save_json_end_to_end(tmp_path):
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.nn.tasks import yaml_model_load
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    with open(os.path.join(FIXTURES, "val_parity_ref.json")) as f:
        ref = json.load(f)
    data_yaml = make_synth_dataset(tmp_path / "synth", **ref["dataset_args"])

    y = yaml_model_load("yolov8n.yaml")
    y["nc"] = ref["dataset_args"]["nc"]
    model = YOLO(y)
    variables = model.model.init_params(imgsz=ref["val_args"]["imgsz"])
    fx = dict(np.load(os.path.join(FIXTURES, "val_parity_model.npz")))
    sd = {k[4:]: v for k, v in fx.items() if k.startswith("sd::")}
    model.model.variables = load_torch_state_dict(variables, sd, strict=True)

    metrics = model.val(data=str(data_yaml), imgsz=ref["val_args"]["imgsz"], batch=8,
                        conf=ref["val_args"]["conf"], iou=ref["val_args"]["iou"],
                        max_det=ref["val_args"]["max_det"], save_json=True,
                        project=str(tmp_path / "runs"))
    # find predictions.json
    preds = list((tmp_path / "runs").rglob("predictions.json"))
    assert preds, "save_json did not write predictions.json"
    pred = json.load(open(preds[0]))
    assert pred, "no predictions saved"

    # GT COCO dict from the val labels (original image frames)
    import cv2

    root = tmp_path / "synth"
    images, anns = [], []
    for p in sorted((root / "images/val").glob("*.jpg")):
        stem = p.stem
        im = cv2.imread(str(p))
        ih, iw = im.shape[:2]
        img_id = int(stem) if stem.isnumeric() else stem
        images.append({"id": img_id, "width": iw, "height": ih})
        lbl = root / "labels/val" / f"{stem}.txt"
        for line in lbl.read_text().strip().splitlines():
            v = [float(x) for x in line.split()]
            c, cx, cy, w, h = int(v[0]), v[1] * iw, v[2] * ih, v[3] * iw, v[4] * ih
            anns.append((img_id, c, (cx - w / 2, cy - h / 2, w, h)))
    gt = _gt([im["id"] for im in images], anns, cats=tuple(range(ref["dataset_args"]["nc"])))
    gt["images"] = images
    stats = COCOEvalNp(gt, pred).run()
    ours = metrics.box.map
    print(f"COCOEvalNp mAP50-95={stats['map50-95']:.4f} DetMetrics={ours:.4f}")
    assert abs(stats["map50-95"] - ours) <= 0.03, (stats, ours)
    assert abs(stats["map50"] - metrics.box.map50) <= 0.03
