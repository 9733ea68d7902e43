"""mAP parity vs the MEASURED torch reference (VERDICT round-1 #1).

tools/gen_reference_baseline.py trained the reference yolov8n on a shared
deterministic synthetic dataset (CPU), ran its validator, and recorded weights
(val_parity_model.npz) + metrics (val_parity_ref.json). Here we import the
identical weights, run OUR val pipeline (letterbox -> forward -> NMS ->
original-frame matching -> ap_per_class) on the regenerated dataset, and
require the same mAP. Ref: ultralytics/engine/validator.py:131,
models/yolo/detect/val.py:274.
"""

import json
import os

import numpy as np
import pytest

from tests.conftest import FIXTURES
from tests.make_synth_dataset import make_synth_dataset

REF_JSON = os.path.join(FIXTURES, "val_parity_ref.json")
REF_NPZ = os.path.join(FIXTURES, "val_parity_model.npz")


@pytest.mark.skipif(not os.path.exists(REF_JSON), reason="reference baseline not generated")
def test_val_map_parity(tmp_path):
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    with open(REF_JSON) as f:
        ref = json.load(f)
    data_yaml = make_synth_dataset(tmp_path / "synth", **ref["dataset_args"])

    from ultralytics_pro_tpu.nn.tasks import yaml_model_load

    y = yaml_model_load("yolov8n.yaml")
    y["nc"] = ref["dataset_args"]["nc"]  # reference trained at the dataset's nc
    model = YOLO(y)
    variables = model.model.init_params(imgsz=ref["val_args"]["imgsz"])
    fx = dict(np.load(REF_NPZ))
    sd = {k[4:]: v for k, v in fx.items() if k.startswith("sd::")}
    model.model.variables = load_torch_state_dict(variables, sd, strict=True)

    metrics = model.val(
        data=str(data_yaml), imgsz=ref["val_args"]["imgsz"], batch=8,
        conf=ref["val_args"]["conf"], iou=ref["val_args"]["iou"],
        max_det=ref["val_args"]["max_det"],
    )
    got50, got = metrics.box.map50, metrics.box.map
    want50 = ref["results"]["metrics/mAP50(B)"]
    want = ref["results"]["metrics/mAP50-95(B)"]
    print(f"ours mAP50={got50:.4f} mAP50-95={got:.4f}  ref mAP50={want50:.4f} mAP50-95={want:.4f}")
    # identical weights + identical data: the whole val pipeline (resize,
    # letterbox, forward, NMS, original-frame matching, 101-pt AP) must agree
    assert abs(got50 - want50) <= 0.005, (got50, want50)
    assert abs(got - want) <= 0.005, (got, want)


def _task_parity(tmp_path, stem, model_yaml, checks):
    """Shared recipe: import the reference-trained weights, run our val, and
    assert each (metric-attr, ref-key) pair agrees within 0.005
    (VERDICT r2 Next #3; ref models/yolo/{segment,pose,obb}/val.py)."""
    from ultralytics_pro_tpu import YOLO
    from ultralytics_pro_tpu.nn.tasks import yaml_model_load
    from ultralytics_pro_tpu.utils.torch_import import load_torch_state_dict

    ref_json = os.path.join(FIXTURES, f"{stem}_ref.json")
    if not os.path.exists(ref_json):
        pytest.skip(f"{stem} baseline not generated")
    with open(ref_json) as f:
        ref = json.load(f)
    data_yaml = make_synth_dataset(tmp_path / "synth", **ref["dataset_args"])

    y = yaml_model_load(model_yaml)
    y["nc"] = ref["dataset_args"]["nc"]
    if "pose" in stem:
        y["kpt_shape"] = [5, 3]  # synth dataset keypoint layout
    model = YOLO(y)
    variables = model.model.init_params(imgsz=ref["val_args"]["imgsz"])
    fx = dict(np.load(os.path.join(FIXTURES, f"{stem}_model.npz")))
    sd = {k[4:]: v for k, v in fx.items() if k.startswith("sd::")}
    model.model.variables = load_torch_state_dict(variables, sd, strict=True)

    metrics = model.val(
        data=str(data_yaml), imgsz=ref["val_args"]["imgsz"], batch=8,
        conf=ref["val_args"]["conf"], iou=ref["val_args"]["iou"],
        max_det=ref["val_args"]["max_det"],
    )
    for attr, key, tol in checks:
        obj = metrics
        for part in attr.split("."):
            obj = getattr(obj, part)
        want = ref["results"][key]
        print(f"{stem} {attr}={obj:.4f} ref[{key}]={want:.4f}")
        assert abs(obj - want) <= tol, (attr, obj, want)


def test_val_map_parity_segment(tmp_path):
    _task_parity(tmp_path, "val_parity_segment", "yolov8n-seg.yaml", [
        ("box.map50", "metrics/mAP50(B)", 0.005),
        ("box.map", "metrics/mAP50-95(B)", 0.005),
        ("seg.map50", "metrics/mAP50(M)", 0.005),
        ("seg.map", "metrics/mAP50-95(M)", 0.005),
    ])


def test_val_map_parity_pose(tmp_path):
    _task_parity(tmp_path, "val_parity_pose", "yolov8n-pose.yaml", [
        ("box.map50", "metrics/mAP50(B)", 0.005),
        ("box.map", "metrics/mAP50-95(B)", 0.005),
        ("pose.map50", "metrics/mAP50(P)", 0.005),
        ("pose.map", "metrics/mAP50-95(P)", 0.005),
    ])


def test_val_map_parity_obb(tmp_path):
    _task_parity(tmp_path, "val_parity_obb", "yolov8n-obb.yaml", [
        ("box.map50", "metrics/mAP50(B)", 0.005),
        ("box.map", "metrics/mAP50-95(B)", 0.005),
    ])
