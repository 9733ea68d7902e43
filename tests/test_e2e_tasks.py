"""Per-task end-to-end smokes: segment / pose / obb / classify train+val+predict
on tiny synthetic datasets (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest

from tests.make_synth_dataset import make_synth_dataset


def _run_task(task, model_yaml, tmp_path, **train_kw):
    from ultralytics_pro_tpu import YOLO

    data = str(make_synth_dataset(tmp_path / "d", n_images=6, imgsz=128, nc=2, task=task))
    model = YOLO(model_yaml, task=task)
    model.train(data=data, epochs=1, imgsz=96, batch=2, workers=2, val=False, device=1,
                project=str(tmp_path / "runs"), name="t", max_gt=16, warmup_epochs=0.5,
                exist_ok=True, **train_kw)
    losses = model.trainer.epoch_losses
    assert all(np.isfinite(v) for v in losses.values()), losses
    metrics = model.val(data=data, imgsz=96, batch=2)
    return model, metrics


def test_segment_e2e(tmp_path):
    model, metrics = _run_task("segment", "yolov8n-seg.yaml", tmp_path)
    assert hasattr(metrics, "seg")
    assert np.isfinite(metrics.box.map50)
    # predict returns masks container
    import cv2

    im = cv2.imread(str(next((tmp_path / "d" / "images" / "val").glob("*.jpg"))))
    r = model.predict(im, imgsz=96, conf=0.001)[0]
    assert r.boxes is not None


@pytest.mark.slow
def test_pose_e2e(tmp_path):
    model, metrics = _run_task("pose", "yolov8n-pose.yaml", tmp_path)
    assert hasattr(metrics, "pose")
    losses = model.trainer.epoch_losses
    assert "pose" in losses and "kobj" in losses


@pytest.mark.slow
def test_obb_e2e(tmp_path):
    model, metrics = _run_task("obb", "yolov8n-obb.yaml", tmp_path)
    assert np.isfinite(metrics.box.map50)
    import cv2

    im = cv2.imread(str(next((tmp_path / "d" / "images" / "val").glob("*.jpg"))))
    r = model.predict(im, imgsz=96, conf=0.001)[0]
    assert r.obb is not None
    assert r.obb.xyxyxyxy.shape[-2:] == (4, 2) or len(r.obb) == 0
