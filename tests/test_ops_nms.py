"""NMS parity vs recorded reference outputs (exact TorchNMS semantics)."""

import numpy as np
import pytest

from tests.conftest import load_fixture
from ultralytics_pro_tpu.ops import non_max_suppression

CASES = {
    "default": dict(conf_thres=0.25, iou_thres=0.45),
    "val": dict(conf_thres=0.001, iou_thres=0.7, multi_label=True),
    "agnostic": dict(conf_thres=0.25, iou_thres=0.45, agnostic=True),
}


@pytest.mark.parametrize("case", list(CASES))
def test_nms_parity(case):
    fx = load_fixture(f"nms_{case}.npz")
    pred = fx["pred"]  # (B, 4+nc, A)
    nc = pred.shape[1] - 4
    boxes = pred[:, :4, :].transpose(0, 2, 1)
    scores = pred[:, 4:, :].transpose(0, 2, 1)

    out = non_max_suppression(boxes, scores, max_det=300, **CASES[case])
    for i in range(pred.shape[0]):
        ref = fx[f"out{i}"]  # (n, 6): xyxy, conf, cls
        valid = np.asarray(out["valid"][i])
        n = int(valid.sum())
        assert n == len(ref), f"image {i}: {n} detections vs reference {len(ref)}"
        got = np.concatenate(
            [
                np.asarray(out["boxes"][i])[:n],
                np.asarray(out["scores"][i])[:n, None],
                np.asarray(out["cls"][i])[:n, None].astype(np.float32),
            ],
            axis=1,
        )
        # Both are in greedy keep order (score-descending); allow reordering of
        # equal-score ties by sorting rows.
        key = lambda a: a[np.lexsort((a[:, 0], a[:, 5], -a[:, 4]))]
        np.testing.assert_allclose(key(got), key(ref), atol=1e-3, rtol=1e-4)


def test_nms_static_shapes():
    rng = np.random.default_rng(1)
    boxes = rng.uniform(0, 640, (2, 400, 4)).astype(np.float32)
    scores = rng.uniform(0, 1, (2, 400, 3)).astype(np.float32)
    out = non_max_suppression(boxes, scores, conf_thres=0.5, iou_thres=0.5, max_det=50)
    assert out["boxes"].shape == (2, 50, 4)
    assert out["scores"].shape == (2, 50)
    assert out["cls"].shape == (2, 50)
    assert out["valid"].shape == (2, 50)


def test_nms_classes_filter():
    rng = np.random.default_rng(2)
    boxes = rng.uniform(100, 500, (1, 64, 4)).astype(np.float32)
    scores = rng.uniform(0.3, 1, (1, 64, 4)).astype(np.float32)
    allowed = np.array([True, False, True, False])
    out = non_max_suppression(boxes, scores, conf_thres=0.25, iou_thres=0.45, max_det=20, classes=allowed)
    valid = np.asarray(out["valid"][0])
    cls = np.asarray(out["cls"][0])[valid]
    assert set(np.unique(cls)).issubset({0, 2})
