"""AP computation parity vs the reference ap_per_class."""

import numpy as np

from tests.conftest import load_fixture
from ultralytics_pro_tpu.utils.metrics import DetMetrics, ap_per_class, match_predictions


def test_ap_per_class_parity():
    fx = load_fixture("metrics.npz")
    res = ap_per_class(fx["tp"].astype(bool), fx["conf"], fx["pred_cls"], fx["target_cls"])
    np.testing.assert_array_equal(res["unique_classes"], fx["unique_classes"].astype(int))
    np.testing.assert_allclose(res["ap"], fx["ap"], atol=1e-6)
    np.testing.assert_allclose(res["p"], fx["p"], atol=1e-6)
    np.testing.assert_allclose(res["r"], fx["r"], atol=1e-6)
    np.testing.assert_allclose(res["f1"], fx["f1"], atol=1e-6)


def test_detmetrics_fitness():
    fx = load_fixture("metrics.npz")
    m = DetMetrics({i: str(i) for i in range(6)})
    m.update_stats(fx["tp"].astype(bool), fx["conf"], fx["pred_cls"], fx["target_cls"])
    m.process()
    assert 0 < m.box.map50 <= 1
    expected = 0.1 * m.box.map50 + 0.9 * m.box.map
    np.testing.assert_allclose(m.fitness, expected)


def test_match_predictions_exact():
    """Hand-checkable matching: one gt, two preds, only the better-IoU pred is TP."""
    gt = np.array([[0.0, 0.0, 10.0, 10.0]])
    gt_cls = np.array([1.0])
    preds = np.array([[0.0, 0.0, 10.0, 9.0], [0.0, 0.0, 10.0, 5.0]])
    pred_cls = np.array([1.0, 1.0])
    from ultralytics_pro_tpu.utils.metrics import box_iou_np

    iou = box_iou_np(gt, preds)
    tp = match_predictions(pred_cls, gt_cls, iou)
    assert tp[0, 0] and not tp[1, 0]  # IoU 0.9 matches at 0.5; 0.5-IoU pred loses the gt
    assert tp[0, 7] and not tp[0, 9]  # IoU ~0.9-eps: TP at 0.85, FP at 0.95
