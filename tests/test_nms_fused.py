"""Fused single-label postprocess (decode_single_label +
non_max_suppression_fused) must produce exactly the generic path's results,
and the classes= filter must follow the reference's single-label semantics
(ultralytics/utils/nms.py:118: rows are DROPPED when their argmax class is
not allowed, not re-scored to the best allowed class)."""

import numpy as np
import pytest


def test_fused_matches_generic_path():
    import jax
    import jax.numpy as jnp

    from ultralytics_pro_tpu.nn.modules.head import decode_single_label
    from ultralytics_pro_tpu.nn.tasks import DetectionModel
    from ultralytics_pro_tpu.ops.nms import non_max_suppression, non_max_suppression_fused

    m = DetectionModel("yolov8n.yaml")
    v = m.init_params(imgsz=64)
    x = jnp.asarray(np.random.default_rng(0).normal(0.45, 0.2, (2, 64, 64, 3)).astype(np.float32))
    y, aux = m.apply(v, x, train=False)

    gen = non_max_suppression(y[..., :4], y[..., 4:], conf_thres=1e-6, iou_thres=0.45,
                              max_det=20, max_nms=64, use_pallas=False)
    b4, cf, cl = decode_single_label(aux["feats"], m.stride, m.nc)
    np.testing.assert_allclose(np.asarray(b4), np.asarray(y[..., :4]), atol=1e-5)
    fus = non_max_suppression_fused(b4, cf, cl, conf_thres=1e-6, iou_thres=0.45,
                                    max_det=20, max_nms=64, use_pallas=False)
    assert np.asarray(gen["valid"]).sum() > 0  # random-init: plenty of candidates
    for k in ("boxes", "scores", "cls", "valid"):
        np.testing.assert_allclose(np.asarray(gen[k], np.float32),
                                   np.asarray(fus[k], np.float32), atol=1e-5, err_msg=k)


def test_classes_filter_drops_disallowed_argmax_row():
    import jax.numpy as jnp

    from ultralytics_pro_tpu.ops.nms import non_max_suppression, non_max_suppression_fused

    # anchor 0: best class = 2 (0.9), class 0 also over threshold (0.8)
    # anchor 1: best class = 0 (0.7)
    boxes = jnp.asarray([[[32, 32, 10, 10], [100, 100, 10, 10], [0, 0, 0, 0]]], jnp.float32)
    scores = jnp.zeros((1, 3, 3), jnp.float32)
    scores = scores.at[0, 0, 2].set(0.9).at[0, 0, 0].set(0.8).at[0, 1, 0].set(0.7)
    allowed = (True, False, False)

    out = non_max_suppression(boxes, scores, conf_thres=0.25, max_det=4, max_nms=3,
                              classes=allowed, use_pallas=False)
    kept = np.asarray(out["scores"])[np.asarray(out["valid"])]
    # reference semantics: anchor 0 is dropped entirely (argmax class 2 not
    # allowed), NOT re-scored to its class-0 0.8
    np.testing.assert_allclose(sorted(kept.tolist()), [0.7], atol=1e-6)

    conf = scores.max(-1)
    cls = scores.argmax(-1).astype(jnp.int32)
    outf = non_max_suppression_fused(boxes, conf, cls, conf_thres=0.25, max_det=4,
                                     max_nms=3, classes=allowed, use_pallas=False)
    keptf = np.asarray(outf["scores"])[np.asarray(outf["valid"])]
    np.testing.assert_allclose(sorted(keptf.tolist()), [0.7], atol=1e-6)


def test_predictor_uses_fused_path_for_detect():
    """BasePredictor's jitted run on a plain Detect model goes through the
    fused path and produces valid Results."""
    import numpy as np

    from ultralytics_pro_tpu import YOLO

    y = YOLO("yolov8n.yaml")
    img = (np.random.default_rng(1).uniform(0, 255, (96, 128, 3))).astype(np.uint8)
    r = y.predict(img, imgsz=64, conf=0.01, verbose=False)
    assert r and r[0].boxes is not None
