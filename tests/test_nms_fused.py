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


def test_approx_topk_agreement():
    """approx_topk (lax.approx_max_k candidate selection, the TPU-fast path
    measured in tools/perf_topk_probe.py) must keep the same top detections as
    exact top_k on realistic score distributions: only the candidate POOL
    tail may differ, and final kept detections (max_det << max_nms) agree."""
    import jax.numpy as jnp

    from ultralytics_pro_tpu.ops.nms import non_max_suppression_fused

    rng = np.random.default_rng(3)
    a = 2100  # anchors
    boxes = np.zeros((2, a, 4), np.float32)
    boxes[..., :2] = rng.uniform(40, 600, (2, a, 2))
    boxes[..., 2:] = rng.uniform(8, 120, (2, a, 2))
    # realistic conf: most anchors low, a few confident detections
    conf = rng.beta(0.3, 6.0, (2, a)).astype(np.float32)
    cls = rng.integers(0, 80, (2, a)).astype(np.int32)

    kw = dict(conf_thres=0.25, iou_thres=0.45, max_det=30, max_nms=512,
              use_pallas=False)
    exact = non_max_suppression_fused(jnp.asarray(boxes), jnp.asarray(conf),
                                      jnp.asarray(cls), **kw)
    approx = non_max_suppression_fused(jnp.asarray(boxes), jnp.asarray(conf),
                                       jnp.asarray(cls), approx_topk=0.95, **kw)
    n_exact = int(np.asarray(exact["valid"]).sum())
    n_approx = int(np.asarray(approx["valid"]).sum())
    assert n_exact > 10
    # kept sets agree (scores identify boxes uniquely here)
    s_exact = np.sort(np.asarray(exact["scores"]).ravel())
    s_approx = np.sort(np.asarray(approx["scores"]).ravel())
    matched = np.isin(np.round(s_approx, 6), np.round(s_exact, 6)).mean()
    assert n_approx >= n_exact - 1
    assert matched > 0.97, f"approx candidate selection changed detections: {matched}"
