"""Regression tests for round-1 advisor findings (ADVICE.md).

- v10Detect predict() must use the NMS-free end2end decode (the generic path
  treats the class-index column as a score);
- rotated NMS must be per-class via the center class-offset trick (reference
  utils/nms.py rotated branch);
- CLI bare boolean config keys resolve to key=True instead of a mode/task
  did-you-mean SyntaxError.
"""

import numpy as np
import pytest


def test_v10_predict_end2end():
    """v10 predict must emit sane class ids / scores without NMS."""
    from ultralytics_pro_tpu import YOLO

    model = YOLO("yolov10n.yaml")
    img = (np.random.RandomState(0).rand(160, 160, 3) * 255).astype(np.uint8)
    results = model.predict(img, imgsz=128, conf=0.0001)
    r = results[0]
    assert r.boxes is not None
    if len(r.boxes.data):
        cls = r.boxes.data[:, 5]
        conf = r.boxes.data[:, 4]
        # class column must be integral indices in [0, nc); conf in [0, 1].
        assert np.allclose(cls, np.round(cls))
        assert cls.max() < model.model.nc
        assert conf.max() <= 1.0 + 1e-6
        # scores sorted desc = the v10 topk path, not NMS-reordered junk
        assert (np.diff(conf) <= 1e-6).all()


def test_rotated_nms_per_class():
    """Two perfectly-overlapping OBBs of different classes must BOTH survive
    per-class rotated NMS, and only one survives agnostic NMS."""
    import jax.numpy as jnp

    from ultralytics_pro_tpu.ops.nms import non_max_suppression_rotated

    rb = jnp.array([[[50.0, 50.0, 20.0, 10.0, 0.3],
                     [50.0, 50.0, 20.0, 10.0, 0.3],
                     [200.0, 200.0, 30.0, 15.0, 1.0]]])
    scores = jnp.array([[[0.9, 0.0], [0.0, 0.8], [0.7, 0.0]]])

    out = non_max_suppression_rotated(rb, scores, conf_thres=0.1, iou_thres=0.5, max_det=8)
    assert int(out["valid"][0].sum()) == 3  # both classes kept + the far box

    out_ag = non_max_suppression_rotated(rb, scores, conf_thres=0.1, iou_thres=0.5,
                                         max_det=8, agnostic=True)
    assert int(out_ag["valid"][0].sum()) == 2  # one of the pair suppressed


def test_cli_bare_bool_key(tmp_path, monkeypatch):
    """`yolo cfg`-style bare words that are bool config keys become key=True
    (reference entrypoint:899) instead of raising a task/mode SyntaxError."""
    from ultralytics_pro_tpu.cfg import DEFAULT_CFG_DICT, entrypoint

    # 'val' is a MODE; 'save' / 'half' are bool keys. 'save' is close to
    # 'val'? no — use 'half' which is near nothing, and 'save' which
    # difflib may match against modes; both must parse as overrides.
    assert isinstance(DEFAULT_CFG_DICT.get("half"), bool)
    captured = {}

    class FakeModel:
        task = "detect"

        def __init__(self, *a, **k):
            pass

        def predict(self, **kw):
            captured.update(kw)
            return []

    import ultralytics_pro_tpu.engine.model as em
    monkeypatch.setattr(em, "YOLO", lambda *a, **k: FakeModel())
    entrypoint(["predict", "model=yolov8n.yaml", "source=x.jpg", "half"])
    assert captured.get("half") is True
